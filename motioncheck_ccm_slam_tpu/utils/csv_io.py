"""Trajectory export in EuRoC / TUM formats.

Replaces the reference's CSV writers (``Map::WriteStateToCsv``
src/Map.cpp:4093-4434 and ``Stats.trajectory_format``
cslam/conf/config.yaml:10-12): poses are exported as Tws = (Tcw^-1 * T_SC^-1)
— i.e. the IMU/body frame in world — with quaternion orientation.
"""
from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

from ..config import Config
from ..ops import lie
import jax.numpy as jnp


def _tws_from_tcw(Tcw: np.ndarray, T_SC: np.ndarray) -> np.ndarray:
    """World-from-body: Tws = Twc @ T_SC^{-1} = (Tcw)^-1 @ inv(T_SC).

    (Reference writes Twc * T_SC^-1; T_SC maps camera->body.)
    """
    Twc = np.linalg.inv(Tcw)
    return Twc @ np.linalg.inv(T_SC)


def trajectory_rows(traj: Iterable[Tuple[float, np.ndarray]], config: Config):
    """(timestamp, Tcw) pairs -> (stamp, t (3,), q (4,) wxyz) body-frame rows."""
    T_SC = config.camera.T_SC()
    rows = []
    for ts, Tcw in traj:
        Tws = _tws_from_tcw(np.asarray(Tcw), T_SC)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(Tws[:3, :3])))
        rows.append((ts, Tws[:3, 3], q))
    return rows


def trajectory_tum(traj, config: Config) -> str:
    """TUM format: stamp[s] tx ty tz qx qy qz qw."""
    lines = []
    for ts, t, q in trajectory_rows(traj, config):
        lines.append(
            f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
        )
    return "\n".join(lines) + "\n"


def trajectory_euroc(traj, config: Config) -> str:
    """EuRoC format: stamp[ns], tx, ty, tz, qw, qx, qy, qz."""
    lines = []
    for ts, t, q in trajectory_rows(traj, config):
        lines.append(
            f"{int(ts * 1e9)},{t[0]:.6f},{t[1]:.6f},{t[2]:.6f},"
            f"{q[0]:.6f},{q[1]:.6f},{q[2]:.6f},{q[3]:.6f}"
        )
    return "\n".join(lines) + "\n"


def ate_rmse(traj_est, traj_gt, align_sim3: bool = True):
    """Absolute trajectory error after optional Sim3 alignment (the standard
    mono-SLAM evaluation the reference relies on external tooling for).

    traj_est/traj_gt: arrays (N, 3) of associated positions.
    Returns (rmse, max_err).
    """
    est = np.asarray(traj_est, np.float64)
    gt = np.asarray(traj_gt, np.float64)
    if align_sim3:
        R, t, s = lie.horn_align(
            jnp.asarray(est, jnp.float32)[None],
            jnp.asarray(gt, jnp.float32)[None],
        )
        R = np.asarray(R[0], np.float64)
        t = np.asarray(t[0], np.float64)
        s = float(s[0])
        est = s * est @ R.T + t
    err = np.linalg.norm(est - gt, axis=-1)
    return float(np.sqrt(np.mean(err**2))), float(err.max())
