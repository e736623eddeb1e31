"""Server-scale synthetic map construction for benchmarks and dry runs.

Builds a fully-populated ``MapState`` at the reference server operating
point (~1-2k keyframes, tens of thousands of landmarks, millions of
observations — reference Map scale after a multi-agent EuRoC run) directly
as device blocks, without replaying a sequence: cameras on a ring facing a
cylindrical landmark band (local covisibility like a corridor loop),
projection-consistent observations, and optional pose/landmark noise so a
GBA has real work to do.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import (CameraParams, CapacityParams, Config, ExtractorParams,
                      MotionCheckParams)
from ..models import map_state as ms


def bench_config(n_kfs: int, n_mps: int, obs_per_kf: int,
                 motion_check: bool = False) -> Config:
    return Config().replace(
        capacity=CapacityParams(server_max_kfs=n_kfs, server_max_mps=n_mps,
                                client_max_kfs=n_kfs, client_max_mps=n_mps),
        extractor=ExtractorParams(max_features=obs_per_kf),
        camera=CameraParams(k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0),
        motion_check=MotionCheckParams(enabled=motion_check),
    )


def build_server_scale_map(n_kfs: int = 1024, n_mps: int = 32768,
                           obs_per_kf: int = 1024, seed: int = 0,
                           pose_noise: float = 0.03,
                           lm_noise: float = 0.02,
                           px_noise: float = 0.4,
                           config: Config = None):
    """Returns (MapState, config, Tcw_true (NK,4,4)).

    Cameras sit on an inner ring (radius 5) facing outward at a landmark
    band (radius ~11): each KF sees only its angular neighborhood, giving
    the banded camera-landmark bipartite structure of a real corridor/loop
    map rather than an all-sees-all block.
    """
    if config is None:
        config = bench_config(n_kfs, n_mps, obs_per_kf)
    rng = np.random.default_rng(seed)
    K = config.camera.K()
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    w, h = config.camera.width, config.camera.height

    # landmarks on a cylindrical band, sorted by angle for windowed access
    th_l = np.sort(rng.uniform(0, 2 * np.pi, n_mps)).astype(np.float32)
    r_l = 11.0 + rng.uniform(-1.0, 1.0, n_mps)
    y_l = rng.uniform(-2.5, 2.5, n_mps)
    X_true = np.stack(
        [r_l * np.cos(th_l), y_l, r_l * np.sin(th_l)], -1
    ).astype(np.float32)

    # cameras on the inner ring facing outward
    th_c = np.linspace(0, 2 * np.pi, n_kfs, endpoint=False).astype(np.float32)
    C_pos = np.stack(
        [5.0 * np.cos(th_c),
         0.3 * np.sin(3 * th_c),
         5.0 * np.sin(th_c)], -1).astype(np.float32)
    fwd = np.stack([np.cos(th_c), np.zeros(n_kfs, np.float32),
                    np.sin(th_c)], -1)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    x_ax = np.cross(np.broadcast_to(up, fwd.shape), fwd)
    x_ax /= np.linalg.norm(x_ax, axis=-1, keepdims=True)
    y_ax = np.cross(fwd, x_ax)
    R_wc = np.stack([x_ax, y_ax, fwd], -1)         # (NK, 3, 3)
    Tcw_true = np.tile(np.eye(4, dtype=np.float32), (n_kfs, 1, 1))
    Tcw_true[:, :3, :3] = np.swapaxes(R_wc, 1, 2)
    Tcw_true[:, :3, 3] = -np.einsum("kij,kj->ki", Tcw_true[:, :3, :3], C_pos)

    # each KF samples obs_per_kf landmarks from its angular window
    half_arc = np.pi * 1.2 * obs_per_kf / n_mps + 0.15
    lo = np.searchsorted(th_l, (th_c - half_arc) % (2 * np.pi))
    hi = np.searchsorted(th_l, (th_c + half_arc) % (2 * np.pi))
    span = (hi - lo) % n_mps
    span = np.maximum(span, obs_per_kf)
    offs = rng.integers(0, 1 << 30, (n_kfs, obs_per_kf)) % span[:, None]
    mp_idx = ((lo[:, None] + offs) % n_mps).astype(np.int32)   # (NK, F)

    # project through the TRUE geometry
    Xo = X_true[mp_idx]                                        # (NK, F, 3)
    pc = np.einsum("kij,kfj->kfi", Tcw_true[:, :3, :3], Xo) \
        + Tcw_true[:, None, :3, 3]
    z = pc[..., 2]
    u = fx * pc[..., 0] / np.maximum(z, 1e-6) + cx
    v = fy * pc[..., 1] / np.maximum(z, 1e-6) + cy
    vis = (z > 0.2) & (u >= 2) & (u < w - 2) & (v >= 2) & (v < h - 2)
    uv = np.stack([u, v], -1).astype(np.float32)
    uv += rng.normal(0, px_noise, uv.shape).astype(np.float32)

    # noisy initial state (what the GBA corrects)
    Tcw = Tcw_true.copy()
    Tcw[:, :3, 3] += rng.normal(0, pose_noise, (n_kfs, 3)).astype(np.float32)
    Xw = X_true + rng.normal(0, lm_noise, X_true.shape).astype(np.float32)

    m = ms.MapState.create(config, server=True)
    F = config.extractor.max_features
    assert F >= obs_per_kf and m.nk >= n_kfs and m.nm >= n_mps
    pad_f = F - obs_per_kf
    if pad_f:
        mp_idx = np.pad(mp_idx, ((0, 0), (0, pad_f)), constant_values=-1)
        uv = np.pad(uv, ((0, 0), (0, pad_f), (0, 0)))
        vis = np.pad(vis, ((0, 0), (0, pad_f)))
    kf = m.kf
    ar = np.arange(n_kfs, dtype=np.int32)
    m.kf = kf._replace(
        kf_id=kf.kf_id.at[:n_kfs].set(jnp.asarray(ar)),
        client_id=kf.client_id.at[:n_kfs].set(0),
        timestamp=kf.timestamp.at[:n_kfs].set(jnp.asarray(0.25 * ar)),
        Tcw=kf.Tcw.at[:n_kfs].set(jnp.asarray(Tcw)),
        xy=kf.xy.at[:n_kfs].set(jnp.asarray(uv)),
        feat_valid=kf.feat_valid.at[:n_kfs].set(jnp.asarray(vis)),
        mp_idx=kf.mp_idx.at[:n_kfs].set(jnp.asarray(mp_idx)),
        parent=kf.parent.at[:n_kfs].set(jnp.asarray(ar - 1)),
        pred=kf.pred.at[:n_kfs].set(jnp.asarray(ar - 1)),
        valid=kf.valid.at[:n_kfs].set(True),
    )
    mp = m.mp
    arm = np.arange(n_mps, dtype=np.int32)
    # reference KF: one that actually observes the landmark (last writer of
    # the scatter below); approximate with the angularly nearest camera
    ref = np.clip(
        np.round(th_l / (2 * np.pi) * n_kfs).astype(np.int32), 0, n_kfs - 1
    )
    m.mp = mp._replace(
        mp_id=mp.mp_id.at[:n_mps].set(jnp.asarray(arm)),
        client_id=mp.client_id.at[:n_mps].set(0),
        Xw=mp.Xw.at[:n_mps].set(jnp.asarray(Xw)),
        min_dist=mp.min_dist.at[:n_mps].set(0.1),
        max_dist=mp.max_dist.at[:n_mps].set(100.0),
        ref_kf=mp.ref_kf.at[:n_mps].set(jnp.asarray(ref)),
        first_kf_id=mp.first_kf_id.at[:n_mps].set(0),
        valid=mp.valid.at[:n_mps].set(True),
    )
    m.sync_host_index()
    return m, config, Tcw_true
