"""Global bundle adjustment driver with Motion Check gating.

Replaces the reference's GBA orchestration (``Map::RunGBA`` src/Map.cpp:1491,
``Optimizer::MapFusionGBA`` src/Optimizer.cpp:646, and the MC-triggered
re-run ``RunGBA_fromCorrectKF`` :1919):

1. snapshot pre-GBA state (poses + landmark positions + MC body positions),
2. run the full-map robust LM with landmarks marginalized (Schur),
   interruptible between iteration chunks (INTERRUPTBA semantics —
   reference Communicator.cpp:453-462 aborts on fresh agent data),
3. run Motion Check per client and apply the verdict: accept, surgically
   delete violating keyframes, or roll everything back.

The solver runs through solvers/local_ba.bundle_adjust for single-chip maps
and parallel/sharded_ba for multi-host execution.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import orb
from ..solvers import ba_core, local_ba
from . import map_state as ms
from . import motion_check as mc


@dataclasses.dataclass
class GBAResult:
    interrupted: bool = False
    reverted: bool = False
    n_deleted_kfs: int = 0
    cost: float = 0.0
    mc_longest_run: int = 0


# Above this dense-W footprint (6C x 3L f32) the Schur solve switches to the
# matrix-free PCG solver — at the server operating point (2048 KFs, 65k MPs)
# the dense W alone would be ~9.7 GB and cannot run on one chip.
DENSE_W_MAX_BYTES = 256 * 2 ** 20

_matrix_free_cache: dict = {}


def _pick_solver(C: int, L: int, pcg_iters: int = 25):
    """None -> dense-W local_ba path; else a matrix-free solver callable."""
    if 6 * C * 3 * L * 4 <= DENSE_W_MAX_BYTES:
        return None
    from ..parallel import sharded_ba

    key = pcg_iters
    if key not in _matrix_free_cache:
        _matrix_free_cache[key] = sharded_ba.make_matrix_free_gba(
            pcg_iters=pcg_iters
        )
    return _matrix_free_cache[key]


def build_observations(kf: ms.KFBlock, config: Config) -> ba_core.BAObservations:
    cam, feat, lm, uv, octv, ok = ms.gather_observations(kf, 0)
    inv_s2_tab = jnp.asarray(orb.inv_level_sigma2(config.extractor))
    return ba_core.BAObservations(
        cam_idx=cam, lm_idx=lm, uv=uv,
        inv_sigma2=inv_s2_tab[jnp.clip(octv, 0, config.extractor.n_levels - 1)],
        valid=ok,
    )


def run_gba(
    m: ms.MapState,
    config: Config,
    interrupt_check: Optional[Callable[[], bool]] = None,
    iterations: Optional[int] = None,
    chunk: int = 5,
    enable_motion_check: Optional[bool] = None,
    sharded_solver=None,
) -> GBAResult:
    """Full-map GBA with MC gating. Mutates ``m`` in place."""
    if iterations is None:
        iterations = config.opt.gba_iterations
    if enable_motion_check is None:
        enable_motion_check = config.motion_check.enabled
    T_SC_inv = jnp.asarray(np.linalg.inv(config.camera.T_SC()))

    # 1. snapshots (reference SetTcwCurrent :1520 + the driver's own landmark
    # copy for revert)
    m.kf = mc.snapshot_pre_gba(m.kf, T_SC_inv)
    Xw_snapshot = m.mp.Xw

    # 2. optimize — gauge fixes the first origin KF (reference
    # Optimizer.cpp:669: first KF with lowest uid fixed)
    obs = build_observations(m.kf, config)
    K = jnp.asarray(config.camera.K())
    kf_ids = np.asarray(m.kf.kf_id)
    valid = np.asarray(m.kf.valid)
    fixed = ~valid
    if valid.any():
        origin = np.flatnonzero(valid)[
            np.argmin(kf_ids[valid])
        ]
        fixed = fixed.copy()
        fixed[origin] = True
    fixed_j = jnp.asarray(fixed)

    result = GBAResult()
    # solver selection: explicit sharded solver > size-based matrix-free >
    # dense-W Schur (small maps)
    solver = sharded_solver
    if solver is None:
        solver = _pick_solver(int(m.kf.Tcw.shape[0]), int(m.mp.Xw.shape[0]))
    done = 0
    Tcw, Xw = m.kf.Tcw, m.mp.Xw
    while done < iterations:
        n_it = min(chunk, iterations - done)
        if solver is not None:
            ba = solver(Tcw, Xw, obs, K, fixed_j, ~m.mp.valid, n_it)
        else:
            ba = local_ba.bundle_adjust(
                Tcw, Xw, obs, K, fixed_j, fixed_lm=~m.mp.valid,
                iterations=n_it,
            )
        Tcw, Xw = ba.Tcw, ba.Xw
        done += n_it
        if interrupt_check is not None and interrupt_check():
            result.interrupted = True
            break
    m.kf = m.kf._replace(Tcw=Tcw)
    m.mp = m.mp._replace(Xw=Xw)
    result.cost = float(ba.cost)

    if result.interrupted:
        # interrupted GBA leaves the map at the pre-GBA state (the reference
        # aborts g2o and re-arms FINALBA — Map::isGBAinterrupted)
        m.kf = m.kf._replace(Tcw=jnp.where(m.kf.valid[:, None, None],
                                           m.kf.Tcw_pre_gba, m.kf.Tcw))
        m.mp = m.mp._replace(Xw=Xw_snapshot)
        return result

    # 3. Motion Check per client (reference RunGBA :1685-1687 runs
    # CorrectKF_V3 fwd+rev per client of the map)
    if enable_motion_check:
        clients = np.unique(np.asarray(m.kf.client_id)[valid])
        for cid in clients:
            if cid < 0:
                continue
            verdict, order = mc.check_after_gba(
                m.kf, T_SC_inv, config.motion_check, client_id=int(cid)
            )
            result.mc_longest_run = max(
                result.mc_longest_run, int(verdict.longest_run)
            )
            kf2, mp2, reverted = mc.apply_verdict(m.kf, m.mp, verdict, order)
            if reverted:
                m.kf = kf2._replace(Tcw=jnp.where(
                    kf2.valid[:, None, None], kf2.Tcw_pre_gba, kf2.Tcw
                ))
                m.mp = m.mp._replace(Xw=Xw_snapshot)
                result.reverted = True
                break
            else:
                n_del = int(np.asarray(m.kf.valid).sum()
                            - np.asarray(kf2.valid).sum())
                result.n_deleted_kfs += n_del
                m.kf, m.mp = kf2, mp2
        if result.n_deleted_kfs:
            m.sync_host_index()
    return result
