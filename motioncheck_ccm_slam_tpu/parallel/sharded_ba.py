"""Distributed global bundle adjustment over a device mesh.

The multi-chip replacement for g2o's ``MapFusionGBA`` + OpenMP
(reference src/Optimizer.cpp:646, optimizer.initMultiThreading :792): the
observation set is sharded across the mesh's ``obs`` axis; camera poses and
landmarks are replicated. Each LM iteration:

1. residuals + Jacobians on the local observation shard;
2. per-entity Hessian blocks via segment-sum, then ``psum`` over ICI —
   this is the distributed Hessian assembly of BASELINE.json;
3. the reduced camera system is solved matrix-free with preconditioned
   conjugate gradients: every ``S @ v`` product is two gather/segment-sum
   sweeps over the local shard plus a ``psum`` (no O(C*L) memory anywhere);
4. landmark back-substitution, damped accept/reject.

Runs under ``jax.shard_map`` on any 1-D mesh (size 1 == single chip), so the
same code path serves the bench chip and a pod slice.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import os

from ..ops import lie, schur_pallas
from ..solvers import ba_core
from ..solvers.local_ba import BAResult, _robust_cost

AXIS = "obs"

# Fused Pallas Schur matvec (ops/schur_pallas.py): replaces the two
# per-sweep 2M-row random gathers + cumsums with VMEM-resident one-hot
# MXU contractions over landmark-aligned tiles. Auto: on for TPU backends
# at server scale (the toy fixtures keep the plain XLA formulation — the
# kernel's tile padding only pays off when a sweep is gather-bound).
# Override with MCSLAM_PALLAS_SCHUR=0/1 (strictly 0/1; anything else is an
# error rather than a silent fallback).


def _env01(name: str, default: str | None = None) -> str | None:
    v = os.environ.get(name) or default
    if v is not None and v not in ("0", "1"):
        raise ValueError(f"{name} must be '0' or '1' (got {v!r})")
    return v


PALLAS_SCHUR: str | None = _env01("MCSLAM_PALLAS_SCHUR")
PALLAS_SCHUR_MIN_CAMS = 512
# diagnostic sub-toggles (default on when the Pallas path is active)
_PL_STREAMS = _env01("MCSLAM_PALLAS_STREAMS", "1") == "1"
_PL_BRDL = _env01("MCSLAM_PALLAS_BRDL", "1") == "1"
# Fused tile-stream GBA (make_tile_gba): auto = on for TPU backends (the
# kernels run in interpret mode elsewhere — correct but slow at scale).
# MCSLAM_TILE_GBA=0/1 forces; read per-call so harnesses (dryrun, tests)
# can toggle it without reimporting.


def _tile_auto() -> bool:
    v = _env01("MCSLAM_TILE_GBA")
    if v is not None:
        return v == "1"
    return jax.default_backend() == "tpu"


def _use_pallas_schur(C: int) -> bool:
    if PALLAS_SCHUR is not None:
        return PALLAS_SCHUR == "1"
    return jax.default_backend() == "tpu" and C >= PALLAS_SCHUR_MIN_CAMS

# Eisenstat-Walker forcing for the inner PCG solve: the reduced camera
# system only needs to be solved as accurately as the outer LM
# linearization warrants. rtol_k = clip(sqrt(|g_k| / |g_0|), EW_FLOOR,
# EW_MAX) — loose solves while the gradient is large (early LM
# iterations), tightening toward EW_FLOOR as the gradient drops. A/B on
# the v5e chip at the server operating point (2048 KFs / 65k MPs / 2M obs,
# 20 LM iterations, 25-sweep cap): forcing ON 2.27 LM it/s, final cost
# 1.13e6, mean pose err 0.0135 vs forcing OFF 1.74 it/s / 1.41e6 / 0.0256
# — 31% faster AND a better optimum for the same budget (the exact cost
# re-evaluation gates every step, so a too-loose step can only be
# rejected, never silently accepted; redistributing truncated-solve sweeps
# toward later, tighter solves helps the LM trajectory).
#
# On SMALL systems the tradeoff inverts: a tight solve costs microseconds,
# and at short iteration budgets loose early steps waste LM iterations
# (measured on the 8-camera fixture: final pose error ~2x worse). Forcing
# only engages at EW_MIN_CAMS+ cameras, where a sweep is expensive.
EW_MAX = 0.1
EW_FLOOR = 1e-5
EW_MIN_CAMS = 512


def _ew_rtol(gnorm, g0, n_cams: int):
    """Forcing tolerance from the current/initial reduced-gradient norms.

    ``g0 < 0`` marks the first LM iteration (no reference yet) -> EW_MAX.
    ``n_cams`` is static: below EW_MIN_CAMS this collapses to the fixed
    tight tolerance.
    """
    if n_cams < EW_MIN_CAMS:
        return EW_FLOOR
    ratio = jnp.where(g0 > 0, gnorm / jnp.maximum(g0, 1e-30), 1.0)
    return jnp.clip(jnp.sqrt(ratio), EW_FLOOR, EW_MAX)


def _pad_obs(obs: ba_core.BAObservations, n_dev: int) -> ba_core.BAObservations:
    O = obs.cam_idx.shape[0]
    pad = (-O) % n_dev
    if pad == 0:
        return obs
    return ba_core.BAObservations(
        cam_idx=jnp.pad(obs.cam_idx, (0, pad)),
        lm_idx=jnp.pad(obs.lm_idx, (0, pad)),
        uv=jnp.pad(obs.uv, ((0, pad), (0, 0))),
        inv_sigma2=jnp.pad(obs.inv_sigma2, (0, pad)),
        valid=jnp.pad(obs.valid, (0, pad)),
    )


def _schur_matvec(v, Hcc_d, Hll_inv, Wcl, cam_idx, lm_idx, C, L, reduce,
                  cam_plan=None, lm_plan=None):
    """S @ v for the reduced camera system, on the local obs shard + psum.

    v: (C, 6) replicated. Wcl: (O_local, 6, 3). ``reduce`` is a psum over
    the mesh's obs axis, or identity when running unsharded on one chip.
    With segment plans, the per-entity reductions are gathers instead of
    scatter-adds (TPU scatters on 2M random indices serialized this loop).
    """
    Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
    # u_l = sum_obs Wcl^T v[cam]  -> (L, 3)
    wtv = jnp.einsum("oij,oi->oj", Wcl, v[cam_idx])
    u = reduce(ba_core._seg_or_scatter(lm_plan, lm_idx, wtv, L))
    u = jnp.einsum("lij,lj->li", Hll_inv, u)
    # w_c = sum_obs Wcl u[lm]    -> (C, 6)
    wu = jnp.einsum("oij,oj->oi", Wcl, u[lm_idx])
    w = reduce(ba_core._seg_or_scatter(cam_plan, cam_idx, wu, C))
    return Hv - w


def _pcg(matvec, b, M_inv_blocks, iters: int, rtol=1e-5):
    """Block-Jacobi preconditioned CG on the (C,6) camera system.

    Runs at most ``iters`` sweeps with residual-based early exit: the loop
    stops once the preconditioned residual norm r.z drops below
    rtol^2 * (r0.z0) — converged LM steps skip the remaining sweeps instead
    of burning a fixed budget. ``rtol`` may be a traced scalar (the LM loop
    passes an Eisenstat-Walker forcing tolerance). All loop-carried scalars
    are replicated under shard_map (matvec psums before any reduction), so
    the exit condition is consistent across devices.
    """

    def precond(r):
        return jnp.einsum("cij,cj->ci", M_inv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    rz0 = jnp.sum(r0 * z0)
    thresh = (rtol * rtol) * rz0

    def cond(state):
        _x, _r, _z, _p, rz, i = state
        return (i < iters) & (rz > thresh)

    def body(state):
        x, r, z, p, rz, i = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1.0, rz)
        p = z + beta * p
        return x, r, z, p, rz_new, i + 1

    x, *_ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.int32(0))
    )
    return x


def _gba_iteration(state, obs_shard: ba_core.BAObservations, K, fixed_cam,
                   fixed_lm, C, L, pcg_iters, reduce,
                   cam_plan=None, lm_plan=None):
    Tcw, Xw, lam, g0 = state
    r, pc, depth_ok = ba_core.reproject_residuals(Tcw, Xw, obs_shard, K)
    w, chi2 = ba_core.robust_obs_weights(r, obs_shard, depth_ok)
    cost = reduce(_robust_cost(chi2, obs_shard.valid))
    Rm = Tcw[obs_shard.cam_idx][:, :3, :3]
    Jc, Jl = ba_core.reproject_jacobians(pc, Rm, K)
    Hcc, bc, Hll, bl, Wcl = ba_core.assemble_blocks(
        Jc, Jl, r, w, obs_shard.cam_idx, obs_shard.lm_idx, C, L,
        cam_plan=cam_plan, lm_plan=lm_plan,
    )
    Hcc = reduce(Hcc)
    bc = reduce(bc)
    Hll = reduce(Hll)
    bl = reduce(bl)

    Hcc_d = ba_core.damp_blocks(Hcc, lam)
    Hll_d = ba_core.damp_blocks(Hll, lam)
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    Hcc_d = jnp.where(fixed_cam[:, None, None], eye6[None], Hcc_d)
    bc = jnp.where(fixed_cam[:, None], 0.0, bc)
    Hll_d = jnp.where(
        fixed_lm[:, None, None], jnp.eye(3, dtype=Hll.dtype)[None], Hll_d
    )
    bl = jnp.where(fixed_lm[:, None], 0.0, bl)
    Wcl = jnp.where(
        fixed_cam[obs_shard.cam_idx][:, None, None]
        | fixed_lm[obs_shard.lm_idx][:, None, None],
        0.0, Wcl,
    )
    Hll_inv = ba_core.inv33(Hll_d)

    # reduced RHS: br = bc - W Hll^-1 bl
    u = jnp.einsum("lij,lj->li", Hll_inv, bl)
    wu = jnp.einsum("oij,oj->oi", Wcl, u[obs_shard.lm_idx])
    Wu = reduce(ba_core._seg_or_scatter(cam_plan, obs_shard.cam_idx, wu, C))
    br = bc - Wu

    matvec = functools.partial(
        _schur_matvec, Hcc_d=Hcc_d, Hll_inv=Hll_inv, Wcl=Wcl,
        cam_idx=obs_shard.cam_idx, lm_idx=obs_shard.lm_idx, C=C, L=L,
        reduce=reduce, cam_plan=cam_plan, lm_plan=lm_plan,
    )
    # block-Jacobi on the TRUE Schur diagonal (see _gba_iteration_cm)
    WG = jnp.einsum("oij,ojk->oik", Wcl, Hll_inv[obs_shard.lm_idx])
    S_obs = jnp.einsum("oik,ojk->oij", WG, Wcl)
    S_diag = Hcc_d - reduce(
        ba_core._seg_or_scatter(cam_plan, obs_shard.cam_idx, S_obs, C))
    M_inv = ba_core.inv66_spd(S_diag + 1e-6 * eye6[None])
    gnorm = jnp.linalg.norm(br)
    g0 = jnp.where(g0 > 0, g0, gnorm)
    dc = _pcg(matvec, br, M_inv, pcg_iters,
               rtol=_ew_rtol(gnorm, g0, C))
    dc = jnp.where(fixed_cam[:, None], 0.0, dc)
    # back-substitute landmarks: dl = Hll^-1 (bl - W^T dc)
    wtv = jnp.einsum("oij,oi->oj", Wcl, dc[obs_shard.cam_idx])
    Wt_dc = reduce(
        ba_core._seg_or_scatter(lm_plan, obs_shard.lm_idx, wtv, L)
    )
    dl = jnp.einsum("lij,lj->li", Hll_inv, bl - Wt_dc)
    dl = jnp.where(fixed_lm[:, None], 0.0, dl)

    T_new = ba_core.apply_pose_update(Tcw, dc, mask=~fixed_cam)
    X_new = Xw + dl
    r2, _, _ = ba_core.reproject_residuals(T_new, X_new, obs_shard, K)
    chi2_new = jnp.sum(r2 * r2, -1) * obs_shard.inv_sigma2
    cost_new = reduce(_robust_cost(chi2_new, obs_shard.valid))
    accept = cost_new < cost
    Tcw = jnp.where(accept, T_new, Tcw)
    Xw = jnp.where(accept, X_new, Xw)
    lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                    jnp.minimum(lam * 4.0, 1e4))
    return (Tcw, Xw, lam, g0), cost_new


def _gba_body(Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
              cam_idx, lm_idx, uv, inv_sigma2, valid,
              pcg_iters, reduce, cam_plan=None, lm_plan=None):
    """n_iters LM iterations + final inlier classification on the (local)
    observation set. ``n_iters`` is a traced scalar — chunked callers vary
    it without recompiling."""
    obs_shard = ba_core.BAObservations(
        cam_idx=cam_idx, lm_idx=lm_idx, uv=uv,
        inv_sigma2=inv_sigma2, valid=valid,
    )
    C = Tcw.shape[0]
    L = Xw.shape[0]

    def it(_, st):
        st, _cost = _gba_iteration(
            st, obs_shard, K, fixed_cam, fixed_lm, C, L, pcg_iters, reduce,
            cam_plan=cam_plan, lm_plan=lm_plan,
        )
        return st

    Tcw, Xw, lam, _g0 = jax.lax.fori_loop(
        0, n_iters, it, (Tcw, Xw, jnp.float32(1e-4), jnp.float32(-1.0))
    )
    # final classification on the local shard
    r, _, depth_ok = ba_core.reproject_residuals(Tcw, Xw, obs_shard, K)
    chi2 = jnp.sum(r * r, -1) * obs_shard.inv_sigma2
    inlier = obs_shard.valid & (chi2 <= ba_core.CHI2_MONO) & depth_ok
    cost = reduce(_robust_cost(chi2, inlier))
    return Tcw, Xw, inlier, cost


def make_sharded_gba(mesh: Mesh, iterations: int = 5, pcg_iters: int = 25):
    """Build a jitted distributed GBA step for a 1-D mesh.

    Returns ``gba(Tcw, Xw, obs, K, fixed_cam, fixed_lm, n_iterations)`` — a
    ``BAResult``-returning callable matching gba.run_gba's
    ``sharded_solver`` interface. ``iterations`` is only the default;
    per-call ``n_iterations`` is dynamic (no recompile across chunk sizes).
    """
    n_dev = mesh.devices.size

    def shard_body(Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
                   cam_idx, lm_idx, uv, inv_sigma2, valid):
        return _gba_body(
            Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
            cam_idx, lm_idx, uv, inv_sigma2, valid,
            pcg_iters, functools.partial(jax.lax.psum, axis_name=AXIS),
        )

    sharded = jax.jit(
        jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(),
                      P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(), P(), P(AXIS), P()),
        )
    )

    def gba(Tcw, Xw, obs: ba_core.BAObservations, K, fixed_cam, fixed_lm,
            n_iterations=None):
        n_it = jnp.int32(iterations if n_iterations is None else n_iterations)
        O = obs.cam_idx.shape[0]
        obs_p = _pad_obs(obs, n_dev)
        Tcw_o, Xw_o, inlier, cost = sharded(
            Tcw, Xw, K, fixed_cam, fixed_lm, n_it,
            obs_p.cam_idx, obs_p.lm_idx, obs_p.uv, obs_p.inv_sigma2,
            obs_p.valid,
        )
        return BAResult(
            Tcw=Tcw_o, Xw=Xw_o, obs_inlier=inlier[:O], cost=cost
        )

    return gba


# ---------------------------------------------------------------------------
# Tile-stream GBA (round 5): the whole LM iteration on the padded
# landmark-tile stream via the fused Pallas kernels (schur_pallas D1/D2/S).
#
# Layout: the plan lays observations out in landmark-aligned tiles
# (schur_pallas.build_schur_plan). EVERY landmark-side quantity (Hll, bl,
# Hll_inv, u, dl, Xw) is a function of one tile's observations only, so
# sharding the TILE AXIS over a 1-D device mesh makes the landmark side
# embarrassingly parallel; the camera side (C ~ 2k poses) is replicated and
# reduced with psums of (C,6)-sized arrays — ~50 KB per PCG sweep, vs the
# ~1.5 MB/sweep the round-4 gather-formulation mesh path moved. This is the
# TPU-native analog of the reference's multi-threaded MapFusionGBA
# (src/Optimizer.cpp:646, initMultiThreading :792) — and unlike round 4's
# mesh path it IS the tuned fast path: the same kernels serve 1 device and N.
# ---------------------------------------------------------------------------


class TilePlan(NamedTuple):
    sp: schur_pallas.SchurPlan
    to_orig: jax.Array    # (OP,) i32 slot -> original obs position (pad -> O)
    slot_of: jax.Array    # (O,) i32 original obs -> slot (invalid -> 0)
    lm_p: jax.Array       # (OP,) i32 global landmark id per slot


def build_tile_plan(obs: ba_core.BAObservations, C: int, L: int,
                    n_shards: int = 1):
    """Host-side tile plan for ANY observation stream (no camera-major
    requirement — the tile stream is landmark-sorted). Returns None when
    the padded tile width would bust the kernel VMEM budget."""
    lm_np = np.asarray(obs.lm_idx, np.int64)
    cam_np = np.asarray(obs.cam_idx, np.int64)
    valid_np = np.asarray(obs.valid, bool)
    O = lm_np.shape[0]
    order = np.argsort(lm_np, kind="stable")
    sp = schur_pallas.build_schur_plan(
        lm_np[order], cam_np[order], C, L, valid_sorted=valid_np[order],
        lpad_multiple=n_shards)
    if sp is None:
        return None
    perm = np.asarray(sp.perm).astype(np.int64)
    to_orig = np.append(order, O)[perm]
    real = to_orig < O
    slot_of = np.zeros(O, np.int64)
    slot_of[to_orig[real]] = np.flatnonzero(real)
    OP = sp.ntl * sp.TP
    tiles = np.arange(OP, dtype=np.int64) // sp.TP
    lm_p = tiles * schur_pallas.LM_BLOCK + np.asarray(sp.lmloc)[0]
    return TilePlan(
        sp=sp,
        to_orig=jnp.asarray(to_orig.astype(np.int32)),
        slot_of=jnp.asarray(slot_of.astype(np.int32)),
        lm_p=jnp.asarray(lm_p.astype(np.int32)),
    )


def _tile_linearize(Tcw, Xw_loc, C, K4, ng, L_loc, TP, camid, lmloc, uv_s,
                    is2_s, valid_s, free_s, reduce):
    """One fused D1 pass at (Tcw, Xw): returns the full linearization
    (W stream, aux rows, landmark Hll+bl, reduced camera Hcc+bc) plus the
    exact robust cost of the state. The LM loop carries this tuple so the
    candidate evaluation IS the next iteration's assembly (speculative
    linearization — the separate D0 cost pass is gone)."""
    t0, t1, t2 = schur_pallas.pose_tables(Tcw, ng)
    X8 = schur_pallas.point_table(Xw_loc.T, L_loc)
    W18, aux, hllbl, acc1 = schur_pallas.d1_assemble(
        camid, lmloc, uv_s, is2_s, valid_s, free_s, K4, t0, t1, t2, X8,
        TP=TP)
    cost = reduce(jnp.sum(aux[0]))
    cam27 = schur_pallas.unpack_cam(reduce(acc1), C,
                                    schur_pallas.D1_CAM_ROWS)
    return W18, aux[0:3], hllbl, cam27, cost


def _tile_iteration(state, K4, fixed_cam, fixed_lm_loc, C, ng, TP, L_loc,
                    pcg_iters, camid, lmloc, uv_s, is2_s, valid_s, free_s,
                    reduce):
    """One LM iteration on the (local) tile stream. ``reduce`` psums
    camera-side partials over the mesh (identity on one device).

    The state carries the linearization OF the carried (Tcw, Xw): the
    candidate state's D1 pass both prices the step (accept/reject on its
    exact robust cost) and, when accepted, becomes the next iteration's
    assembly — one fused pass per LM iteration instead of assemble+cost
    (the D0 pass was ~18% of the round-5 iteration)."""
    Tcw, Xw_loc, lam, g0, W18, aux3, hllbl, cam27, cost = state
    Hcc = schur_pallas.sym6_from_tri(cam27[:, :21])
    bc = cam27[:, 21:]
    Hll = hllbl[0:9].T.reshape(L_loc, 3, 3)
    bl = hllbl[9:12].T                                         # (L_loc, 3)

    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    Hcc_d = ba_core.damp_blocks(Hcc, lam)
    Hcc_d = jnp.where(fixed_cam[:, None, None], eye6[None], Hcc_d)
    bc = jnp.where(fixed_cam[:, None], 0.0, bc)
    Hll_d = ba_core.damp_blocks(Hll, lam)
    Hll_d = jnp.where(
        fixed_lm_loc[:, None, None], jnp.eye(3, dtype=Hll.dtype)[None],
        Hll_d)
    bl = jnp.where(fixed_lm_loc[:, None], 0.0, bl)
    Hll_inv = ba_core.inv33(Hll_d)
    H9 = Hll_inv.reshape(L_loc, 9).T                           # (9, L_loc)

    # reduced RHS br = bc - W Hll^-1 bl (kernel B on the local shard)
    u0 = jnp.einsum("lij,lj->li", Hll_inv, bl)                 # (L_loc, 3)
    u0_8 = schur_pallas.point_table(u0.T, L_loc)
    br = bc - reduce(schur_pallas.apply_b_raw(
        camid, lmloc, W18, u0_8, C, TP=TP))

    # block-Jacobi preconditioner on the TRUE Schur diagonal (kernel D2)
    acc2 = schur_pallas.d2_precond(camid, lmloc, W18, H9, TP=TP, ng=ng)
    S21 = schur_pallas.unpack_cam(reduce(acc2), C,
                                  schur_pallas.D2_CAM_ROWS)
    S_diag = Hcc_d - schur_pallas.sym6_from_tri(S21)
    M_inv = ba_core.inv66_spd(S_diag + 1e-6 * eye6[None])

    # PCG sweep kernel choice: after the j-major/slab-batched kernel
    # rewrite the fused S kernel wins on the v5e (4.15 vs 2.46+3.03 ms at
    # the 2048-KF operating point — one W read per sweep, u never leaves
    # VMEM); before it, the split pair's smaller VMEM working set won
    # (5.9 vs 7.1 ms). MCSLAM_TILE_SWEEP=ab forces the split pair.
    if os.environ.get("MCSLAM_TILE_SWEEP", "s") == "s":
        def matvec(v):
            Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
            return Hv - reduce(schur_pallas.s_apply(
                camid, lmloc, W18, v, H9, TP=TP))
    else:
        def matvec(v):
            Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
            u8 = schur_pallas.apply_a_raw(camid, lmloc, W18, v, H9, TP=TP)
            return Hv - reduce(schur_pallas.apply_b_raw(
                camid, lmloc, W18, u8, C, TP=TP))

    gnorm = jnp.linalg.norm(br)
    g0 = jnp.where(g0 > 0, g0, gnorm)
    dc = _pcg(matvec, br, M_inv, pcg_iters, rtol=_ew_rtol(gnorm, g0, C))
    dc = jnp.where(fixed_cam[:, None], 0.0, dc)

    # landmark back-substitution: dl = u0 - Hll^-1 segsum(W^T dc) — the
    # landmark reduction is tile-local, so kernel A needs NO psum
    a3 = schur_pallas.apply_a_raw(camid, lmloc, W18, dc, H9, TP=TP)[0:3]
    dl = u0 - a3.T
    dl = jnp.where(fixed_lm_loc[:, None], 0.0, dl)

    # speculative candidate linearization: one fused D1 pass both prices
    # the step (exact robust cost) and produces the linearization the next
    # iteration assembles from when the step is accepted
    T_new = ba_core.apply_pose_update(Tcw, dc, mask=~fixed_cam)
    X_new = Xw_loc + dl
    Wn, auxn, hllbln, cam27n, cost_new = _tile_linearize(
        T_new, X_new, C, K4, ng, L_loc, TP, camid, lmloc, uv_s, is2_s,
        valid_s, free_s, reduce)
    accept = cost_new < cost
    Tcw = jnp.where(accept, T_new, Tcw)
    Xw_loc = jnp.where(accept, X_new, Xw_loc)
    W18 = jnp.where(accept, Wn, W18)
    aux3 = jnp.where(accept, auxn, aux3)
    hllbl = jnp.where(accept, hllbln, hllbl)
    cam27 = jnp.where(accept, cam27n, cam27)
    cost = jnp.where(accept, cost_new, cost)
    lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                    jnp.minimum(lam * 4.0, 1e4))
    return (Tcw, Xw_loc, lam, g0, W18, aux3, hllbl, cam27, cost), cost_new


def _tile_body(Tcw, Xw_pad, K4, fixed_cam, fixed_lm_pad, n_iters,
               camid, lmloc, uv_s, is2_s, valid_s, free_s,
               C, ng, TP, pcg_iters, reduce):
    """n_iters LM iterations + final classification on the (local) tile
    stream. Under shard_map every input arriving here is already the
    device-local block."""
    L_loc = Xw_pad.shape[0]

    lin0 = _tile_linearize(
        Tcw, Xw_pad, C, K4, ng, L_loc, TP, camid, lmloc, uv_s, is2_s,
        valid_s, free_s, reduce)

    def it(_, st):
        st, _cost = _tile_iteration(
            st, K4, fixed_cam, fixed_lm_pad, C, ng, TP, L_loc, pcg_iters,
            camid, lmloc, uv_s, is2_s, valid_s, free_s, reduce)
        return st

    Tcw_o, Xw_o, lam, _g0, _W, aux3, _h, _c27, _cost = jax.lax.fori_loop(
        0, n_iters, it,
        (Tcw, Xw_pad, jnp.float32(1e-4), jnp.float32(-1.0)) + lin0
    )
    # final inlier classification: the carried linearization is OF the
    # carried state (accepted or initial), so its aux rows ARE the
    # classification — no extra assembly pass
    inlier = aux3[1] > 0.5                                     # (OP_loc,)
    cost = reduce(jnp.sum(aux3[1] * aux3[2]))
    return Tcw_o, Xw_o, inlier, cost


IN_SPECS_TILE = (P(), P(AXIS), P(), P(), P(AXIS), P(),
                 P(None, AXIS), P(None, AXIS), P(None, AXIS),
                 P(None, AXIS), P(None, AXIS), P(None, AXIS))


def make_tile_gba(mesh: Mesh | None = None, iterations: int = 5,
                  pcg_iters: int = 25, fallback=None, globalize=None):
    """Fused tile-stream GBA over ``mesh`` (None/1-device = single chip).

    Same ``BAResult``-returning interface as make_sharded_gba /
    make_matrix_free_gba. Accepts ANY observation stream. When no tile
    plan fits the kernel VMEM budget, delegates to ``fallback`` (or
    raises if none given).

    ``globalize``: optional ``(host_array, PartitionSpec) -> jax.Array``
    hook for MULTI-CONTROLLER meshes (jax.distributed): converts the
    wrapper's process-local inputs into global arrays before the
    shard_map call (every process computes identical host values, so the
    hook can build the global array from local data; see
    tools/multiproc_mesh.py). None = single-controller.
    """
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    bodies: dict = {}
    plan_cache: list = [None]

    def _get_body(statics):
        if statics not in bodies:
            C, ng, TP, L_pad = statics

            def body(Tcw, Xw_pad, K4, fixed_cam, fixed_lm_pad, n_iters,
                     camid, lmloc, uv_s, is2_s, valid_s, free_s):
                if mesh is not None and n_dev > 1:
                    reduce = functools.partial(jax.lax.psum, axis_name=AXIS)
                else:
                    reduce = lambda x: x
                return _tile_body(
                    Tcw, Xw_pad, K4, fixed_cam, fixed_lm_pad, n_iters,
                    camid, lmloc, uv_s, is2_s, valid_s, free_s,
                    C, ng, TP, pcg_iters, reduce)

            if mesh is not None and n_dev > 1:
                # check_vma=False: pallas_call out_shapes carry no varying
                # -mesh-axes annotation; correctness is covered by the
                # mesh-vs-single-device parity test
                body = jax.shard_map(
                    body, mesh=mesh,
                    in_specs=IN_SPECS_TILE,
                    out_specs=(P(), P(AXIS), P(AXIS), P()),
                    check_vma=False,
                )
            bodies[statics] = jax.jit(body)
        return bodies[statics]

    def gba(Tcw, Xw, obs: ba_core.BAObservations, K, fixed_cam, fixed_lm,
            n_iterations=None):
        if fallback is not None and not _tile_auto():
            return fallback(Tcw, Xw, obs, K, fixed_cam, fixed_lm,
                            n_iterations)
        C, L = int(Tcw.shape[0]), int(Xw.shape[0])
        ent = plan_cache[0]
        if (ent is None or ent[0] is not obs.lm_idx
                or ent[1] is not obs.cam_idx or ent[2] != (C, L)
                or ent[3] is not obs.valid):
            tp = build_tile_plan(obs, C, L, n_shards=n_dev)
            ent = (obs.lm_idx, obs.cam_idx, (C, L), obs.valid, tp)
            plan_cache[0] = ent
        tp = ent[4]
        if tp is None:
            if fallback is None:
                raise ValueError(
                    "tile plan exceeds kernel VMEM budget and no fallback "
                    "solver was given")
            return fallback(Tcw, Xw, obs, K, fixed_cam, fixed_lm,
                            n_iterations)
        sp = tp.sp
        n_it = jnp.int32(iterations if n_iterations is None else n_iterations)
        K4 = jnp.reshape(
            jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]), (1, 4))
        # once-per-call tile streams (pad slots read the appended zero/False
        # column; ~45 MB of gathers amortized over the chunk's iterations)
        uv_z = jnp.concatenate([obs.uv, jnp.zeros((1, 2), obs.uv.dtype)], 0)
        uv_s = uv_z[tp.to_orig].T                              # (2, OP)
        is2_s = jnp.concatenate(
            [obs.inv_sigma2, jnp.zeros((1,), obs.inv_sigma2.dtype)]
        )[tp.to_orig][None, :]
        valid_s = jnp.concatenate(
            [obs.valid, jnp.zeros((1,), bool)]
        )[tp.to_orig].astype(jnp.float32)[None, :]
        cam_p = sp.camid[0]
        free_s = (~(fixed_cam[cam_p]
                    | jnp.pad(fixed_lm, (0, sp.L_pad - L),
                              constant_values=True)[tp.lm_p])
                  ).astype(jnp.float32)[None, :]
        Xw_pad = jnp.pad(Xw, ((0, sp.L_pad - L), (0, 0)))
        fixed_lm_pad = jnp.pad(fixed_lm, (0, sp.L_pad - L),
                               constant_values=True)
        body = _get_body((C, sp.n_groups, sp.TP, sp.L_pad))
        call_args = (Tcw, Xw_pad, K4, fixed_cam, fixed_lm_pad, n_it,
                     sp.camid, sp.lmloc, uv_s, is2_s, valid_s, free_s)
        if globalize is not None:
            call_args = tuple(
                globalize(a, s) for a, s in zip(call_args, IN_SPECS_TILE))
        Tcw_o, Xw_o, inlier_slots, cost = body(*call_args)
        if globalize is None:
            inlier = inlier_slots[tp.slot_of] & obs.valid
            return BAResult(Tcw=Tcw_o, Xw=Xw_o[:L], obs_inlier=inlier,
                            cost=cost)
        # multi-controller: the sharded outputs span processes — gather
        # them to replicated inside jit (eager slicing of a
        # non-addressable array is not allowed)
        from jax.sharding import NamedSharding
        rep = NamedSharding(mesh, P())
        slot_c = jnp.asarray(tp.slot_of)
        fetch = jax.jit(
            lambda xw, sl, vv: (xw[:L], sl[slot_c] & vv),
            out_shardings=(rep, rep))
        Xw_ret, inlier = fetch(Xw_o, inlier_slots,
                               globalize(obs.valid, P()))
        return BAResult(Tcw=Tcw_o, Xw=Xw_ret, obs_inlier=inlier,
                        cost=cost)

    return gba


def _rep_cam(x, seg: int):
    """(..., C) -> (..., C*seg): per-observation camera quantity for a
    camera-major contiguous observation stream — a broadcast+reshape, never
    a gather (the camera-side gathers were ~4 ms each per PCG sweep)."""
    b = jnp.broadcast_to(x[..., None], x.shape + (seg,))
    return b.reshape(x.shape[:-1] + (x.shape[-1] * seg,))


def _cam_sum_t(x, C: int, seg: int):
    """(..., C*seg) -> (..., C) reshape-sum."""
    return x.reshape(x.shape[:-1] + (C, seg)).sum(-1)


def _lm_sum_t(x_sorted, bounds):
    """(..., O) sorted by landmark -> (..., L) via cumsum + boundary diff
    along the minor (lane) axis."""
    cs = jnp.cumsum(x_sorted, -1)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], -1)
    return cs[..., bounds[1:]] - cs[..., bounds[:-1]]


def _obs_pipeline(R_t, t_t, X_t, uv_t, inv_sigma2, valid, K):
    """Residual + Jacobian pipeline for one observation stream in
    component-major layout (every array (components..., O) — the obs axis
    rides the 128-lane vector dim). Pure per-element arithmetic: producing
    the same observations in a different order yields bitwise-identical
    values, which the dual-layout iteration below relies on."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    pc = jnp.einsum("ijo,jo->io", R_t, X_t) + t_t              # (3,O)
    z = pc[2]
    depth_ok = z > 1e-6
    zs = jnp.where(depth_ok, z, 1.0)
    iz = 1.0 / zs
    r_t = uv_t - jnp.stack([fx * pc[0] * iz + cx,
                            fy * pc[1] * iz + cy])             # (2,O)
    chi2 = jnp.sum(r_t * r_t, 0) * inv_sigma2
    w = inv_sigma2 * ba_core.huber_weights(chi2)
    w = jnp.where(valid & depth_ok, w, 0.0)                    # (O,)
    # dproj/dpc (2,3,O); dpc/dxi = [-hat(pc) | I] (3,6,O); dpc/dX = R
    iz2 = iz * iz
    zo = jnp.zeros_like(z)
    dproj = jnp.stack([
        jnp.stack([fx * iz, zo, -fx * pc[0] * iz2]),
        jnp.stack([zo, fy * iz, -fy * pc[1] * iz2]),
    ])                                                         # (2,3,O)
    one = jnp.ones_like(z)
    hat = jnp.stack([
        jnp.stack([zo, -pc[2], pc[1]]),
        jnp.stack([pc[2], zo, -pc[0]]),
        jnp.stack([-pc[1], pc[0], zo]),
    ])                                                         # (3,3,O)
    eye_t = jnp.stack([
        jnp.stack([one, zo, zo]),
        jnp.stack([zo, one, zo]),
        jnp.stack([zo, zo, one]),
    ])
    dpc_dxi = jnp.concatenate([-hat, eye_t], 1)                # (3,6,O)
    Jc = -jnp.einsum("ijo,jko->iko", dproj, dpc_dxi)           # (2,6,O)
    Jl = -jnp.einsum("ijo,jko->iko", dproj, R_t)               # (2,3,O)
    return r_t, chi2, w, Jc, Jl


def _gba_iteration_cm(state, K, fixed_cam, fixed_lm, C, L, seg, pcg_iters,
                      uv_t, inv_sigma2, valid, lm_idx, lm_bounds,
                      cam_idx_l, lm_sorted, uv_s, is2_s, valid_s,
                      sp_statics=None, sp_perm=None, sp_camid=None,
                      sp_lmloc=None):
    """One LM iteration in DUAL-LAYOUT component-major form.

    The measured cost profile of the previous single-layout formulation
    (tools/bench_hbm.py, v5e): the per-sweep (3,O) permutation into
    landmark-sorted order was +8.9 ms and the random (3,L)->(3,O) expand
    +5.1 ms — together 3/4 of a 19.1 ms Schur matvec, with the actual
    einsums at ~1 ms. Fix: materialize the observation stream in BOTH
    orders and never permute per-observation data inside the PCG loop:

    - camera-major (obs o = c*seg + i): camera quantities form by
      broadcast+reshape, camera reductions by reshape-sum / fused MXU
      contraction; produces Hcc, bc and the cam-side W copy ``Wcl_t``.
    - landmark-sorted (static host permutation ``lm_order``): landmark
      reductions are cumsum + boundary-diff with NO in-graph permute;
      camera quantities gather from the tiny (6,C)/(3,3,C) tables;
      produces Hll, bl and the lm-side W copy ``Wl_t``.

    The residual/Jacobian pipeline runs once per layout — pure streaming
    arithmetic that costs a few ms and replaces ~30 ms of permutes per LM
    iteration (14 permuted (·,O) rows in assembly + 25 sweeps x 1 row).
    Per-element results are bitwise identical across layouts, so the PCG
    operator stays exactly symmetric. Each Schur matvec is then:
    small-table gather -> einsum -> cumsum-reduce -> 3x3 solve ->
    (3,L)->(3,O) gather -> einsum -> reshape-sum.
    """
    Tcw, Xw, lam, g0 = state

    # ---- camera-major pass -------------------------------------------
    R_t = _rep_cam(jnp.moveaxis(Tcw[:, :3, :3], 0, -1), seg)   # (3,3,O)
    t_t = _rep_cam(Tcw[:, :3, 3].T, seg)                       # (3,O)
    X_t = Xw.T[:, lm_idx]                                      # (3,O) gather
    r_t, chi2, w, Jc, Jl = _obs_pipeline(
        R_t, t_t, X_t, uv_t, inv_sigma2, valid, K)
    cost = _robust_cost(chi2, valid)
    wJc = Jc * w
    # camera blocks as obs-major streams + reshape-sum. The "fold the
    # reduction into the einsum" form ("kics,kjcs->cij") lowered to 2048
    # batched (6 x seg)@(seg x 6) matmuls — M=N=6 uses 0.2% of the MXU
    # and measured ~58 ms/LM-iter on the v5e; the (6,6,O) product +
    # reshape-sum streams ~0.6 GB at memory speed (~3 ms) instead.
    P66 = jnp.einsum("kio,kjo->ijo", wJc, Jc)                  # (6,6,O)
    Hcc = jnp.moveaxis(P66.reshape(6, 6, C, seg).sum(-1), -1, 0)  # (C,6,6)
    bc = -jnp.einsum("kio,ko->io", wJc, r_t).reshape(
        6, C, seg).sum(-1).T                                   # (C,6)
    Wcl_t = jnp.einsum("kio,kjo->ijo", wJc, Jl)                # (6,3,O)

    # ---- landmark-sorted pass ----------------------------------------
    if sp_statics is not None and _PL_STREAMS:
        # one Pallas pass materializes all 15 per-observation stream rows
        # (9 R + 3 t + 3 X) via packed one-hot MXU expansions — the
        # per-row HBM gathers cost ~2.8 ms EACH at this scale
        ntl_, TP_, ngrp_, L_pad_ = sp_statics
        plan_c = schur_pallas.SchurPlan(
            ntl=ntl_, TP=TP_, n_groups=ngrp_, L_pad=L_pad_,
            perm=sp_perm, camid=sp_camid, lmloc=sp_lmloc)
        R_l, t_l, X_l = schur_pallas.expand_sorted_streams(plan_c, Tcw, Xw)
    else:
        Rc_t = jnp.moveaxis(Tcw[:, :3, :3], 0, -1)             # (3,3,C)
        R_l = Rc_t[:, :, cam_idx_l]                            # small-src gather
        t_l = Tcw[:, :3, 3].T[:, cam_idx_l]
        X_l = Xw.T[:, lm_sorted]                               # sorted gather
    r_l, _chi2_l, w_l, Jc_l, Jl_l = _obs_pipeline(
        R_l, t_l, X_l, uv_s, is2_s, valid_s, K)
    wJl_l = Jl_l * w_l
    Hll = jnp.moveaxis(
        _lm_sum_t(jnp.einsum("kio,kjo->ijo", wJl_l, Jl_l), lm_bounds),
        -1, 0)                                                 # (L,3,3)
    bl = -_lm_sum_t(jnp.einsum("kio,ko->io", wJl_l, r_l), lm_bounds).T
    Wl_t = jnp.einsum("kio,kjo->ijo", Jc_l * w_l, Jl_l)        # (6,3,O)

    # ---- damping / gauge fixing ---------------------------------------
    Hcc_d = ba_core.damp_blocks(Hcc, lam)
    Hll_d = ba_core.damp_blocks(Hll, lam)
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    Hcc_d = jnp.where(fixed_cam[:, None, None], eye6[None], Hcc_d)
    bc = jnp.where(fixed_cam[:, None], 0.0, bc)
    Hll_d = jnp.where(
        fixed_lm[:, None, None], jnp.eye(3, dtype=Hll.dtype)[None], Hll_d
    )
    bl = jnp.where(fixed_lm[:, None], 0.0, bl)
    free_obs = ~(_rep_cam(fixed_cam[None], seg)[0] | fixed_lm[lm_idx])
    Wcl_t = jnp.where(free_obs, Wcl_t, 0.0)
    free_obs_l = ~(fixed_cam[cam_idx_l] | fixed_lm[lm_sorted])
    Wl_t = jnp.where(free_obs_l, Wl_t, 0.0)
    Hll_inv = ba_core.inv33(Hll_d)
    Hll_inv_t = jnp.moveaxis(Hll_inv, 0, -1)                   # (3,3,L)

    # ---- reduced camera system ----------------------------------------
    def lm_solve_t(x_t):                                       # (3,L)->(3,L)
        return jnp.einsum("ijl,jl->il", Hll_inv_t, x_t)

    if sp_statics is not None:
        # fused Pallas sweep. The whole landmark-sorted side of this
        # iteration already runs on the plan's PADDED TILE stream (the
        # caller swapped the sorted-stream inputs), so Wl_t is born in
        # kernel layout — a reshape, not a 96 ms (18,O)-row repack.
        ntl, TP, ngrp, L_pad = sp_statics
        plan = schur_pallas.SchurPlan(
            ntl=ntl, TP=TP, n_groups=ngrp, L_pad=L_pad,
            perm=sp_perm, camid=sp_camid, lmloc=sp_lmloc)
        # kernels consume W in J-MAJOR row order (row j*6+i = W[i,j] —
        # schur_pallas.pack_w): transpose the (6,3,O) block axes first
        Wp = Wl_t.transpose(1, 0, 2).reshape(18, -1)
        H9 = jnp.pad(Hll_inv_t.reshape(9, L), ((0, 0), (0, L_pad - L)))

        def matvec(v):                                         # (C,6)
            Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
            return Hv - schur_pallas.schur_apply(plan, Wp, v, H9)
    else:
        def matvec(v):                                         # (C,6)
            Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
            vgl = v.T[:, cam_idx_l]                            # (6,O) tiny-src
            wtv = jnp.einsum("ijo,io->jo", Wl_t, vgl)          # (3,O)
            u = lm_solve_t(_lm_sum_t(wtv, lm_bounds))          # (3,L)
            ug = u[:, lm_idx]                                  # (3,O) gather
            wu = jnp.einsum("ijo,jo->io", Wcl_t, ug)           # (6,O)
            return Hv - _cam_sum_t(wu, C, seg).T

    u0 = lm_solve_t(bl.T)
    if sp_statics is not None and _PL_BRDL:
        u0_8 = jnp.zeros((8, L_pad), u0.dtype)
        u0_8 = jax.lax.dynamic_update_slice(u0_8, u0, (0, 0))
        br = bc - schur_pallas.apply_b(plan, Wp, u0_8, C)
    else:
        br = bc - _cam_sum_t(
            jnp.einsum("ijo,jo->io", Wcl_t, u0[:, lm_idx]), C, seg
        ).T
    # block-Jacobi preconditioner on the TRUE Schur diagonal
    # M_c = Hcc_c - sum_{o in c} w_o Hll^-1[l(o)] w_o^T  — one extra
    # assembly-shaped pass per LM iteration, but it tracks S (not just Hcc)
    # and with residual early exit buys back whole PCG sweeps.
    # (obs-major product + reshape-sum, NOT a fused per-camera einsum —
    # see the Hcc comment above: same batched-tiny-matmul pathology.)
    G = Hll_inv_t[:, :, lm_idx]                                # (3,3,O)
    WG = jnp.einsum("ijo,jko->iko", Wcl_t, G)                  # (6,3,O)
    S66 = jnp.einsum("iko,jko->ijo", WG, Wcl_t)                # (6,6,O)
    S_diag = Hcc_d - jnp.moveaxis(
        S66.reshape(6, 6, C, seg).sum(-1), -1, 0)
    M_inv = ba_core.inv66_spd(S_diag + 1e-6 * eye6[None])
    gnorm = jnp.linalg.norm(br)
    g0 = jnp.where(g0 > 0, g0, gnorm)
    dc = _pcg(matvec, br, M_inv, pcg_iters,
               rtol=_ew_rtol(gnorm, g0, C))
    dc = jnp.where(fixed_cam[:, None], 0.0, dc)

    # ---- landmark back-substitution -----------------------------------
    # dl = Hll^-1 (bl - W^T dc) = u0 - Hll^-1 segsum(W^T dc): the second
    # term is exactly kernel A applied to dc
    if sp_statics is not None and _PL_BRDL:
        a_dc = schur_pallas.apply_a(plan, Wp, dc, H9)[0:3, :L]
        dl = (u0 - a_dc).T
    else:
        wtv = jnp.einsum("ijo,io->jo", Wl_t, dc.T[:, cam_idx_l])
        dl = lm_solve_t(bl.T - _lm_sum_t(wtv, lm_bounds)).T
    dl = jnp.where(fixed_lm[:, None], 0.0, dl)

    # ---- accept / reject ----------------------------------------------
    T_new = ba_core.apply_pose_update(Tcw, dc, mask=~fixed_cam)
    X_new = Xw + dl
    R2_t = _rep_cam(jnp.moveaxis(T_new[:, :3, :3], 0, -1), seg)
    t2_t = _rep_cam(T_new[:, :3, 3].T, seg)
    pc2 = jnp.einsum("ijo,jo->io", R2_t, X_new.T[:, lm_idx]) + t2_t
    z2 = jnp.where(pc2[2] > 1e-6, pc2[2], 1.0)
    r2 = uv_t - jnp.stack([K[0, 0] * pc2[0] / z2 + K[0, 2],
                           K[1, 1] * pc2[1] / z2 + K[1, 2]])
    cost_new = _robust_cost(jnp.sum(r2 * r2, 0) * inv_sigma2, valid)
    accept = cost_new < cost
    Tcw = jnp.where(accept, T_new, Tcw)
    Xw = jnp.where(accept, X_new, Xw)
    lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                    jnp.minimum(lam * 4.0, 1e4))
    return (Tcw, Xw, lam, g0), cost_new


def make_matrix_free_gba(iterations: int = 5, pcg_iters: int = 25):
    """Single-chip matrix-free GBA in component-major layout
    (:func:`_gba_iteration_cm`). This is what ``run_gba`` picks on one
    device when the dense-W Schur solve would not fit (server operating
    point: 2048 KFs x 65k MPs would need a ~9.7 GB dense W — reference
    scale, per src/Optimizer.cpp:646 MapFusionGBA).

    Requires camera-major contiguous observations (O = C * F) — exactly
    what map_state.gather_observations produces. The landmark sort order is
    built on host once per problem and cached by array identity (strong
    refs, so a recycled id() can never alias a stale plan)."""

    bodies = {}
    plan_cache: list = [None]

    def _get_body(seg: int, sp_statics):
        key = (seg, sp_statics)
        if key not in bodies:
            def body_fn(Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
                        uv_t, inv_sigma2, valid, lm_idx, lm_order, lm_bounds,
                        cam_idx_l, lm_sorted, sp_perm, sp_camid, sp_lmloc):
                C = Tcw.shape[0]
                L = Xw.shape[0]
                # loop-invariant landmark-sorted streams: permute once per
                # call, outside the LM loop (the iteration itself never
                # permutes per-observation data). ``lm_order`` is either
                # the plain sort order (O,) or the Pallas plan's padded
                # tile order (OP,) with pad slots pointing one past the
                # end — the appended zero/False column makes pads inert.
                uv_z = jnp.concatenate(
                    [uv_t, jnp.zeros((2, 1), uv_t.dtype)], axis=1)
                is2_z = jnp.concatenate(
                    [inv_sigma2, jnp.zeros((1,), inv_sigma2.dtype)])
                val_z = jnp.concatenate([valid, jnp.zeros((1,), bool)])
                uv_s = uv_z[:, lm_order]
                is2_s = is2_z[lm_order]
                valid_s = val_z[lm_order]

                def it(_, st):
                    st, _cost = _gba_iteration_cm(
                        st, K, fixed_cam, fixed_lm, C, L, seg, pcg_iters,
                        uv_t, inv_sigma2, valid, lm_idx, lm_bounds,
                        cam_idx_l, lm_sorted, uv_s, is2_s, valid_s,
                        sp_statics=sp_statics, sp_perm=sp_perm,
                        sp_camid=sp_camid, sp_lmloc=sp_lmloc,
                    )
                    return st

                Tcw_o, Xw_o, lam, _g0 = jax.lax.fori_loop(
                    0, n_iters, it,
                    (Tcw, Xw, jnp.float32(1e-4), jnp.float32(-1.0))
                )
                # final inlier classification
                R_t = _rep_cam(jnp.moveaxis(Tcw_o[:, :3, :3], 0, -1), seg)
                t_t = _rep_cam(Tcw_o[:, :3, 3].T, seg)
                pc = jnp.einsum("ijo,jo->io", R_t, Xw_o.T[:, lm_idx]) + t_t
                depth_ok = pc[2] > 1e-6
                zs = jnp.where(depth_ok, pc[2], 1.0)
                r = uv_t - jnp.stack([
                    K[0, 0] * pc[0] / zs + K[0, 2],
                    K[1, 1] * pc[1] / zs + K[1, 2],
                ])
                chi2 = jnp.sum(r * r, 0) * inv_sigma2
                inlier = valid & (chi2 <= ba_core.CHI2_MONO) & depth_ok
                cost = _robust_cost(chi2, inlier)
                return Tcw_o, Xw_o, inlier, cost
            bodies[key] = jax.jit(body_fn)
        return bodies[key]

    def gba(Tcw, Xw, obs: ba_core.BAObservations, K, fixed_cam, fixed_lm,
            n_iterations=None):
        n_it = jnp.int32(iterations if n_iterations is None else n_iterations)
        C, L = Tcw.shape[0], Xw.shape[0]
        O = obs.cam_idx.shape[0]
        assert O % C == 0, "matrix-free GBA needs camera-major contiguous obs"
        seg = O // C
        ent = plan_cache[0]
        # the valid mask participates in the key: the Pallas plan omits
        # invalid observations from the padded tile stream, so reusing
        # index arrays with a CHANGED mask must rebuild the plan (a stale
        # plan would silently drop newly-valid observations)
        if (ent is None or ent[0] is not obs.lm_idx
                or ent[1] is not obs.cam_idx or ent[2] != (C, L)
                or ent[3] is not obs.valid):
            lm_np = np.asarray(obs.lm_idx)
            ss = ba_core.build_sorted_segments(lm_np, L)
            order_np = np.asarray(ss.order)
            cam_np_l = (np.arange(O, dtype=np.int32) // seg)[order_np]
            lm_sorted_np = lm_np[order_np]
            valid_np = np.asarray(obs.valid)[order_np]
            sp = (schur_pallas.build_schur_plan(
                lm_sorted_np, cam_np_l, C, L, valid_sorted=valid_np)
                if _use_pallas_schur(C) else None)
            if sp is not None:
                # the sorted side runs directly on the plan's padded tile
                # stream: indices/bounds are rebuilt once here; pad slots
                # point one past the original stream (-> zero column) and
                # carry zero weight.
                OP = sp.ntl * sp.TP
                perm_np = np.asarray(sp.perm).astype(np.int64)
                to_orig = np.append(order_np.astype(np.int64), O)[perm_np]
                lmloc_np = np.asarray(sp.lmloc)[0].astype(np.int64)
                tiles = np.arange(OP, dtype=np.int64) // sp.TP
                lm_p = np.minimum(tiles * schur_pallas.LM_BLOCK + lmloc_np,
                                  L - 1)
                cam_p = np.asarray(sp.camid)[0].astype(np.int64)
                # bounds over the padded stream: valid obs of landmark l
                # are contiguous; tile-tail pads fall between landmark
                # runs and contribute zero to the cumsum reduce
                keep_counts = np.bincount(
                    lm_sorted_np[valid_np], minlength=L)
                bv = np.zeros(L + 1, np.int64)
                bv[1:] = np.cumsum(keep_counts)
                t_l = np.arange(L, dtype=np.int64) // schur_pallas.LM_BLOCK
                bounds_p = np.append(
                    t_l * sp.TP + bv[:L] - bv[t_l * schur_pallas.LM_BLOCK],
                    OP)
                sorted_args = (
                    jnp.asarray(to_orig.astype(np.int32)),
                    jnp.asarray(bounds_p.astype(np.int32)),
                    jnp.asarray(cam_p.astype(np.int32)),
                    jnp.asarray(lm_p.astype(np.int32)),
                )
            else:
                sorted_args = (ss.order, ss.bounds,
                               jnp.asarray(cam_np_l),
                               jnp.asarray(lm_sorted_np))
            ent = (obs.lm_idx, obs.cam_idx, (C, L), obs.valid,
                   ss, sorted_args, sp)
            plan_cache[0] = ent
        _, _, _, _, ss, sorted_args, sp = ent
        if sp is not None:
            sp_statics = (sp.ntl, sp.TP, sp.n_groups, sp.L_pad)
            sp_args = (sp.perm, sp.camid, sp.lmloc)
        else:
            sp_statics = None
            z = jnp.zeros((1,), jnp.int32)
            sp_args = (z, z[None], z[None])
        to_orig_j, bounds_j, cam_l_j, lm_s_j = sorted_args
        body = _get_body(seg, sp_statics)
        Tcw_o, Xw_o, inlier, cost = body(
            Tcw, Xw, K, fixed_cam, fixed_lm, n_it,
            obs.uv.T, obs.inv_sigma2, obs.valid, obs.lm_idx,
            to_orig_j, bounds_j, cam_l_j, lm_s_j, *sp_args,
        )
        return BAResult(Tcw=Tcw_o, Xw=Xw_o, obs_inlier=inlier, cost=cost)

    return gba
