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

from ..ops import lie
from ..solvers import ba_core
from ..solvers.local_ba import BAResult, _robust_cost

AXIS = "obs"


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


def _pcg(matvec, b, M_inv_blocks, iters: int, rtol: float = 1e-5):
    """Block-Jacobi preconditioned CG on the (C,6) camera system.

    Runs at most ``iters`` sweeps with residual-based early exit: the loop
    stops once the preconditioned residual norm r.z drops below
    rtol^2 * (r0.z0) — converged LM steps skip the remaining sweeps instead
    of burning a fixed budget. All loop-carried scalars are replicated under
    shard_map (matvec psums before any reduction), so the exit condition is
    consistent across devices.
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
    Tcw, Xw, lam = state
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
    M_inv = jnp.linalg.inv(Hcc_d + 1e-6 * eye6[None])
    dc = _pcg(matvec, br, M_inv, pcg_iters)
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
    return (Tcw, Xw, lam), cost_new


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

    Tcw, Xw, lam = jax.lax.fori_loop(
        0, n_iters, it, (Tcw, Xw, jnp.float32(1e-4))
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


def _gba_iteration_sorted(state, obs: ba_core.BAObservations, K, fixed_cam,
                          fixed_lm, C, L, pcg_iters, cam_seg: int,
                          lm_order, lm_bounds, cam_idx_sorted, lm_idx):
    """One LM iteration specialized for the single-chip matrix-free path:
    camera reductions are reshape-sums (observations are camera-major
    contiguous), landmark reductions are cumsum-at-boundaries over obs
    pre-sorted by landmark — the PCG hot loop contains NO scatter and no
    large gather tables (both serialized the 2M-obs GBA on TPU)."""
    Tcw, Xw, lam = state
    r, pc, depth_ok = ba_core.reproject_residuals(Tcw, Xw, obs, K)
    w, chi2 = ba_core.robust_obs_weights(r, obs, depth_ok)
    cost = _robust_cost(chi2, obs.valid)
    Rm = Tcw[obs.cam_idx][:, :3, :3]
    Jc, Jl = ba_core.reproject_jacobians(pc, Rm, K)
    wJc = Jc * w[:, None, None]
    wJl = Jl * w[:, None, None]

    def cam_sum(x):
        return x.reshape((C, cam_seg) + x.shape[1:]).sum(1)

    def lm_sum_sorted(x_sorted):
        return ba_core.sorted_seg_sum(x_sorted, lm_bounds)

    Hcc = cam_sum(jnp.einsum("oic,oid->ocd", wJc, Jc))
    bc = cam_sum(-jnp.einsum("oic,oi->oc", wJc, r))
    Hll = lm_sum_sorted(jnp.einsum("oic,oid->ocd", wJl, Jl)[lm_order])
    bl = lm_sum_sorted(-jnp.einsum("oic,oi->oc", wJl, r)[lm_order])
    Wcl = jnp.einsum("oic,oid->ocd", wJc, Jl)      # (O, 6, 3) cam order

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
        fixed_cam[obs.cam_idx][:, None, None]
        | fixed_lm[lm_idx][:, None, None],
        0.0, Wcl,
    )
    Hll_inv = ba_core.inv33(Hll_d)
    Wcl_lm = Wcl[lm_order]                          # (O, 6, 3) lm order

    # reduced RHS: br = bc - W Hll^-1 bl
    u0 = jnp.einsum("lij,lj->li", Hll_inv, bl)
    br = bc - cam_sum(jnp.einsum("oij,oj->oi", Wcl, u0[lm_idx]))

    def matvec(v):
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        wtv = jnp.einsum("oij,oi->oj", Wcl_lm, v[cam_idx_sorted])
        u = jnp.einsum("lij,lj->li", Hll_inv, lm_sum_sorted(wtv))
        w_ = cam_sum(jnp.einsum("oij,oj->oi", Wcl, u[lm_idx]))
        return Hv - w_

    M_inv = jnp.linalg.inv(Hcc_d + 1e-6 * eye6[None])
    dc = _pcg(matvec, br, M_inv, pcg_iters)
    dc = jnp.where(fixed_cam[:, None], 0.0, dc)
    # back-substitute landmarks: dl = Hll^-1 (bl - W^T dc)
    wtv = jnp.einsum("oij,oi->oj", Wcl_lm, dc[cam_idx_sorted])
    dl = jnp.einsum("lij,lj->li", Hll_inv, bl - lm_sum_sorted(wtv))
    dl = jnp.where(fixed_lm[:, None], 0.0, dl)

    T_new = ba_core.apply_pose_update(Tcw, dc, mask=~fixed_cam)
    X_new = Xw + dl
    r2, _, _ = ba_core.reproject_residuals(T_new, X_new, obs, K)
    chi2_new = jnp.sum(r2 * r2, -1) * obs.inv_sigma2
    cost_new = _robust_cost(chi2_new, obs.valid)
    accept = cost_new < cost
    Tcw = jnp.where(accept, T_new, Tcw)
    Xw = jnp.where(accept, X_new, Xw)
    lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                    jnp.minimum(lam * 4.0, 1e4))
    return (Tcw, Xw, lam), cost_new


def make_sorted_matrix_free_gba(iterations: int = 5, pcg_iters: int = 25):
    """Single-chip matrix-free GBA using the sorted-cumsum landmark
    reduction (``_gba_iteration_sorted``): camera sums are reshape-sums over
    the camera-major observation stream, landmark sums are one permutation
    gather + parallel-prefix cumsum + boundary diff. Unlike the SegmentPlan
    gather tables, the hot-loop cost is independent of the landmark degree
    distribution (a table pads every landmark to the max degree; a popular
    landmark inflates the whole gather). Requires camera-major contiguous
    observations — exactly what map_state.gather_observations produces."""

    bodies = {}
    plan_cache: list = [None]

    def _get_body(cam_seg: int):
        if cam_seg not in bodies:
            def body_fn(Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
                        cam_idx, lm_idx, uv, inv_sigma2, valid,
                        lm_order, lm_bounds, cam_idx_sorted):
                obs = ba_core.BAObservations(
                    cam_idx=cam_idx, lm_idx=lm_idx, uv=uv,
                    inv_sigma2=inv_sigma2, valid=valid,
                )
                C = Tcw.shape[0]
                L = Xw.shape[0]

                def it(_, st):
                    st, _cost = _gba_iteration_sorted(
                        st, obs, K, fixed_cam, fixed_lm, C, L, pcg_iters,
                        cam_seg, lm_order, lm_bounds, cam_idx_sorted, lm_idx,
                    )
                    return st

                Tcw_o, Xw_o, lam = jax.lax.fori_loop(
                    0, n_iters, it, (Tcw, Xw, jnp.float32(1e-4))
                )
                r, _, depth_ok = ba_core.reproject_residuals(
                    Tcw_o, Xw_o, obs, K
                )
                chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
                inlier = obs.valid & (chi2 <= ba_core.CHI2_MONO) & depth_ok
                cost = _robust_cost(chi2, inlier)
                return Tcw_o, Xw_o, inlier, cost
            bodies[cam_seg] = jax.jit(body_fn)
        return bodies[cam_seg]

    def gba(Tcw, Xw, obs: ba_core.BAObservations, K, fixed_cam, fixed_lm,
            n_iterations=None):
        n_it = jnp.int32(iterations if n_iterations is None else n_iterations)
        C, L = Tcw.shape[0], Xw.shape[0]
        O = obs.cam_idx.shape[0]
        assert O % C == 0, "sorted GBA needs camera-major contiguous obs"
        ent = plan_cache[0]
        if (ent is None or ent[0] is not obs.lm_idx
                or ent[1] is not obs.cam_idx or ent[2] != (C, L)):
            ss = ba_core.build_sorted_segments(np.asarray(obs.lm_idx), L)
            ent = (obs.lm_idx, obs.cam_idx, (C, L), ss,
                   obs.cam_idx[ss.order])
            plan_cache[0] = ent
        ss, cam_idx_sorted = ent[3], ent[4]
        body = _get_body(O // C)
        Tcw_o, Xw_o, inlier, cost = body(
            Tcw, Xw, K, fixed_cam, fixed_lm, n_it,
            obs.cam_idx, obs.lm_idx, obs.uv, obs.inv_sigma2, obs.valid,
            ss.order, ss.bounds, cam_idx_sorted,
        )
        return BAResult(Tcw=Tcw_o, Xw=Xw_o, obs_inlier=inlier, cost=cost)

    return gba


def make_matrix_free_gba(iterations: int = 5, pcg_iters: int = 25):
    """Single-chip matrix-free GBA: the same LM/PCG body as the sharded
    solver, without collectives. This is what ``run_gba`` picks when the
    dense-W Schur solve would not fit (server operating point: 2048 KFs x
    65k MPs would need a ~9.7 GB dense W — reference scale, one chip).

    Segment-gather plans (built on host once per problem, cached by obs
    identity) replace every per-entity scatter-add: at 2M observations TPU
    scatter serialization dominated the PCG loop (measured ~5x)."""

    bodies = {}
    _dummy_t = jnp.zeros((1, 1), jnp.int32)
    _dummy_m = jnp.zeros((1, 1), bool)

    def _get_body(cam_seg: int, lm_seg: int):
        key = (cam_seg, lm_seg)
        if key not in bodies:
            def body_fn(Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
                        cam_idx, lm_idx, uv, inv_sigma2, valid,
                        cam_table, cam_mask, lm_table, lm_mask):
                return _gba_body(
                    Tcw, Xw, K, fixed_cam, fixed_lm, n_iters,
                    cam_idx, lm_idx, uv, inv_sigma2, valid,
                    pcg_iters, lambda x: x,
                    cam_plan=ba_core.SegmentPlan(cam_table, cam_mask,
                                                 cam_seg),
                    lm_plan=ba_core.SegmentPlan(lm_table, lm_mask, lm_seg),
                )
            bodies[key] = jax.jit(body_fn)
        return bodies[key]

    # one live problem at a time; the cache entry keeps STRONG references to
    # the keyed index arrays and revalidates by object identity — an id()
    # key would silently alias a recycled address after the previous job's
    # arrays are garbage-collected, reusing a stale landmark plan built for
    # different associations
    plan_cache: list = [None]  # (cam_idx, lm_idx, C, L, cam_plan, lm_plan)

    def gba(Tcw, Xw, obs: ba_core.BAObservations, K, fixed_cam, fixed_lm,
            n_iterations=None):
        n_it = jnp.int32(iterations if n_iterations is None else n_iterations)
        C, L = Tcw.shape[0], Xw.shape[0]
        ent = plan_cache[0]
        if (ent is None or ent[0] is not obs.cam_idx
                or ent[1] is not obs.lm_idx or ent[2] is not obs.valid
                or ent[3] != (C, L)):
            ent = (
                obs.cam_idx, obs.lm_idx, obs.valid, (C, L),
                ba_core.build_segment_plan(np.asarray(obs.cam_idx), C),
                ba_core.build_segment_plan(np.asarray(obs.lm_idx), L,
                                           valid=np.asarray(obs.valid)),
            )
            plan_cache[0] = ent
        cam_plan, lm_plan = ent[4], ent[5]
        body = _get_body(cam_plan.seg_size, lm_plan.seg_size)
        Tcw_o, Xw_o, inlier, cost = body(
            Tcw, Xw, K, fixed_cam, fixed_lm, n_it,
            obs.cam_idx, obs.lm_idx, obs.uv, obs.inv_sigma2, obs.valid,
            cam_plan.table if cam_plan.table is not None else _dummy_t,
            cam_plan.mask if cam_plan.mask is not None else _dummy_m,
            lm_plan.table if lm_plan.table is not None else _dummy_t,
            lm_plan.mask if lm_plan.mask is not None else _dummy_m,
        )
        return BAResult(Tcw=Tcw_o, Xw=Xw_o, obs_inlier=inlier, cost=cost)

    return gba
