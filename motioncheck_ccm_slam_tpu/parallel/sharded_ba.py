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


def _schur_matvec(v, Hcc_d, Hll_inv, Wcl, cam_idx, lm_idx, C, L, reduce):
    """S @ v for the reduced camera system, on the local obs shard + psum.

    v: (C, 6) replicated. Wcl: (O_local, 6, 3). ``reduce`` is a psum over
    the mesh's obs axis, or identity when running unsharded on one chip.
    """
    Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
    # u_l = sum_obs Wcl^T v[cam]  -> (L, 3)
    wtv = jnp.einsum("oij,oi->oj", Wcl, v[cam_idx])
    u = jnp.zeros((L, 3), v.dtype).at[lm_idx].add(wtv)
    u = reduce(u)
    u = jnp.einsum("lij,lj->li", Hll_inv, u)
    # w_c = sum_obs Wcl u[lm]    -> (C, 6)
    wu = jnp.einsum("oij,oj->oi", Wcl, u[lm_idx])
    w = jnp.zeros((C, 6), v.dtype).at[cam_idx].add(wu)
    w = reduce(w)
    return Hv - w


def _pcg(matvec, b, M_inv_blocks, iters: int):
    """Block-Jacobi preconditioned CG on the (C,6) camera system."""

    def precond(r):
        return jnp.einsum("cij,cj->ci", M_inv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0

    def body(_, state):
        x, r, z, p, rz = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-12, 1.0, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1.0, rz)
        p = z + beta * p
        return x, r, z, p, rz_new

    x, *_ = jax.lax.fori_loop(
        0, iters, body, (x0, r0, z0, p0, jnp.sum(r0 * z0))
    )
    return x


def _gba_iteration(state, obs_shard: ba_core.BAObservations, K, fixed_cam,
                   fixed_lm, C, L, pcg_iters, reduce):
    Tcw, Xw, lam = state
    r, pc, depth_ok = ba_core.reproject_residuals(Tcw, Xw, obs_shard, K)
    w, chi2 = ba_core.robust_obs_weights(r, obs_shard, depth_ok)
    cost = reduce(_robust_cost(chi2, obs_shard.valid))
    Rm = Tcw[obs_shard.cam_idx][:, :3, :3]
    Jc, Jl = ba_core.reproject_jacobians(pc, Rm, K)
    Hcc, bc, Hll, bl, Wcl = ba_core.assemble_blocks(
        Jc, Jl, r, w, obs_shard.cam_idx, obs_shard.lm_idx, C, L
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
    Wu = reduce(
        jnp.zeros((C, 6), bc.dtype).at[obs_shard.cam_idx].add(wu)
    )
    br = bc - Wu

    matvec = functools.partial(
        _schur_matvec, Hcc_d=Hcc_d, Hll_inv=Hll_inv, Wcl=Wcl,
        cam_idx=obs_shard.cam_idx, lm_idx=obs_shard.lm_idx, C=C, L=L,
        reduce=reduce,
    )
    M_inv = jnp.linalg.inv(Hcc_d + 1e-6 * eye6[None])
    dc = _pcg(matvec, br, M_inv, pcg_iters)
    dc = jnp.where(fixed_cam[:, None], 0.0, dc)
    # back-substitute landmarks: dl = Hll^-1 (bl - W^T dc)
    wtv = jnp.einsum("oij,oi->oj", Wcl, dc[obs_shard.cam_idx])
    Wt_dc = reduce(
        jnp.zeros((L, 3), bl.dtype).at[obs_shard.lm_idx].add(wtv)
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
              pcg_iters, reduce):
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
            st, obs_shard, K, fixed_cam, fixed_lm, C, L, pcg_iters, reduce
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


def make_matrix_free_gba(iterations: int = 5, pcg_iters: int = 25):
    """Single-chip matrix-free GBA: the same LM/PCG body as the sharded
    solver, without collectives. This is what ``run_gba`` picks when the
    dense-W Schur solve would not fit (server operating point: 2048 KFs x
    65k MPs would need a ~9.7 GB dense W — reference scale, one chip)."""

    body = jax.jit(functools.partial(
        _gba_body, pcg_iters=pcg_iters, reduce=lambda x: x,
    ))

    def gba(Tcw, Xw, obs: ba_core.BAObservations, K, fixed_cam, fixed_lm,
            n_iterations=None):
        n_it = jnp.int32(iterations if n_iterations is None else n_iterations)
        Tcw_o, Xw_o, inlier, cost = body(
            Tcw, Xw, K, fixed_cam, fixed_lm, n_it,
            obs.cam_idx, obs.lm_idx, obs.uv, obs.inv_sigma2, obs.valid,
        )
        return BAResult(Tcw=Tcw_o, Xw=Xw_o, obs_inlier=inlier, cost=cost)

    return gba
