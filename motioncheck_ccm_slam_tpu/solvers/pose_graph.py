"""Sim3 essential-graph pose-graph optimization.

Replaces the reference's ``Optimizer::OptimizeEssentialGraphLoopClosure``
(src/Optimizer.cpp:1064) and ``OptimizeEssentialGraphMapFusion`` (:1339):
after a loop closure / map merge, distribute the Sim3 correction over the
whole keyframe graph (loop edges + spanning tree + strong covisibility
edges), then the map layer corrects landmarks through their reference
keyframes.

Formulation
-----------
Vertices: S_iw (world -> KF i Sim3, stored [sR|t] 4x4). Edges carry measured
relative transforms S_ji_meas = S_jw S_iw^-1 taken from the *uncorrected*
poses (or the corrected ones for loop-connection edges), like g2o EdgeSim3.
Edge error: e_ij = log_sim3(S_ji_meas^-1 . S_jw . S_iw^-1)  in R^7.

The normal equations are assembled from per-edge autodiff Jacobians into a
dense (7V, 7V) system and solved with Cholesky — at the reference's scales
(<= ~2000 KFs after redundancy culling) this is MXU-friendly; damping uses
the reference's tiny initial lambda (1e-16, Optimizer.cpp:1077 userLambdaInit)
because the graph is well-conditioned by the spanning tree.

Fixed vertices (the loop KF / map origin) are frozen by identity rows.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie


class PoseGraphEdges(NamedTuple):
    """Fixed-capacity edge list (E slots, masked)."""

    i: jax.Array          # (E,) i32 — vertex index i
    j: jax.Array          # (E,) i32 — vertex index j
    S_ji_meas: jax.Array  # (E, 4, 4) measured S_jw S_iw^-1
    weight: jax.Array     # (E,) f32 edge information scale
    valid: jax.Array      # (E,) bool


class PoseGraphResult(NamedTuple):
    S_iw: jax.Array       # (V, 4, 4) optimized Sim3 poses
    cost: jax.Array


def make_edge_measurements(S_iw, edges_i, edges_j):
    """S_ji_meas from current vertex estimates (for graph construction)."""
    Sj = S_iw[edges_j]
    Si_inv = lie.sim3_inv(S_iw[edges_i])
    return Sj @ Si_inv


def _edge_error(Si, Sj, S_ji_meas_inv):
    """log_sim3(S_ji_meas^-1 Sj Si^-1) -> (7,)."""
    return lie.sim3_log(S_ji_meas_inv @ Sj @ lie.sim3_inv(Si))


def _edge_error_perturbed(xi_i, xi_j, Si, Sj, S_ji_meas_inv):
    Si_p = lie.sim3_exp(xi_i[None])[0] @ Si
    Sj_p = lie.sim3_exp(xi_j[None])[0] @ Sj
    return _edge_error(Si_p, Sj_p, S_ji_meas_inv)


def optimize_pose_graph(
    S_iw_init,
    edges: PoseGraphEdges,
    fixed,
    iterations: int = 10,
    lambda_init: float = 1e-16,
) -> PoseGraphResult:
    """LM over the Sim3 pose graph. V static; E static with masks.

    fixed: (V,) bool — gauge vertices (loop KF, reference Optimizer.cpp:1085).
    """
    V = S_iw_init.shape[0]
    E = edges.i.shape[0]
    meas_inv = lie.sim3_inv(edges.S_ji_meas)
    zero7 = jnp.zeros(7, jnp.float32)

    def edge_res_jac(Si, Sj, Minv):
        r = _edge_error(Si, Sj, Minv)
        Ji = jax.jacfwd(lambda x: _edge_error_perturbed(x, zero7, Si, Sj, Minv))(zero7)
        Jj = jax.jacfwd(lambda x: _edge_error_perturbed(zero7, x, Si, Sj, Minv))(zero7)
        return r, Ji, Jj

    edge_rj = jax.vmap(edge_res_jac)

    def assemble(S):
        Si = S[edges.i]
        Sj = S[edges.j]
        r, Ji, Jj = edge_rj(Si, Sj, meas_inv)    # (E,7), (E,7,7), (E,7,7)
        w = jnp.where(edges.valid, edges.weight, 0.0)
        cost = jnp.sum(w * jnp.sum(r * r, -1))
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        # block scatter into dense H
        H = jnp.zeros((V * 7, V * 7), jnp.float32)
        b = jnp.zeros((V * 7,), jnp.float32)

        def rows(idx):
            return idx[:, None, None] * 7 + jnp.arange(7)[None, :, None]

        def cols(idx):
            return idx[:, None, None] * 7 + jnp.arange(7)[None, None, :]

        Hii = jnp.einsum("eai,eaj->eij", wJi, Ji)
        Hjj = jnp.einsum("eai,eaj->eij", wJj, Jj)
        Hij = jnp.einsum("eai,eaj->eij", wJi, Jj)
        ri = rows(edges.i)
        ci = cols(edges.i)
        rj = rows(edges.j)
        cj = cols(edges.j)
        shape = (E, 7, 7)
        H = H.at[jnp.broadcast_to(ri, shape), jnp.broadcast_to(ci, shape)].add(Hii)
        H = H.at[jnp.broadcast_to(rj, shape), jnp.broadcast_to(cj, shape)].add(Hjj)
        H = H.at[jnp.broadcast_to(ri, shape), jnp.broadcast_to(cj, shape)].add(Hij)
        H = H.at[jnp.broadcast_to(rj, shape), jnp.broadcast_to(ci, shape)].add(
            jnp.swapaxes(Hij, -1, -2)
        )
        b = b.at[(edges.i[:, None] * 7 + jnp.arange(7)[None, :]).reshape(-1)].add(
            (-jnp.einsum("eai,ea->ei", wJi, r)).reshape(-1)
        )
        b = b.at[(edges.j[:, None] * 7 + jnp.arange(7)[None, :]).reshape(-1)].add(
            (-jnp.einsum("eai,ea->ei", wJj, r)).reshape(-1)
        )
        return H, b, cost

    fixed_rows = jnp.repeat(fixed, 7)

    def body(_, state):
        S, lam = state
        H, b, cost = assemble(S)
        # freeze fixed vertices
        H = jnp.where(fixed_rows[:, None], 0.0, H)
        H = jnp.where(fixed_rows[None, :], 0.0, H)
        H = H + jnp.diag(jnp.where(fixed_rows, 1.0, 0.0))
        b = jnp.where(fixed_rows, 0.0, b)
        d = jnp.diag(H)
        Hd = H + jnp.diag(lam * d + 1e-10)
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hd + 1e-8 * jnp.eye(V * 7)), b
        ).reshape(V, 7)
        dx = jnp.where(fixed[:, None], 0.0, dx)
        S_new = lie.sim3_exp(dx) @ S
        _, _, cost_new = assemble(S_new)
        accept = cost_new < cost
        S = jnp.where(accept, S_new, S)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-16),
                        jnp.minimum(jnp.maximum(lam, 1e-10) * 10.0, 1e2))
        return S, lam

    S, _ = jax.lax.fori_loop(
        0, iterations, body, (S_iw_init, jnp.float32(lambda_init))
    )
    _, _, cost = assemble(S)
    return PoseGraphResult(S_iw=S, cost=cost)


def correct_landmarks(Xw, ref_kf_idx, S_iw_before, S_iw_after):
    """Move landmarks with their reference keyframes after a pose-graph solve
    (reference Optimizer.cpp:1287-1326): X' = S_after^-1( S_before( X ) )."""
    Sb = S_iw_before[ref_kf_idx]          # (L, 4, 4) world->kf (old)
    Sa_inv = lie.sim3_inv(S_iw_after[ref_kf_idx])
    x_kf = jnp.einsum("lij,lj->li", Sb[:, :3, :3], Xw) + Sb[:, :3, 3]
    return jnp.einsum("lij,lj->li", Sa_inv[:, :3, :3], x_kf) + Sa_inv[:, :3, 3]


def se3_from_sim3(S):
    """Project optimized Sim3 back to SE3: divide translation by scale
    (reference: [R t/s; 0 1] after essential-graph optimization)."""
    R, t, s = lie.split_sim3(S)
    return lie.make_T(R, t / s[..., None])
