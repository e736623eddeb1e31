"""Sim3 pair refinement between two keyframes.

Replaces the reference's ``Optimizer::OptimizeSim3`` (src/Optimizer.cpp:867):
given matched landmarks seen by two keyframes, refine the Sim3 S12 (camera2
frame -> camera1 frame) with bidirectional projection residuals, Huber
robustification, an outlier-removal pass, and a final inlier count the
caller gates on (>= 20 inliers accepts a loop candidate).

Jacobians come from forward-mode autodiff of the residual wrt the 7-dof
left-multiplicative sim3 perturbation — exact, and avoids hand-deriving the
Sim3 adjoint chain.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie

CHI2_SIM3 = 10.0  # reference th2 = 10 per direction


class Sim3OptResult(NamedTuple):
    S12: jax.Array       # (4, 4) refined [sR|t]
    inliers: jax.Array   # (N,) bool
    n_inliers: jax.Array


def _project(K, pc):
    z = jnp.maximum(pc[..., 2], 1e-6)
    u = K[0, 0] * pc[..., 0] / z + K[0, 2]
    v = K[1, 1] * pc[..., 1] / z + K[1, 2]
    return jnp.stack([u, v], -1)


def _residuals(S12, X1, X2, uv1, uv2, K):
    """Bidirectional projection residuals (N, 4).

    X1/X2: landmarks in camera-1/camera-2 frames; uv1: observation of the
    match in image 1 (paired with X2 through S12), uv2 vice versa.
    """
    S21 = lie.sim3_inv(S12)
    p1 = lie.sim3_apply(S12, X2[None])[0]
    p2 = lie.sim3_apply(S21, X1[None])[0]
    r1 = uv1 - _project(K, p1)
    r2 = uv2 - _project(K, p2)
    return jnp.concatenate([r1, r2], -1), p1[..., 2], p2[..., 2]


def optimize_sim3(
    S12_init,
    X1,
    X2,
    uv1,
    uv2,
    inv_sigma2_1,
    inv_sigma2_2,
    valid,
    K,
    fix_scale: bool = False,
    iterations: int = 10,
    outlier_pass_at: int = 5,
) -> Sim3OptResult:
    """Refine S12 (4, 4) [sR|t]. All arrays fixed capacity with ``valid``."""

    def res_of_xi(xi, S):
        S_new = lie.sim3_exp(xi[None])[0] @ S
        r, z1, z2 = _residuals(S_new, X1, X2, uv1, uv2, K)
        return r, (z1, z2)

    def chi2_of(r):
        c1 = jnp.sum(r[:, :2] ** 2, -1) * inv_sigma2_1
        c2 = jnp.sum(r[:, 2:] ** 2, -1) * inv_sigma2_2
        return c1, c2

    s_init = lie.split_sim3(S12_init)[2]

    def body(i, state):
        S, lam, active = state
        zero = jnp.zeros(7, jnp.float32)
        r, _ = res_of_xi(zero, S)
        J = jax.jacfwd(lambda x: res_of_xi(x, S)[0])(zero)  # (N, 4, 7)
        c1, c2 = chi2_of(r)
        # robust weights per direction
        w1 = inv_sigma2_1 * _huber_w(c1)
        w2 = inv_sigma2_2 * _huber_w(c2)
        w = jnp.where(active, 1.0, 0.0)
        W4 = jnp.stack([w1 * w, w1 * w, w2 * w, w2 * w], -1)  # (N, 4)
        if fix_scale:
            J = J.at[:, :, 6].set(0.0)
        H = jnp.einsum("nif,ni,nig->fg", J, W4, J)
        b = -jnp.einsum("nif,ni,ni->f", J, W4, r)
        if fix_scale:
            H = H.at[6, 6].add(1.0)
        else:
            # soft log-scale prior anchored at the Horn/RANSAC init: for a
            # small-baseline revisit the family (lam*s, lam*t) is a near
            # gauge freedom of two-view projections and LM random-walks the
            # scale away. The 3D-3D alignment that produced S12_init DOES
            # observe scale; a prior at ~1% of the largest diagonal entry
            # yields to any real projection information but pins the null
            # direction.
            w_prior = 1e-2 * jnp.max(jnp.diag(H)) + 1e-6
            sigma_rel = jnp.log(lie.split_sim3(S)[2] / s_init)
            H = H.at[6, 6].add(w_prior)
            b = b.at[6].add(-w_prior * sigma_rel)
        # identity damping scaled by the largest diagonal entry (g2o's LM
        # scheme): a revisit of the SAME viewpoint makes the scale dof nearly
        # unobservable from projections — diag-proportional damping leaves
        # that null direction free and the scale random-walks away from the
        # Horn/RANSAC init; identity damping pins it.
        Hd = H + jnp.eye(7, dtype=H.dtype) * (lam * jnp.max(jnp.diag(H)) + 1e-9)
        dx = jnp.linalg.solve(Hd, b)
        if fix_scale:
            dx = dx.at[6].set(0.0)
        S_new = lie.sim3_exp(dx[None])[0] @ S
        r_new, _ = res_of_xi(zero, S_new)
        c1n, c2n = chi2_of(r_new)
        cost = jnp.sum(jnp.where(active, _huber_rho(c1) + _huber_rho(c2), 0.0))
        cost_new = jnp.sum(jnp.where(active, _huber_rho(c1n) + _huber_rho(c2n), 0.0))
        accept = cost_new < cost
        S = jnp.where(accept, S_new, S)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e4))
        # outlier pass: drop matches failing either direction
        do_gate = i == outlier_pass_at
        r_cur, _ = res_of_xi(zero, S)
        c1c, c2c = chi2_of(r_cur)
        gated = active & (c1c <= CHI2_SIM3) & (c2c <= CHI2_SIM3)
        active = jnp.where(do_gate, gated, active)
        return S, lam, active

    S, _, active = jax.lax.fori_loop(
        0, iterations, body, (S12_init, jnp.float32(1e-4), valid)
    )
    # final classification
    rr, z1, z2 = _residuals(S, X1, X2, uv1, uv2, K)
    c1 = jnp.sum(rr[:, :2] ** 2, -1) * inv_sigma2_1
    c2 = jnp.sum(rr[:, 2:] ** 2, -1) * inv_sigma2_2
    inl = valid & active & (c1 <= CHI2_SIM3) & (c2 <= CHI2_SIM3) & (z1 > 0) & (z2 > 0)
    return Sim3OptResult(S12=S, inliers=inl, n_inliers=jnp.sum(inl))


def _huber_w(chi2, delta: float = 3.1623):  # sqrt(10)
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)


def _huber_rho(chi2, delta: float = 3.1623):
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, chi2, 2.0 * delta * e - delta * delta)
