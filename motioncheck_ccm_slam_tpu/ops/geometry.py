"""Projective geometry utilities: projection, distortion, triangulation.

Batched jnp replacements for the reference's per-point OpenCV/Eigen geometry
(reference: src/Frame.cpp UndistortKeyPoints/isInFrustum, src/Mapping.cpp
CreateNewMapPoints triangulation, src/Initializer.cpp Triangulate).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Pinhole projection + radial-tangential (k1 k2 p1 p2 k3) distortion
# ---------------------------------------------------------------------------

def project(pts_cam, K):
    """Camera-frame points (..., N, 3) -> pixel coords (..., N, 2).

    No distortion: the pipeline works on undistorted keypoints like the
    reference (Frame.cpp undistorts once at extraction).
    """
    z = pts_cam[..., 2:3]
    xy = pts_cam[..., :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = fx[..., None] * xy[..., 0] + cx[..., None]
    v = fy[..., None] * xy[..., 1] + cy[..., None]
    return jnp.stack([u, v], -1)


def distort_normalized(xy, dist):
    """Apply radtan distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def undistort_points(uv, K, dist, iters: int = 8):
    """Undistort pixel keypoints (..., 2) -> undistorted pixels (..., 2).

    Fixed-point Gauss iteration (equivalent of cv::undistortPoints as used in
    Frame::UndistortKeyPoints). ``iters`` fixed for jit.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    target = jnp.stack([xd, yd], -1)

    def body(_, xy):
        d = distort_normalized(xy, dist)
        return xy + (target - d)

    xy = jax.lax.fori_loop(0, iters, body, target)
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], -1)


def backproject(uv, K):
    """Pixels (..., 2) -> normalized camera rays (..., 3) with z=1."""
    fx, fy, cx, cy = K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]
    x = (uv[..., 0] - cx[..., None] if cx.ndim else uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy[..., None] if cy.ndim else uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], -1)


# ---------------------------------------------------------------------------
# Two-view triangulation (DLT) — reference Initializer::Triangulate and
# LocalMapping::CreateNewMapPoints
# ---------------------------------------------------------------------------

def triangulate_dlt(P1, P2, uv1, uv2):
    """Linear triangulation of correspondences.

    P1, P2: (..., 3, 4) projection matrices (K [R|t]).
    uv1, uv2: (..., N, 2) pixel coords.
    Returns world points (..., N, 3) and the smallest singular value (..., N)
    as a conditioning signal.
    """
    # build A: (..., N, 4, 4)
    r0 = uv1[..., 0:1, None] * P1[..., None, 2:3, :] - P1[..., None, 0:1, :]
    r1 = uv1[..., 1:2, None] * P1[..., None, 2:3, :] - P1[..., None, 1:2, :]
    r2 = uv2[..., 0:1, None] * P2[..., None, 2:3, :] - P2[..., None, 0:1, :]
    r3 = uv2[..., 1:2, None] * P2[..., None, 2:3, :] - P2[..., None, 1:2, :]
    A = jnp.concatenate([r0, r1, r2, r3], -2)  # (..., N, 4, 4)
    # homogeneous solution = right-singular vector of smallest singular value
    _, s, vt = jnp.linalg.svd(A, full_matrices=True)
    X = vt[..., -1, :]  # (..., N, 4)
    w = X[..., 3]
    pts = X[..., :3] / jnp.where(jnp.abs(w) < _EPS, _EPS, w)[..., None]
    return pts, s[..., -1]


def projection_matrix(K, Tcw):
    """K (3,3) and Tcw (..., 4, 4) -> P = K [R|t] (..., 3, 4)."""
    return jnp.einsum("ij,...jk->...ik", K, Tcw[..., :3, :])


# ---------------------------------------------------------------------------
# Checks used throughout matching / mapping
# ---------------------------------------------------------------------------

def reprojection_chi2(pts_world, Tcw, K, uv_obs, inv_sigma2):
    """Per-observation chi2 of reprojection error.

    pts_world (..., N, 3); Tcw (..., 4, 4); uv_obs (..., N, 2);
    inv_sigma2 (..., N) per-octave information weight. Returns chi2 (..., N)
    and depth (..., N).
    """
    R, t = Tcw[..., :3, :3], Tcw[..., :3, 3]
    pc = jnp.einsum("...ij,...nj->...ni", R, pts_world) + t[..., None, :]
    uv = project(pc, K)
    err = uv - uv_obs
    chi2 = jnp.sum(err * err, -1) * inv_sigma2
    return chi2, pc[..., 2]


def parallax_cos(C1, C2, pts):
    """Cosine of the parallax angle of points (..., N, 3) seen from camera
    centers C1/C2 (..., 3)."""
    v1 = pts - C1[..., None, :]
    v2 = pts - C2[..., None, :]
    n1 = jnp.linalg.norm(v1, axis=-1)
    n2 = jnp.linalg.norm(v2, axis=-1)
    return jnp.sum(v1 * v2, -1) / jnp.maximum(n1 * n2, _EPS)


def in_image(uv, width, height, margin=0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < height - margin)
    )


def camera_center(Tcw):
    """World-frame camera center Ow = -R^T t from Tcw (..., 4, 4)."""
    R, t = Tcw[..., :3, :3], Tcw[..., :3, 3]
    return -jnp.einsum("...ji,...j->...i", R, t)
