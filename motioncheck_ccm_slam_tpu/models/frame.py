"""Per-image working frame.

Replaces the reference ``Frame`` (src/Frame.cpp): ORB extraction +
undistortion happen once per image; the frame carries fixed-capacity feature
arrays plus its (evolving) pose estimate and feature->landmark associations.
The reference's 48x75 acceleration grid (Frame.h:51-52) is dropped — search
is done with dense masked distance matrices (see ops/matching.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import geometry, image as image_ops, orb


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    feats: orb.OrbFeatures          # xy already undistorted (level-0 px)
    Tcw: jax.Array                  # (4, 4) current pose estimate
    mp_idx: jax.Array               # (F,) i32 — matched landmark slot or -1
    n_tracked: int = 0              # inliers after local-map tracking


_extract_cache = {}


def make_extractor(config: Config):
    """Jitted extract+undistort closure for this config (cached)."""
    key = (config.extractor, config.camera)
    if key in _extract_cache:
        return _extract_cache[key]
    cam = config.camera
    K = jnp.asarray(cam.K())
    dist = jnp.asarray(cam.dist_coeffs())

    @jax.jit
    def extract(img):
        feats = orb.extract_orb(img, config.extractor)
        und = geometry.undistort_points(feats.xy, K, dist)
        return feats._replace(xy=und)

    _extract_cache[key] = extract
    return extract


def make_frame(config: Config, frame_id: int, timestamp: float, img) -> Frame:
    extract = make_extractor(config)
    feats = extract(jnp.asarray(img, jnp.float32))
    f = config.extractor.max_features
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        feats=feats,
        Tcw=jnp.eye(4, dtype=jnp.float32),
        mp_idx=jnp.full((f,), -1, jnp.int32),
    )
