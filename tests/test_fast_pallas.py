"""Parity tests for the fused Pallas FAST front-end (ops/fast_pallas.py).

Run in interpreter mode on the CPU mesh; the kernels must reproduce the
jnp reference formulation in ops/orb.py — exactly for the discrete corner
stage, to f32 rounding for the blur/moment maps.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from motioncheck_ccm_slam_tpu.config import DEFAULT_CONFIG
from motioncheck_ccm_slam_tpu.ops import fast_pallas, image as image_ops, orb


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    base = rng.uniform(0, 64, (137, 201)).astype(np.float32)
    # drop in some strong corners so both thresholds fire
    for y, x in rng.integers(25, 110, (30, 2)):
        base[y:y + 3, x:x + 3] += 150.0
    return jnp.asarray(base)


def _reference_masked_score(img, params, cell=32):
    h, w = img.shape
    b = params.edge_threshold
    (ch, sh), (cl, sl) = orb.fast_response_two_thresholds(
        img, float(params.ini_th_fast), float(params.min_th_fast))
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    okb = (yy >= b) & (yy < h - b) & (xx >= b) & (xx < w - b)
    ch, cl = ch & okb, cl & okb
    hp = (h + cell - 1) // cell * cell
    wp = (w + cell - 1) // cell * cell

    def to_cells(x, fill):
        xp = jnp.pad(x, ((0, hp - h), (0, wp - w)), constant_values=fill)
        return xp.reshape(
            hp // cell, cell, wp // cell, cell).transpose(0, 2, 1, 3)

    use_hi = jnp.any(to_cells(ch, False), axis=(2, 3))[:, :, None, None]
    corner = jnp.where(use_hi, to_cells(ch, False), to_cells(cl, False))
    score = jnp.where(use_hi, to_cells(sh, 0.0), to_cells(sl, 0.0))
    corner_map = corner.transpose(0, 2, 1, 3).reshape(hp, wp)
    score_map = score.transpose(0, 2, 1, 3).reshape(hp, wp)
    return np.asarray(jnp.where(corner_map, score_map, 0.0))


def test_masked_corner_score_bitexact(img):
    params = DEFAULT_CONFIG.extractor
    ref = _reference_masked_score(img, params)
    out = np.asarray(fast_pallas.masked_corner_score(
        img, th_hi=float(params.ini_th_fast),
        th_lo=float(params.min_th_fast), border=params.edge_threshold,
        interpret=True,
    ))
    hp, wp = ref.shape
    assert (ref > 0).sum() > 50, "fixture produced too few corners"
    np.testing.assert_array_equal(out[:hp, :wp], ref)
    # pad region must never produce candidates
    assert np.abs(out[hp:]).sum() == 0.0
    assert np.abs(out[:, wp:]).sum() == 0.0


def test_blur_and_moments_close(img):
    h, w = img.shape
    blur_ref = np.asarray(image_ops.gaussian_blur(img, 7, 2.0))
    m10_ref, m01_ref = orb.ic_moment_maps(img, 15)
    blur, m10, m01 = fast_pallas.blur_and_moments(
        img, half_patch=15, interpret=True)
    np.testing.assert_allclose(
        np.asarray(blur)[:h, :w], blur_ref, rtol=0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(m10)[:h, :w], np.asarray(m10_ref), rtol=0, atol=1.0)
    np.testing.assert_allclose(
        np.asarray(m01)[:h, :w], np.asarray(m01_ref), rtol=0, atol=1.0)


def test_extractor_pallas_backend_matches(img):
    """Full extract_orb with the pallas front-end vs the jnp front-end:
    keypoint sets identical, angles near-identical, descriptors
    near-identical (blur rounding can flip a near-tie BRIEF bit)."""
    import dataclasses

    # the 137x201 fixture can't fill the EuRoC 1000-feature budget on the
    # smallest pyramid levels (top_k pool < k); shrink the budget
    params = dataclasses.replace(DEFAULT_CONFIG.extractor, max_features=150)
    prev = orb.FAST_BACKEND
    try:
        orb.FAST_BACKEND = "jnp"
        ref = orb.extract_orb(img, params)
        orb.FAST_BACKEND = "pallas"
        fast_pallas.FORCE_INTERPRET = True
        out = orb.extract_orb(img, params)
    finally:
        orb.FAST_BACKEND = prev
        fast_pallas.FORCE_INTERPRET = False
    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(out.xy)[v], np.asarray(ref.xy)[v])
    np.testing.assert_array_equal(
        np.asarray(out.octave)[v], np.asarray(ref.octave)[v])
    da = np.abs(np.asarray(out.angle)[v] - np.asarray(ref.angle)[v])
    da = np.minimum(da, 2 * np.pi - da)
    assert da.max() < 1e-3
    # descriptors: allow a handful of flipped bits from blur rounding
    dd = np.asarray(out.desc)[v] ^ np.asarray(ref.desc)[v]
    flipped = np.unpackbits(dd.view(np.uint8), axis=-1).sum(-1)
    assert flipped.max() <= 4, f"max hamming drift {flipped.max()}"
