"""Fused FAST-9/16 front-end as a single Pallas TPU kernel.

The dense corner stage of the extractor (reference src/ORBextractor.cpp
ComputeKeyPointsOctTree :933 — cv::FAST at two thresholds + the per-cell
retry) is pure elementwise work, but expressed as jnp graph ops it costs
~40 full-image HBM passes per pyramid level: 16 shifted ring views, 4
threshold/score maps, the bit-packed arc reduction, border masks and the
32px-cell hi/lo selection. This kernel streams each row-stripe through
VMEM exactly once and emits the final masked corner-score map:

    masked[y,x] = score_chosen[y,x]  if the pixel is a FAST corner under
                  the per-cell-chosen threshold (hi where the 32x32 cell
                  has any hi-threshold corner, else lo), inside the
                  edge-threshold border; 0 otherwise.

3x3 NMS + top-k selection stay in XLA (they are two cheap passes and the
NMS neighborhood crosses cell boundaries, which a stripe kernel cannot see
without a second halo exchange).

Numerics are bit-identical to ops.orb.fast_response_two_thresholds + the
cell-retry block in ops.orb._select_level_keypoints: same f32 adds in the
same ring order, same strict inequalities.

Layout: the wrapper zero-pads the image into P (Hp + 2*HALO, WP) with the
pixel (0,0) at P[HALO, HALO]; each grid program DMAs one (TH + 2*HALO, WP)
stripe HBM->VMEM and writes a (TH, Wc) output tile. The 32x32-cell
``any`` + broadcast-back runs as four tiny 0/1 matmuls on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAST ring: 16 contiguous (dx, dy) offsets of the radius-3 Bresenham
# circle (shared with ops.orb, which imports these).
FAST_RING = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2),
        (-1, -3),
    ],
    dtype=np.int32,
)
FAST_ARC = 9  # FAST-9: >= 9 contiguous ring pixels all brighter/darker

HALO = 4          # ring radius 3, +1 slack
TH = 64           # blur/moment stripe height (multiple of the 32px cell)
# Corner stripe height: the 16x-unrolled ring loop keeps ~100 live
# stripe-sized temporaries (4 masks + 4 scores + d per offset before the
# scheduler can retire them); at 64 rows that is ~22 MB of scoped VMEM,
# over the 16 MB/core budget on real chips. 32 rows halves it.
TH_CORNER = 32
CELL = 32

# Test hook: force interpreter-mode execution (CPU) for the kernels even
# when callers don't pass interpret=True.
FORCE_INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _cell_matmul_any(mask_f, th: int, wc: int):
    """Per-32x32-cell ``any`` broadcast back to pixels, via MXU matmuls.

    mask_f: (th, wc) f32 0/1. Returns (th, wc) f32 > 0 where the cell has
    any set pixel. A 2D->4D reshape + axis-reduce is lane-hostile in
    Mosaic; two 0/1 aggregation matmuls + two broadcast matmuls are free
    on the MXU.
    """
    gr = jax.lax.broadcasted_iota(jnp.int32, (th // CELL, th), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (th // CELL, th), 1)
    a_row = (rr // CELL == gr).astype(jnp.float32)          # (th/32, th)
    gc = jax.lax.broadcasted_iota(jnp.int32, (wc // CELL, wc), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (wc // CELL, wc), 1)
    a_col = (cc // CELL == gc).astype(jnp.float32)          # (wc/32, wc)
    cell = jnp.dot(
        jnp.dot(a_row, mask_f, preferred_element_type=jnp.float32),
        a_col.T, preferred_element_type=jnp.float32,
    )                                                       # (th/32, wc/32)
    back = jnp.dot(
        jnp.dot(a_row.T, cell, preferred_element_type=jnp.float32),
        a_col, preferred_element_type=jnp.float32,
    )                                                       # (th, wc)
    return back


def _arc(m):
    """Wraparound >=FAST_ARC contiguous run over 16 ring bits packed in an
    int32 map (same reduction as ops.orb._has_arc)."""
    dup = m | (m << 16)
    run = dup
    for k in range(1, FAST_ARC):
        run = run & (dup >> k)
    return (run & jnp.int32(0xFFFF)) != 0


def _make_kernel(H: int, W: int, Wc: int, WP: int, th_hi: float,
                 th_lo: float, border: int, th: int):
    ring = [(int(dx), int(dy)) for dx, dy in np.asarray(FAST_RING)]

    def kernel(p_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * th, th + 2 * HALO), :], scratch, sem
        )
        dma.start()
        dma.wait()
        center = scratch[HALO:HALO + th, HALO:HALO + Wc]
        zero = jnp.zeros_like(center)
        m_hb = jnp.zeros(center.shape, jnp.int32)
        m_hd = jnp.zeros(center.shape, jnp.int32)
        m_lb = jnp.zeros(center.shape, jnp.int32)
        m_ld = jnp.zeros(center.shape, jnp.int32)
        s_hb = zero
        s_hd = zero
        s_lb = zero
        s_ld = zero
        for k, (dx, dy) in enumerate(ring):
            d = scratch[HALO + dy:HALO + dy + th,
                        HALO + dx:HALO + dx + Wc] - center
            m_hb = m_hb | ((d > th_hi).astype(jnp.int32) << k)
            m_hd = m_hd | ((d < -th_hi).astype(jnp.int32) << k)
            m_lb = m_lb | ((d > th_lo).astype(jnp.int32) << k)
            m_ld = m_ld | ((d < -th_lo).astype(jnp.int32) << k)
            s_hb = s_hb + jnp.maximum(d - th_hi, 0.0)
            s_hd = s_hd + jnp.maximum(-d - th_hi, 0.0)
            s_lb = s_lb + jnp.maximum(d - th_lo, 0.0)
            s_ld = s_ld + jnp.maximum(-d - th_lo, 0.0)
        score_hi = jnp.maximum(s_hb, s_hd)
        score_lo = jnp.maximum(s_lb, s_ld)
        rows = i * th + jax.lax.broadcasted_iota(jnp.int32, center.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
        ok = ((rows >= border) & (rows < H - border)
              & (cols >= border) & (cols < W - border))
        corner_hi = (_arc(m_hb) | _arc(m_hd)) & ok
        corner_lo = (_arc(m_lb) | _arc(m_ld)) & ok
        use_hi = _cell_matmul_any(
            corner_hi.astype(jnp.float32), th, Wc) > 0.0
        masked = jnp.where(
            use_hi,
            jnp.where(corner_hi, score_hi, 0.0),
            jnp.where(corner_lo, score_lo, 0.0),
        )
        out_ref[:] = masked

    return kernel


def _make_blur_moments_kernel(Wc: int, kb: np.ndarray, kh: np.ndarray,
                              kv: np.ndarray, r: int, MHALO: int):
    """Stripe kernel emitting (blur, m10, m01) from one image read.

    kb: (7,) Gaussian taps; kh/kv: (2r, 31) horizontal/vertical moment
    factors (see ops.orb.ic_moment_maps — channels [0, r) produce m10,
    [r, 2r) produce m01). Accumulation order matches the jnp formulation
    exactly (channel-outer, tap-inner ascending), so results are
    bit-identical where the jnp path's edge padding applies.
    """
    ksz = kh.shape[1]
    kbs = kb.shape[0]
    bh = kbs // 2            # blur half-width
    p = ksz // 2             # moment half-width

    def kernel(p_hbm, blur_ref, m10_ref, m01_ref, scratch, mid, sem):
        # Accumulate through VMEM refs, not SSA chains: the fully-unrolled
        # 2r*2*31-tap multiply-add graph left hundreds of stripe-sized
        # temporaries live in Mosaic's stack allocator (~105 MB scoped VMEM
        # at TH=64 — far over the 16 MB/core budget). Every store below
        # retires its temporaries, bounding the live set to ~3 stripes.
        # The read-modify-write order reproduces the SSA chains' float
        # association exactly (0 + x == x and a*k == k*a bitwise), so
        # results stay bit-identical to the jnp formulation.
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            p_hbm.at[pl.ds(i * TH, TH + 2 * MHALO), :], scratch, sem
        )
        dma.start()
        dma.wait()

        def hpass(taps, half):
            """Horizontal tap sum over all scratch rows into ``mid``."""
            mid[:] = float(taps[0]) * scratch[:, MHALO - half:MHALO - half + Wc]
            for t in range(1, len(taps)):
                mid[:] = mid[:] + float(taps[t]) * scratch[
                    :, MHALO - half + t:MHALO - half + t + Wc]

        def vpass(taps, half, out_ref, first: bool):
            """Vertical tap sum of ``mid`` accumulated into ``out_ref``.

            first=True starts the chain as sl*k (the jnp path's acc=None
            arm); otherwise every tap is out += k*sl, continuing the
            cross-channel chain like the jnp path's zeros-init accumulator.
            The one non-bitwise case is signed zeros: a negative tap times
            +0.0 yields -0.0 here where 0 + k*sl yields +0.0 — numerically
            equal (-0.0 == 0.0), so downstream comparisons are unaffected.
            """
            for t in range(len(taps)):
                sl = mid[MHALO - half + t:MHALO - half + t + TH, :]
                if first and t == 0:
                    out_ref[:] = sl * float(taps[t])
                else:
                    out_ref[:] = out_ref[:] + float(taps[t]) * sl

        hpass(kb, bh)
        vpass(kb, bh, blur_ref, first=True)
        for c in range(r):
            hpass(kh[c], p)
            vpass(kv[c], p, m10_ref, first=(c == 0))
        for c in range(r):
            hpass(kh[r + c], p)
            vpass(kv[r + c], p, m01_ref, first=(c == 0))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("half_patch", "ksize", "sigma", "interpret")
)
def blur_and_moments(img, *, half_patch: int = 15, ksize: int = 7,
                     sigma: float = 2.0, interpret: bool = False):
    """(H, W) f32 -> (blur, m10, m01), each (Hp, Wc), one image read.

    Replaces ops.image.gaussian_blur + ops.orb.ic_moment_maps for the
    extractor hot path; values match them to f32 rounding (~1e-6 relative
    — same edge-replicate padding and accumulation order, but fused
    multiply-adds associate differently). The pad region holds junk that
    downstream never samples (keypoints live >= edge_threshold inside the
    image).
    """
    from .orb import _ic_moment_factors  # shared factors: bitwise parity
    from .image import _gaussian_kernel_1d

    H, W = img.shape
    MHALO = half_patch + 1                       # 16: covers blur halo too
    Hp = _round_up(H, TH)
    Wc = _round_up(W, CELL)
    WP = _round_up(Wc + 2 * MHALO, 128)
    p = jnp.pad(img, ((MHALO, MHALO + (Hp - H)), (MHALO, WP - W - MHALO)),
                mode="edge")
    uy, vx = _ic_moment_factors(half_patch)
    r = vx.shape[0]
    kh = np.concatenate([vx, uy.T], 0)           # (2r, 31) horizontal taps
    kv = np.concatenate([uy.T, vx], 0)           # (2r, 31) vertical taps
    kb = _gaussian_kernel_1d(ksize, sigma)
    kernel = _make_blur_moments_kernel(Wc, kb, kh, kv, r, MHALO)
    interpret = interpret or FORCE_INTERPRET
    out = jax.ShapeDtypeStruct((Hp, Wc), img.dtype)
    spec = pl.BlockSpec((TH, Wc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(Hp // TH,),
        out_shape=(out, out, out),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(spec, spec, spec),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * MHALO, WP), img.dtype),
            pltpu.VMEM((TH + 2 * MHALO, Wc), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(p)


@functools.partial(
    jax.jit,
    static_argnames=("th_hi", "th_lo", "border", "interpret"),
)
def masked_corner_score(img, *, th_hi: float, th_lo: float, border: int,
                        interpret: bool = False):
    """(H, W) f32 image -> (Hp, Wc) masked two-threshold FAST score map.

    Hp = round_up(H, 64), Wc = round_up(W, 32); the pad area is zero (no
    candidates), matching the pad-to-cell-multiple in
    ops.orb._select_level_keypoints. Requires border >= HALO so that halo
    pixels can never become candidates.
    """
    H, W = img.shape
    assert border >= HALO
    Hp = _round_up(H, TH)  # keep the pad multiple of 64: callers (and the
    # jnp path) pad score maps to 64-row multiples
    Wc = _round_up(W, CELL)
    WP = _round_up(Wc + 2 * HALO, 128)
    p = jnp.zeros((Hp + 2 * HALO, WP), img.dtype)
    p = jax.lax.dynamic_update_slice(p, img, (HALO, HALO))
    th = TH_CORNER  # single source for the kernel's stripe height and the
    # grid/spec/scratch shapes below — they must agree.
    kernel = _make_kernel(H, W, Wc, WP, float(th_hi), float(th_lo), border,
                          th)
    interpret = interpret or FORCE_INTERPRET
    return pl.pallas_call(
        kernel,
        grid=(Hp // th,),
        out_shape=jax.ShapeDtypeStruct((Hp, Wc), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, Wc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, WP), img.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(p)
