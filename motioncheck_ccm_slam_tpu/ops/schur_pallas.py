"""Fused Schur-complement matvec as a Pallas TPU kernel pair.

The matrix-free GBA's PCG sweep (parallel/sharded_ba._gba_iteration_cm)
costs ~15 ms on a v5e at the server operating point (2048 KFs, 65k
landmarks, 2M observations); ~11.5 ms of that is two per-observation
random gathers (v -> obs and u -> obs, ~5.7 ms each — measured
per-row-issue bound, tools/bench_gather_fusion.py) plus two (3,O)
cumsums. XLA-level alternatives (optimization barriers, layout changes,
one-hot matmul scans, diff-cumsum expansion) all land within 15% of the
gather because the (·,O)-sized intermediates they materialize dominate.

This kernel pair keeps every intermediate in VMEM and re-expresses both
"gathers" as MXU matmuls against tiny one-hot matrices:

- observations are laid out in LANDMARK-ALIGNED TILES: tile t holds all
  (padded) observations of landmarks [128t, 128(t+1)), sorted; every
  landmark window is then a STATIC (8,128) block — no dynamic slicing,
  no scatter, no cumsum.
- the camera lookup v[cam(o)] becomes res = V_packed.T @ onehot(c & 127)
  — one (96,128)@(128,TP) matmul — followed by a 16-way masked select
  on the camera's high bits (cameras form NG=C/128 groups of 128; the
  matmul computes every group's candidate, the select keeps the right
  one). The one-hot is exact 0/1, V is split hi+lo bf16 (~2^-17 relative
  — inside the PCG forcing tolerance; the LM cost gate re-evaluates
  exactly).
- the landmark reduce/expand use the tile-local one-hot of (lm & 127):
  u_part = wtv @ onehot.T and ug = u_tile @ onehot — small exact f32
  MXU contractions.

Kernel A emits u = Hll_inv @ (sum_obs W^T v[cam]) per landmark block;
kernel B consumes u and emits the group-packed camera reduction
w_pack[g*6+i, lo] = sum_{o: cam(o)=g*128+lo} (W ug)[i,o]. The caller
unpacks w_pack and forms S v = Hcc_d v - w.

Reference semantics: the Schur product of Optimizer::MapFusionGBA's
reduced camera system (reference src/Optimizer.cpp:646); layout and
tiling are original to this TPU design.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook (mirrors ops.fast_pallas.FORCE_INTERPRET)
FORCE_INTERPRET = False

LM_BLOCK = 128          # landmarks per tile (one lane span)
CAM_GROUP = 128         # cameras per one-hot group


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class SchurPlan(NamedTuple):
    """Host-built, per-problem static plan for the tiled matvec.

    ``perm`` maps padded-tile slots to positions in the LANDMARK-SORTED
    observation stream (O == "sorted" order used by _gba_iteration_cm);
    pad slots map to O (one synthetic zero slot). All index arrays are
    device-resident and reused across every sweep and LM iteration.
    """

    ntl: int                # number of landmark tiles (L_pad / 128)
    TP: int                 # padded observations per tile
    n_groups: int           # camera groups (C_pad / 128)
    L_pad: int
    perm: jax.Array         # (ntl*TP,) i32 into sorted stream (pad -> O)
    camid: jax.Array        # (1, ntl*TP) i32, pad -> 0
    lmloc: jax.Array        # (1, ntl*TP) i32 tile-local lm id, pad -> 0


# Above this per-tile padded width the one-hot scratch would stress VMEM
# (oh bf16 + res f32 ~ 10 MB at 16k) — the caller falls back to the XLA
# gather formulation. A width this large only arises from pathological
# degree skew; real maps sit well below it.
MAX_TP = 16384
# Kernel A's VMEM working set scales with BOTH the tile width and the
# camera count: oh_scr (128,TP) bf16 + res_scr (n_groups*6,TP) f32 +
# the (18,TP) W block + misc f32 temporaries. Budget it explicitly so a
# large C (4096+ cameras) with a wide TP takes the documented XLA
# fallback instead of failing at compile.
VMEM_BUDGET_BYTES = 12 * 2 ** 20


def _plan_vmem_bytes(TP: int, n_groups: int) -> int:
    return (256 + 72 + 128 + 24 * n_groups) * TP


def build_schur_plan(lm_sorted: np.ndarray, cam_sorted: np.ndarray,
                     C: int, L: int, valid_sorted: np.ndarray = None,
                     lpad_multiple: int = 1):
    """lm_sorted: (O,) landmark id per sorted-stream position
    (nondecreasing); cam_sorted: (O,) camera id per sorted position;
    valid_sorted: optional (O,) bool — INVALID observations are omitted
    from the plan entirely (exact: their weights are zero, so they
    contribute nothing to any reduction). The product's observation
    stream parks every empty feature slot at landmark 0
    (map_state.gather_observations), so without the filter tile 0 would
    hold millions of dead slots and the padded tile width would explode.

    ``lpad_multiple``: pad L_pad to a multiple of LM_BLOCK*lpad_multiple so
    the tile axis divides evenly across a device mesh of that size.

    Returns None when the padded tile width would exceed MAX_TP.
    """
    lm_sorted = np.asarray(lm_sorted, np.int64)
    cam_sorted = np.asarray(cam_sorted, np.int64)
    O = lm_sorted.shape[0]
    if valid_sorted is not None:
        keep = np.flatnonzero(np.asarray(valid_sorted, bool))
    else:
        keep = np.arange(O, dtype=np.int64)
    lm_k = lm_sorted[keep]
    cam_k = cam_sorted[keep]
    L_pad = _round_up(max(L, 1), LM_BLOCK * max(lpad_multiple, 1))
    ntl = L_pad // LM_BLOCK
    counts = np.bincount(lm_k, minlength=L_pad)
    bounds = np.zeros(L_pad + 1, np.int64)
    bounds[1:] = np.cumsum(counts)
    tile_counts = bounds[LM_BLOCK::LM_BLOCK] - bounds[:-LM_BLOCK:LM_BLOCK]
    TP = int(_round_up(max(int(tile_counts.max()) if ntl else 1, 1), 128))
    n_groups_chk = _round_up(max(C, 1), CAM_GROUP) // CAM_GROUP
    if TP > MAX_TP or _plan_vmem_bytes(TP, n_groups_chk) > VMEM_BUDGET_BYTES:
        return None
    OP = ntl * TP
    perm = np.full((ntl, TP), O, np.int64)
    camid = np.zeros((ntl, TP), np.int32)
    lmloc = np.zeros((ntl, TP), np.int32)
    for t in range(ntl):
        s, e = bounds[t * LM_BLOCK], bounds[(t + 1) * LM_BLOCK]
        n = e - s
        perm[t, :n] = keep[s:e]
        camid[t, :n] = cam_k[s:e]
        lmloc[t, :n] = lm_k[s:e] - t * LM_BLOCK
    n_groups = _round_up(max(C, 1), CAM_GROUP) // CAM_GROUP
    return SchurPlan(
        ntl=ntl, TP=TP, n_groups=n_groups, L_pad=L_pad,
        perm=jnp.asarray(perm.reshape(-1).astype(np.int32)),
        camid=jnp.asarray(camid.reshape(1, -1)),
        lmloc=jnp.asarray(lmloc.reshape(1, -1)),
    )


def pack_w(plan: SchurPlan, Wl_t):
    """(6,3,O) sorted-stream W -> (18, ntl*TP) padded tile stream in the
    kernels' J-MAJOR row order (row j*6+i holds W[i,j]): the landmark
    index j varies slowest so the sweep kernels consume W in full
    (6,TP)/(18,TP) blocks instead of (1,TP) rows.

    One (18, OP) gather per LM ITERATION (pad slots read a zero column),
    amortized over every PCG sweep of that iteration.
    """
    W18 = Wl_t.transpose(1, 0, 2).reshape(18, -1)
    W18z = jnp.concatenate([W18, jnp.zeros((18, 1), W18.dtype)], axis=1)
    return W18z[:, plan.perm]


def _wtv_jm(w18, v_sel, TP):
    """wtv[j] = sum_i W[i,j] v[i] on the J-MAJOR W stream (row j*6+i =
    W[i,j]): one full-width (18,TP) multiply + three 6-row sublane
    reductions — replaces 18 (1,TP) multiply-adds (1/8 VPU width)."""
    v6 = jnp.concatenate(v_sel, axis=0)                   # (6, TP)
    prod = w18 * jnp.concatenate([v6, v6, v6], axis=0)    # (18, TP)
    return jnp.concatenate(
        [jnp.sum(prod[j * 6:(j + 1) * 6], axis=0, keepdims=True)
         for j in range(3)], axis=0)                      # (3, TP)


def _wu_jm(w18, ug, TP):
    """rows6[i] = sum_j W[i,j] ug[j] on the J-MAJOR W stream: one
    full-width multiply + two adds of aligned (6,TP) slabs."""
    ug18 = jnp.concatenate(
        [jnp.broadcast_to(ug[j:j + 1, :], (6, TP)) for j in range(3)],
        axis=0)
    prod = w18 * ug18                                     # (18, TP)
    return prod[0:6] + prod[6:12] + prod[12:18]           # (6, TP)


def _kernel_a(camid_ref, lmloc_ref, w_ref, vhi_ref, vlo_ref, hll_ref,
              u_ref, oh_scr, res_scr):
    TP = camid_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CAM_GROUP, TP), 0)
    cam = camid_ref[0, :]
    lo = (cam & (CAM_GROUP - 1))[None, :]
    # camera one-hot, (128, TP), exact 0/1 in bf16
    oh_scr[:] = (lane == lo).astype(jnp.bfloat16)
    # all camera groups' candidate rows: (NG*6, TP)
    res_scr[:] = (
        jnp.dot(vhi_ref[:], oh_scr[:], preferred_element_type=jnp.float32)
        + jnp.dot(vlo_ref[:], oh_scr[:], preferred_element_type=jnp.float32)
    )
    g = (cam >> 7)[None, :]
    ng = vhi_ref.shape[0] // 6
    v_sel = _expand_cam_rows(res_scr[:], g, ng, 6, TP)
    wtv = _wtv_jm(w_ref[:], v_sel, TP)                       # (3, TP)
    # landmark one-hot (tile-local), then u_part = wtv @ oh_lm^T.
    # Default-precision TPU dots round f32 operands to bf16 (this
    # silently corrupted the first on-chip run); Precision.HIGHEST costs
    # ~6 emulation passes. Instead the DATA operand rides an explicit
    # hi+lo bf16 split against the exact 0/1 bf16 one-hot — two
    # full-rate dots, ~2^-17 relative (PCG-internal: inside the forcing
    # tolerance; the LM cost gate re-evaluates exactly).
    lml = lmloc_ref[0, :][None, :]
    lm_lane = jax.lax.broadcasted_iota(jnp.int32, (LM_BLOCK, TP), 0)
    oh_lm = (lm_lane == lml).astype(jnp.bfloat16)            # (128, TP)
    dn = (((1,), (1,)), ((), ()))
    wtv_hi = wtv.astype(jnp.bfloat16)
    wtv_lo = (wtv - wtv_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    u_part = (
        jax.lax.dot_general(wtv_hi, oh_lm, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(wtv_lo, oh_lm, dn,
                              preferred_element_type=jnp.float32)
    )                                                        # (3, 128)
    # per-landmark 3x3 solve: u = Hll_inv @ u_part (hll rows are the 9
    # block entries, landmark on lanes)
    out = []
    for i in range(3):
        acc = hll_ref[i * 3, :][None, :] * u_part[0, :][None, :]
        for j2 in range(1, 3):
            acc = acc + (hll_ref[i * 3 + j2, :][None, :]
                         * u_part[j2, :][None, :])
        out.append(acc)
    zeros = jnp.zeros((8 - 3, LM_BLOCK), jnp.float32)
    u_ref[:] = jnp.concatenate(out + [zeros], axis=0)


def _kernel_b(camid_ref, lmloc_ref, w_ref, u_ref, out_ref):
    # out_ref has a constant index map: the block stays resident in VMEM
    # across the whole grid and is flushed once at the end — it IS the
    # accumulator.
    t = pl.program_id(0)
    TP = camid_ref.shape[1]

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # expand u to observations: ug = u_tile @ oh_lm  ((3,128)@(128,TP)).
    # hi+lo bf16 split of u against the 0/1 bf16 one-hot (see kernel A's
    # precision note) — two full-rate dots, ~2^-17 relative.
    lml = lmloc_ref[0, :][None, :]
    lm_lane = jax.lax.broadcasted_iota(jnp.int32, (LM_BLOCK, TP), 0)
    oh_lm = (lm_lane == lml).astype(jnp.bfloat16)            # (128, TP)
    u3 = u_ref[0:3, :]
    u_hi = u3.astype(jnp.bfloat16)
    u_lo = (u3 - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    ug = (jnp.dot(u_hi, oh_lm, preferred_element_type=jnp.float32)
          + jnp.dot(u_lo, oh_lm, preferred_element_type=jnp.float32))
    rows6 = _wu_jm(w_ref[:], ug, TP)                         # (6, TP)
    # camera reduce, group-packed and GROUP-FUSED: the masked rows of a
    # GCHUNK of groups are stacked into one operand so the MXU contraction
    # runs at M = GCHUNK*6 instead of 6 (the per-group skinny dots were
    # M-bound — measured ~2.6x on the round-4 sweep)
    cam = camid_ref[0, :]
    oh = _cam_onehot(cam, TP)
    ng = out_ref.shape[0] // 6
    _cam_reduce_acc(rows6, cam, oh, out_ref, ng, TP)


def _kernel_c(camid_ref, lmloc_ref, t0_ref, t1_ref, t2_ref, x8_ref,
              out_ref):
    """Materialize the sorted-side per-observation streams: camera table
    rows (9 R entries + 3 t entries, three-term bf16 split -> f32-exact)
    expanded by the camera one-hot, landmark positions expanded by the
    tile-local one-hot. Replaces 15 per-row HBM gathers per LM iteration.
    """
    TP = camid_ref.shape[1]
    cam = camid_ref[0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CAM_GROUP, TP), 0)
    lo = (cam & (CAM_GROUP - 1))[None, :]
    oh = (lane == lo).astype(jnp.bfloat16)                    # (128, TP)
    res = (
        jnp.dot(t0_ref[:], oh, preferred_element_type=jnp.float32)
        + jnp.dot(t1_ref[:], oh, preferred_element_type=jnp.float32)
        + jnp.dot(t2_ref[:], oh, preferred_element_type=jnp.float32)
    )                                                         # (NG*12, TP)
    g = (cam >> 7)[None, :]
    ng = t0_ref.shape[0] // 12
    rows = []
    for r in range(12):
        acc = jnp.zeros((1, TP), jnp.float32)
        for gi in range(ng):
            m = (g == gi).astype(jnp.float32)
            acc = acc + m * res[gi * 12 + r, :][None, :]
        rows.append(acc)
    # landmark expand: X is the LINEARIZATION POINT, so it rides a
    # THREE-term bf16 split (~2^-24: f32 roundoff) against the 0/1
    # one-hot — three full-rate dots (Precision.HIGHEST would emulate
    # f32 at ~6x; default precision silently rounds operands to bf16)
    lml = lmloc_ref[0, :][None, :]
    lm_lane = jax.lax.broadcasted_iota(jnp.int32, (LM_BLOCK, TP), 0)
    oh_lm = (lm_lane == lml).astype(jnp.bfloat16)             # (128, TP)
    x3 = x8_ref[0:3, :]
    x_a = x3.astype(jnp.bfloat16)
    r1x = x3 - x_a.astype(jnp.float32)
    x_b = r1x.astype(jnp.bfloat16)
    x_c = (r1x - x_b.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = (jnp.dot(x_a, oh_lm, preferred_element_type=jnp.float32)
          + jnp.dot(x_b, oh_lm, preferred_element_type=jnp.float32)
          + jnp.dot(x_c, oh_lm, preferred_element_type=jnp.float32))
    zero = jnp.zeros((1, TP), jnp.float32)
    out_ref[:] = jnp.concatenate(rows + [xg, zero], axis=0)   # (16, TP)


def expand_sorted_streams(plan: SchurPlan, Tcw, Xw, *,
                          interpret: bool = False):
    """(C,4,4) poses + (L,3) landmarks -> (16, ntl*TP) padded sorted
    streams: rows 0-8 = R (row-major), 9-11 = t, 12-14 = X, 15 = 0.

    The camera table rides a THREE-term bf16 split (error ~2^-24: f32
    roundoff) so the linearization point matches the gather formulation;
    the landmark expand is exact 0/1 f32.
    """
    interpret = (interpret or FORCE_INTERPRET
                 or jax.default_backend() != "tpu")
    C = Tcw.shape[0]
    L = Xw.shape[0]
    ng = plan.n_groups
    TP, ntl = plan.TP, plan.ntl
    C_pad = ng * CAM_GROUP
    tab = jnp.concatenate([
        Tcw[:, :3, :3].reshape(C, 9), Tcw[:, :3, 3]], axis=1)  # (C,12)
    tab = jnp.pad(tab, ((0, C_pad - C), (0, 0)))
    T_all = tab.reshape(ng, CAM_GROUP, 12).transpose(0, 2, 1).reshape(
        ng * 12, CAM_GROUP)
    t0 = T_all.astype(jnp.bfloat16)
    r1 = T_all - t0.astype(jnp.float32)
    t1 = r1.astype(jnp.bfloat16)
    t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)
    X8 = jnp.zeros((8, plan.L_pad), Xw.dtype)
    X8 = jax.lax.dynamic_update_slice(X8, Xw.T, (0, 0))

    tile = lambda i: (0, i)
    spec_obs = pl.BlockSpec((1, TP), tile, memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_c,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((16, ntl * TP), jnp.float32),
        in_specs=[spec_obs, spec_obs, full, full, full,
                  pl.BlockSpec((8, LM_BLOCK), tile,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, TP), tile, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plan.camid, plan.lmloc, t0, t1, t2, X8)
    R_l = out[0:9].reshape(3, 3, ntl * TP)
    t_l = out[9:12]
    X_l = out[12:15]
    return R_l, t_l, X_l


def apply_a(plan: SchurPlan, Wp, v, Hll_inv9, *, interpret: bool = False):
    """Kernel A alone: u (8, L_pad) = Hll_inv @ sum_obs W^T v[cam].

    Rows 0-2 hold the result (the back-substitution's W^T-side product);
    rows 3-7 are zero padding.
    """
    interpret = (interpret or FORCE_INTERPRET
                 or jax.default_backend() != "tpu")
    C = v.shape[0]
    ng = plan.n_groups
    TP, ntl = plan.TP, plan.ntl
    vhi, vlo = pack_v(v, ng)

    tile = lambda i: (0, i)
    spec_obs = pl.BlockSpec((1, TP), tile, memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((18, TP), tile, memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_a,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((8, plan.L_pad), jnp.float32),
        in_specs=[spec_obs, spec_obs, spec_w, full, full,
                  pl.BlockSpec((9, LM_BLOCK), tile,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, LM_BLOCK), tile,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((CAM_GROUP, TP), jnp.bfloat16),
            pltpu.VMEM((ng * 6, TP), jnp.float32),
        ],
        interpret=interpret,
    )(plan.camid, plan.lmloc, Wp, vhi, vlo, Hll_inv9)


def apply_b(plan: SchurPlan, Wp, u8, C: int, *, interpret: bool = False):
    """Kernel B alone: w (C, 6) = per-camera sum of W @ u8[lm].

    u8: (8, L_pad) with the landmark 3-vectors in rows 0-2 (kernel A's
    output layout).
    """
    interpret = (interpret or FORCE_INTERPRET
                 or jax.default_backend() != "tpu")
    ng = plan.n_groups
    TP, ntl = plan.TP, plan.ntl
    C_pad = ng * CAM_GROUP
    tile = lambda i: (0, i)
    spec_obs = pl.BlockSpec((1, TP), tile, memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((18, TP), tile, memory_space=pltpu.VMEM)
    w_pack = pl.pallas_call(
        _kernel_b,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((ng * 6, CAM_GROUP), jnp.float32),
        in_specs=[spec_obs, spec_obs, spec_w,
                  pl.BlockSpec((8, LM_BLOCK), tile,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ng * 6, CAM_GROUP), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plan.camid, plan.lmloc, Wp, u8)
    return w_pack.reshape(ng, 6, CAM_GROUP).transpose(0, 2, 1).reshape(
        C_pad, 6)[:C]


def schur_apply(plan: SchurPlan, Wp, v, Hll_inv9, *, interpret: bool = False):
    """One fused W Hll^-1 W^T v product.

    Wp: (18, ntl*TP) padded tile stream. v: (C, 6). Hll_inv9: (9, L_pad).
    Returns w: (C, 6) == sum_obs W_o Hll_inv W_o^T v aggregated per
    camera. Caller forms S v = Hcc_d v - w.
    """
    u = apply_a(plan, Wp, v, Hll_inv9, interpret=interpret)
    return apply_b(plan, Wp, u, v.shape[0], interpret=interpret)


# ---------------------------------------------------------------------------
# Fully-fused tile-stream GBA kernels (round 5)
#
# The round-4 LM iteration was assembly-bound: the dual-layout formulation
# still streamed ~40 (., O)-sized intermediates (Jacobian rows, block
# products, reshape-sums, cumsums) through HBM per iteration, ~290 ms at the
# server operating point vs ~4 ms per PCG sweep. These kernels compute the
# ENTIRE linearization in VMEM on the padded landmark-tile stream:
#
#   D1 (assemble):  camid/lmloc/uv/is2/valid/free + pose tables + X tiles
#                   -> W (18,OP), per-obs aux stats (rho/inlier/chi2),
#                      landmark-reduced Hll+bl (12, L_pad), camera-reduced
#                      Hcc+bc accumulator (ng*27, 128).
#   D2 (precond):   W + Hll_inv -> camera-reduced true-Schur-diagonal
#                   correction (ng*21, 128).
#   D0 (cost):      pose tables + X tiles -> robust-cost scalar (kernel
#                   micro-bench / standalone cost only: the LM loop prices
#                   candidates with D1 itself — speculative linearization,
#                   sharded_ba._tile_iteration).
#   S  (sweep):     W + v -> per-camera W Hll^-1 W^T v in ONE pass (kernels
#                   A and B fused; u never leaves VMEM).
#
# The W stream and all slab products use the J-MAJOR row order (row
# j*6+i = W[i,j], see pack_w) so the VPU operates on full (18,TP)/(6,TP)
# blocks instead of (1,TP) rows.
#
# Per-observation data never re-enters HBM between "gather", "Jacobian",
# "product" and "reduce" stages; the only large HBM arrays per iteration are
# the W stream written once by D1 and read by D2/S. Camera reductions use a
# GROUP-FUSED one-hot contraction: the per-group masked rows are stacked
# into one (chunk*R, TP) operand so the MXU sees M ~ 100 instead of
# M = 6 -- the round-4 kernel-B group loop issued 2*ng skinny dots per tile
# and was M-bound.
#
# Sharding: tiles are LANDMARK-ALIGNED, so splitting the grid over a device
# mesh along the tile axis makes every landmark-side quantity (Hll, bl,
# Hll_inv, u, dl) shard-local; only the (C,6)-sized camera reductions and
# scalar costs need a psum. parallel/sharded_ba builds exactly that.
#
# Reference semantics: the inner linearization of Optimizer::MapFusionGBA
# (reference src/Optimizer.cpp:646) -- residual/Jacobian/Huber per
# g2o::EdgeSE3ProjectXYZ, left-multiplicative se3, b = -J^T W r.
# ---------------------------------------------------------------------------

# Hcc / S66 are symmetric: only the upper triangle is reduced.
PAIRS6 = [(i, j) for i in range(6) for j in range(i, 6)]   # 21
D1_CAM_ROWS = len(PAIRS6) + 6      # 21 Hcc + 6 bc
D2_CAM_ROWS = len(PAIRS6)          # 21 S66
GCHUNK = 4                         # camera groups per fused reduce chunk
HUBER_DELTA = 2.447                # sqrt(5.991) -- ba_core.HUBER_DELTA


def _split2(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _cam_onehot(cam, TP):
    lane = jax.lax.broadcasted_iota(jnp.int32, (CAM_GROUP, TP), 0)
    return (lane == (cam & (CAM_GROUP - 1))[None, :]).astype(jnp.bfloat16)


def _lm_onehot(lml, TP):
    lane = jax.lax.broadcasted_iota(jnp.int32, (LM_BLOCK, TP), 0)
    return (lane == lml[None, :]).astype(jnp.bfloat16)


def _expand_cam_rows(res, g, ng, R, TP):
    """res (R*ng, TP), row r*ng + gi (COMPONENT-MAJOR packing, see
    pack_v/pose_tables) -> R rows (1,TP): out[r][o] = res[r*ng+g(o), o].

    Groups are selected in sublane blocks of 8: the per-group (1,TP)
    mask-accumulate form used 1/8 of the VPU; masking a contiguous
    (8,TP) block of candidates and sublane-reducing runs at full width.
    Masks are built once and shared across all R components."""
    blocks = [(k, min(8, ng - k)) for k in range(0, ng, 8)]
    masks = []
    for k, nb in blocks:
        iota = jax.lax.broadcasted_iota(jnp.int32, (nb, TP), 0)
        masks.append((g - k == iota).astype(jnp.float32))       # (nb, TP)
    rows = []
    for r in range(R):
        acc = None
        for (k, nb), m in zip(blocks, masks):
            part = jnp.sum(res[r * ng + k:r * ng + k + nb, :] * m,
                           axis=0, keepdims=True)
            acc = part if acc is None else acc + part
        rows.append(acc)
    return rows


def _cam_reduce_acc(rows, cam, oh, acc_ref, ng, TP):
    """Group-fused camera reduction of ``rows`` (list of (1,TP) f32 rows,
    or an already-stacked (R,TP) array) into the resident accumulator
    acc_ref (ng*R, 128): row g*R+r holds
    sum_{o: cam(o) = g*128+lo} rows[r][o] at lane lo. Exact to the
    two-term bf16 split (~2^-17 relative; 0/1 one-hot and masks are exact).
    The caller zeroes acc_ref at grid step 0 (pl.when).
    """
    if isinstance(rows, (list, tuple)):
        stack = jnp.concatenate(rows, axis=0)                # (R, TP) f32
    else:
        stack = rows
    R = stack.shape[0]
    hi, lo_ = _split2(stack)
    g = (cam >> 7)[None, :]
    dn = (((1,), (1,)), ((), ()))
    for g0 in range(0, ng, GCHUNK):
        gs = range(g0, min(g0 + GCHUNK, ng))
        mh = jnp.concatenate(
            [hi * (g == gi).astype(jnp.bfloat16) for gi in gs], axis=0)
        ml = jnp.concatenate(
            [lo_ * (g == gi).astype(jnp.bfloat16) for gi in gs], axis=0)
        part = (
            jax.lax.dot_general(mh, oh, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ml, oh, dn,
                                  preferred_element_type=jnp.float32)
        )                                                    # (chunk*R, 128)
        sl = slice(g0 * R, (g0 + len(list(gs))) * R)
        acc_ref[sl, :] = acc_ref[sl, :] + part


def _pose_point_streams(camid_ref, lmloc_ref, t0_ref, t1_ref, t2_ref,
                        x8_ref, res_scr):
    """Shared expansion: camera table rows (9 R + 3 t, THREE-term bf16
    split -> f32-exact) and landmark positions (rows 0-2 of the x8 tile
    block) per observation slot. Returns (R rows[9], t rows[3],
    X rows[3], oh_cam, oh_lm, cam)."""
    TP = camid_ref.shape[1]
    cam = camid_ref[0, :]
    oh = _cam_onehot(cam, TP)
    res_scr[:] = (
        jnp.dot(t0_ref[:], oh, preferred_element_type=jnp.float32)
        + jnp.dot(t1_ref[:], oh, preferred_element_type=jnp.float32)
        + jnp.dot(t2_ref[:], oh, preferred_element_type=jnp.float32)
    )
    ng = t0_ref.shape[0] // 12
    g = (cam >> 7)[None, :]
    rows = _expand_cam_rows(res_scr[:], g, ng, 12, TP)
    oh_lm = _lm_onehot(lmloc_ref[0, :], TP)
    x3 = x8_ref[0:3, :]
    x_a = x3.astype(jnp.bfloat16)
    r1 = x3 - x_a.astype(jnp.float32)
    x_b = r1.astype(jnp.bfloat16)
    x_c = (r1 - x_b.astype(jnp.float32)).astype(jnp.bfloat16)
    xg = (jnp.dot(x_a, oh_lm, preferred_element_type=jnp.float32)
          + jnp.dot(x_b, oh_lm, preferred_element_type=jnp.float32)
          + jnp.dot(x_c, oh_lm, preferred_element_type=jnp.float32))
    X = [xg[i, :][None, :] for i in range(3)]
    return rows[:9], rows[9:12], X, oh, oh_lm, cam


def _project(Rr, tr, X, uv_ref, is2_ref, valid_ref, kp_ref):
    """Reprojection pipeline on (1,TP) rows. Returns
    (pc rows[3], iz, rx, ry, chi2, w, rho, inlier, depth_f, valid).

    The R@X+t contraction runs on one (9,TP) slab (full VPU width); the
    scalar chain after it is inherently row-wise."""
    fx = kp_ref[0, 0]
    fy = kp_ref[0, 1]
    cx = kp_ref[0, 2]
    cy = kp_ref[0, 3]
    R9 = jnp.concatenate(Rr[0:9], axis=0)                    # (9, TP)
    X3 = jnp.concatenate(X, axis=0)                          # (3, TP)
    prod = R9 * jnp.concatenate([X3, X3, X3], axis=0)        # (9, TP)
    t3 = jnp.concatenate(tr, axis=0)                         # (3, TP)
    pc3 = jnp.concatenate(
        [jnp.sum(prod[3 * i:3 * i + 3], axis=0, keepdims=True)
         for i in range(3)], axis=0) + t3                    # (3, TP)
    pc0 = pc3[0:1, :]
    pc1 = pc3[1:2, :]
    pc2 = pc3[2:3, :]
    depth_f = (pc2 > 1e-6).astype(jnp.float32)
    zs = jnp.where(pc2 > 1e-6, pc2, 1.0)
    iz = 1.0 / zs
    rx = uv_ref[0, :][None, :] - (fx * pc0 * iz + cx)
    ry = uv_ref[1, :][None, :] - (fy * pc1 * iz + cy)
    is2 = is2_ref[0, :][None, :]
    valid = valid_ref[0, :][None, :]
    chi2 = (rx * rx + ry * ry) * is2
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    d = HUBER_DELTA
    hw = jnp.where(e <= d, 1.0, d / e)
    w = is2 * hw * valid * depth_f
    rho = jnp.where(e <= d, chi2, 2.0 * d * e - d * d) * valid
    inlier = valid * depth_f * (chi2 <= 5.991).astype(jnp.float32)
    return (pc0, pc1, pc2), iz, rx, ry, chi2, w, rho, inlier, depth_f


def _d1_kernel(camid_ref, lmloc_ref, uv_ref, is2_ref, valid_ref, free_ref,
               kp_ref, t0_ref, t1_ref, t2_ref, x8_ref,
               w_ref, aux_ref, hll_ref, acc_ref, res_scr):
    t = pl.program_id(0)
    TP = camid_ref.shape[1]
    ng = t0_ref.shape[0] // 12
    Rr, tr, X, oh, oh_lm, cam = _pose_point_streams(
        camid_ref, lmloc_ref, t0_ref, t1_ref, t2_ref, x8_ref, res_scr)
    pc, iz, rx, ry, chi2, w, rho, inlier, _depth = _project(
        Rr, tr, X, uv_ref, is2_ref, valid_ref, kp_ref)
    pc0, pc1, pc2 = pc
    fx = kp_ref[0, 0]
    fy = kp_ref[0, 1]
    a00 = fx * iz
    a02 = -fx * pc0 * iz * iz
    a11 = fy * iz
    a12 = -fy * pc1 * iz * iz
    # Jc = -dproj @ [-hat(pc) | I]  (2 x 6): entries are irregular, built
    # as (1,TP) rows and stacked ONCE — all downstream products then run
    # on full (k,TP) slabs instead of (1,TP) rows (1/8 VPU width)
    Jc0s = jnp.concatenate(
        [-(a02 * pc1), -(a00 * pc2 - a02 * pc0), a00 * pc1,
         -a00, jnp.zeros_like(a00), -a02], axis=0)           # (6, TP)
    Jc1s = jnp.concatenate(
        [a11 * pc2 - a12 * pc1, a12 * pc0, -a11 * pc0,
         jnp.zeros_like(a11), -a11, -a12], axis=0)           # (6, TP)
    # Jl = -dproj @ R  (2 x 3) on (3,TP) slabs
    R0s = jnp.concatenate([Rr[0], Rr[1], Rr[2]], axis=0)     # (3, TP)
    R1s = jnp.concatenate([Rr[3], Rr[4], Rr[5]], axis=0)
    R2s = jnp.concatenate([Rr[6], Rr[7], Rr[8]], axis=0)
    Jl0s = -(a00 * R0s + a02 * R2s)                          # (3, TP)
    Jl1s = -(a11 * R1s + a12 * R2s)                          # (3, TP)

    def rep(x, k):
        """(1,TP) row -> (k,TP) sublane broadcast."""
        return jnp.broadcast_to(x, (k, TP))

    def tile_rows(x, k):
        """(r,TP) slab tiled k times -> (k*r, TP)."""
        return jnp.concatenate([x] * k, axis=0)

    # W stream in J-MAJOR row order (row j*6+i = W[i,j] — see pack_w;
    # free-masked: observations of fixed entities contribute no Schur
    # coupling; their Hcc/Hll rows are overwritten host-side). One
    # (18,TP) expression: rows j*6+i = wf * (Jc0[i]Jl0[j] + Jc1[i]Jl1[j]).
    wf = w * free_ref[0, :][None, :]
    Jl0_18 = jnp.concatenate(
        [rep(Jl0s[j:j + 1], 6) for j in range(3)], axis=0)   # (18, TP)
    Jl1_18 = jnp.concatenate(
        [rep(Jl1s[j:j + 1], 6) for j in range(3)], axis=0)
    w_ref[:] = wf * (tile_rows(Jc0s, 3) * Jl0_18
                     + tile_rows(Jc1s, 3) * Jl1_18)
    aux_ref[0, :] = rho[0, :]
    aux_ref[1, :] = inlier[0, :]
    aux_ref[2, :] = chi2[0, :]
    aux_ref[3:8, :] = jnp.zeros((5, TP), jnp.float32)
    # landmark-reduced Hll (9 rows, j*3+k) + bl (3 rows): slab products,
    # then exact-split dots against the tile-local one-hot
    Jl0_9 = jnp.concatenate(
        [rep(Jl0s[j:j + 1], 3) for j in range(3)], axis=0)   # (9, TP)
    Jl1_9 = jnp.concatenate(
        [rep(Jl1s[j:j + 1], 3) for j in range(3)], axis=0)
    lm9 = w * (Jl0_9 * tile_rows(Jl0s, 3) + Jl1_9 * tile_rows(Jl1s, 3))
    bl3 = -w * (Jl0s * rx + Jl1s * ry)                       # (3, TP)
    lm_stack = jnp.concatenate([lm9, bl3], axis=0)           # (12, TP)
    hi, lo_ = _split2(lm_stack)
    dn = (((1,), (1,)), ((), ()))
    hll_ref[:] = (
        jax.lax.dot_general(hi, oh_lm, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(lo_, oh_lm, dn,
                              preferred_element_type=jnp.float32)
    )
    # camera-reduced Hcc upper triangle (21, PAIRS6 order = 6 slabs of
    # rows (i, j>=i)) + bc (6): per-slab products at (6-i, TP)
    cam_rows = [
        w * (rep(Jc0s[i:i + 1], 6 - i) * Jc0s[i:]
             + rep(Jc1s[i:i + 1], 6 - i) * Jc1s[i:])
        for i in range(6)
    ]
    cam_rows.append(-w * (Jc0s * rx + Jc1s * ry))            # bc (6, TP)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _cam_reduce_acc(jnp.concatenate(cam_rows, axis=0), cam, oh, acc_ref,
                    ng, TP)


def _d2_kernel(camid_ref, lmloc_ref, w_ref, h9_ref, acc_ref):
    """True-Schur-diagonal correction: per-camera sum of W Hll^-1 W^T
    (upper triangle), group-fused. Hll_inv expands by the tile-local
    one-hot with a two-term split (preconditioner accuracy is uncritical).
    """
    t = pl.program_id(0)
    TP = camid_ref.shape[1]
    cam = camid_ref[0, :]
    oh = _cam_onehot(cam, TP)
    oh_lm = _lm_onehot(lmloc_ref[0, :], TP)
    h_hi, h_lo = _split2(h9_ref[:])
    G = (jnp.dot(h_hi, oh_lm, preferred_element_type=jnp.float32)
         + jnp.dot(h_lo, oh_lm, preferred_element_type=jnp.float32))
    # J-MAJOR W stream: W[i,j] = w_ref[j*6+i]; all products on full
    # (6,TP)/(6-i,TP) slabs. WG[:,k] = sum_j W[:,j] G[j,k] — the W[:,j]
    # slabs w_ref[j*6:(j+1)*6] are 6-row-aligned blocks.
    w6 = [w_ref[j * 6:(j + 1) * 6, :] for j in range(3)]     # 3 x (6, TP)
    Gr = [G[k, :][None, :] for k in range(9)]
    WGs = [
        (w6[0] * jnp.broadcast_to(Gr[0 * 3 + k], (6, TP))
         + w6[1] * jnp.broadcast_to(Gr[1 * 3 + k], (6, TP))
         + w6[2] * jnp.broadcast_to(Gr[2 * 3 + k], (6, TP)))
        for k in range(3)
    ]                                                        # WGs[k][i]
    # S66 upper triangle rows (i, j>=i) = sum_k WG[i,k] W[j,k]: per-i
    # slabs of (6-i, TP) — PAIRS6 order
    rows = []
    for i in range(6):
        acc = None
        for k in range(3):
            part = (jnp.broadcast_to(WGs[k][i:i + 1, :], (6 - i, TP))
                    * w_ref[k * 6 + i:(k + 1) * 6, :])
            acc = part if acc is None else acc + part
        rows.append(acc)
    ng = acc_ref.shape[0] // D2_CAM_ROWS

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _cam_reduce_acc(rows, cam, oh, acc_ref, ng, TP)


def _d0_kernel(camid_ref, lmloc_ref, uv_ref, is2_ref, valid_ref, kp_ref,
               t0_ref, t1_ref, t2_ref, x8_ref, acc_ref, res_scr):
    """Robust cost of a (candidate) state: one masked-scalar accumulator."""
    t = pl.program_id(0)
    Rr, tr, X, _oh, _oh_lm, _cam = _pose_point_streams(
        camid_ref, lmloc_ref, t0_ref, t1_ref, t2_ref, x8_ref, res_scr)
    _pc, _iz, _rx, _ry, _chi2, _w, rho, _inl, _d = _project(
        Rr, tr, X, uv_ref, is2_ref, valid_ref, kp_ref)
    partial = jnp.sum(rho)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    upd = jnp.where((r_i == 0) & (c_i == 0), partial, 0.0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = acc_ref[:] + upd


def _s_kernel(camid_ref, lmloc_ref, w_ref, vhi_ref, vlo_ref, h9_ref,
              acc_ref, oh_scr, res_scr):
    """Fused PCG sweep: kernel A's landmark stage feeds kernel B's camera
    stage without u ever leaving VMEM (the tile is landmark-aligned, so u
    for this tile's landmarks is complete after the tile-local reduce).
    The camera reduction is group-fused (M = chunk*6, not 6)."""
    t = pl.program_id(0)
    TP = camid_ref.shape[1]
    cam = camid_ref[0, :]
    oh_scr[:] = _cam_onehot(cam, TP)
    res_scr[:] = (
        jnp.dot(vhi_ref[:], oh_scr[:], preferred_element_type=jnp.float32)
        + jnp.dot(vlo_ref[:], oh_scr[:], preferred_element_type=jnp.float32)
    )
    ng = vhi_ref.shape[0] // 6
    g = (cam >> 7)[None, :]
    v_sel = _expand_cam_rows(res_scr[:], g, ng, 6, TP)
    wtv = _wtv_jm(w_ref[:], v_sel, TP)                       # (3, TP)
    oh_lm = _lm_onehot(lmloc_ref[0, :], TP)
    dn = (((1,), (1,)), ((), ()))
    hi, lo_ = _split2(wtv)
    u_part = (
        jax.lax.dot_general(hi, oh_lm, dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(lo_, oh_lm, dn,
                              preferred_element_type=jnp.float32)
    )                                                        # (3, 128)
    u = []
    for i in range(3):
        acc = h9_ref[i * 3, :][None, :] * u_part[0, :][None, :]
        for j2 in range(1, 3):
            acc = acc + (h9_ref[i * 3 + j2, :][None, :]
                         * u_part[j2, :][None, :])
        u.append(acc)
    u3 = jnp.concatenate(u, axis=0)                          # (3, 128)
    u_hi, u_lo = _split2(u3)
    ug = (jnp.dot(u_hi, oh_lm, preferred_element_type=jnp.float32)
          + jnp.dot(u_lo, oh_lm, preferred_element_type=jnp.float32))
    rows6 = _wu_jm(w_ref[:], ug, TP)                         # (6, TP)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _cam_reduce_acc(rows6, cam, oh_scr[:], acc_ref, ng, TP)


# -- host-side wrappers ------------------------------------------------------

IU6 = np.array([p[0] for p in PAIRS6])
JU6 = np.array([p[1] for p in PAIRS6])


def _interp(interpret: bool) -> bool:
    return (interpret or FORCE_INTERPRET
            or jax.default_backend() != "tpu")


def pose_tables(Tcw, ng: int):
    """(C,4,4) poses -> three-term bf16 split camera tables (12*ng, 128):
    COMPONENT-MAJOR row r*ng+g, lane lo = component r (9 R row-major +
    3 t) of camera g*128+lo — each component's group candidates are
    contiguous so _expand_cam_rows selects on full (8,TP) blocks. Three
    terms keep the expansion f32-exact (~2^-24)."""
    C = Tcw.shape[0]
    C_pad = ng * CAM_GROUP
    tab = jnp.concatenate(
        [Tcw[:, :3, :3].reshape(C, 9), Tcw[:, :3, 3]], axis=1)
    tab = jnp.pad(tab, ((0, C_pad - C), (0, 0)))
    T_all = tab.reshape(ng, CAM_GROUP, 12).transpose(2, 0, 1).reshape(
        12 * ng, CAM_GROUP)
    t0 = T_all.astype(jnp.bfloat16)
    r1 = T_all - t0.astype(jnp.float32)
    t1 = r1.astype(jnp.bfloat16)
    t2 = (r1 - t1.astype(jnp.float32)).astype(jnp.bfloat16)
    return t0, t1, t2


def point_table(Xw_T, L_pad: int):
    """(3, L) landmark positions -> (8, L_pad) tile-sliceable table."""
    X8 = jnp.zeros((8, L_pad), Xw_T.dtype)
    return jax.lax.dynamic_update_slice(X8, Xw_T, (0, 0))


def _obs_spec(rows: int, TP: int):
    return pl.BlockSpec((rows, TP), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _lm_spec(rows: int):
    return pl.BlockSpec((rows, LM_BLOCK), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


_FULL = pl.BlockSpec(memory_space=pltpu.VMEM)
_SMEM = pl.BlockSpec(memory_space=pltpu.SMEM)


def _acc_spec(rows: int):
    """Grid-resident accumulator: constant index map, flushed once."""
    return pl.BlockSpec((rows, CAM_GROUP), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def d1_assemble(camid, lmloc, uv2, is21, valid1, free1, kp, t0, t1, t2,
                X8, *, TP: int, interpret: bool = False):
    """One fused linearization pass over the padded tile stream.

    Returns (W18 (18,OP), aux (8,OP): rho/inlier/chi2 rows,
    hllbl (12, L_pad): 9 Hll + 3 bl rows, cam_acc (ng*27, 128)).
    """
    OP = camid.shape[1]
    ntl = OP // TP
    L_pad = X8.shape[1]
    ng = t0.shape[0] // 12
    return pl.pallas_call(
        _d1_kernel,
        grid=(ntl,),
        out_shape=[
            jax.ShapeDtypeStruct((18, OP), jnp.float32),
            jax.ShapeDtypeStruct((8, OP), jnp.float32),
            jax.ShapeDtypeStruct((12, L_pad), jnp.float32),
            jax.ShapeDtypeStruct((ng * D1_CAM_ROWS, CAM_GROUP),
                                 jnp.float32),
        ],
        in_specs=[_obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(2, TP),
                  _obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(1, TP),
                  _SMEM, _FULL, _FULL, _FULL, _lm_spec(8)],
        out_specs=[_obs_spec(18, TP), _obs_spec(8, TP), _lm_spec(12),
                   _acc_spec(ng * D1_CAM_ROWS)],
        scratch_shapes=[pltpu.VMEM((ng * 12, TP), jnp.float32)],
        interpret=_interp(interpret),
    )(camid, lmloc, uv2, is21, valid1, free1, kp, t0, t1, t2, X8)


def d2_precond(camid, lmloc, W18, H9, *, TP: int, ng: int,
               interpret: bool = False):
    """Camera-reduced upper triangle of sum_obs W Hll^-1 W^T:
    (ng*21, 128)."""
    OP = camid.shape[1]
    ntl = OP // TP
    return pl.pallas_call(
        _d2_kernel,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((ng * D2_CAM_ROWS, CAM_GROUP),
                                       jnp.float32),
        in_specs=[_obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(18, TP),
                  _lm_spec(9)],
        out_specs=_acc_spec(ng * D2_CAM_ROWS),
        interpret=_interp(interpret),
    )(camid, lmloc, W18, H9)


def d0_cost(camid, lmloc, uv2, is21, valid1, kp, t0, t1, t2, X8, *,
            TP: int, interpret: bool = False):
    """Robust cost of a state over the (local) tile stream -> f32 scalar."""
    OP = camid.shape[1]
    ntl = OP // TP
    ng = t0.shape[0] // 12
    acc = pl.pallas_call(
        _d0_kernel,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((8, CAM_GROUP), jnp.float32),
        in_specs=[_obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(2, TP),
                  _obs_spec(1, TP), _obs_spec(1, TP),
                  _SMEM, _FULL, _FULL, _FULL, _lm_spec(8)],
        out_specs=_acc_spec(8),
        scratch_shapes=[pltpu.VMEM((ng * 12, TP), jnp.float32)],
        interpret=_interp(interpret),
    )(camid, lmloc, uv2, is21, valid1, kp, t0, t1, t2, X8)
    return acc[0, 0]


def pack_v(v, ng: int):
    """(C,6) -> two bf16 split operands (6*ng, 128) for kernels A/S:
    COMPONENT-MAJOR row i*ng+g, lane lo = v[g*128+lo, i] (see
    pose_tables)."""
    C = v.shape[0]
    C_pad = ng * CAM_GROUP
    vp = jnp.pad(v, ((0, C_pad - C), (0, 0)))
    V_all = vp.reshape(ng, CAM_GROUP, 6).transpose(2, 0, 1).reshape(
        6 * ng, CAM_GROUP)
    return _split2(V_all)


def unpack_cam(acc, C: int, rows: int):
    """(ng*rows, 128) group-packed accumulator -> (C, rows)."""
    ng = acc.shape[0] // rows
    return acc.reshape(ng, rows, CAM_GROUP).transpose(0, 2, 1).reshape(
        ng * CAM_GROUP, rows)[:C]


def sym6_from_tri(tri):
    """(C, 21) upper-triangle rows -> (C, 6, 6) symmetric."""
    C = tri.shape[0]
    H = jnp.zeros((C, 6, 6), tri.dtype)
    H = H.at[:, IU6, JU6].set(tri)
    return H.at[:, JU6, IU6].set(tri)


def apply_a_raw(camid, lmloc, W18, v, H9, *, TP: int,
                interpret: bool = False):
    """Kernel A on raw tile-stream arrays: u (8, L_pad) = Hll_inv @
    sum_obs W^T v[cam], rows 0-2 live. L_pad = H9.shape[1] (local under
    sharding — the landmark reduction is tile-local, so no psum is needed
    on the output)."""
    OP = camid.shape[1]
    ntl = OP // TP
    C = v.shape[0]
    ng = _round_up(max(C, 1), CAM_GROUP) // CAM_GROUP
    vhi, vlo = pack_v(v, ng)
    L_pad = H9.shape[1]
    return pl.pallas_call(
        _kernel_a,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((8, L_pad), jnp.float32),
        in_specs=[_obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(18, TP),
                  _FULL, _FULL, _lm_spec(9)],
        out_specs=_lm_spec(8),
        scratch_shapes=[
            pltpu.VMEM((CAM_GROUP, TP), jnp.bfloat16),
            pltpu.VMEM((ng * 6, TP), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(camid, lmloc, W18, vhi, vlo, H9)


def apply_b_raw(camid, lmloc, W18, u8, C: int, *, TP: int,
                interpret: bool = False):
    """Kernel B on raw tile-stream arrays: (C,6) per-camera sums of
    W @ u8[lm] (partial under sharding: psum outside)."""
    OP = camid.shape[1]
    ntl = OP // TP
    ng = _round_up(max(C, 1), CAM_GROUP) // CAM_GROUP
    w_pack = pl.pallas_call(
        _kernel_b,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((ng * 6, CAM_GROUP), jnp.float32),
        in_specs=[_obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(18, TP),
                  _lm_spec(8)],
        out_specs=_acc_spec(ng * 6),
        interpret=_interp(interpret),
    )(camid, lmloc, W18, u8)
    return unpack_cam(w_pack, C, 6)


def s_apply(camid, lmloc, W18, v, H9, *, TP: int, interpret: bool = False):
    """One fused W Hll^-1 W^T v PCG product -> (C, 6) per-camera sums
    (partial under sharding: psum outside). Replaces apply_a+apply_b in
    the sweep loop — W is read once, u never leaves VMEM."""
    OP = camid.shape[1]
    ntl = OP // TP
    C = v.shape[0]
    ng = _round_up(max(C, 1), CAM_GROUP) // CAM_GROUP
    vhi, vlo = pack_v(v, ng)
    acc = pl.pallas_call(
        _s_kernel,
        grid=(ntl,),
        out_shape=jax.ShapeDtypeStruct((ng * 6, CAM_GROUP), jnp.float32),
        in_specs=[_obs_spec(1, TP), _obs_spec(1, TP), _obs_spec(18, TP),
                  _FULL, _FULL, _lm_spec(9)],
        out_specs=_acc_spec(ng * 6),
        scratch_shapes=[
            pltpu.VMEM((CAM_GROUP, TP), jnp.bfloat16),
            pltpu.VMEM((ng * 6, TP), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(camid, lmloc, W18, vhi, vlo, H9)
    return unpack_cam(acc, C, 6)
