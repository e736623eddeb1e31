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
                     C: int, L: int, valid_sorted: np.ndarray = None):
    """lm_sorted: (O,) landmark id per sorted-stream position
    (nondecreasing); cam_sorted: (O,) camera id per sorted position;
    valid_sorted: optional (O,) bool — INVALID observations are omitted
    from the plan entirely (exact: their weights are zero, so they
    contribute nothing to any reduction). The product's observation
    stream parks every empty feature slot at landmark 0
    (map_state.gather_observations), so without the filter tile 0 would
    hold millions of dead slots and the padded tile width would explode.

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
    L_pad = _round_up(max(L, 1), LM_BLOCK)
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
    """(6,3,O) sorted-stream W -> (18, ntl*TP) padded tile stream.

    One (18, OP) gather per LM ITERATION (pad slots read a zero column),
    amortized over every PCG sweep of that iteration.
    """
    W18 = Wl_t.reshape(18, -1)
    W18z = jnp.concatenate([W18, jnp.zeros((18, 1), W18.dtype)], axis=1)
    return W18z[:, plan.perm]


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
    v_sel = [jnp.zeros((1, TP), jnp.float32)] * 6
    for gi in range(ng):
        m = (g == gi).astype(jnp.float32)
        for i in range(6):
            v_sel[i] = v_sel[i] + m * res_scr[gi * 6 + i, :][None, :]
    # wtv[j,:] = sum_i W[i*3+j] * v_sel[i]
    wtv = []
    for j in range(3):
        acc = w_ref[j, :][None, :] * v_sel[0]
        for i in range(1, 6):
            acc = acc + w_ref[i * 3 + j, :][None, :] * v_sel[i]
        wtv.append(acc)
    wtv = jnp.concatenate(wtv, axis=0)                       # (3, TP)
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
    # wu[i,:] = sum_j W[i*3+j] * ug[j]
    wu = []
    for i in range(6):
        acc = w_ref[i * 3, :][None, :] * ug[0, :][None, :]
        for j in range(1, 3):
            acc = acc + w_ref[i * 3 + j, :][None, :] * ug[j, :][None, :]
        wu.append(acc)
    wu = jnp.concatenate(wu, axis=0)                          # (6, TP)
    # camera reduce, group-packed: for each group g,
    # acc[g*6+i, lo] += sum_o [cam==g*128+lo] wu[i,o]
    cam = camid_ref[0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (CAM_GROUP, TP), 0)
    lo = (cam & (CAM_GROUP - 1))[None, :]
    oh = (lane == lo).astype(jnp.bfloat16)                    # (128, TP)
    g = (cam >> 7)[None, :]
    ng = out_ref.shape[0] // 6
    # hi/lo split ONCE, masks applied per group (0/1 bf16 multiply is
    # exact) -> 2*NG full-rate dots instead of NG emulated-f32 ones
    wu_hi = wu.astype(jnp.bfloat16)
    wu_lo = (wu - wu_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))
    for gi in range(ng):
        m = (g == gi).astype(jnp.bfloat16)
        part = (
            jax.lax.dot_general(wu_hi * m, oh, dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(wu_lo * m, oh, dn,
                                  preferred_element_type=jnp.float32)
        )                                                     # (6, 128)
        out_ref[gi * 6:gi * 6 + 6, :] = (
            out_ref[gi * 6:gi * 6 + 6, :] + part)


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
    C_pad = ng * CAM_GROUP
    vp = jnp.pad(v, ((0, C_pad - C), (0, 0)))
    # V packed (NG*6, 128): row g*6+i, col lo = v[g*128+lo, i]
    V_all = vp.reshape(ng, CAM_GROUP, 6).transpose(0, 2, 1).reshape(
        ng * 6, CAM_GROUP)
    vhi = V_all.astype(jnp.bfloat16)
    vlo = (V_all - vhi.astype(jnp.float32)).astype(jnp.bfloat16)

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
