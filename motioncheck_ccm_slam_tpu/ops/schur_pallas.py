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


def build_schur_plan(lm_sorted: np.ndarray, cam_sorted: np.ndarray,
                     C: int, L: int) -> SchurPlan:
    """lm_sorted: (O,) landmark id per sorted-stream position
    (nondecreasing); cam_sorted: (O,) camera id per sorted position."""
    lm_sorted = np.asarray(lm_sorted, np.int64)
    cam_sorted = np.asarray(cam_sorted, np.int64)
    O = lm_sorted.shape[0]
    L_pad = _round_up(max(L, 1), LM_BLOCK)
    ntl = L_pad // LM_BLOCK
    counts = np.bincount(lm_sorted, minlength=L_pad)
    bounds = np.zeros(L_pad + 1, np.int64)
    bounds[1:] = np.cumsum(counts)
    tile_counts = bounds[LM_BLOCK::LM_BLOCK] - bounds[:-LM_BLOCK:LM_BLOCK]
    TP = int(_round_up(max(int(tile_counts.max()) if ntl else 1, 1), 128))
    OP = ntl * TP
    perm = np.full((ntl, TP), O, np.int64)
    camid = np.zeros((ntl, TP), np.int32)
    lmloc = np.zeros((ntl, TP), np.int32)
    for t in range(ntl):
        s, e = bounds[t * LM_BLOCK], bounds[(t + 1) * LM_BLOCK]
        n = e - s
        perm[t, :n] = np.arange(s, e)
        camid[t, :n] = cam_sorted[s:e]
        lmloc[t, :n] = lm_sorted[s:e] - t * LM_BLOCK
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
    # landmark one-hot (tile-local), then u_part = wtv @ oh_lm^T
    lml = lmloc_ref[0, :][None, :]
    lm_lane = jax.lax.broadcasted_iota(jnp.int32, (LM_BLOCK, TP), 0)
    oh_lm = (lm_lane == lml).astype(jnp.float32)             # (128, TP)
    u_part = jax.lax.dot_general(
        wtv, oh_lm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (3, 128)
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

    # expand u to observations: ug = u_tile @ oh_lm  ((3,128)@(128,TP))
    lml = lmloc_ref[0, :][None, :]
    lm_lane = jax.lax.broadcasted_iota(jnp.int32, (LM_BLOCK, TP), 0)
    oh_lm = (lm_lane == lml).astype(jnp.float32)             # (128, TP)
    ug = jnp.dot(u_ref[0:3, :], oh_lm,
                 preferred_element_type=jnp.float32)          # (3, TP)
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
    oh = (lane == lo).astype(jnp.float32)                     # (128, TP)
    g = (cam >> 7)[None, :]
    ng = out_ref.shape[0] // 6
    for gi in range(ng):
        m = (g == gi).astype(jnp.float32)
        part = jax.lax.dot_general(
            wu * m, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (6, 128)
        out_ref[gi * 6:gi * 6 + 6, :] = (
            out_ref[gi * 6:gi * 6 + 6, :] + part)


def schur_apply(plan: SchurPlan, Wp, v, Hll_inv9, *, interpret: bool = False):
    """One fused W Hll^-1 W^T v product.

    Wp: (18, ntl*TP) from pack_w. v: (C, 6). Hll_inv9: (9, L_pad).
    Returns w: (C, 6) == sum_obs W_o Hll_inv W_o^T v aggregated per
    camera. Caller forms S v = Hcc_d v - w.
    """
    # non-TPU backends (tests, forced CPU runs) fall back to the Pallas
    # interpreter automatically
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

    u = pl.pallas_call(
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
    )(plan.camid, plan.lmloc, Wp, u)

    w = w_pack.reshape(ng, 6, CAM_GROUP).transpose(0, 2, 1).reshape(
        C_pad, 6)[:C]
    return w
