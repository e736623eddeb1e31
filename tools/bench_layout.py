"""Micro-benchmark: where does the matrix-free GBA PCG sweep lose its
bandwidth? Times each hot primitive at the server operating point
(O=2M obs, C=2048 cams, L=65536 landmarks) in the current obs-major layout
(minor dims 3/6 -> 2-5% lane utilization on the (8,128) vregs) vs a
transposed component-major layout (obs minor -> full lanes).

Usage: python tools/bench_layout.py [--obs 2048000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timeit(name, fn, *args, n=10, bytes_touched=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    bw = f"  {bytes_touched / ms * 1e3 / 2**30:8.1f} GiB/s" \
        if bytes_touched else ""
    print(f"{name:42s} {ms:9.2f} ms{bw}")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=2048000)
    ap.add_argument("--cams", type=int, default=2048)
    ap.add_argument("--lms", type=int, default=65536)
    args = ap.parse_args()
    O, C, L = args.obs, args.cams, args.lms
    cam_seg = O // C
    print(f"devices={jax.devices()}  O={O} C={C} L={L} seg={cam_seg}")

    rng = np.random.default_rng(0)
    # generate the big operands ON DEVICE: pushing ~500 MB through the
    # remote-TPU tunnel dominates the whole benchmark otherwise
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    Wcl = jax.block_until_ready(
        jax.random.normal(k1, (O, 6, 3), jnp.float32))
    Wcl_t = jax.block_until_ready(
        jax.jit(lambda w: jnp.moveaxis(w, 0, -1).copy())(Wcl))   # (6,3,O)
    v = jax.random.normal(k2, (C, 6), jnp.float32)
    v_t = v.T.copy()                                             # (6,C)
    u = jax.random.normal(k3, (L, 3), jnp.float32)
    u_t = u.T.copy()                                             # (3,L)
    cam_idx = np.repeat(np.arange(C), cam_seg).astype(np.int32)
    lm_idx = rng.integers(0, L, O).astype(np.int32)
    order = np.argsort(lm_idx, kind="stable")
    counts = np.bincount(lm_idx, minlength=L)
    bounds = np.zeros(L + 1, np.int64)
    bounds[1:] = np.cumsum(counts)
    cam_idx_j = jnp.asarray(cam_idx)
    lm_idx_j = jnp.asarray(lm_idx)
    lm_sorted_j = jnp.asarray(np.sort(lm_idx).astype(np.int32))
    order_j = jnp.asarray(order.astype(np.int32))
    bounds_j = jnp.asarray(bounds.astype(np.int32))
    x3 = jax.block_until_ready(
        jax.random.normal(jax.random.PRNGKey(7), (O, 3), jnp.float32))
    x3_t = jax.block_until_ready(jax.jit(lambda x: x.T.copy())(x3))  # (3,O)

    WB = 4 * O * 18

    # -- per-obs einsum: obs-major vs component-major ------------------
    f = jax.jit(lambda W, vg: jnp.einsum("oij,oi->oj", W, vg[cam_idx_j]))
    timeit("einsum Wcl^T v[cam]   (O,6,3) obs-major", f, Wcl, v,
           bytes_touched=WB)

    def g(Wt, vt):
        vg = jnp.repeat(vt[:, :, None], cam_seg, 2).reshape(6, O)
        return jnp.einsum("ijo,io->jo", Wt, vg)
    timeit("einsum Wcl^T v[cam]   (6,3,O) comp-major", jax.jit(g), Wcl_t, v_t,
           bytes_touched=WB)

    # -- landmark gather: obs-major vs component-major -----------------
    f = jax.jit(lambda uu: uu[lm_idx_j])
    timeit("gather u[lm_idx]      (L,3) obs-major", f, u,
           bytes_touched=4 * O * 3)
    f = jax.jit(lambda uu: uu[:, lm_idx_j])
    timeit("gather u[:,lm_idx]    (3,L) comp-major", f, u_t,
           bytes_touched=4 * O * 3)

    # -- full product einsum(Wcl, u[lm]) + cam reshape-sum -------------
    def h(W, uu):
        wu = jnp.einsum("oij,oj->oi", W, uu[lm_idx_j])
        return wu.reshape(C, cam_seg, 6).sum(1)
    timeit("einsum Wcl u[lm] +camsum  obs-major", jax.jit(h), Wcl, u,
           bytes_touched=WB)

    def h_t(Wt, ut):
        ug = ut[:, lm_idx_j]                       # (3,O)
        wu = jnp.einsum("ijo,jo->io", Wt, ug)      # (6,O)
        return wu.reshape(6, C, cam_seg).sum(-1)
    timeit("einsum Wcl u[lm] +camsum comp-major", jax.jit(h_t), Wcl_t, u_t,
           bytes_touched=WB)

    # -- landmark segment reduction: cumsum vs table --------------------
    f = jax.jit(lambda xs: jnp.concatenate(
        [jnp.zeros_like(xs[:1]), jnp.cumsum(xs, 0)], 0))
    cs = timeit("cumsum (O,3) axis0    obs-major", f, x3,
                bytes_touched=4 * O * 3 * 2)
    f = jax.jit(lambda xs: jnp.concatenate(
        [jnp.zeros_like(xs[:, :1]), jnp.cumsum(xs, 1)], 1))
    timeit("cumsum (3,O) axis1   comp-major", f, x3_t,
           bytes_touched=4 * O * 3 * 2)

    # -- segment-sum via jax.ops.segment_sum (sorted ids) ---------------
    f = jax.jit(lambda xs: jax.ops.segment_sum(
        xs, lm_sorted_j, num_segments=L, indices_are_sorted=True))
    timeit("segment_sum sorted (O,3) obs-major", f, x3,
           bytes_touched=4 * O * 3)
    f = jax.jit(lambda xs: jax.ops.segment_sum(
        xs, lm_idx_j, num_segments=L))
    timeit("segment_sum unsorted (O,3) obs-major", f, x3,
           bytes_touched=4 * O * 3)

    # -- permutation gather (per LM iteration, not per sweep) -----------
    f = jax.jit(lambda W: W[order_j])
    timeit("perm gather Wcl[order] (O,6,3)", f, Wcl, bytes_touched=2 * WB)
    f = jax.jit(lambda W: W[:, :, order_j])
    timeit("perm gather Wcl[:,:,order] (6,3,O)", f, Wcl_t,
           bytes_touched=2 * WB)

    # -- full Schur matvec: obs-major sorted-cumsum (current best) ------
    Wcl_lm = jax.block_until_ready(Wcl[order_j])
    cam_idx_sorted = jnp.asarray(cam_idx[order].astype(np.int32))
    Hll_inv = jnp.asarray(
        np.tile(np.eye(3, dtype=np.float32), (L, 1, 1)))
    Hcc_d = jnp.asarray(np.tile(np.eye(6, dtype=np.float32), (C, 1, 1)))

    def matvec_cur(vv):
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, vv)
        wtv = jnp.einsum("oij,oi->oj", Wcl_lm, vv[cam_idx_sorted])
        cs = jnp.concatenate([jnp.zeros_like(wtv[:1]), jnp.cumsum(wtv, 0)], 0)
        uu = cs[bounds_j[1:]] - cs[bounds_j[:-1]]
        uu = jnp.einsum("lij,lj->li", Hll_inv, uu)
        w_ = jnp.einsum("oij,oj->oi", Wcl, uu[lm_idx_j])
        return Hv - w_.reshape(C, cam_seg, 6).sum(1)
    timeit("FULL matvec obs-major sorted-cumsum", jax.jit(matvec_cur), v,
           bytes_touched=2 * WB)

    # -- full Schur matvec: component-major ----------------------------
    Wcl_lm_t = jax.block_until_ready(Wcl_t[:, :, order_j])
    cam_sorted_j = jnp.asarray(cam_idx[order].astype(np.int32))

    def matvec_t(vt):
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, vt.T).T
        vg = vt[:, cam_sorted_j]                       # (6,O) gather
        wtv = jnp.einsum("ijo,io->jo", Wcl_lm_t, vg)   # (3,O)
        cs = jnp.concatenate(
            [jnp.zeros_like(wtv[:, :1]), jnp.cumsum(wtv, 1)], 1)
        uu = cs[:, bounds_j[1:]] - cs[:, bounds_j[:-1]]   # (3,L)
        uu = jnp.einsum("lij,jl->il", Hll_inv, uu)        # (3,L)
        ug = uu[:, lm_idx_j]                              # (3,O)
        wu = jnp.einsum("ijo,jo->io", Wcl_t, ug)          # (6,O)
        return Hv - wu.reshape(6, C, cam_seg).sum(-1).T
    timeit("FULL matvec comp-major sorted-cumsum", jax.jit(matvec_t), v_t,
           bytes_touched=2 * WB)


if __name__ == "__main__":
    main()
