"""Hunt the gather-fusion pathology in the Schur matvec.

tools/bench_hbm.py measured an ISOLATED (3,L)->(3,O) random gather at
0.51 ms (~stream speed), yet inside the production matvec the same gather
adds ~4.5 ms and the v-gather ~5.7 ms (tools/bench_gba_phases.py). The
hypothesis: XLA fuses the gather into the consuming einsum loop, turning a
sequential stream + batched random reads into per-FMA random access.

This tool times each gather+einsum composition variant in-graph:
  A-side (v-gather):  wtv = einsum("ijo,io->jo", Wl_t, gather(v))
  B-side (u-gather):  wu  = einsum("ijo,jo->io", Wcl_t, gather(u))
variants: fused (production), optimization_barrier between gather and
einsum, and leading-axis index layouts.

Usage: python tools/bench_gather_fusion.py [--obs 2048000]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", type=int, default=2048000)
    ap.add_argument("--kfs", type=int, default=2048)
    ap.add_argument("--mps", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    O, C, L = args.obs, args.kfs, args.mps
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.normal(0, 0.1, (6, 3, O)).astype(np.float32))
    cam_idx = jnp.asarray(rng.integers(0, C, O).astype(np.int32))
    lm_idx = jnp.asarray(rng.integers(0, L, O).astype(np.int32))
    v = jnp.asarray(rng.normal(0, 1, (C, 6)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 1, (L, 3)).astype(np.float32))
    barrier = jax.lax.optimization_barrier

    def timeit(name, fn, x0):
        def loop(x):
            def body(_, carry):
                xx, acc = carry
                r = fn(xx * (1.0 + acc * 1e-30))
                return xx, acc + jnp.sum(r) * 1e-30
            _, acc = jax.lax.fori_loop(
                0, args.reps, body, (x, jnp.float32(0.0)))
            return acc
        f = jax.jit(loop)
        float(f(x0))
        t0 = time.perf_counter()
        float(f(x0))
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name:44s} {ms:8.2f} ms", flush=True)
        return ms

    # ---- A-side: v (C,6) gathered to observations, contracted with W ----
    timeit("A fused   einsum(W, v.T[:, idx])",
           lambda vv: jnp.einsum("ijo,io->jo", W, vv.T[:, cam_idx]), v)
    timeit("A barrier einsum(W, B(v.T[:, idx]))",
           lambda vv: jnp.einsum("ijo,io->jo", W,
                                 barrier(vv.T[:, cam_idx])), v)
    timeit("A lead    einsum(W, B(v[idx]) oi)",
           lambda vv: jnp.einsum("ijo,oi->jo", W, barrier(vv[cam_idx])), v)
    timeit("A leadT   einsum(W, B(v[idx].T) io)",
           lambda vv: jnp.einsum("ijo,io->jo", W,
                                 barrier(vv[cam_idx].T)), v)

    # ---- B-side: u (L,3) gathered to observations ----
    timeit("B fused   einsum(W, u.T[:, idx])",
           lambda uu: jnp.einsum("ijo,jo->io", W, uu.T[:, lm_idx]), u)
    timeit("B barrier einsum(W, B(u.T[:, idx]))",
           lambda uu: jnp.einsum("ijo,jo->io", W,
                                 barrier(uu.T[:, lm_idx])), u)
    timeit("B lead    einsum(W, B(u[idx]) oj)",
           lambda uu: jnp.einsum("ijo,oj->io", W, barrier(uu[lm_idx])), u)

    # ---- structural replacements ------------------------------------
    # (1) camera expand as a group-packed one-hot matmul: cameras form
    # NG groups of 128; one (B,128)@(128, NG*6) MXU matmul per block
    # computes ALL groups' candidate rows, a cheap per-group output mask
    # selects the right one. Exact (0/1 f32 one-hot).
    NG = C // 128
    BB = 8192
    NB = O // BB
    Wb = jnp.moveaxis(W.reshape(6, 3, NB, BB), 2, 0)      # (NB,6,3,BB)
    cam_b = cam_idx.reshape(NB, BB)
    lane = jnp.arange(128, dtype=jnp.int32)
    grp = jnp.arange(NG, dtype=jnp.int32)

    def a_onehot(vv):
        V_all = vv.reshape(NG, 128, 6).transpose(1, 0, 2).reshape(128, NG * 6)

        def blk(carry, inp):
            Wk, ids = inp
            lo = ids & 127
            g = ids >> 7
            oh = (lo[:, None] == lane[None, :]).astype(jnp.float32)
            res = (oh @ V_all).reshape(BB, NG, 6)
            sel = jnp.sum(
                res * (g[:, None] == grp[None, :])[..., None], axis=1)
            wtv = jnp.einsum("ijo,oi->jo", Wk, sel)
            return carry, wtv

        _, out = jax.lax.scan(blk, 0, (Wb, cam_b))
        return out

    timeit("A onehot96 scan expand+einsum", a_onehot, v)

    # (2) sorted landmark expand as diff -> scatter-at-bounds -> cumsum:
    # ug[:, o] = u[lm_sorted[o]] for sorted ids reconstructs by prefix
    # sum of per-boundary differences (no 2M-row gather; one L-row
    # scatter + one (3,O) cumsum).
    lm_sorted = jnp.sort(lm_idx)
    counts = jnp.bincount(lm_idx, length=L)
    bounds = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])

    def b_diffcumsum(uu):
        uT = uu.T                                          # (3, L)
        d = jnp.diff(uT, axis=1, prepend=jnp.zeros((3, 1), uT.dtype))
        start = bounds[:-1]                                # (L,)
        # boundary impulses: position bounds[l] gets u[l]-u[l-1]
        # (empty landmarks collapse onto the same position; their diffs
        # telescope so the sum is still correct)
        imp = jnp.zeros((3, O + 1), uT.dtype).at[:, start].add(d)
        ug = jnp.cumsum(imp[:, :O], axis=1)
        return jnp.einsum("ijo,jo->io", W, ug)

    timeit("B diff-cumsum expand+einsum", b_diffcumsum, u)

    # numeric check of (2) against the gather
    ref = np.asarray(u)[np.asarray(lm_sorted)].T
    got = np.asarray(jnp.zeros((3, O + 1)).at[
        :, bounds[:-1]].add(jnp.diff(
            u.T, axis=1, prepend=jnp.zeros((3, 1)))))
    got = np.cumsum(got[:, :O], axis=1)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"diff-cumsum max rel err vs gather: {err:.2e}")

    # (3) camera reduce as the transposed packed one-hot (the sorted
    # layout's replacement for the camera-major reshape-sum)
    def c_onehot(vv):
        def blk(carry, inp):
            Wk, ids = inp
            lo = ids & 127
            g = ids >> 7
            oh = (lo[:, None] == lane[None, :]).astype(jnp.float32)
            wu = jnp.einsum("ijo,jo->oi", Wk, Wk[0])       # (BB,6) proxy
            wu_exp = (wu[:, None, :]
                      * (g[:, None] == grp[None, :])[..., None]
                      ).reshape(BB, NG * 6)
            return carry + oh.T @ wu_exp, None

        acc, _ = jax.lax.scan(
            blk, jnp.zeros((128, NG * 6), jnp.float32), (Wb, cam_b))
        return acc

    timeit("C onehot96 scan cam-reduce", c_onehot, v)


if __name__ == "__main__":
    main()
