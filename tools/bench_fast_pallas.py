"""A/B the extractor front-end backends on the real chip.

Times full extract_orb at the EuRoC operating point (752x480, 1000
features, 8 levels) with the jnp (XLA) dense front-end vs the fused
Pallas kernels (ops/fast_pallas.py), plus the isolated dense stages.
Device-loop timing (lax.fori_loop with a live carry), same methodology as
bench.py.

Usage: python tools/bench_fast_pallas.py [--iters 32]
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


def device_loop_ms(fn, args, iters):
    """Time fn over `iters` device-loop iterations, scalar-carry kept live.

    The first argument (the image) is perturbed by the carry each
    iteration, so the body is NOT loop-invariant — without this XLA hoists
    the whole computation out of the fori_loop and the measurement is
    pure loop overhead (this bit an earlier version of this tool: a full
    8-level extract "measured" ~1 ms while the real cost was ~9 ms).
    """

    def loop(img, *rest):
        def body(_, acc):
            out = fn(img + acc * 1e-20, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            s = acc
            for x in leaves:
                s = s + jnp.sum(x).astype(jnp.float32)
            return s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    j = jax.jit(loop)
    float(j(*args))                     # compile + warm
    t0 = time.perf_counter()
    float(j(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--levels", type=str, default="",
                    help="comma-separated pyramid levels (default: all)")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full extract_orb A/B")
    args = ap.parse_args()

    from motioncheck_ccm_slam_tpu.config import DEFAULT_CONFIG
    from motioncheck_ccm_slam_tpu.ops import fast_pallas, image as image_ops, orb

    cfg = DEFAULT_CONFIG
    cam = cfg.camera
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.uniform(0, 255, (cam.height, cam.width)).astype(np.float32))
    params = cfg.extractor
    print(f"backend={jax.default_backend()} img={img.shape}")

    # isolated dense stages, per pyramid level (the Pallas kernels pad to
    # 64-row/32-col multiples — their relative cost grows as levels shrink)
    def corner_jnp(im):
        (c_hi, s_hi), (c_lo, s_lo) = orb.fast_response_two_thresholds(
            im, float(params.ini_th_fast), float(params.min_th_fast))
        return jnp.where(c_hi, s_hi, 0.0) + jnp.where(c_lo, s_lo, 0.0)

    def corner_pallas(im):
        return fast_pallas.masked_corner_score(
            im, th_hi=float(params.ini_th_fast),
            th_lo=float(params.min_th_fast), border=params.edge_threshold)

    def blurmom_jnp(im):
        return (image_ops.gaussian_blur(im, 7, 2.0),
                orb.ic_moment_maps(im, params.half_patch_size))

    def blurmom_pallas(im):
        return fast_pallas.blur_and_moments(
            im, half_patch=params.half_patch_size)

    levels = ([int(x) for x in args.levels.split(",")] if args.levels
              else list(range(params.n_levels)))
    print(f"{'lvl':4s} {'shape':10s} {'corner_jnp':>11s} {'corner_pal':>11s} "
          f"{'blurmom_jnp':>12s} {'blurmom_pal':>12s}")
    for l in levels:
        h = int(round(cam.height / params.scale_factor ** l))
        w = int(round(cam.width / params.scale_factor ** l))
        lvl = img if l == 0 else jnp.asarray(
            rng.uniform(0, 255, (h, w)).astype(np.float32))
        row = [device_loop_ms(f, (lvl,), args.iters)
               for f in (corner_jnp, corner_pallas, blurmom_jnp,
                         blurmom_pallas)]
        print(f"L{l:<3d} {str(tuple(lvl.shape)):10s} "
              + " ".join(f"{ms:11.3f}" for ms in row), flush=True)
    if args.skip_full:
        return

    for backend in ("jnp", "pallas"):
        orb.FAST_BACKEND = backend
        ms = device_loop_ms(
            lambda im: orb.extract_orb(im, params), (img,), args.iters)
        print(f"extract_orb [{backend:6s}]: {ms:7.3f} ms")
    orb.FAST_BACKEND = None


if __name__ == "__main__":
    main()
