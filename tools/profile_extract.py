"""Sub-stage breakdown of ORB extraction on the real TPU.

Same on-device fori_loop methodology as profile_tpu.py (remote platforms
don't await completion in block_until_ready; a carried checksum + one scalar
fetch at the end forces it). Stages are profiled per pyramid LEVEL 0 (the
dominant one) plus the full extractor, so the hot sub-kernel is identifiable.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

ITERS = 16


def timeit_loop(name, stage_fn, feed, iters=ITERS):
    B = feed.shape[0]

    def loop(feed):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(feed, i % B, 0, keepdims=False)
            return acc + stage_fn(x)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    f = jax.jit(loop)
    float(f(feed))
    t0 = time.perf_counter()
    float(f(feed))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    from motioncheck_ccm_slam_tpu.config import DEFAULT_CONFIG
    from motioncheck_ccm_slam_tpu.ops import image as image_ops
    from motioncheck_ccm_slam_tpu.ops import orb

    cfg = DEFAULT_CONFIG
    cam = cfg.camera
    p = cfg.extractor
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (2, cam.height, cam.width)).astype(np.float32))
    print(f"platform: {jax.devices()[0]}", flush=True)

    budgets = orb.level_feature_budgets(p.max_features, p.n_levels,
                                        p.scale_factor)
    k0 = budgets[0]

    timeit_loop("L0 fast_response (2 thresholds)",
                lambda im: (lambda a, b: a[1].sum() + b[1].sum())(
                    *orb.fast_response_two_thresholds(
                        im, float(p.ini_th_fast), float(p.min_th_fast))),
                imgs)

    timeit_loop("L0 select_keypoints",
                lambda im: orb._select_level_keypoints(im, p, k0)[1].sum(),
                imgs)

    timeit_loop("L0 ic_moment_maps (dense conv)",
                lambda im: (lambda m: m[0].sum() + m[1].sum())(
                    orb.ic_moment_maps(im, p.half_patch_size)),
                imgs)

    xy = jnp.asarray(rng.uniform(30, 440, (k0, 2)).astype(np.float32))
    ang = jnp.asarray(rng.uniform(-3, 3, (k0,)).astype(np.float32))
    timeit_loop("L0 gaussian_blur",
                lambda im: image_ops.gaussian_blur(im, 7, 2.0).sum(),
                imgs)
    timeit_loop("L0 brief_descriptors",
                lambda im: orb.brief_descriptors(im, xy, ang)
                .sum().astype(jnp.float32),
                imgs)

    timeit_loop("L0 ic_angles",
                lambda im: orb.ic_angles(im, xy, p.half_patch_size).sum(),
                imgs)

    def ext(im):
        f = orb.extract_orb(im, p)
        return (f.xy.sum() + f.desc.sum().astype(jnp.float32)
                + f.valid.sum().astype(jnp.float32))
    timeit_loop("extract_orb (full, 8 levels)", ext, imgs)


if __name__ == "__main__":
    main()
