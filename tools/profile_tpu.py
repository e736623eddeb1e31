"""Break down the tracking-step time on the real TPU.

Methodology: every stage is iterated ON DEVICE in a lax.fori_loop with a
carried checksum (block_until_ready does not await completion on remote
platforms — timing dispatches is meaningless there); one scalar fetch at
the end forces completion. Prints ms/iter per stage.
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

ITERS = 32


def timeit_loop(name, stage_fn, feed, iters=ITERS):
    """stage_fn(x) -> scalar; feed (B, ...) batch the loop cycles through."""
    B = feed.shape[0]

    def loop(feed):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(feed, i % B, 0, keepdims=False)
            return acc + stage_fn(x)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    f = jax.jit(loop)
    float(f(feed))          # compile + warm
    t0 = time.perf_counter()
    float(f(feed))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms/iter", flush=True)
    return dt


def main():
    from motioncheck_ccm_slam_tpu.config import DEFAULT_CONFIG
    from motioncheck_ccm_slam_tpu.models.tracking import _track_two_pass
    from motioncheck_ccm_slam_tpu.ops import matching, orb
    from motioncheck_ccm_slam_tpu.ops import image as image_ops

    cfg = DEFAULT_CONFIG
    cam = cfg.camera
    K = jnp.asarray(cam.K())
    sf = jnp.asarray(orb.scale_factors(cfg.extractor))
    inv_s2 = jnp.asarray(orb.inv_level_sigma2(cfg.extractor))
    NM = cfg.capacity.client_max_mps
    F = cfg.extractor.max_features
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (2, cam.height, cam.width)).astype(np.float32))

    print(f"platform: {jax.devices()[0]}", flush=True)

    timeit_loop("pyramid (8 levels)",
                lambda im: image_ops.build_pyramid(
                    im, cfg.extractor.n_levels, cfg.extractor.scale_factor
                )[-1].sum(),
                imgs)

    def ext(im):
        f = orb.extract_orb(im, cfg.extractor)
        return (f.xy.sum() + f.desc.sum().astype(jnp.float32)
                + f.valid.sum().astype(jnp.float32))
    timeit_loop("extract_orb (full)", ext, imgs)

    d1 = jnp.asarray(rng.integers(0, 2**32, (NM, 8), dtype=np.uint32))
    d2s = jnp.asarray(rng.integers(0, 2**32, (2, F, 8), dtype=np.uint32))
    timeit_loop(f"hamming ({NM}x{F})",
                lambda d2: matching.hamming_matrix(d1, d2).sum().astype(jnp.float32),
                d2s)

    feats_xy = jnp.asarray(rng.uniform(0, 470, (2, F, 2)).astype(np.float32))
    feats_oct = jnp.asarray(rng.integers(0, 8, (F,), dtype=np.int32))
    feats_valid = jnp.ones((F,), bool)
    mp_Xw = jnp.asarray(rng.normal(0, 1, (NM, 3)).astype(np.float32)
                        + np.array([0, 0, 5], np.float32))
    mp_normal = jnp.asarray(np.tile(np.array([0, 0, -1], np.float32), (NM, 1)))

    def track(xy):
        Tcw, assoc, n_inl, vis, found = _track_two_pass(
            xy, d2s[0], feats_oct, jnp.zeros((F,), jnp.float32), feats_valid,
            jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
            mp_Xw, d1, mp_normal, jnp.full((NM,), 0.5), jnp.full((NM,), 50.0),
            jnp.ones((NM,), bool),
            K, cam.width, cam.height, sf, inv_s2, cfg.extractor.n_levels,
        )
        return Tcw[0, 0] + n_inl.astype(jnp.float32) + jnp.sum(assoc).astype(jnp.float32)
    timeit_loop("track_two_pass", track, feats_xy)

    import __graft_entry__
    fn, args = __graft_entry__.entry()

    def full(im):
        Tcw, assoc, n_inl, vis, found = fn(im, *args[1:])
        return Tcw[0, 0] + n_inl.astype(jnp.float32) + jnp.sum(assoc).astype(jnp.float32)
    timeit_loop("full step (entry)", full, imgs)


if __name__ == "__main__":
    main()
