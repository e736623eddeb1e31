"""Headline benchmark: full tracking-step throughput on one TPU chip.

Measures the client hot loop at the reference's EuRoC operating point
(752x480 mono, 1000-feature ORB budget over 8 pyramid levels): ORB
extraction + undistortion + two-pass projection tracking against a
populated local map + motion-only pose optimization, all fused into one
jitted program.

Methodology: the step is iterated ON DEVICE inside a ``lax.fori_loop``
(each iteration consumes a different image and the previous pose, and a
carried checksum keeps every output live), and one scalar is fetched at
the end. This counts pure device throughput and is robust to remote
platforms where ``block_until_ready`` does not await completion.

Baseline: the reference client must sustain the EuRoC camera rate of
20 fps (cslam/conf/vi_euroc.yaml Camera.fps) to run real time;
``vs_baseline`` is the speedup over that real-time requirement.

Prints ONE JSON line.
"""
import json
import time

import numpy as np

N_ITERS = 64
N_IMGS = 4


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 8-level extractor graph is large and its
    # TPU compile dominates cold-start (~minutes); cache it across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from __graft_entry__ import entry

    fn, args = entry()
    img0, Tcw_pred0, Tcw_last0 = args[0], args[1], args[2]
    map_args = args[3:]

    rng = np.random.default_rng(1)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (N_IMGS,) + img0.shape).astype(np.float32)
    )

    def loop(imgs, Tcw_pred0, Tcw_last0, map_args):
        def body(i, carry):
            Tcw_pred, Tcw_last, acc = carry
            img = jax.lax.dynamic_index_in_dim(
                imgs, i % N_IMGS, axis=0, keepdims=False
            )
            Tcw, assoc, n_inl, vis, found = fn(
                img, Tcw_pred, Tcw_last, *map_args
            )
            # keep every output live in the carry
            acc = (
                acc
                + n_inl.astype(jnp.float32)
                + jnp.sum(assoc).astype(jnp.float32)
                + jnp.sum(vis).astype(jnp.float32)
                + jnp.sum(found).astype(jnp.float32)
            )
            return Tcw, Tcw_pred, acc

        Tcw, _, acc = jax.lax.fori_loop(
            0, N_ITERS, body, (Tcw_pred0, Tcw_last0, jnp.float32(0.0))
        )
        return Tcw[0, 0] + acc

    step_loop = jax.jit(loop)
    # compile + warm up (fetch forces completion)
    float(step_loop(imgs, Tcw_pred0, Tcw_last0, map_args))

    t0 = time.perf_counter()
    out = float(step_loop(imgs, Tcw_pred0, Tcw_last0, map_args))
    dt = time.perf_counter() - t0
    fps = N_ITERS / dt

    print(json.dumps({
        "metric": "tracking_step_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2),
    }))


if __name__ == "__main__":
    main()
