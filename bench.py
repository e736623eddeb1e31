"""Headline benchmark: full tracking-step throughput on one TPU chip.

Measures the client hot loop at the reference's EuRoC operating point
(752x480 mono, 1000-feature ORB budget over 8 pyramid levels): ORB
extraction + undistortion + two-pass projection tracking against a
populated local map + motion-only pose optimization, all fused into one
jitted program.

Baseline: the reference client must sustain the EuRoC camera rate of
20 fps (cslam/conf/vi_euroc.yaml Camera.fps) to run real time;
``vs_baseline`` is the speedup over that real-time requirement.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: the 8-level extractor graph is large and its
    # TPU compile dominates cold-start (~minutes); cache it across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from __graft_entry__ import entry

    fn, args = entry()
    step = jax.jit(fn)
    # compile
    out = step(*args)
    jax.block_until_ready(out)

    # measure
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "tracking_step_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2),
    }))


if __name__ == "__main__":
    main()
