"""Benchmark the single-chip matrix-free GBA on the real chip at the server
operating point (2048 KFs, 65k landmarks, ~2M observations) and report
ms/LM-iteration + achieved-vs-roofline fraction.

(Historical note: this tool once compared a SegmentPlan-gather variant
against the sorted-cumsum variant — the sorted layout won on chip
[1076 vs 1229 ms/LM-iter] and then moved to component-major layout, which
is the one production solver now. The mesh-sharded solver keeps gather
plans because a global sort does not shard.)

Usage: python tools/bench_gba_variants.py [--kfs 2048] [--mps 65536]
       [--obs-per-kf 1000] [--iters 10] [--pcg 25]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kfs", type=int, default=2048)
    ap.add_argument("--mps", type=int, default=65536)
    ap.add_argument("--obs-per-kf", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pcg", type=int, default=25)
    args = ap.parse_args()

    import jax.numpy as jnp

    from motioncheck_ccm_slam_tpu.models import gba as gba_mod
    from motioncheck_ccm_slam_tpu.parallel import sharded_ba
    from motioncheck_ccm_slam_tpu.utils import bigmap

    print(f"devices: {jax.devices()}")
    m, cfg, Tcw_true = bigmap.build_server_scale_map(
        n_kfs=args.kfs, n_mps=args.mps, obs_per_kf=args.obs_per_kf, seed=0
    )
    obs = gba_mod.build_observations(m.kf, cfg)
    O = int(obs.cam_idx.shape[0])
    n_valid = int(np.asarray(obs.valid).sum())
    deg = np.bincount(np.asarray(obs.lm_idx)[np.asarray(obs.valid)],
                      minlength=args.mps)
    print(f"C={args.kfs} L={args.mps} O={O} (valid {n_valid}) "
          f"lm degree mean={deg.mean():.1f} max={deg.max()}")

    K = jnp.asarray(cfg.camera.K())
    fixed_cam = jnp.zeros(args.kfs, bool).at[0].set(True)
    fixed_cam = jnp.concatenate(
        [fixed_cam, jnp.ones(m.nk - args.kfs, bool)])
    fixed_lm = ~m.mp.valid
    Tcw0, Xw0 = m.kf.Tcw, m.mp.Xw

    def bench(name, solver):
        r = solver(Tcw0, Xw0, obs, K, fixed_cam, fixed_lm, 1)
        jax.block_until_ready(r.Tcw)          # compile + plan build
        t0 = time.perf_counter()
        r = solver(Tcw0, Xw0, obs, K, fixed_cam, fixed_lm, args.iters)
        jax.block_until_ready(r.Tcw)
        dt = time.perf_counter() - t0
        ms = dt / args.iters * 1e3
        print(f"{name:12s} {ms:9.1f} ms/LM-iter  "
              f"({args.iters / dt:.3f} it/s)  cost={float(r.cost):.1f}")
        return ms

    ms_cm = bench("comp-major", sharded_ba.make_matrix_free_gba(
        pcg_iters=args.pcg))

    # roofline (dual-layout formulation): the PCG sweep reads both W copies
    # (2 x O x 18 f32), writes/reads the (3,O)/(6,O) intermediates
    # (~O x 15 f32), one (6,O) small-table gather expand + one (3,O)
    # landmark gather (O x 9 f32 + O x 2 index words), plus the cumsum
    # segment reduce (O x 6 f32 read+write)
    bytes_sweep = 4 * O * (18 * 2 + 15 + 9 + 2 + 6)
    # per LM iteration: the residual/Jacobian pipeline runs once per layout
    # (~2 x O x 45 f32 of streamed per-obs arrays incl. W construction) +
    # Hll cumsum assembly (O x 9 x 2) + accept/reject re-projection (O x 12)
    bytes_iter = 4 * O * (2 * 45 + 18 + 12) + args.pcg * bytes_sweep
    hbm = 819e9   # v5e HBM spec bandwidth
    meas = 375e9  # measured practical stream ceiling (tools/bench_hbm.py)
    sol_ms = bytes_iter / hbm * 1e3
    prac_ms = bytes_iter / meas * 1e3
    print(f"roofline: ~{bytes_iter / 2**30:.2f} GiB/LM-iter -> "
          f"{sol_ms:.1f} ms at {hbm / 1e9:.0f} GB/s spec "
          f"({prac_ms:.1f} ms at the {meas / 1e9:.0f} GB/s measured "
          f"axpy ceiling); achieved "
          f"{prac_ms / ms_cm * 100:.0f}% of the practical ceiling "
          f"({ms_cm:.1f} ms)")


if __name__ == "__main__":
    main()
