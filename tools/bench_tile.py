"""A/B the round-5 fused tile-stream GBA against the round-4 dual-layout
path on the real chip at the server operating point.

Usage: python tools/bench_tile.py [--kfs 2048] [--mps 65536] [--iters 10]
       [--which tile|old|both] [--mesh N  (virtual CPU mesh A/B)]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kfs", type=int, default=2048)
    ap.add_argument("--mps", type=int, default=65536)
    ap.add_argument("--obs-per-kf", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pcg", type=int, default=25)
    ap.add_argument("--which", default="both")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the tile solver over an N-device mesh")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from motioncheck_ccm_slam_tpu.parallel import sharded_ba
    from motioncheck_ccm_slam_tpu.solvers import ba_core

    rng = np.random.default_rng(7)
    C, L = args.kfs, args.mps
    O = C * args.obs_per_kf
    pts = rng.uniform(-8, 8, (L, 3)).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    Tcw[:, 0, 3] = rng.uniform(-0.5, 0.5, C)
    Tcw[:, 1, 3] = rng.uniform(-0.5, 0.5, C)
    fx = fy = 458.0
    cx, cy = 376.0, 240.0
    K = jnp.asarray(np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                             np.float32))
    cam_idx = np.repeat(np.arange(C), args.obs_per_kf).astype(np.int32)
    lm_idx = rng.integers(0, L, O).astype(np.int32)
    pc = np.einsum("oij,oj->oi", Tcw[cam_idx][:, :3, :3], pts[lm_idx]) \
        + Tcw[cam_idx][:, :3, 3]
    z = np.maximum(pc[:, 2], 1e-3)
    uv = np.stack([fx * pc[:, 0] / z + cx, fy * pc[:, 1] / z + cy], -1)
    uv = (uv + rng.normal(0, 0.5, uv.shape)).astype(np.float32)
    obs = ba_core.BAObservations(
        cam_idx=jnp.asarray(cam_idx), lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(uv), inv_sigma2=jnp.ones(O, jnp.float32),
        valid=jnp.ones(O, bool),
    )
    fixed_cam = jnp.zeros(C, bool).at[0].set(True)
    fixed_lm = jnp.zeros(L, bool)
    gargs = (jnp.asarray(Tcw), jnp.asarray(pts), obs, K, fixed_cam,
             fixed_lm)

    def run(name, gba):
        r = gba(*gargs, n_iterations=1)
        float(r.cost)  # compile + warm
        t0 = time.perf_counter()
        r = gba(*gargs, n_iterations=args.iters)
        c = float(r.cost)
        dt = time.perf_counter() - t0
        print(f"{name:28s} {args.iters / dt:7.3f} LM it/s   "
              f"({dt / args.iters * 1e3:7.1f} ms/it)  cost={c:.4g}",
              flush=True)

    if args.which in ("old", "both"):
        run("dual-layout (round 4)",
            sharded_ba.make_matrix_free_gba(pcg_iters=args.pcg))
    if args.which in ("tile", "both"):
        mesh = None
        if args.mesh:
            from jax.sharding import Mesh
            mesh = Mesh(np.array(jax.devices()[:args.mesh]),
                        (sharded_ba.AXIS,))
        run(f"tile-stream (mesh={args.mesh or 1})",
            sharded_ba.make_tile_gba(mesh, pcg_iters=args.pcg))
    if args.which == "stages":
        bench_stages(jax, jnp, sharded_ba, gargs, K, args)


def bench_stages(jax, jnp, sharded_ba, gargs, K, args):
    """Per-kernel timings of one tile-stream LM iteration's pieces."""
    from motioncheck_ccm_slam_tpu.ops import schur_pallas as spk

    Tcw, Xw, obs, K, fixed_cam, fixed_lm = gargs
    C, L = Tcw.shape[0], Xw.shape[0]
    tp = sharded_ba.build_tile_plan(obs, C, L)
    sp = tp.sp
    print(f"plan: ntl={sp.ntl} TP={sp.TP} OP={sp.ntl * sp.TP} "
          f"ng={sp.n_groups} L_pad={sp.L_pad}")
    K4 = jnp.reshape(jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]), (1, 4))
    uv_z = jnp.concatenate([obs.uv, jnp.zeros((1, 2), obs.uv.dtype)], 0)
    uv_s = uv_z[tp.to_orig].T
    is2_s = jnp.concatenate([obs.inv_sigma2, jnp.zeros(1)])[
        tp.to_orig][None, :]
    valid_s = jnp.concatenate([obs.valid, jnp.zeros(1, bool)])[
        tp.to_orig].astype(jnp.float32)[None, :]
    free_s = valid_s
    t0, t1, t2 = spk.pose_tables(Tcw, sp.n_groups)
    X8 = spk.point_table(Xw.T, sp.L_pad)
    W18, aux, hllbl, acc1 = spk.d1_assemble(
        sp.camid, sp.lmloc, uv_s, is2_s, valid_s, free_s, K4, t0, t1, t2,
        X8, TP=sp.TP)
    from motioncheck_ccm_slam_tpu.solvers import ba_core
    Hll = hllbl[0:9].T.reshape(sp.L_pad, 3, 3)
    H9 = ba_core.inv33(Hll).reshape(sp.L_pad, 9).T
    v = jnp.ones((C, 6), jnp.float32)
    u8 = jnp.zeros((8, sp.L_pad), jnp.float32)

    import time

    def timeit(name, fn, x0, reps=20):
        """In-graph repetitions (one dispatch ~25 ms on the remote
        platform): fn(x) -> array; the carry perturbs the input so XLA
        cannot hoist the body."""

        def loop(x):
            def body(_, carry):
                x_, acc = carry
                r = fn(x_ * (1.0 + acc * 1e-30))
                return x_, acc + jnp.sum(r).astype(jnp.float32) * 1e-30
            _, acc = jax.lax.fori_loop(0, reps, body,
                                       (x, jnp.float32(0.0)))
            return acc

        g = jax.jit(loop)
        float(g(x0))
        t0_ = time.perf_counter()
        float(g(x0))
        ms = (time.perf_counter() - t0_) / reps * 1e3
        print(f"{name:28s} {ms:8.2f} ms", flush=True)

    timeit("D1 assemble", lambda x: spk.d1_assemble(
        sp.camid, sp.lmloc, uv_s * x, is2_s, valid_s, free_s, K4, t0, t1,
        t2, X8, TP=sp.TP)[3], jnp.float32(1.0))
    timeit("D2 precond", lambda x: spk.d2_precond(
        sp.camid, sp.lmloc, W18 * x, H9, TP=sp.TP, ng=sp.n_groups),
        jnp.float32(1.0))
    timeit("D0 cost", lambda x: spk.d0_cost(
        sp.camid, sp.lmloc, uv_s * x, is2_s, valid_s, K4, t0, t1, t2, X8,
        TP=sp.TP), jnp.float32(1.0))
    timeit("S sweep (fused A+B)", lambda vv: spk.s_apply(
        sp.camid, sp.lmloc, W18, vv, H9, TP=sp.TP), v)
    timeit("A alone", lambda vv: spk.apply_a_raw(
        sp.camid, sp.lmloc, W18, vv, H9, TP=sp.TP), v)
    timeit("B alone", lambda x: spk.apply_b_raw(
        sp.camid, sp.lmloc, W18, u8 + x, C, TP=sp.TP), jnp.float32(0.0))


if __name__ == "__main__":
    main()
