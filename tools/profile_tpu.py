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


def main_gba(n_kfs=2048, n_mps=65536, obs_per_kf=1000, pcg_iters=25):
    """Per-stage breakdown of one GBA LM iteration at the server operating
    point: residual+Jacobian, block assembly, single Schur matvec, full PCG
    solve, and the whole iteration — with the analytic HBM roofline."""
    import functools

    import jax.numpy as jnp

    from motioncheck_ccm_slam_tpu.models import gba as gba_mod
    from motioncheck_ccm_slam_tpu.parallel import sharded_ba
    from motioncheck_ccm_slam_tpu.solvers import ba_core
    from motioncheck_ccm_slam_tpu.solvers.local_ba import _robust_cost
    from motioncheck_ccm_slam_tpu.utils import bigmap

    print(f"platform: {jax.devices()[0]}", flush=True)
    m, cfg, _ = bigmap.build_server_scale_map(
        n_kfs=n_kfs, n_mps=n_mps, obs_per_kf=obs_per_kf, seed=0)
    obs = gba_mod.build_observations(m.kf, cfg)
    O = int(obs.cam_idx.shape[0])
    C, L = m.nk, m.mp.Xw.shape[0]
    K = jnp.asarray(cfg.camera.K())
    Tcw, Xw = m.kf.Tcw, m.mp.Xw
    fixed_cam = ~m.kf.valid
    fixed_lm = ~m.mp.valid
    cam_plan = ba_core.build_segment_plan(np.asarray(obs.cam_idx), C)
    lm_plan = ba_core.build_segment_plan(np.asarray(obs.lm_idx), L,
                                         valid=np.asarray(obs.valid))
    ss = ba_core.build_sorted_segments(np.asarray(obs.lm_idx), L)
    print(f"C={C} L={L} O={O} pcg={pcg_iters}")

    def time_fn(name, f, *args):
        r = jax.block_until_ready(jax.jit(f)(*args))
        t0 = time.perf_counter()
        r = jax.block_until_ready(jax.jit(f)(*args))
        dt = time.perf_counter() - t0
        print(f"{name:34s} {dt*1e3:9.1f} ms", flush=True)
        return dt

    def resjac(Tcw, Xw):
        r, pc, depth_ok = ba_core.reproject_residuals(Tcw, Xw, obs, K)
        w, chi2 = ba_core.robust_obs_weights(r, obs, depth_ok)
        Rm = Tcw[obs.cam_idx][:, :3, :3]
        Jc, Jl = ba_core.reproject_jacobians(pc, Rm, K)
        return r, w, Jc, Jl
    time_fn("residual+jacobian", resjac, Tcw, Xw)

    def assemble(Tcw, Xw):
        r, w, Jc, Jl = resjac(Tcw, Xw)
        return ba_core.assemble_blocks(
            Jc, Jl, r, w, obs.cam_idx, obs.lm_idx, C, L,
            cam_plan=cam_plan, lm_plan=lm_plan)
    out = jax.block_until_ready(jax.jit(assemble)(Tcw, Xw))
    time_fn("  +assemble_blocks (plan)", assemble, Tcw, Xw)
    Hcc, bc, Hll, bl, Wcl = out
    Hcc_d = ba_core.damp_blocks(Hcc, 1e-4)
    Hll_inv = ba_core.inv33(ba_core.damp_blocks(Hll, 1e-4))
    ident = lambda x: x  # noqa: E731

    def matvec_once(v):
        return sharded_ba._schur_matvec(
            v, Hcc_d, Hll_inv, Wcl, obs.cam_idx, obs.lm_idx, C, L, ident,
            cam_plan=cam_plan, lm_plan=lm_plan)
    v0 = jnp.ones((C, 6), jnp.float32)
    t_mv = time_fn("schur matvec x1 (plan)", matvec_once, v0)

    def lm_seg_sorted(x):
        return ba_core.sorted_seg_sum(x[ss.order], ss.bounds)

    def matvec_sorted(v):
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        wtv = jnp.einsum("oij,oi->oj", Wcl, v[obs.cam_idx])
        u = jnp.einsum("lij,lj->li", Hll_inv, lm_seg_sorted(wtv))
        wu = jnp.einsum("oij,oj->oi", Wcl, u[obs.lm_idx])
        w_ = ba_core.seg_sum(cam_plan, wu)
        return Hv - w_
    time_fn("schur matvec x1 (sorted)", matvec_sorted, v0)

    M_inv = jnp.linalg.inv(Hcc_d + 1e-6 * jnp.eye(6)[None])

    def pcg_full(v):
        return sharded_ba._pcg(matvec_once, v, M_inv, pcg_iters)
    t_pcg = time_fn(f"pcg solve ({pcg_iters} max)", pcg_full, bc)

    def full_iter(Tcw, Xw):
        (T, X, lam, _g0), cost = sharded_ba._gba_iteration(
            (Tcw, Xw, jnp.float32(1e-4), jnp.float32(-1.0)), obs, K,
            fixed_cam, fixed_lm, C, L, pcg_iters, ident,
            cam_plan=cam_plan, lm_plan=lm_plan)
        return T, X, cost
    t_it = time_fn("full LM iteration (plan)", full_iter, Tcw, Xw)

    bytes_sweep = 4 * O * (18 * 2 + 24 + 9 + 6)
    bytes_iter = 4 * O * 60 + pcg_iters * bytes_sweep
    hbm = 819e9
    print(f"roofline: matvec ~{4 * O * 57 / 2**30:.2f} GiB -> "
          f"{4 * O * 57 / hbm * 1e3:.1f} ms (measured {t_mv*1e3:.1f}); "
          f"iter ~{bytes_iter / 2**30:.1f} GiB -> {bytes_iter/hbm*1e3:.1f} ms"
          f" (measured {t_it*1e3:.1f}, "
          f"{bytes_iter / hbm / t_it * 100:.0f}% of speed-of-light)")


if __name__ == "__main__":
    if "--gba" in sys.argv:
        main_gba()
    else:
        main()
