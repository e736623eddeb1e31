"""In-graph bandwidth ceiling probe: times hot primitives inside ONE jitted
fori_loop (no per-call dispatch), giving the practical HBM ceiling on this
chip and the true in-graph cost of each GBA building block.

Usage: python tools/bench_hbm.py
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

N_IN = 50          # in-graph repetitions


def timeit_graph(name, make_body, x0, bytes_per_rep):
    """make_body(i, x) -> x; runs N_IN reps inside one jit."""

    @jax.jit
    def run(x):
        out = jax.lax.fori_loop(0, N_IN, make_body, x)
        return jnp.sum(out)          # scalar: the fetch forces completion

    float(run(x0))   # compile + warm (block_until_ready does not await on
    #                  remote platforms; a scalar fetch does)
    t0 = time.perf_counter()
    float(run(x0))
    dt = time.perf_counter() - t0
    ms = dt / N_IN * 1e3
    print(f"{name:44s} {ms:8.2f} ms/rep  "
          f"{bytes_per_rep / ms * 1e3 / 2**30:8.1f} GiB/s", flush=True)
    return ms


def main():
    print(f"devices={jax.devices()}", flush=True)
    O = 2048000
    C, L, seg = 2048, 65536, 1000

    # 1. pure elementwise stream: the practical bandwidth ceiling
    x = jax.random.normal(jax.random.PRNGKey(0), (64 * 1024 * 1024,),
                          jnp.float32)                     # 256 MB
    timeit_graph("axpy 256MB (read+write)",
                 lambda i, xx: xx * 1.000001 + 0.5, x,
                 2 * x.size * 4)

    # 2. comp-major einsum (per-sweep shape)
    W = jax.random.normal(jax.random.PRNGKey(1), (6, 3, O), jnp.float32)
    vg = jax.random.normal(jax.random.PRNGKey(2), (6, O), jnp.float32)

    def body_e(i, acc):
        return acc + jnp.einsum("ijo,io->jo", W, vg * (1 + 1e-9 * i))
    timeit_graph("einsum (6,3,O)x(6,O)->(3,O)",
                 body_e, jnp.zeros((3, O)), 4 * O * (18 + 6 + 3))

    # 3. gather (3,L) -> (3,O)
    lm_idx = jnp.asarray(
        np.random.default_rng(0).integers(0, L, O).astype(np.int32))
    u = jax.random.normal(jax.random.PRNGKey(3), (3, L), jnp.float32)

    def body_g(i, acc):
        return acc + u[:, lm_idx] * (1 + 1e-9 * i)
    timeit_graph("gather u[:,lm_idx] (3,L)->(3,O)",
                 body_g, jnp.zeros((3, O)), 4 * O * (3 + 1))

    # 3b. gather along leading axis (L,3) -> (O,3)
    uT = u.T.copy()

    def body_g2(i, acc):
        return acc + uT[lm_idx] * (1 + 1e-9 * i)
    timeit_graph("gather u[lm_idx] (L,3)->(O,3)",
                 body_g2, jnp.zeros((O, 3)), 4 * O * (3 + 1))

    # 3c. gather width 128 (pad the minor dim to a full vreg lane)
    u128 = jax.random.normal(jax.random.PRNGKey(4), (L, 128), jnp.float32)

    def body_g3(i, acc):
        return acc + u128[lm_idx[:200000]] * (1 + 1e-9 * i)
    timeit_graph("gather (L,128)->(200k,128)",
                 body_g3, jnp.zeros((200000, 128)), 4 * 200000 * 129)

    # 4. cumsum along minor axis (3,O)
    w3 = jax.random.normal(jax.random.PRNGKey(5), (3, O), jnp.float32)

    def body_c(i, acc):
        return acc + jnp.cumsum(w3 * (1 + 1e-9 * i), 1)[:, -1:]
    timeit_graph("cumsum (3,O) axis1",
                 body_c, jnp.zeros((3, 1)), 4 * O * 3 * 2)

    # 4b. cumsum along major axis (O,3)
    w3T = w3.T.copy()

    def body_c2(i, acc):
        return acc + jnp.cumsum(w3T * (1 + 1e-9 * i), 0)[-1:, :]
    timeit_graph("cumsum (O,3) axis0",
                 body_c2, jnp.zeros((1, 3)), 4 * O * 3 * 2)

    # 5. camera broadcast + reshape (6,C) -> (6,O)
    v6 = jax.random.normal(jax.random.PRNGKey(6), (6, C), jnp.float32)

    def body_b(i, acc):
        b = jnp.broadcast_to((v6 * (1 + 1e-9 * i))[..., None],
                             (6, C, seg)).reshape(6, O)
        return acc + b
    timeit_graph("broadcast (6,C)->(6,O)",
                 body_b, jnp.zeros((6, O)), 4 * O * 6)

    # 6. camera reshape-sum (6,O) -> (6,C)
    def body_s(i, acc):
        return acc + (vg * (1 + 1e-9 * i)).reshape(6, C, seg).sum(-1)
    timeit_graph("reshape-sum (6,O)->(6,C)",
                 body_s, jnp.zeros((6, C)), 4 * O * 6)

    # 7. full Schur matvec, comp-major (the real per-sweep graph)
    from motioncheck_ccm_slam_tpu.parallel import sharded_ba as sb
    order = jnp.asarray(np.argsort(np.asarray(lm_idx), kind="stable")
                        .astype(np.int32))
    counts = np.bincount(np.asarray(lm_idx), minlength=L)
    bounds = np.zeros(L + 1, np.int64)
    bounds[1:] = np.cumsum(counts)
    bounds = jnp.asarray(bounds.astype(np.int32))
    Hll_inv_t = jnp.broadcast_to(jnp.eye(3)[..., None], (3, 3, L)).copy()
    Hcc_d = jnp.broadcast_to(jnp.eye(6)[None], (C, 6, 6)).copy()
    v0 = jax.random.normal(jax.random.PRNGKey(8), (C, 6), jnp.float32)

    def mv_base(v):
        """No landmark side: broadcast + 2 einsums + reshape-sum."""
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        vgb = sb._rep_cam(v.T, seg)
        wtv = jnp.einsum("ijo,io->jo", W, vgb)
        wu = jnp.einsum("ijo,jo->io", W, jnp.tanh(wtv))
        return Hv - sb._cam_sum_t(wu, C, seg).T

    def mv_perm(v):
        """+ the lm_order permutation of (3,O)."""
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        vgb = sb._rep_cam(v.T, seg)
        wtv = jnp.einsum("ijo,io->jo", W, vgb)[:, order]
        wu = jnp.einsum("ijo,jo->io", W, jnp.tanh(wtv))
        return Hv - sb._cam_sum_t(wu, C, seg).T

    def mv_lmred(v):
        """+ cumsum/boundary reduction + Hll solve, no re-expansion."""
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        vgb = sb._rep_cam(v.T, seg)
        wtv = jnp.einsum("ijo,io->jo", W, vgb)
        uu = jnp.einsum("ijl,jl->il", Hll_inv_t,
                        sb._lm_sum_t(wtv[:, order], bounds))
        wu = jnp.einsum("ijo,jo->io", W, wtv + jnp.sum(uu) * 1e-9)
        return Hv - sb._cam_sum_t(wu, C, seg).T

    def mv_full(v):
        Hv = jnp.einsum("cij,cj->ci", Hcc_d, v)
        vgb = sb._rep_cam(v.T, seg)
        wtv = jnp.einsum("ijo,io->jo", W, vgb)
        uu = jnp.einsum("ijl,jl->il", Hll_inv_t,
                        sb._lm_sum_t(wtv[:, order], bounds))
        ug = uu[:, lm_idx]
        wu = jnp.einsum("ijo,jo->io", W, ug)
        return Hv - sb._cam_sum_t(wu, C, seg).T

    for name, mv in [("matvec base (no lm side)", mv_base),
                     ("matvec + perm", mv_perm),
                     ("matvec + perm+cumsum+solve", mv_lmred),
                     ("matvec FULL (+u gather)", mv_full)]:
        def body_m(i, v, mv=mv):
            return mv(v) * 1e-3 + v0
        timeit_graph(name, body_m, v0, 4 * O * (18 * 2 + 15))


if __name__ == "__main__":
    main()
