"""Fused tile-stream GBA (schur_pallas D0/D1/D2/S + sharded_ba.make_tile_gba)
vs the dense-W and gather formulations, single-device and on the virtual
8-device mesh. Kernels run in interpret mode on CPU (auto)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from motioncheck_ccm_slam_tpu.ops import lie, schur_pallas
from motioncheck_ccm_slam_tpu.parallel import sharded_ba
from motioncheck_ccm_slam_tpu.solvers import ba_core, local_ba

from test_ba import synth_scene, K


def _perturbed(rng, n_cams=8, n_pts=200):
    Tcw_true, pts_true, obs = synth_scene(rng, n_cams=n_cams, n_pts=n_pts,
                                          obs_noise=0.2)
    Tcw_init = np.asarray(Tcw_true).copy()
    for c in range(1, n_cams):
        xi = np.zeros(6, np.float32)
        xi[:3] = rng.normal(0, 0.005, 3)
        xi[3:] = rng.normal(0, 0.04, 3)
        Tcw_init[c] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ Tcw_init[c]
    pts_init = pts_true + jnp.asarray(
        rng.normal(0, 0.05, pts_true.shape).astype(np.float32))
    fixed_cam = jnp.zeros(n_cams, bool).at[0].set(True)
    fixed_lm = jnp.zeros(n_pts, bool)
    return (jnp.asarray(Tcw_init), pts_init, obs, fixed_cam, fixed_lm,
            Tcw_true, pts_true)


def test_d1_assembly_matches_ba_core():
    """Kernel D1's W/Hll/bl/Hcc/bc/cost against the ba_core reference
    assembly on a random scene (includes invalid obs and fixed entities)."""
    rng = np.random.default_rng(3)
    C, L = 5, 90
    Tcw, pts, obs = synth_scene(rng, n_cams=C, n_pts=L, obs_noise=0.5)
    # knock out some observations and fix some entities
    valid = np.ones(C * L, bool)
    valid[rng.integers(0, C * L, 40)] = False
    obs = obs._replace(valid=jnp.asarray(valid))
    fixed_cam = jnp.zeros(C, bool).at[0].set(True)
    fixed_lm = jnp.zeros(L, bool).at[7].set(True)

    tp = sharded_ba.build_tile_plan(obs, C, L)
    sp = tp.sp
    K4 = jnp.reshape(jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]), (1, 4))
    uv_z = jnp.concatenate([obs.uv, jnp.zeros((1, 2), jnp.float32)], 0)
    uv_s = uv_z[tp.to_orig].T
    is2_s = jnp.concatenate([obs.inv_sigma2, jnp.zeros(1)])[
        tp.to_orig][None, :]
    valid_s = jnp.concatenate([obs.valid, jnp.zeros(1, bool)])[
        tp.to_orig].astype(jnp.float32)[None, :]
    free_s = (~(fixed_cam[sp.camid[0]]
                | jnp.pad(fixed_lm, (0, sp.L_pad - L),
                          constant_values=True)[tp.lm_p])
              ).astype(jnp.float32)[None, :]
    t0, t1, t2 = schur_pallas.pose_tables(Tcw, sp.n_groups)
    X8 = schur_pallas.point_table(pts.T, sp.L_pad)
    W18, aux, hllbl, acc1 = schur_pallas.d1_assemble(
        camid=sp.camid, lmloc=sp.lmloc, uv2=uv_s, is21=is2_s,
        valid1=valid_s, free1=free_s, kp=K4, t0=t0, t1=t1, t2=t2, X8=X8,
        TP=sp.TP)

    # reference assembly
    r, pc, depth_ok = ba_core.reproject_residuals(Tcw, pts, obs, K)
    w, chi2 = ba_core.robust_obs_weights(r, obs, depth_ok)
    Jc, Jl = ba_core.reproject_jacobians(
        pc, Tcw[obs.cam_idx][:, :3, :3], K)
    Hcc_r, bc_r, Hll_r, bl_r, Wcl_r = ba_core.assemble_blocks(
        Jc, Jl, r, w, obs.cam_idx, obs.lm_idx, C, L)
    cost_r = float(local_ba._robust_cost(chi2, obs.valid))

    cam27 = schur_pallas.unpack_cam(acc1, C, schur_pallas.D1_CAM_ROWS)
    Hcc = schur_pallas.sym6_from_tri(cam27[:, :21])
    bc = cam27[:, 21:]
    Hll = hllbl[0:9].T.reshape(sp.L_pad, 3, 3)[:L]
    bl = hllbl[9:12].T[:L]
    tol = 2e-4  # two-term bf16 split on the reductions (~2^-17 relative)

    def relerr(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-6))

    assert relerr(Hcc, Hcc_r) < tol
    assert relerr(bc, bc_r) < tol
    assert relerr(Hll, Hll_r) < tol
    assert relerr(bl, bl_r) < tol
    assert abs(float(jnp.sum(aux[0])) - cost_r) / cost_r < 1e-4
    # W stream: gather the reference per-obs blocks onto tile slots
    # (free-masked, J-MAJOR row order: row j*6+i = W[i,j] — see
    # schur_pallas.pack_w). Pad slots must be zero.
    free = ~(fixed_cam[obs.cam_idx] | fixed_lm[obs.lm_idx])
    Wref = jnp.where(free[:, None, None], Wcl_r,
                     0.0).transpose(0, 2, 1).reshape(-1, 18)
    Wref_z = jnp.concatenate([Wref, jnp.zeros((1, 18))], 0)
    Wref_s = Wref_z[tp.to_orig].T
    assert relerr(W18, Wref_s) < tol
    # inlier row maps back through slot_of
    inlier_ref = obs.valid & (chi2 <= ba_core.CHI2_MONO) & depth_ok
    inlier = (aux[1] > 0.5)[tp.slot_of] & obs.valid
    assert bool(jnp.all(inlier == inlier_ref))


@pytest.mark.parametrize("n_shards", [1, 8])
def test_tile_gba_converges(n_shards):
    """The tile solver reaches the dense-W optimizer's optimum, single
    device and sharded over the virtual 8-device mesh."""
    rng = np.random.default_rng(0)
    (Tcw_i, pts_i, obs, fixed_cam, fixed_lm, Tcw_true,
     pts_true) = _perturbed(rng)
    if n_shards == 1:
        mesh = None
    else:
        mesh = Mesh(np.array(jax.devices()[:n_shards]), (sharded_ba.AXIS,))
    gba = sharded_ba.make_tile_gba(mesh, iterations=8, pcg_iters=30)
    res = gba(Tcw_i, pts_i, obs, K, fixed_cam, fixed_lm)
    dense = local_ba.bundle_adjust(Tcw_i, pts_i, obs, K, fixed_cam,
                                   fixed_lm=fixed_lm, iterations=8)
    # both should land at (essentially) the same optimum
    assert float(res.cost) < float(dense.cost) * 1.10
    pose_err = float(jnp.abs(res.Tcw - Tcw_true).max())
    assert pose_err < 0.01, pose_err
    # inlier classification agrees with the dense solver's on >99% of obs
    agree = float(jnp.mean(res.obs_inlier == dense.obs_inlier))
    assert agree > 0.99, agree


def test_tile_gba_mesh_matches_single_device():
    """Sharded and single-device tile solvers produce the same optimum
    (identical arithmetic up to psum ordering)."""
    rng = np.random.default_rng(5)
    Tcw_i, pts_i, obs, fixed_cam, fixed_lm, _, _ = _perturbed(
        rng, n_cams=6, n_pts=150)
    g1 = sharded_ba.make_tile_gba(None, iterations=5, pcg_iters=20)
    mesh = Mesh(np.array(jax.devices()), (sharded_ba.AXIS,))
    g8 = sharded_ba.make_tile_gba(mesh, iterations=5, pcg_iters=20)
    r1 = g1(Tcw_i, pts_i, obs, K, fixed_cam, fixed_lm)
    r8 = g8(Tcw_i, pts_i, obs, K, fixed_cam, fixed_lm)
    assert abs(float(r1.cost) - float(r8.cost)) <= (
        1e-3 * max(float(r1.cost), 1.0))
    assert float(jnp.abs(r1.Tcw - r8.Tcw).max()) < 1e-3
    # landmark coords are O(10): allow float-ordering divergence (psum
    # reduction order) amplified over 5 LM iterations
    assert float(jnp.abs(r1.Xw - r8.Xw).max()) < 5e-3


def test_tile_gba_dynamic_iterations_no_retrace():
    """n_iterations is a traced scalar: chunked callers reuse the compiled
    body."""
    rng = np.random.default_rng(1)
    Tcw_i, pts_i, obs, fixed_cam, fixed_lm, _, _ = _perturbed(
        rng, n_cams=4, n_pts=80)
    gba = sharded_ba.make_tile_gba(None, pcg_iters=10)
    c1 = float(gba(Tcw_i, pts_i, obs, K, fixed_cam, fixed_lm,
                   n_iterations=2).cost)
    c2 = float(gba(Tcw_i, pts_i, obs, K, fixed_cam, fixed_lm,
                   n_iterations=6).cost)
    assert c2 <= c1 * 1.05


def test_tile_gba_reject_branch_monotone():
    """Speculative linearization: starting AT a converged optimum, LM
    steps keep getting rejected (cost cannot improve) — the carried state
    and its classification must stay consistent and the cost must never
    increase across extra iterations."""
    rng = np.random.default_rng(9)
    Tcw_i, pts_i, obs, fixed_cam, fixed_lm, _, _ = _perturbed(
        rng, n_cams=5, n_pts=100)
    gba = sharded_ba.make_tile_gba(None, pcg_iters=15)
    r0 = gba(Tcw_i, pts_i, obs, K, fixed_cam, fixed_lm, n_iterations=8)
    # re-run FROM the optimum: every further candidate is ~rejected
    r1 = gba(r0.Tcw, r0.Xw, obs, K, fixed_cam, fixed_lm, n_iterations=4)
    assert float(r1.cost) <= float(r0.cost) * (1.0 + 1e-5)
    assert float(jnp.abs(r1.Tcw - r0.Tcw).max()) < 5e-3
    # classification of the carried state matches a fresh n_iterations=0
    # pass at the same state
    r2 = gba(r1.Tcw, r1.Xw, obs, K, fixed_cam, fixed_lm, n_iterations=0)
    assert bool(jnp.all(r1.obs_inlier == r2.obs_inlier))
