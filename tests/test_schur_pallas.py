"""Fused Pallas Schur matvec vs the reference gather formulation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from motioncheck_ccm_slam_tpu.ops import schur_pallas


def _problem(rng, C, L, O):
    lm_idx = np.sort(rng.integers(0, L, O)).astype(np.int32)
    cam_idx = rng.integers(0, C, O).astype(np.int32)
    Wl = rng.normal(0, 0.3, (6, 3, O)).astype(np.float32)
    v = rng.normal(0, 1.0, (C, 6)).astype(np.float32)
    Hll_inv = np.stack([np.eye(3, dtype=np.float32) * s
                        for s in rng.uniform(0.2, 2.0, L)])
    # add off-diagonal structure so the solve is exercised
    Q = rng.normal(0, 0.05, (L, 3, 3)).astype(np.float32)
    Hll_inv = Hll_inv + Q @ np.transpose(Q, (0, 2, 1))
    return lm_idx, cam_idx, Wl, v, Hll_inv


def _reference(lm_idx, cam_idx, Wl, v, Hll_inv):
    """w_c = sum_o W_o (Hll_inv[lm] sum_{o' in lm} W_{o'}^T v[cam(o')])."""
    O = lm_idx.shape[0]
    L = Hll_inv.shape[0]
    C = v.shape[0]
    wtv = np.einsum("ijo,oi->oj", Wl, v[cam_idx])          # (O,3)
    u_raw = np.zeros((L, 3), np.float64)
    np.add.at(u_raw, lm_idx, wtv)
    u = np.einsum("lij,lj->li", Hll_inv.astype(np.float64), u_raw)
    wu = np.einsum("ijo,oj->oi", Wl, u[lm_idx])            # (O,6)
    w = np.zeros((C, 6), np.float64)
    np.add.at(w, cam_idx, wu)
    return w.astype(np.float32)


@pytest.mark.parametrize("C,L,O", [(256, 256, 3000), (130, 384, 5000)])
def test_schur_apply_matches_reference(C, L, O):
    rng = np.random.default_rng(0)
    lm_idx, cam_idx, Wl, v, Hll_inv = _problem(rng, C, L, O)
    plan = schur_pallas.build_schur_plan(lm_idx, cam_idx, C, L)
    Wp = schur_pallas.pack_w(plan, jnp.asarray(Wl))
    H9 = jnp.asarray(
        np.pad(Hll_inv.reshape(L, 9).T, ((0, 0), (0, plan.L_pad - L))))
    w = schur_pallas.schur_apply(plan, Wp, jnp.asarray(v), H9,
                                 interpret=True)
    ref = _reference(lm_idx, cam_idx, Wl, v, Hll_inv)
    scale = np.abs(ref).max() + 1e-6
    err = np.abs(np.asarray(w) - ref).max() / scale
    # V rides a two-term bf16 split (~2^-17 relative); everything else is
    # exact f32 — keep a margin over that.
    assert err < 5e-5, err


def test_matrix_free_gba_with_pallas_schur(monkeypatch):
    """The full solver with the fused sweep lands where the plain XLA
    formulation lands (same scene as test_sharded_ba)."""
    from motioncheck_ccm_slam_tpu.parallel import sharded_ba
    from motioncheck_ccm_slam_tpu.ops import lie
    from test_ba import synth_scene, K

    rng = np.random.default_rng(0)
    Tcw_true, pts_true, obs = synth_scene(rng, n_cams=8, n_pts=200,
                                          obs_noise=0.2)
    Tcw_init = np.asarray(Tcw_true).copy()
    for c in range(1, 8):
        xi = np.zeros(6, np.float32)
        xi[:3] = rng.normal(0, 0.005, 3)
        xi[3:] = rng.normal(0, 0.04, 3)
        Tcw_init[c] = np.asarray(lie.se3_exp(jnp.asarray(xi))) @ Tcw_init[c]
    pts_init = pts_true + jnp.asarray(
        rng.normal(0, 0.05, pts_true.shape).astype(np.float32))
    fixed_cam = jnp.zeros(8, bool).at[0].set(True)
    fixed_lm = jnp.zeros(200, bool)

    def run():
        gba = sharded_ba.make_matrix_free_gba(iterations=8, pcg_iters=30)
        res = gba(jnp.asarray(Tcw_init), pts_init, obs, K, fixed_cam,
                  fixed_lm)
        return np.asarray(res.Tcw), float(res.cost)

    monkeypatch.setattr(sharded_ba, "PALLAS_SCHUR", "1")
    T_pal, cost_pal = run()
    monkeypatch.setattr(sharded_ba, "PALLAS_SCHUR", "0")
    T_ref, cost_ref = run()
    # same basin, near-identical trajectory (bf16 hi/lo split on V is the
    # only inexact piece of the fused sweep)
    assert np.abs(T_pal - T_ref).max() < 5e-3, np.abs(T_pal - T_ref).max()
    assert abs(cost_pal - cost_ref) / max(cost_ref, 1.0) < 0.02


def test_plan_shapes_and_padding():
    rng = np.random.default_rng(1)
    C, L, O = 64, 200, 700
    lm_idx, cam_idx, Wl, v, Hll_inv = _problem(rng, C, L, O)
    plan = schur_pallas.build_schur_plan(lm_idx, cam_idx, C, L)
    assert plan.L_pad % schur_pallas.LM_BLOCK == 0
    assert plan.TP % 128 == 0
    assert plan.camid.shape == (1, plan.ntl * plan.TP)
    # every real observation appears exactly once
    perm = np.asarray(plan.perm)
    real = perm[perm < O]
    assert len(real) == O and len(np.unique(real)) == O


def test_invalid_obs_excluded_from_plan():
    """The product stream parks empty feature slots at landmark 0; the
    plan must skip them or tile 0's padded width explodes (this crashed
    the first on-chip product GBA with a 512 MB VMEM scratch demand)."""
    rng = np.random.default_rng(2)
    C, L, O = 130, 384, 5000
    lm_idx, cam_idx, Wl, v, Hll_inv = _problem(rng, C, L, O)
    # park 60% of slots at landmark 0, invalid
    valid = rng.uniform(size=O) < 0.4
    lm_idx = np.where(valid, lm_idx, 0).astype(np.int32)
    lm_order = np.argsort(lm_idx, kind="stable")
    lm_idx, cam_idx, valid = (lm_idx[lm_order], cam_idx[lm_order],
                              valid[lm_order])
    Wl = Wl[:, :, lm_order]
    Wl_masked = np.where(valid[None, None, :], Wl, 0.0)
    plan = schur_pallas.build_schur_plan(lm_idx, cam_idx, C, L,
                                         valid_sorted=valid)
    # the dead slots don't inflate the padded tile width
    assert plan.TP <= schur_pallas._round_up(
        int(np.bincount(lm_idx[valid], minlength=L)
            .reshape(-1, 128).sum(1).max()) + 128, 128) + 128
    Wp = schur_pallas.pack_w(plan, jnp.asarray(Wl_masked))
    H9 = jnp.asarray(
        np.pad(Hll_inv.reshape(L, 9).T, ((0, 0), (0, plan.L_pad - L))))
    w = schur_pallas.schur_apply(plan, Wp, jnp.asarray(v), H9,
                                 interpret=True)
    ref = _reference(lm_idx, cam_idx, Wl_masked, v, Hll_inv)
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(np.asarray(w) - ref).max() / scale < 5e-5
