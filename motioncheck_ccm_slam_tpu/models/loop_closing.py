"""Server-side intra-map loop closing.

Replaces the reference ``LoopFinder`` (src/LoopFinder.cpp): BoW candidate
detection with covisibility-consistency confirmation, Sim3 RANSAC +
refinement between the current and loop keyframes, correction propagation
over the current covisibility neighborhood, landmark fusion, essential-graph
optimization, and a Motion-Check-gated GBA.

The thread/queue structure is replaced by ``LoopCloser.process_keyframe``
invoked by the server per arriving KF; all numeric stages are the batched
kernels from ops/ and solvers/.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import lie, matching, ransac
from ..solvers import pose_graph, sim3_opt
from . import database as db_mod
from . import gba as gba_mod
from . import map_state as ms


def kf_landmark_side(kf, mp, slot):
    """Per-feature landmark view of one keyframe for Sim3-guided matching:
    descriptors, camera-frame landmark coords, uv, octave, landmark slots,
    and validity (feature valid, associated, landmark alive)."""
    idx = np.asarray(kf.mp_idx[slot])
    nm = mp.Xw.shape[0]
    safe = np.clip(idx, 0, nm - 1)
    valid = (np.asarray(kf.feat_valid[slot]) & (idx >= 0)
             & np.asarray(mp.valid)[safe])
    Xw = mp.Xw[jnp.asarray(safe.astype(np.int32))]
    Xc = lie.transform_points(kf.Tcw[slot], Xw[None])[0]
    return {
        "desc": kf.desc[slot], "Xc": Xc, "valid": jnp.asarray(valid),
        "uv": kf.xy[slot], "octave": kf.octave[slot], "mp": idx,
    }


def sim3_guided_refine(side1, side2, S12_cam, feat1, feat2, inliers,
                       config: Config, K, radius: float = 7.5):
    """Sim3-guided correspondence harvest + joint re-optimization (reference
    ComputeSim3's second stage: matcher.SearchBySim3 with radius 7.5 then
    OptimizeSim3 over the union — src/LoopFinder.cpp:326-345,
    src/MapMatcher.cpp:330-345).

    side1/side2: outputs of :func:`kf_landmark_side`. ``S12_cam`` maps
    camera-2 coords into camera 1. feat1/feat2/inliers: the RANSAC stage's
    matched feature pairs + inlier mask. Returns
    (Sim3OptResult, union_feat1, union_feat2, union_mp1, union_mp2).
    """
    guided = matching.search_by_sim3(
        side1["desc"], side1["Xc"], side1["valid"],
        side2["desc"], side2["Xc"], side2["valid"],
        jnp.asarray(S12_cam), K, radius=radius,
    )
    g_ok = np.asarray(guided.ok)
    g_idx = np.asarray(guided.idx)
    have1 = np.zeros(g_ok.shape[0], bool)
    have1[feat1] = True
    have2 = np.zeros(np.asarray(side2["valid"]).shape[0], bool)
    have2[feat2] = True
    add1 = np.flatnonzero(g_ok & ~have1 & ~have2[g_idx])
    add2 = g_idx[add1]
    u1 = np.concatenate([feat1, add1])
    u2 = np.concatenate([feat2, add2])
    active0 = np.concatenate([np.asarray(inliers, bool),
                              np.ones(len(add1), bool)])
    j1 = jnp.asarray(u1.astype(np.int32))
    j2 = jnp.asarray(u2.astype(np.int32))
    from ..ops import orb as orb_mod

    inv_s2 = jnp.asarray(orb_mod.inv_level_sigma2(config.extractor))
    nlev = config.extractor.n_levels - 1
    opt = sim3_opt.optimize_sim3(
        jnp.asarray(S12_cam),
        side1["Xc"][j1], side2["Xc"][j2],
        side1["uv"][j1], side2["uv"][j2],
        inv_s2[jnp.clip(side1["octave"][j1], 0, nlev)],
        inv_s2[jnp.clip(side2["octave"][j2], 0, nlev)],
        jnp.asarray(active0), K,
    )
    return opt, u1, u2, side1["mp"][u1], side2["mp"][u2]


@dataclasses.dataclass
class LoopCloser:
    config: Config
    map: ms.MapState
    database: db_mod.KeyFrameDatabase
    map_id: int = 0
    # covisibility-consistency state (reference DetectLoop :103):
    # list of (group: set[slot], count)
    consistent_groups: List[Tuple[Set[int], int]] = dataclasses.field(
        default_factory=list
    )
    last_loop_kf_id: int = -1
    n_loops_closed: int = 0
    rng_key: jax.Array = dataclasses.field(
        default_factory=lambda: jax.random.PRNGKey(42)
    )
    run_gba_after_loop: bool = True
    # injectable GBA solver (tests corrupt it to exercise the MC gate);
    # None = run_gba's size-based selection
    gba_solver: Optional[object] = None
    n_regba: int = 0

    # ------------------------------------------------------------------
    def _covis_group(self, slot: int, W=None, thres: float = 15.0) -> Set[int]:
        if W is None:
            # one row is enough — avoids the full O(NK^2) matrix per tick
            w = np.asarray(ms.covisibility_row(self.map.kf, self.map.nm, slot))
        else:
            w = W[slot]
        return set(np.flatnonzero(w >= thres).tolist()) | {slot}

    # ------------------------------------------------------------------
    def detect(self, slot: int) -> Optional[int]:
        """BoW detection + consistency confirmation. Returns the accepted
        loop candidate slot or None (reference DetectLoop)."""
        cfg = self.config.placerec
        kf = self.map.kf
        kf_id = int(np.asarray(kf.kf_id[slot]))
        # respect the cooldown after a closed loop (reference: NewLoopThres)
        if self.last_loop_kf_id >= 0 and kf_id < self.last_loop_kf_id + cfg.new_loop_thres:
            self.database.add(slot, kf.desc[slot], kf.feat_valid[slot],
                              map_id=self.map_id)
            return None
        covis_mask = np.zeros(self.map.nk, bool)
        grp = self._covis_group(slot)
        covis_mask[list(grp)] = True
        qbow = self.database.add(slot, kf.desc[slot], kf.feat_valid[slot],
                                 map_id=self.map_id)
        cands, scores = self.database.detect_loop_candidates(
            slot, qbow, covis_mask
        )
        if len(cands) == 0:
            self.consistent_groups = []
            return None
        # consistency: a candidate's covis group must intersect a previous
        # group for covisibility_consistency_th consecutive detections
        new_groups: List[Tuple[Set[int], int]] = []
        accepted = None
        for cand in cands:
            cand_grp = self._covis_group(int(cand))
            best_count = 0
            for grp_prev, count in self.consistent_groups:
                if cand_grp & grp_prev:
                    best_count = max(best_count, count + 1)
            new_groups.append((cand_grp, best_count))
            if best_count + 1 >= cfg.covisibility_consistency_th and accepted is None:
                accepted = int(cand)
        self.consistent_groups = new_groups
        return accepted

    # ------------------------------------------------------------------
    def compute_sim3(self, cur: int, cand: int):
        """Sim3 between current and candidate KF from matched landmarks
        (reference ComputeSim3 :231). Returns (S12 [sR|t] mapping cand-camera
        coords -> cur-camera coords, matched mp pairs) or None."""
        kf, mp = self.map.kf, self.map.mp
        m = matching.mutual_match(
            kf.desc[cur], kf.feat_valid[cur] & (kf.mp_idx[cur] >= 0),
            kf.desc[cand], kf.feat_valid[cand] & (kf.mp_idx[cand] >= 0),
            max_dist=matching.TH_LOW,
        )
        ok = np.asarray(m.ok)
        if ok.sum() < self.config.opt.matches_thres:
            return None
        feat1 = np.flatnonzero(ok)
        feat2 = np.asarray(m.idx)[feat1]
        mp1 = np.asarray(kf.mp_idx[cur])[feat1]
        mp2 = np.asarray(kf.mp_idx[cand])[feat2]
        X1w = mp.Xw[jnp.asarray(mp1)]
        X2w = mp.Xw[jnp.asarray(mp2)]
        # camera-frame coordinates
        p1 = lie.transform_points(kf.Tcw[cur], X1w[None])[0]
        p2 = lie.transform_points(kf.Tcw[cand], X2w[None])[0]
        uv1 = kf.xy[cur][jnp.asarray(feat1)]
        uv2 = kf.xy[cand][jnp.asarray(feat2)]
        K = jnp.asarray(self.config.camera.K())
        self.rng_key, sub = jax.random.split(self.rng_key)
        # RANSAC maps p2 -> p1 (S12)
        # RANSAC needs only opt.min_inliers (reference Opt.MinInliers = 6,
        # cslam/conf/config.yaml:127) — the strict inliers_thres gate applies
        # AFTER Sim3-guided densification, so a marginal revisit can be
        # rescued by guided matches (reference LoopFinder.cpp:277,326-333)
        res = ransac.sim3_ransac(
            sub, p2, p1, uv2, uv1,
            jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32), K,
            jnp.ones(len(feat1), bool),
            min_inliers=self.config.opt.min_inliers, fix_scale=False,
        )
        if not bool(res.success):
            return None
        S12 = lie.make_sim3(res.R, res.t, res.s)
        # Sim3-guided harvest of additional correspondences, then refine on
        # the union with bidirectional projection residuals (reference
        # SearchBySim3 radius 7.5 + second OptimizeSim3,
        # src/LoopFinder.cpp:326-345) — marginal revisits whose mutual-match
        # inliers alone fall short are accepted when guided matches push the
        # union over the bar
        side1 = kf_landmark_side(kf, mp, cur)
        side2 = kf_landmark_side(kf, mp, cand)
        opt, feat1, feat2, mp1, mp2 = sim3_guided_refine(
            side1, side2, S12, feat1, feat2, np.asarray(res.inliers),
            self.config, K,
        )
        if int(opt.n_inliers) < self.config.opt.inliers_thres:
            return None
        # scale plausibility gate: monocular drift between a revisit and the
        # stored map is bounded; a wildly scaled Sim3 fit means the match/
        # refinement latched onto a degenerate configuration and applying it
        # would shear the whole neighborhood (relative offsets divide by s)
        _, _, s = lie.split_sim3(opt.S12)
        if not (0.5 < float(s) < 2.0):
            return None
        return opt.S12, (feat1, feat2, mp1, mp2, np.asarray(opt.inliers))

    # ------------------------------------------------------------------
    def correct_loop(self, cur: int, cand: int, S12, match_info,
                     interrupt_check=None) -> bool:
        """Propagate the loop correction, fuse, optimize the essential graph,
        and trigger the Motion-Check-gated GBA (reference CorrectLoop :407)."""
        cfg = self.config
        m = self.map
        kf, mp = m.kf, m.mp
        minfeat = cfg.opt.ess_graph_min_feats
        # pre-fusion covisibility: computed ONCE on device, fetched as the
        # thresholded boolean matrix + the current KF's row (the only float
        # row any consumer needs) — not the full O(NK²) float matrix
        Wd = ms.covisibility(kf, m.nm)
        row_cur = np.asarray(Wd[cur])
        Wb_ge = np.asarray(Wd >= minfeat)

        # snapshot the pre-correction poses: these are the reference's
        # NonCorrectedSim3 (src/LoopFinder.cpp:520-566) — the essential-graph
        # *normal* edges must measure relative transforms from THESE, not
        # from the corrected poses, or every residual is log(I)=0 and the
        # solve is a no-op.
        T_before = kf.Tcw
        S_before = lie.make_sim3(T_before[:, :3, :3], T_before[:, :3, 3],
                                 jnp.ones(m.nk, jnp.float32))

        # corrected Sim3 world pose of the current KF:
        # S_cur_w(corrected) = S12 . T_cand_w  (reference mg2oScw = gScm*gSmw)
        T_cand = kf.Tcw[cand]
        S_cand = lie.make_sim3(T_cand[:3, :3], T_cand[:3, 3],
                               jnp.float32(1.0))
        S_cur_corr = S12 @ S_cand

        # neighborhood to correct: covis group of cur
        grp = sorted(set(np.flatnonzero(row_cur >= 15.0).tolist()) | {cur})
        grp_idx = jnp.asarray(np.array(grp, np.int32))
        T_cur = kf.Tcw[cur]
        S_cur = lie.make_sim3(T_cur[:3, :3], T_cur[:3, 3], jnp.float32(1.0))
        # relative transforms S_ic = T_iw . T_cw^-1 (scale 1), corrected
        # S_iw' = S_ic . S_cur_corr
        T_grp = kf.Tcw[grp_idx]
        S_grp = lie.make_sim3(T_grp[:, :3, :3], T_grp[:, :3, 3],
                              jnp.ones(len(grp), jnp.float32))
        S_ic = S_grp @ lie.sim3_inv(S_cur)[None]
        S_corr = S_ic @ S_cur_corr[None]

        # correct landmarks of the neighborhood: X' = S_corr^-1( S_old(X) )
        # for each landmark referenced by a corrected KF; remember the owner
        # (reference mCorrectedReference_LC) so the essential-graph landmark
        # correction later uses the CORRECTED owner pose as its "before".
        # First-group-member-wins, vectorized: scatter in REVERSE group
        # order so the earliest member's write lands last.
        grp_arr = np.array(grp, np.int64)
        lm_rows = np.asarray(kf.mp_idx[jnp.asarray(grp_arr.astype(np.int32))])
        owner_of = np.full(m.nm, -1, np.int64)   # group-slot that corrected it
        flat = lm_rows[::-1].ravel()
        srcs = np.repeat(grp_arr[::-1], lm_rows.shape[1])
        okm = flat >= 0
        owner_of[flat[okm]] = srcs[okm]
        sel = np.flatnonzero(owner_of >= 0)
        if len(sel):
            slot_to_gi = np.full(m.nk, -1, np.int64)
            slot_to_gi[grp_arr] = np.arange(len(grp))
            gi = jnp.asarray(slot_to_gi[owner_of[sel]].astype(np.int32))
            S_old = S_grp[gi]
            S_new_inv = lie.sim3_inv(S_corr[gi])
            X = mp.Xw[jnp.asarray(sel)]
            x_cam = jnp.einsum("lij,lj->li", S_old[:, :3, :3], X) + S_old[:, :3, 3]
            X_new = jnp.einsum("lij,lj->li", S_new_inv[:, :3, :3], x_cam) + S_new_inv[:, :3, 3]
            mp = mp._replace(Xw=mp.Xw.at[jnp.asarray(sel)].set(X_new))

        # write corrected poses (SE3 projection: t/s)
        T_corr = pose_graph.se3_from_sim3(S_corr)
        kf = kf._replace(Tcw=kf.Tcw.at[grp_idx].set(T_corr))
        m.kf, m.mp = kf, mp

        # landmark fusion around the corrected region (reference
        # SearchAndFuse): project loop-side landmarks into corrected KFs
        from . import mapping as mapping_mod

        mapping_mod.fuse_neighbors(m, grp, cfg)

        # essential-graph optimization (reference
        # OptimizeEssentialGraphLoopClosure :696 / Optimizer.cpp:1064);
        # fusion created new cross-loop covis links (LoopConnections) —
        # only the corrected group's rows can have gained links, so only
        # those rows are recomputed/fetched
        Wa_grp_ge = np.asarray(ms.covisibility_rows(
            m.kf, m.nm, grp_arr.astype(np.int32)) >= minfeat)
        self._optimize_essential_graph(
            cur, cand, grp, S_before, Wb_ge, Wa_grp_ge, owner_of
        )

        # record the loop edge AFTER the solve (reference LoopFinder.cpp:699)
        m.kf = m.kf._replace(
            loop_edge=m.kf.loop_edge.at[cur].set(cand).at[cand].set(cur)
        )

        # loop-closure GBA with the Motion Check in GATING mode (reference
        # LoopFinder::RunGBA :1200-1202 runs CorrectKF_V3 with isGBA=false —
        # flags only; a bad verdict latches CorrectKF_switch off and sets
        # request_GBA), then the MC-triggered follow-up GBA (reference
        # RequestBA_fromCorrectKF, src/LoopFinder.cpp:754-762)
        if self.run_gba_after_loop:
            gba_mod.run_gba(m, cfg, interrupt_check=interrupt_check,
                            sharded_solver=self.gba_solver, mc_mode="gating")
            if m.request_gba:
                m.request_gba = False
                gba_mod.run_gba(m, cfg, interrupt_check=interrupt_check,
                                mc_mode="full")
                self.n_regba += 1
        self.last_loop_kf_id = int(np.asarray(m.kf.kf_id[cur]))
        self.n_loops_closed += 1
        return True

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, cur: int, cand: int, grp,
                                  S_before_full, Wb_ge, Wa_grp_ge,
                                  lm_owner):
        """Build and solve the Sim3 pose graph, compacted to valid KFs.

        Reference semantics (Optimizer.cpp:1064-1337):
        - vertex estimates: current poses (corrected for the covis group,
          pre-correction for everyone else); the loop KF is the fixed gauge;
        - loop-connection edges (new covis links across the loop created by
          fusion, plus the cur-cand pair) measure from the CORRECTED
          estimates (vScw);
        - normal edges (spanning tree, previous loop edges, strong covis)
          measure from the PRE-correction poses (NonCorrectedSim3).

        ``Wb_ge``: (NK, NK) bool, pre-fusion covis >= min_feats (invalid
        KFs have all-zero rows by construction). ``Wa_grp_ge``: (G, NK)
        bool, post-fusion covis >= min_feats for the corrected group's rows
        only. Edge assembly is fully vectorized — at the 1-2k-KF server
        operating point the previous per-edge Python loop was seconds of
        host time per closure while the device idled.
        """
        cfg = self.config
        m = self.map
        kf = m.kf
        valid = np.asarray(kf.valid)
        slots = np.flatnonzero(valid)
        V = len(slots)
        if V < 2:
            return
        comp = np.full(m.nk, -1, np.int64)
        comp[slots] = np.arange(V)
        slots_j = jnp.asarray(slots.astype(np.int32))

        # vertex init: current poses = corrected group + uncorrected rest
        T = kf.Tcw[slots_j]
        S_init = lie.make_sim3(T[:, :3, :3], T[:, :3, 3],
                               jnp.ones(V, jnp.float32))
        S_bef = S_before_full[slots_j]

        grp_arr = np.array(sorted(grp), np.int64)
        parent = np.asarray(kf.parent)
        loop_edge = np.asarray(kf.loop_edge)

        # loop-connection edges (reference sets them first and skips
        # duplicates in the normal sections): always the cur-cand pair, plus
        # new strong links from corrected KFs to outside the group
        in_grp = np.zeros(m.nk, bool)
        in_grp[grp_arr] = True
        new_mask = Wa_grp_ge & ~Wb_ge[grp_arr] & valid[None, :] \
            & ~in_grp[None, :]
        gi_new, j_new = np.nonzero(new_mask)
        loopc = np.concatenate([
            np.array([[cur, cand]], np.int64),
            np.stack([grp_arr[gi_new], j_new], -1),
        ], 0)
        # normal edges: spanning tree + previous loop edges + strong covis,
        # all measured from the pre-correction poses
        p = parent[slots]
        p_ok = (p >= 0) & valid[np.clip(p, 0, m.nk - 1)]
        st = np.stack([slots[p_ok], p[p_ok]], -1)
        le_t = loop_edge[slots]
        le_ok = (le_t >= 0) & valid[np.clip(le_t, 0, m.nk - 1)]
        le = np.stack([slots[le_ok], le_t[le_ok]], -1)
        cov = np.argwhere(np.triu(Wb_ge, 1))
        norm = np.concatenate([st, le, cov], 0)

        # canonicalize + dedup, loop-connection edges take priority
        all_e = np.concatenate([loopc, norm], 0)
        a = np.minimum(all_e[:, 0], all_e[:, 1])
        b = np.maximum(all_e[:, 0], all_e[:, 1])
        keep = a != b
        a, b = a[keep], b[keep]
        n_loopc_cand = int(keep[:len(loopc)].sum())
        _, first = np.unique(a * m.nk + b, return_index=True)
        first.sort()
        a, b = a[first], b[first]
        is_loopc = first < n_loopc_cand
        order = np.argsort(~is_loopc, kind="stable")  # loop edges first
        a, b = a[order], b[order]
        nl = int(is_loopc.sum())
        if len(a) == 0:
            return

        ei = jnp.asarray(comp[a].astype(np.int32))
        ej = jnp.asarray(comp[b].astype(np.int32))
        meas_loop = pose_graph.make_edge_measurements(
            S_init, ei[:nl], ej[:nl]
        )
        meas_norm = pose_graph.make_edge_measurements(
            S_bef, ei[nl:], ej[nl:]
        )
        meas = jnp.concatenate([meas_loop, meas_norm], 0)
        E = int(ei.shape[0])
        edges = pose_graph.PoseGraphEdges(
            i=ei, j=ej, S_ji_meas=meas,
            weight=jnp.ones(E, jnp.float32),
            valid=jnp.ones(E, bool),
        )
        fixed = np.zeros(V, bool)
        fixed[comp[cand]] = True   # loop KF anchors the gauge (ref :1119)
        res = pose_graph.optimize_pose_graph(
            S_init, edges, jnp.asarray(fixed),
            iterations=cfg.opt.ess_graph_iterations,
        )

        # landmark correction through reference keyframes (reference
        # Optimizer.cpp:1287-1326): landmarks moved by the Sim3 propagation
        # correct through their *owner* group KF (whose S_init is already
        # corrected); everyone else through its reference KF.
        ref_slot = np.asarray(m.mp.ref_kf).copy()
        owned = lm_owner >= 0
        ref_slot[owned] = lm_owner[owned]
        ref_ok = (ref_slot >= 0) & valid[np.clip(ref_slot, 0, m.nk - 1)]
        ref_c = np.where(ref_ok, comp[np.clip(ref_slot, 0, m.nk - 1)], 0)
        X_new = pose_graph.correct_landmarks(
            m.mp.Xw, jnp.asarray(ref_c.astype(np.int32)), S_init, res.S_iw
        )
        move = m.mp.valid & jnp.asarray(ref_ok)
        m.mp = m.mp._replace(Xw=jnp.where(move[:, None], X_new, m.mp.Xw))
        # scatter optimized poses back to their slots
        T_new = pose_graph.se3_from_sim3(res.S_iw)
        m.kf = kf._replace(Tcw=kf.Tcw.at[slots_j].set(T_new))

    # ------------------------------------------------------------------
    def process_keyframe(self, slot: int, interrupt_check=None) -> bool:
        """Full loop-closing attempt for one arriving KF. Returns True if a
        loop was closed."""
        cand = self.detect(slot)
        if cand is None:
            return False
        got = self.compute_sim3(slot, cand)
        if got is None:
            return False
        S12, match_info = got
        return self.correct_loop(slot, cand, S12, match_info,
                                 interrupt_check=interrupt_check)
