"""Map fusion: merge one agent's map into another after a cross-map match.

Replaces the reference ``MapMerger::MergeMaps`` (src/MapMerger.cpp:39) + the
Map merge constructor (src/Map.cpp:100): the current map's keyframes and
landmarks are Sim3-transformed into the matched map's frame and re-allocated
into its blocks; association tables are remapped through a slot lookup; the
matched landmark pairs are fused (the kept map's landmark wins, reference
SearchAndFuse semantics); finally an essential-graph optimization rigidifies
the seam and a Motion-Check-gated GBA polishes the fused map.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import lie
from ..solvers import pose_graph
from . import map_state as ms


def sim3_transform_map(m: ms.MapState, S_ba) -> ms.MapState:
    """Express every pose/landmark of map ``m`` in the frame defined by Sim3
    ``S_ba`` (maps m's world coords into the target world): X' = S_ba(X),
    Tcw' = SE3(S_cw . S_ba^-1)."""
    S_ba = jnp.asarray(S_ba)
    kf, mp = m.kf, m.mp
    T = kf.Tcw
    S_cw = lie.make_sim3(T[:, :3, :3], T[:, :3, 3],
                         jnp.ones(T.shape[0], jnp.float32))
    S_cw_new = S_cw @ lie.sim3_inv(S_ba)[None]
    T_new = pose_graph.se3_from_sim3(S_cw_new)
    X_new = lie.sim3_apply(S_ba, mp.Xw[None])[0]
    m.kf = kf._replace(
        Tcw=jnp.where(kf.valid[:, None, None], T_new, kf.Tcw),
        Tcw_pre_gba=jnp.where(kf.valid[:, None, None],
                              pose_graph.se3_from_sim3(
                                  lie.make_sim3(
                                      kf.Tcw_pre_gba[:, :3, :3],
                                      kf.Tcw_pre_gba[:, :3, 3],
                                      jnp.ones(T.shape[0], jnp.float32),
                                  ) @ lie.sim3_inv(S_ba)[None]
                              ),
                              kf.Tcw_pre_gba),
    )
    m.mp = mp._replace(Xw=jnp.where(mp.valid[:, None], X_new, mp.Xw))
    return m


def merge_maps(
    m_from: ms.MapState,
    m_into: ms.MapState,
    S_ba,
    mp_fuse_pairs=None,
    config: Config = None,
) -> Tuple[ms.MapState, Dict[int, int], Dict[int, int]]:
    """Move every entity of ``m_from`` (already Sim3-transformed via
    ``sim3_transform_map``) into ``m_into``'s blocks.

    mp_fuse_pairs: optional array (N, 2) of (from_mp_slot, into_mp_slot) —
    matched landmark duplicates; the target map's landmark is kept and the
    source's observations are rewired onto it (reference landmark fusion in
    MergeMaps).

    Returns (m_into, kf_slot_map, mp_slot_map).
    """
    kf_from, mp_from = m_from.kf, m_from.mp
    from_kf_slots = np.flatnonzero(np.asarray(kf_from.valid))
    from_mp_slots = np.flatnonzero(np.asarray(mp_from.valid))

    fuse_map: Dict[int, int] = {}
    if mp_fuse_pairs is not None:
        for a, b in mp_fuse_pairs:
            fuse_map[int(a)] = int(b)

    # allocate landmark slots in the target (skip fused duplicates)
    mp_slot_map: Dict[int, int] = {}
    alloc_list = [s for s in from_mp_slots if int(s) not in fuse_map]
    ids = [
        (int(np.asarray(mp_from.mp_id[s])), int(np.asarray(mp_from.client_id[s])))
        for s in alloc_list
    ]
    new_slots = m_into.alloc_mp_slots(len(alloc_list), ids)
    for s, ns in zip(alloc_list, new_slots):
        mp_slot_map[int(s)] = int(ns)
    mp_slot_map.update(fuse_map)

    if alloc_list:
        src = jnp.asarray(np.array(alloc_list, np.int32))
        dst = jnp.asarray(np.array(new_slots, np.int32))
        tgt = m_into.mp
        m_into.mp = tgt._replace(
            mp_id=tgt.mp_id.at[dst].set(mp_from.mp_id[src]),
            client_id=tgt.client_id.at[dst].set(mp_from.client_id[src]),
            unique_id=tgt.unique_id.at[dst].set(mp_from.unique_id[src]),
            Xw=tgt.Xw.at[dst].set(mp_from.Xw[src]),
            desc=tgt.desc.at[dst].set(mp_from.desc[src]),
            normal=tgt.normal.at[dst].set(mp_from.normal[src]),
            min_dist=tgt.min_dist.at[dst].set(mp_from.min_dist[src]),
            max_dist=tgt.max_dist.at[dst].set(mp_from.max_dist[src]),
            first_kf_id=tgt.first_kf_id.at[dst].set(mp_from.first_kf_id[src]),
            n_visible=tgt.n_visible.at[dst].set(mp_from.n_visible[src]),
            n_found=tgt.n_found.at[dst].set(mp_from.n_found[src]),
            valid=tgt.valid.at[dst].set(True),
        )

    # landmark slot LUT for association remapping (-1 passthrough)
    nm_from = m_from.nm
    lut = np.full(nm_from + 1, -1, np.int32)
    for old, new in mp_slot_map.items():
        lut[old] = new

    # allocate and copy keyframes
    kf_slot_map: Dict[int, int] = {}
    for s in from_kf_slots:
        kf_id = int(np.asarray(kf_from.kf_id[s]))
        cid = int(np.asarray(kf_from.client_id[s]))
        ns = m_into.alloc_kf_slot(kf_id, cid)
        kf_slot_map[int(s)] = ns
    for s, ns in kf_slot_map.items():
        old_assoc = np.asarray(kf_from.mp_idx[s])
        new_assoc = np.where(old_assoc >= 0, lut[np.maximum(old_assoc, 0)], -1)
        tgt = m_into.kf
        m_into.kf = tgt._replace(
            kf_id=tgt.kf_id.at[ns].set(kf_from.kf_id[s]),
            client_id=tgt.client_id.at[ns].set(kf_from.client_id[s]),
            unique_id=tgt.unique_id.at[ns].set(kf_from.unique_id[s]),
            timestamp=tgt.timestamp.at[ns].set(kf_from.timestamp[s]),
            Tcw=tgt.Tcw.at[ns].set(kf_from.Tcw[s]),
            xy=tgt.xy.at[ns].set(kf_from.xy[s]),
            angle=tgt.angle.at[ns].set(kf_from.angle[s]),
            octave=tgt.octave.at[ns].set(kf_from.octave[s]),
            desc=tgt.desc.at[ns].set(kf_from.desc[s]),
            feat_valid=tgt.feat_valid.at[ns].set(kf_from.feat_valid[s]),
            mp_idx=tgt.mp_idx.at[ns].set(jnp.asarray(new_assoc)),
            valid=tgt.valid.at[ns].set(True),
            Tcw_pre_gba=tgt.Tcw_pre_gba.at[ns].set(kf_from.Tcw_pre_gba[s]),
            tracking_tws=tgt.tracking_tws.at[ns].set(kf_from.tracking_tws[s]),
        )
    # second pass: graph links through the slot map
    for s, ns in kf_slot_map.items():
        parent_old = int(np.asarray(kf_from.parent[s]))
        pred_old = int(np.asarray(kf_from.pred[s]))
        parent_new = kf_slot_map.get(parent_old, -1) if parent_old >= 0 else -1
        pred_new = kf_slot_map.get(pred_old, -1) if pred_old >= 0 else -1
        m_into.kf = m_into.kf._replace(
            parent=m_into.kf.parent.at[ns].set(parent_new),
            pred=m_into.kf.pred.at[ns].set(pred_new),
        )
    # landmark reference keyframes of moved landmarks
    for s, ns in mp_slot_map.items():
        if s in fuse_map:
            continue
        ref_old = int(np.asarray(mp_from.ref_kf[s]))
        ref_new = kf_slot_map.get(ref_old, -1) if ref_old >= 0 else -1
        m_into.mp = m_into.mp._replace(
            ref_kf=m_into.mp.ref_kf.at[ns].set(ref_new)
        )
    m_into.sync_host_index()
    return m_into, kf_slot_map, mp_slot_map


def seam_measurement(Tcw_cur_pre, Tcw_match, S_align):
    """Measured Sim3 edge for one map-match hit.

    ``Tcw_cur_pre``: the current-map KF's pose BEFORE the alignment was
    applied (its own world); ``Tcw_match``: the matched KF's pose in the
    fused world; ``S_align``: this hit's measured Sim3 (cur world -> fused
    world). The hit implies the cur KF should sit at
    ``se3(U(Tcw_cur_pre) . S_align^-1)`` in the fused world; the edge
    measures S_ji = U(T_match) . U(T_implied)^-1, so the hit whose alignment
    was actually applied has zero residual and any additional hit's
    disagreement with it becomes signal for the solver.
    """
    U_pre = lie.make_sim3(Tcw_cur_pre[:3, :3], Tcw_cur_pre[:3, 3],
                          jnp.float32(1.0))
    T_impl = pose_graph.se3_from_sim3(
        (U_pre @ lie.sim3_inv(jnp.asarray(S_align)))[None]
    )[0]
    U_impl = lie.make_sim3(T_impl[:3, :3], T_impl[:3, 3], jnp.float32(1.0))
    U_match = lie.make_sim3(Tcw_match[:3, :3], Tcw_match[:3, 3],
                            jnp.float32(1.0))
    return U_match @ lie.sim3_inv(U_impl)


def optimize_seam_essential_graph(m: ms.MapState, seam_edges,
                                  fixed_slot: int, config: Config):
    """Essential-graph optimization over the fused map (reference
    ``Optimizer::OptimizeEssentialGraphMapFusion`` src/Optimizer.cpp:1339,
    called from MapMerger::MergeMaps :500 before the fused-map GBA).

    ``seam_edges``: list of ``(cur_slot, match_slot, S_ji_meas)`` — one per
    confirmed map-match hit, measured via :func:`seam_measurement` from the
    hit's own Sim3 (reference MergeMaps receives a *vector* of MapMatchHits,
    src/MapMatcher.cpp:439-448). Intra-map edges (spanning tree, old loop
    edges, strong covis) are measured from the CURRENT poses: the whole
    current map was rigidly aligned, so they are zero-residual rigidity
    anchors — the same convention as the reference, whose fusion variant
    builds every normal-edge measurement from ``vScw`` (Optimizer.cpp:1395,
    1437-1460). The functional signal is the *disagreement between multiple
    seam hits*: with one hit the solve is a consistent fixed point (as in
    the reference); with several, their residuals are distributed over the
    graph. Gauge = the matched KF of the primary hit.
    """
    kf = m.kf
    valid = np.asarray(kf.valid)
    slots = np.flatnonzero(valid)
    V = len(slots)
    if V < 2 or not seam_edges:
        return
    comp = np.full(m.nk, -1, np.int64)
    comp[slots] = np.arange(V)
    slots_j = jnp.asarray(slots.astype(np.int32))
    T = kf.Tcw[slots_j]
    S_init = lie.make_sim3(T[:, :3, :3], T[:, :3, 3],
                           jnp.ones(V, jnp.float32))
    # thresholded covis fetched once as bool; edge assembly vectorized
    # (invalid KFs have all-zero covis rows by construction)
    W_ge = np.asarray(ms.covisibility(kf, m.nm) >= config.opt.ess_graph_min_feats)
    parent = np.asarray(kf.parent)
    loop_edge = np.asarray(kf.loop_edge)

    seam = np.array(
        [(int(c), int(ms_)) for c, ms_, _ in seam_edges
         if valid[c] and valid[ms_]], np.int64
    ).reshape(-1, 2)
    seam_meas_list = [meas for c, ms_, meas in seam_edges
                      if valid[c] and valid[ms_]]
    p = parent[slots]
    p_ok = (p >= 0) & valid[np.clip(p, 0, m.nk - 1)]
    st = np.stack([slots[p_ok], p[p_ok]], -1)
    le_t = loop_edge[slots]
    le_ok = (le_t >= 0) & valid[np.clip(le_t, 0, m.nk - 1)]
    le = np.stack([slots[le_ok], le_t[le_ok]], -1)
    cov = np.argwhere(np.triu(W_ge, 1))

    all_e = np.concatenate([seam, st, le, cov], 0)
    a = np.minimum(all_e[:, 0], all_e[:, 1])
    b = np.maximum(all_e[:, 0], all_e[:, 1])
    keep = a != b
    a, b = a[keep], b[keep]
    n_seam_cand = int(keep[:len(seam)].sum())
    seam_meas_list = [mm for mm, k in
                      zip(seam_meas_list, keep[:len(seam)]) if k]
    _, first = np.unique(a * m.nk + b, return_index=True)
    first.sort()
    a, b = a[first], b[first]
    is_seam = first < n_seam_cand
    order = np.argsort(~is_seam, kind="stable")    # seam edges first
    a, b = a[order], b[order]
    n_seam = int(is_seam.sum())
    # dedup may drop seam candidates; keep the surviving measurements in
    # first-occurrence order
    kept_seam_pos = first[is_seam]
    seam_meas_list = [seam_meas_list[i] for i in kept_seam_pos]
    if len(a) == 0 or n_seam == 0:
        return
    ei_j = jnp.asarray(comp[a].astype(np.int32))
    ej_j = jnp.asarray(comp[b].astype(np.int32))
    meas = pose_graph.make_edge_measurements(S_init, ei_j, ej_j)
    meas = jnp.concatenate([
        jnp.stack([jnp.asarray(mm) for mm in seam_meas_list], 0),
        meas[n_seam:],
    ], 0)
    edges = pose_graph.PoseGraphEdges(
        i=ei_j, j=ej_j, S_ji_meas=meas,
        weight=jnp.ones(len(a), jnp.float32),
        valid=jnp.ones(len(a), bool),
    )
    fixed = np.zeros(V, bool)
    fixed[comp[fixed_slot]] = True
    res = pose_graph.optimize_pose_graph(
        S_init, edges, jnp.asarray(fixed),
        iterations=config.opt.solver_iterations,
    )
    # landmarks follow their reference keyframes
    ref_slot = np.asarray(m.mp.ref_kf)
    ref_ok = (ref_slot >= 0) & valid[np.clip(ref_slot, 0, m.nk - 1)]
    ref_c = np.where(ref_ok, comp[np.clip(ref_slot, 0, m.nk - 1)], 0)
    X_new = pose_graph.correct_landmarks(
        m.mp.Xw, jnp.asarray(ref_c.astype(np.int32)), S_init, res.S_iw
    )
    move = m.mp.valid & jnp.asarray(ref_ok)
    m.mp = m.mp._replace(Xw=jnp.where(move[:, None], X_new, m.mp.Xw))
    T_new = pose_graph.se3_from_sim3(res.S_iw)
    m.kf = kf._replace(Tcw=kf.Tcw.at[slots_j].set(T_new))
