"""Local mapping: per-keyframe map growth and maintenance.

Replaces the reference client ``LocalMapping::RunClient`` pipeline
(src/Mapping.cpp:44): process new KF -> cull recent landmarks ->
triangulate new landmarks with covisible neighbors -> fuse duplicates ->
clip the local map (``Map::MapTrimming`` src/Map.cpp:869) -> local BA.

The queue-and-thread structure is replaced by a synchronous ``process_keyframe``
the client system calls after each KF decision; each numeric stage is a
batched device kernel over the fixed-capacity blocks.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import geometry, lie, matching, orb
from ..solvers import ba_core, local_ba
from . import map_state as ms
from .frame import Frame

N_TRIANG_NEIGHBORS = 20    # covis neighbors used for triangulation
                           # (reference CreateNewMapPoints searches 20,
                           # src/Mapping.cpp:302). 5 was tried and starves
                           # slow-motion runs: the strongest-covis
                           # neighbors are the NEAREST KFs, whose baselines
                           # fail the 1.15-degree triangulation parallax
                           # gate — on the ring world the map thinned to
                           # ~600 landmarks and tracking bled out. The
                           # wide-baseline pairs among 20 neighbors are
                           # what keep landmark creation alive.


def covis_neighbors_of(m: ms.MapState, slot: int,
                       k: int = N_TRIANG_NEIGHBORS, thres: float = 15.0):
    """Strongest covisibility neighbors of one KF (weight >= thres)."""
    w = np.asarray(ms.covisibility_row(m.kf, m.nm, slot))
    valid = np.asarray(m.kf.valid)
    order = np.argsort(-w)
    return [int(s) for s in order[:k] if w[s] >= thres and valid[s]]


# ---------------------------------------------------------------------------
# KF insertion
# ---------------------------------------------------------------------------

@jax.jit
def _insert_kf_kernel(kf: ms.KFBlock, slot, kf_id, client_id, timestamp,
                      Tcw, xy, angle, octave, desc, feat_valid, mp_idx,
                      parent, pred):
    return kf._replace(
        kf_id=kf.kf_id.at[slot].set(kf_id),
        client_id=kf.client_id.at[slot].set(client_id),
        timestamp=kf.timestamp.at[slot].set(timestamp),
        Tcw=kf.Tcw.at[slot].set(Tcw),
        xy=kf.xy.at[slot].set(xy),
        angle=kf.angle.at[slot].set(angle),
        octave=kf.octave.at[slot].set(octave),
        desc=kf.desc.at[slot].set(desc),
        feat_valid=kf.feat_valid.at[slot].set(feat_valid),
        mp_idx=kf.mp_idx.at[slot].set(mp_idx),
        parent=kf.parent.at[slot].set(parent),
        pred=kf.pred.at[slot].set(pred),
        valid=kf.valid.at[slot].set(True),
        loop_edge=kf.loop_edge.at[slot].set(-1),
    )


def insert_keyframe(m: ms.MapState, fr: Frame, kf_id: int, client_id: int,
                    parent_slot: int = -1, pred_slot: int = -1) -> int:
    """Allocate a slot and scatter the frame into the KF block."""
    slot = m.alloc_kf_slot(kf_id, client_id)
    m.kf = _insert_kf_kernel(
        m.kf, slot, kf_id, client_id, fr.timestamp, fr.Tcw,
        fr.feats.xy, fr.feats.angle, fr.feats.octave, fr.feats.desc,
        fr.feats.valid, fr.mp_idx, parent_slot, pred_slot,
    )
    return slot


# ---------------------------------------------------------------------------
# Triangulation of new landmarks with covisible neighbors
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_levels",))
def _triangulate_with_neighbor(
    xy1, desc1, octave1, free1, Tcw1,
    xy2, desc2, octave2, free2, Tcw2,
    K, inv_sigma2_arr, scale_factors, n_levels,
):
    """Epipolar-match free features of KF1 against free features of one
    neighbor KF2 and triangulate (reference CreateNewMapPoints
    src/Mapping.cpp:302).

    Returns per-KF1-feature: (pts3d (F, 3), match2 (F,), ok (F,)).
    """
    # fundamental F12 from relative pose: x2^T F x1 = 0
    T21 = Tcw2 @ lie.inv_T(Tcw1)
    R, t = T21[:3, :3], T21[:3, 3]
    Kinv = jnp.linalg.inv(K)
    E = lie.hat(t) @ R
    F12 = Kinv.T @ E @ Kinv
    inv_s2_oct = inv_sigma2_arr
    m = matching.search_for_triangulation(
        desc1, xy1, free1, desc2, xy2, free2, F12, inv_s2_oct, octave2,
        max_dist=matching.TH_LOW,
    )
    # triangulate matched pairs
    P1 = geometry.projection_matrix(K, Tcw1)
    P2 = geometry.projection_matrix(K, Tcw2)
    uv2 = xy2[m.idx]
    pts, sv = geometry.triangulate_dlt(P1, P2, xy1[None], uv2[None])
    pts = pts[0]
    # checks: positive depth both views, parallax, reprojection chi2, scale
    C1 = geometry.camera_center(Tcw1)
    C2 = geometry.camera_center(Tcw2)
    cosp = geometry.parallax_cos(C1[None], C2[None], pts[None])[0]
    pc1 = lie.transform_points(Tcw1, pts[None])[0]
    pc2 = lie.transform_points(Tcw2, pts[None])[0]
    uvp1 = geometry.project(pc1[None], K)[0]
    uvp2 = geometry.project(pc2[None], K)[0]
    s2_1 = inv_sigma2_arr[jnp.clip(octave1, 0, n_levels - 1)]
    s2_2 = inv_sigma2_arr[jnp.clip(octave2[m.idx], 0, n_levels - 1)]
    e1 = jnp.sum((uvp1 - xy1) ** 2, -1) * s2_1
    e2 = jnp.sum((uvp2 - uv2) ** 2, -1) * s2_2
    # scale-consistency: distance ratio vs octave ratio (reference check)
    d1 = jnp.linalg.norm(pts - C1, axis=-1)
    d2 = jnp.linalg.norm(pts - C2, axis=-1)
    ratio_d = d1 / jnp.maximum(d2, 1e-9)
    sf1 = scale_factors[jnp.clip(octave1, 0, n_levels - 1)]
    sf2 = scale_factors[jnp.clip(octave2[m.idx], 0, n_levels - 1)]
    ratio_o = sf1 / sf2
    ratio_factor = 1.5 * scale_factors[1] / scale_factors[0]
    ok = (
        m.ok
        & (pc1[:, 2] > 0)
        & (pc2[:, 2] > 0)
        & (cosp < 0.9998)
        & (e1 < 5.991)
        & (e2 < 5.991)
        & (ratio_d < ratio_o * ratio_factor)
        & (ratio_d * ratio_factor > ratio_o)
    )
    return pts, m.idx, ok


def create_new_map_points(m: ms.MapState, new_slot: int, neighbor_slots,
                          config: Config, next_mp_id: int, client_id: int):
    """Triangulate new landmarks between the new KF and its covis neighbors,
    allocate MP slots, and write associations. Returns # created and next id."""
    kf = m.kf
    K = jnp.asarray(config.camera.K())
    inv_s2 = jnp.asarray(orb.inv_level_sigma2(config.extractor))
    sf = jnp.asarray(orb.scale_factors(config.extractor))
    F = kf.mp_idx.shape[1]

    created = 0
    for nb in neighbor_slots:
        free1 = kf.feat_valid[new_slot] & (kf.mp_idx[new_slot] < 0)
        free2 = kf.feat_valid[nb] & (kf.mp_idx[nb] < 0)
        pts, idx2, ok = _triangulate_with_neighbor(
            kf.xy[new_slot], kf.desc[new_slot], kf.octave[new_slot], free1,
            kf.Tcw[new_slot],
            kf.xy[nb], kf.desc[nb], kf.octave[nb], free2, kf.Tcw[nb],
            K, inv_s2, sf, config.extractor.n_levels,
        )
        ok_np = np.asarray(ok)
        n_new = int(ok_np.sum())
        if n_new == 0:
            continue
        feat1 = np.flatnonzero(ok_np)
        feat2 = np.asarray(idx2)[feat1]
        ids = [(next_mp_id + i, client_id) for i in range(n_new)]
        try:
            slots = m.alloc_mp_slots(n_new, ids)
        except RuntimeError:
            break
        next_mp_id += n_new
        created += n_new
        pts_np = np.asarray(pts)[feat1]
        m.mp = _write_new_mps(
            m.mp, jnp.asarray(slots), jnp.asarray(pts_np),
            kf.desc[new_slot][jnp.asarray(feat1)],
            jnp.asarray([i for i, _ in ids], dtype=jnp.int32), client_id,
            kf.kf_id[new_slot], new_slot,
        )
        m.kf = _write_assocs(
            m.kf, new_slot, jnp.asarray(feat1), nb, jnp.asarray(feat2),
            jnp.asarray(slots, dtype=jnp.int32),
        )
        kf = m.kf
    return created, next_mp_id


@jax.jit
def _write_new_mps(mp: ms.MPBlock, slots, pts, descs, ids, client_id,
                   first_kf_id, ref_kf_slot):
    return mp._replace(
        mp_id=mp.mp_id.at[slots].set(ids),
        client_id=mp.client_id.at[slots].set(client_id),
        Xw=mp.Xw.at[slots].set(pts),
        desc=mp.desc.at[slots].set(descs),
        normal=mp.normal.at[slots].set(0.0),
        min_dist=mp.min_dist.at[slots].set(0.0),
        max_dist=mp.max_dist.at[slots].set(1e9),
        ref_kf=mp.ref_kf.at[slots].set(ref_kf_slot),
        first_kf_id=mp.first_kf_id.at[slots].set(first_kf_id),
        n_visible=mp.n_visible.at[slots].set(1),
        n_found=mp.n_found.at[slots].set(1),
        valid=mp.valid.at[slots].set(True),
    )


@jax.jit
def _write_assocs(kf: ms.KFBlock, slot1, feat1, slot2, feat2, mp_slots):
    mp_idx = kf.mp_idx.at[slot1, feat1].set(mp_slots)
    mp_idx = mp_idx.at[slot2, feat2].set(mp_slots)
    return kf._replace(mp_idx=mp_idx)


# ---------------------------------------------------------------------------
# Fuse: project landmarks into neighbors to densify observations
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_levels",))
def _fuse_match(kf_xy, kf_desc, kf_octave, kf_feat_valid, kf_mp_idx, Tcw,
                mp_Xw, mp_desc, mp_valid, K, width, height,
                inv_sigma2_arr, n_levels):
    """Projection-match map landmarks into one KF's features (reference
    ORBmatcher::Fuse). Searches ALL valid features — an occupied best match
    becomes a replace candidate, a free one a claim. Returns per-landmark
    (best feature index, ok).

    The gate is deliberately strict (tight Hamming + per-octave chi2):
    a loose fuse claims the sibling corners every blob produces across
    pyramid levels, saturating the feature pool and starving triangulation.
    """
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = mp_Xw @ R.T + t
    uv = geometry.project(pc[None], K)[0]
    vis = mp_valid & (pc[:, 2] > 0.05) & geometry.in_image(uv, width, height)
    octv = jnp.zeros(mp_Xw.shape[0], jnp.int32)
    m = matching.search_by_projection(
        mp_desc, uv, octv, vis,
        kf_desc, kf_xy, kf_octave, kf_feat_valid,
        radius=3.0, max_dist=35, nn_ratio=1.0, use_octave=False,
    )
    # chi2 gate at the claimed feature's octave (reference Fuse: e2 *
    # invSigma2 <= 5.99, src/ORBmatcher.cpp:950)
    err = kf_xy[m.idx] - uv
    chi2 = jnp.sum(err * err, -1) * inv_sigma2_arr[
        jnp.clip(kf_octave[m.idx], 0, n_levels - 1)
    ]
    # a landmark must not re-claim a feature it already owns elsewhere in
    # this KF (the row dedupe would otherwise drop the older association)
    already_here = kf_mp_idx[m.idx] == jnp.arange(mp_Xw.shape[0])
    ok = m.ok & (chi2 <= 5.991)
    return m.idx, ok & ~already_here, ok & already_here


@jax.jit
def _apply_replacement(mp_idx, repl):
    """Rewire associations through a landmark-replacement map ``repl``
    (NM,)->winner slot (identity where no replacement), then drop per-row
    duplicates, preferring the original (non-rewired) association —
    reference MapPoint::Replace: observers of the loser re-point to the
    winner unless the winner is already observed in that keyframe."""
    F = mp_idx.shape[1]
    old = mp_idx
    new = jnp.where(old >= 0, repl[jnp.maximum(old, 0)], -1)
    rewired = (new != old) & (old >= 0)
    # sort key groups by landmark; original associations sort before
    # rewired ones, earlier features before later
    fidx = jnp.arange(F, dtype=jnp.int32)[None, :]
    key = new * (2 * F) + rewired.astype(jnp.int32) * F + fidx
    big = jnp.iinfo(jnp.int32).max
    key = jnp.where(new >= 0, key, big)
    skey = jnp.sort(key, axis=1)
    mp_sorted = skey // (2 * F)
    dup = jnp.concatenate(
        [jnp.zeros_like(mp_sorted[:, :1], dtype=bool),
         (mp_sorted[:, 1:] == mp_sorted[:, :-1]) & (skey[:, 1:] != big)], 1
    )
    feat_sorted = (skey % F).astype(jnp.int32)
    rows = jnp.arange(new.shape[0])[:, None]
    drop = jnp.zeros_like(new, dtype=bool)
    drop = drop.at[rows, jnp.where(dup, feat_sorted, F)].set(True, mode="drop")
    return jnp.where(drop, -1, new)


@jax.jit
def _merge_mp_stats(mp: ms.MPBlock, losers, winners):
    return mp._replace(
        n_visible=mp.n_visible.at[winners].add(mp.n_visible[losers]),
        n_found=mp.n_found.at[winners].add(mp.n_found[losers]),
        valid=mp.valid.at[losers].set(False),
    )


def replace_map_points(m: ms.MapState, pairs) -> int:
    """Collapse duplicate landmarks: for each (a, b) pair the one with more
    observations survives and absorbs the other's observers and stats
    (reference ORBmatcher::Fuse :977 + MapPoint::Replace)."""
    nm = m.nm
    n_obs = np.asarray(ms.mp_observation_counts(m.kf, nm))
    repl = np.arange(nm, dtype=np.int32)

    def find(x):
        while repl[x] != x:
            x = repl[x]
        return int(x)

    n = 0
    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra == rb:
            continue
        w, l = (ra, rb) if n_obs[ra] >= n_obs[rb] else (rb, ra)
        repl[l] = w
        n += 1
    if n == 0:
        return 0
    while True:
        r2 = repl[repl]
        if np.array_equal(r2, repl):
            break
        repl = r2
    m.kf = m.kf._replace(
        mp_idx=_apply_replacement(m.kf.mp_idx, jnp.asarray(repl))
    )
    losers = np.flatnonzero(repl != np.arange(nm))
    m.mp = _merge_mp_stats(
        m.mp, jnp.asarray(losers.astype(np.int32)),
        jnp.asarray(repl[losers].astype(np.int32)),
    )
    m.sync_host_index()
    return n


def fuse_neighbors(m: ms.MapState, kf_slots, config: Config):
    """Project all valid landmarks into each listed KF: claim free features,
    and collapse duplicate landmarks when the best feature is already
    associated (reference SearchInNeighbors src/Mapping.cpp:489 +
    ORBmatcher::Fuse with Replace). Returns (n_claimed, n_replaced)."""
    K = jnp.asarray(config.camera.K())
    inv_s2 = jnp.asarray(orb.inv_level_sigma2(config.extractor))
    n_claim = 0
    pairs = []
    for s in kf_slots:
        feat_idx, ok, _ = _fuse_match(
            m.kf.xy[s], m.kf.desc[s], m.kf.octave[s], m.kf.feat_valid[s],
            m.kf.mp_idx[s], m.kf.Tcw[s],
            m.mp.Xw, m.mp.desc, m.mp.valid,
            K, config.camera.width, config.camera.height, inv_s2,
            config.extractor.n_levels,
        )
        ok_np = np.asarray(ok)
        cand = np.flatnonzero(ok_np)
        if not len(cand):
            continue
        feats = np.asarray(feat_idx)[cand]
        row = np.asarray(m.kf.mp_idx[s]).copy()
        incumbent = row[feats]
        free = incumbent < 0
        if free.any():
            row[feats[free]] = cand[free]
            m.kf = m.kf._replace(
                mp_idx=m.kf.mp_idx.at[s].set(jnp.asarray(row))
            )
            n_claim += int(free.sum())
        for c, inc in zip(cand[~free], incumbent[~free]):
            if int(c) != int(inc):
                pairs.append((int(c), int(inc)))
    n_repl = replace_map_points(m, pairs) if pairs else 0
    return n_claim, n_repl


# ---------------------------------------------------------------------------
# Landmark culling / map trimming
# ---------------------------------------------------------------------------

@jax.jit
def _cull_mps_kernel(kf: ms.KFBlock, mp: ms.MPBlock, newest_kf_id):
    """Erase weak *recent* landmarks (reference MapPointCullingClient):
    during its first ~3 keyframes a landmark must reach >=3 observations and
    a found/visible ratio above 0.25; after that probation window it is never
    re-tested (the reference erases it from the recent list and keeps it)."""
    nm = mp.valid.shape[0]
    n_obs = ms.mp_observation_counts(kf, nm)
    age = newest_kf_id - mp.first_kf_id
    ratio = mp.n_found.astype(jnp.float32) / jnp.maximum(
        mp.n_visible.astype(jnp.float32), 1.0
    )
    in_probation = age <= 3
    bad = mp.valid & in_probation & (
        (ratio < 0.25)
        | ((age >= 2) & (n_obs <= 2))
    )
    # drop observations of dead landmarks from the association table
    dead_slots = jnp.where(bad, True, False)
    obs_dead = dead_slots[jnp.maximum(kf.mp_idx, 0)] & (kf.mp_idx >= 0)
    new_mp_idx = jnp.where(obs_dead, -1, kf.mp_idx)
    return (
        kf._replace(mp_idx=new_mp_idx),
        mp._replace(valid=mp.valid & ~bad),
        jnp.sum(bad),
    )


def cull_map_points(m: ms.MapState, newest_kf_id: int) -> int:
    m.kf, m.mp, n = _cull_mps_kernel(m.kf, m.mp, newest_kf_id)
    n = int(n)
    if n:
        m.sync_host_index()
    return n


@jax.jit
def _cull_server_kernel(kf: ms.KFBlock, mp: ms.MPBlock, mp_tick, tick,
                        client_id):
    """Server recent-landmark probation (reference MapPointCullingServer
    src/Mapping.cpp:756-787): an own-client landmark leaving its 3-KF
    probation window with <=3 observations is erased. The found-ratio rule
    (:772) is client-only here — the wire schema does not carry tracking
    visibility stats (reference MP.msg doesn't either; its server counts stay
    at their defaults)."""
    nm = mp.valid.shape[0]
    n_obs = ms.mp_observation_counts(kf, nm)
    leaving = (mp_tick >= 0) & (tick - mp_tick == 3)
    bad = mp.valid & leaving & (mp.client_id == client_id) & (n_obs <= 3)
    obs_dead = bad[jnp.maximum(kf.mp_idx, 0)] & (kf.mp_idx >= 0)
    return (
        kf._replace(mp_idx=jnp.where(obs_dead, -1, kf.mp_idx)),
        mp._replace(valid=mp.valid & ~bad),
        jnp.sum(bad),
    )


def cull_recent_mps_server(m: ms.MapState, mp_tick: np.ndarray, tick: int,
                           client_id: int) -> int:
    """Run the server landmark probation check; ``mp_tick`` maps MP slot ->
    processed-KF count at insertion (-1 = untracked)."""
    m.kf, m.mp, n = _cull_server_kernel(
        m.kf, m.mp, jnp.asarray(mp_tick), tick, client_id
    )
    n = int(n)
    if n:
        m.sync_host_index()
    return n


@jax.jit
def _trim_kernel(kf: ms.KFBlock, mp: ms.MPBlock, min_keep_kf_id):
    """Clip the client map to the newest window (reference Map::MapTrimming
    src/Map.cpp:869): drop KFs older than min_keep_kf_id and landmarks left
    with no observations."""
    drop_kf = kf.valid & (kf.kf_id < min_keep_kf_id)
    kf_valid = kf.valid & ~drop_kf
    kf2 = kf._replace(
        valid=kf_valid,
        mp_idx=jnp.where(kf_valid[:, None], kf.mp_idx, -1),
        feat_valid=kf.feat_valid & kf_valid[:, None],
    )
    nm = mp.valid.shape[0]
    n_obs = ms.mp_observation_counts(kf2, nm)
    mp_valid = mp.valid & (n_obs > 0)
    # scrub dangling references
    dead = ~mp_valid
    obs_dead = dead[jnp.maximum(kf2.mp_idx, 0)] & (kf2.mp_idx >= 0)
    kf2 = kf2._replace(mp_idx=jnp.where(obs_dead, -1, kf2.mp_idx))
    return kf2, mp._replace(valid=mp_valid), jnp.sum(drop_kf)


def map_trimming(m: ms.MapState, config: Config) -> int:
    """Keep only the newest local_map_size (+buffer grace) keyframes."""
    kf_ids = np.asarray(m.kf.kf_id)
    valid = np.asarray(m.kf.valid)
    ids = np.sort(kf_ids[valid])
    limit = config.mapping.local_map_size
    if len(ids) <= limit + config.mapping.local_map_buffer:
        return 0
    min_keep = int(ids[-limit])
    m.kf, m.mp, n = _trim_kernel(m.kf, m.mp, min_keep)
    n = int(n)
    if n:
        m.sync_host_index()
    return n


@functools.partial(jax.jit, static_argnames=("nm", "n_levels"))
def _redundancy_kernel(kf: ms.KFBlock, nm: int, n_levels: int = 8):
    """Per-KF fraction of redundant observations (reference
    KeyFrameCullingV3 src/Mapping.cpp:816-881): an observation of landmark L
    at octave o is redundant iff L has >3 observations total AND >=3 OTHER
    keyframes observe L at the same-or-finer scale (octave' <= o + 1).

    Vectorized as a per-(landmark, octave) observation histogram + cumsum —
    no per-observation loop."""
    obs_ok = kf.feat_valid & (kf.mp_idx >= 0) & kf.valid[:, None]
    l = jnp.where(obs_ok, kf.mp_idx, nm)      # trash row nm for invalid
    o = jnp.clip(kf.octave, 0, n_levels - 1)
    hist = jnp.zeros((nm + 1, n_levels), jnp.int32)
    hist = hist.at[l.reshape(-1), o.reshape(-1)].add(1)
    cum = jnp.cumsum(hist[:nm], axis=1)       # obs of L at octave <= col
    n_obs_total = cum[:, -1]
    lm = jnp.maximum(kf.mp_idx, 0)
    o1 = jnp.clip(o + 1, 0, n_levels - 1)
    others_finer = cum[lm, o1] - 1            # own octave is always <= o+1
    red = obs_ok & (n_obs_total[lm] > 3) & (others_finer >= 3)
    tot = obs_ok.sum(1)
    return red.sum(1).astype(jnp.float32) \
        / jnp.maximum(tot.astype(jnp.float32), 1.0)


def cull_redundant_keyframes(m: ms.MapState, config: Config, protect=None,
                             max_cull: int = 2) -> int:
    """Server-side redundancy culling (reference KeyFrameCullingV3): a KF
    whose observations are overwhelmingly redundant is deleted. The origin
    KF, spanning-tree roots, and freshly arrived KFs are protected."""
    protect = protect or set()
    frac = np.asarray(_redundancy_kernel(
        m.kf, nm=m.nm, n_levels=config.extractor.n_levels
    ))
    valid = np.asarray(m.kf.valid)
    kf_ids = np.asarray(m.kf.kf_id)
    parent = np.asarray(m.kf.parent)
    children = {}
    for s in np.flatnonzero(valid):
        p = parent[s]
        if p >= 0:
            children.setdefault(int(p), []).append(int(s))
    cand = [
        int(s) for s in np.flatnonzero(valid)
        if frac[s] >= config.mapping.redundancy_thres
        and int(s) not in protect
        and kf_ids[s] > 1              # keep origin keyframes
    ]
    # cull most-redundant first, bounded per cycle
    cand.sort(key=lambda s: -frac[s])
    culled = 0
    for s in cand[:max_cull]:
        # spanning-tree repair: children adopt the culled KF's parent
        p = int(parent[s])
        for c in children.get(s, []):
            m.kf = m.kf._replace(parent=m.kf.parent.at[c].set(p))
        m.kf = m.kf._replace(
            valid=m.kf.valid.at[s].set(False),
            mp_idx=m.kf.mp_idx.at[s].set(-1),
            feat_valid=m.kf.feat_valid.at[s].set(False),
        )
        culled += 1
    if culled:
        m.sync_host_index()
    return culled


# ---------------------------------------------------------------------------
# Local BA over the clipped map
# ---------------------------------------------------------------------------

def run_local_ba(m: ms.MapState, config: Config, iterations: int = 15,
                 fix_oldest: int = 2):
    """Local bundle adjustment over the whole clipped client map (the clip IS
    the reference's covis window — reference LocalBundleAdjustmentClient with
    MapTrimming makes these coincide). Oldest ``fix_oldest`` KFs act as the
    fixed frontier/gauge."""
    kf, mp = m.kf, m.mp
    cam, feat, lm, uv, octv, ok = ms.gather_observations(kf, 0)
    K = jnp.asarray(config.camera.K())
    inv_s2_tab = jnp.asarray(orb.inv_level_sigma2(config.extractor))
    obs = ba_core.BAObservations(
        cam_idx=cam,
        lm_idx=lm,
        uv=uv,
        inv_sigma2=inv_s2_tab[jnp.clip(octv, 0, config.extractor.n_levels - 1)],
        valid=ok,
    )
    # fixed = oldest valid KFs by kf_id
    kf_ids = np.asarray(kf.kf_id)
    valid = np.asarray(kf.valid)
    order = np.argsort(np.where(valid, kf_ids, np.iinfo(np.int32).max))
    fixed = np.zeros(len(kf_ids), bool)
    fixed[order[: min(fix_oldest, valid.sum())]] = True
    fixed |= ~valid
    res = local_ba.bundle_adjust(
        kf.Tcw, mp.Xw, obs, K, jnp.asarray(fixed),
        fixed_lm=~mp.valid, iterations=iterations, outlier_pass_at=iterations // 3,
    )
    # write back + drop outlier observations
    F = kf.mp_idx.shape[1]
    inl = res.obs_inlier.reshape(kf.mp_idx.shape)
    new_mp_idx = jnp.where((kf.mp_idx >= 0) & ~inl, -1, kf.mp_idx)
    m.kf = kf._replace(Tcw=res.Tcw, mp_idx=new_mp_idx)
    m.mp = mp._replace(Xw=res.Xw)
    return float(res.cost)


# ---------------------------------------------------------------------------
# LocalMapper: the per-KF pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LocalMapper:
    """Client-side local mapping pipeline (reference RunClient)."""

    config: Config
    map: ms.MapState
    next_mp_id: int = 0
    next_kf_id: int = 0
    client_id: int = 0
    n_culled: int = 0
    n_created: int = 0
    last_kf_slot: int = -1

    def covis_neighbors(self, slot: int, k: int = N_TRIANG_NEIGHBORS):
        return covis_neighbors_of(self.map, slot, k=k)

    def process_keyframe(self, fr: Frame) -> int:
        """Insert a new KF from a tracked frame and run the mapping pipeline.
        Returns the KF slot."""
        m = self.map
        kf_id = self.next_kf_id
        self.next_kf_id += 1
        pred = self.last_kf_slot
        slot = insert_keyframe(m, fr, kf_id, self.client_id,
                               parent_slot=pred, pred_slot=pred)
        self.last_kf_slot = slot
        # parent = strongest covis neighbor
        nbs = self.covis_neighbors(slot)
        if nbs:
            m.kf = m.kf._replace(parent=m.kf.parent.at[slot].set(nbs[0]))
        # cull weak recent landmarks
        self.n_culled += cull_map_points(m, kf_id)
        # triangulate new landmarks
        created, self.next_mp_id = create_new_map_points(
            m, slot, nbs, self.config, self.next_mp_id, self.client_id
        )
        self.n_created += created
        # fuse into neighbors + self
        fuse_neighbors(m, [slot] + nbs, self.config)
        # refresh landmark stats
        m.mp = ms.update_mp_descriptors_and_normals(
            m.kf, m.mp, orb.scale_factors(self.config.extractor)
        )
        # clip the local map
        map_trimming(m, self.config)
        # local BA
        run_local_ba(m, self.config)
        return slot
