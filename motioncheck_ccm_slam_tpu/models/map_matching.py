"""Cross-map place recognition and merge triggering.

Replaces the reference ``MapMatcher`` (src/MapMatcher.cpp): one global
matcher watches every per-agent server map through a shared BoW database
whose retrieval excludes the query's own map
(``DetectMapMatchCandidates``); a confirmed hit computes a cross-map Sim3
and hands over to the merger.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import lie, matching, ransac
from ..solvers import sim3_opt
from . import database as db_mod
from . import map_state as ms
from . import vocabulary as vocab_mod


@dataclasses.dataclass
class MapMatchHit:
    """A confirmed cross-map correspondence (reference MapMatcher.h:66-81)."""

    map_id_cur: int
    map_id_match: int
    slot_cur: int
    slot_match: int
    S_match_from_cur: jax.Array     # Sim3: cur-map world -> match-map world


@dataclasses.dataclass
class MapMatcher:
    """Global cross-map matcher over all per-agent maps."""

    config: Config
    maps: Dict[int, ms.MapState]
    vocab: vocab_mod.Vocabulary = None
    # one shared database; rows are (map_id, slot) pairs flattened
    db: db_mod.KeyFrameDatabase = None
    row_of: Dict[Tuple[int, int], int] = dataclasses.field(default_factory=dict)
    key_of_row: Dict[int, Tuple[int, int]] = dataclasses.field(default_factory=dict)
    next_row: int = 0
    rng_key: jax.Array = dataclasses.field(
        default_factory=lambda: jax.random.PRNGKey(7)
    )
    min_hit_kf_id: int = 0

    def __post_init__(self):
        if self.vocab is None:
            self.vocab = vocab_mod.default_vocabulary()
        if self.db is None:
            cap = sum(m.nk for m in self.maps.values())
            self.db = db_mod.KeyFrameDatabase(vocab=self.vocab, capacity=cap)

    # ------------------------------------------------------------------
    def add_keyframe(self, map_id: int, slot: int):
        m = self.maps[map_id]
        row = self.row_of.get((map_id, slot))
        if row is None:
            row = self.next_row
            self.next_row += 1
            self.row_of[(map_id, slot)] = row
            self.key_of_row[row] = (map_id, slot)
        self.db.add(row, m.kf.desc[slot], m.kf.feat_valid[slot], map_id=map_id)

    # ------------------------------------------------------------------
    def check(self, map_id: int, slot: int) -> Optional[MapMatchHit]:
        """Look for a cross-map hit for a newly arrived KF (reference
        DetectLoop + ComputeSim3 on the cross-map database)."""
        m = self.maps[map_id]
        kf_id = int(np.asarray(m.kf.kf_id[slot]))
        if kf_id < self.config.placerec.start_map_matching_after_kf:
            self.add_keyframe(map_id, slot)
            return None
        tf = vocab_mod.make_transform(self.vocab)
        _, qbow = tf(m.kf.desc[slot], m.kf.feat_valid[slot])
        self.add_keyframe(map_id, slot)
        cands, scores = self.db.detect_map_match_candidates(qbow, map_id)
        for row in cands:
            mid2, slot2 = self.key_of_row[int(row)]
            hit = self._compute_cross_sim3(map_id, slot, mid2, slot2)
            if hit is not None:
                return hit
        return None

    # ------------------------------------------------------------------
    def _compute_cross_sim3(self, mid1, slot1, mid2, slot2) -> Optional[MapMatchHit]:
        m1, m2 = self.maps[mid1], self.maps[mid2]
        kf1, kf2 = m1.kf, m2.kf
        mm = matching.mutual_match(
            kf1.desc[slot1], kf1.feat_valid[slot1] & (kf1.mp_idx[slot1] >= 0),
            kf2.desc[slot2], kf2.feat_valid[slot2] & (kf2.mp_idx[slot2] >= 0),
            max_dist=matching.TH_LOW,
        )
        ok = np.asarray(mm.ok)
        if ok.sum() < self.config.opt.matches_thres:
            return None
        feat1 = np.flatnonzero(ok)
        feat2 = np.asarray(mm.idx)[feat1]
        mp1 = np.asarray(kf1.mp_idx[slot1])[feat1]
        mp2 = np.asarray(kf2.mp_idx[slot2])[feat2]
        X1w = m1.mp.Xw[jnp.asarray(mp1)]     # cur-map world
        X2w = m2.mp.Xw[jnp.asarray(mp2)]     # match-map world
        uv1 = kf1.xy[slot1][jnp.asarray(feat1)]
        uv2 = kf2.xy[slot2][jnp.asarray(feat2)]
        K = jnp.asarray(self.config.camera.K())
        self.rng_key, sub = jax.random.split(self.rng_key)
        # Sim3 on WORLD coordinates: X2w ~ S(X1w); reprojection check via the
        # two keyframes' poses
        res = ransac.sim3_ransac(
            sub, X1w, X2w, uv1, uv2, kf1.Tcw[slot1], kf2.Tcw[slot2], K,
            jnp.ones(len(feat1), bool),
            min_inliers=self.config.opt.inliers_thres,
        )
        if not bool(res.success):
            return None
        S = lie.make_sim3(res.R, res.t, res.s)
        return MapMatchHit(
            map_id_cur=mid1, map_id_match=mid2,
            slot_cur=slot1, slot_match=slot2,
            S_match_from_cur=S,
        )
