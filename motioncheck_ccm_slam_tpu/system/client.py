"""Client system: wires tracking + local mapping for one agent.

Replaces the reference's ``ClientSystem`` + ``ClientHandler`` client role
(src/client/ClientSystem.cpp, src/ClientHandler.cpp:157-188): instead of
four free-running threads synchronized with spin-locks, the client is a
synchronous per-frame pipeline — tracking every frame, mapping on keyframe
creation — with the communicator draining outboxes between frames.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import map_state as ms
from ..models import mapping as mapping_mod
from ..models import tracking as tracking_mod
from ..models.frame import Frame
from ..ops import lie, orb
from ..solvers import ba_core, local_ba
from ..utils import watchdog as watchdog_mod


@dataclasses.dataclass
class ClientSystem:
    config: Config
    map: ms.MapState = None
    tracker: tracking_mod.Tracker = None
    mapper: mapping_mod.LocalMapper = None
    comm: object = None      # optional Communicator, set by the runner
    # liveness watchdog (reference estd::mylog; tracking/mapping/comm beats)
    watchdog: watchdog_mod.Watchdog = dataclasses.field(
        default_factory=lambda: watchdog_mod.Watchdog(timeout_s=30.0))

    def __post_init__(self):
        if self.map is None:
            self.map = ms.MapState.create(self.config, server=False)
        if self.tracker is None:
            self.tracker = tracking_mod.Tracker(config=self.config, map=self.map)
        if self.mapper is None:
            self.mapper = mapping_mod.LocalMapper(
                config=self.config, map=self.map,
                client_id=self.config.sys.client_id,
            )

    @property
    def client_id(self) -> int:
        return self.config.sys.client_id

    def process_image(self, img, timestamp: float) -> Frame:
        fr = self.tracker.process(img, timestamp)
        if (
            self.tracker.state == tracking_mod.TrackState.LOST
            and self.map.n_kfs <= self.config.tracking.init_kfs
        ):
            # lost soon after init: full reset (reference Tracking::Track
            # src/Tracking.cpp:249-259 via ClientHandler::Reset)
            self._reset_map()
            return fr
        self.watchdog.beat("tracking", self.tracker.state.name)
        self.watchdog.beat("mapping", f"{self.map.n_kfs} kfs")
        if self.tracker.init_result is not None:
            self._create_initial_map()
        elif (
            self.tracker.state == tracking_mod.TrackState.OK
            and self.tracker.need_new_keyframe(fr)
        ):
            slot = self.mapper.process_keyframe(fr)
            self.tracker.notify_kf_created(fr.n_tracked)
            self.watchdog.beat("mapping", f"kf slot {slot}")
            if self.comm is not None:
                self.comm.on_new_keyframe(self.map, slot)
        if self.comm is not None:
            self.comm.tick(self.map)
            self.watchdog.beat("comm", f"pub {self.comm.n_published}")
        return fr

    # ------------------------------------------------------------------
    def _create_initial_map(self):
        """Build the 2-KF bootstrap map (reference
        Tracking::CreateInitialMapMonocular src/Tracking.cpp:362): create both
        keyframes and the triangulated landmarks, run a 20-iteration full BA,
        and normalize the map scale by median scene depth (:418-443)."""
        cfg = self.config
        res = self.tracker.init_result
        self.tracker.init_result = None
        ref: Frame = res["ref_frame"]
        cur: Frame = res["cur_frame"]
        good = res["good"]
        match_idx = res["match_idx"]
        pts3d = res["pts3d"]
        m = self.map
        mapper = self.mapper

        feat1 = np.flatnonzero(good)
        feat2 = match_idx[feat1]
        n_new = len(feat1)
        # landmark slots
        ids = [(mapper.next_mp_id + i, self.client_id) for i in range(n_new)]
        slots = m.alloc_mp_slots(n_new, ids)
        mapper.next_mp_id += n_new

        # keyframes (ref = identity, cur = init pose)
        kf0_id = mapper.next_kf_id
        kf1_id = kf0_id + 1
        mapper.next_kf_id += 2
        assoc0 = np.full(cfg.extractor.max_features, -1, np.int32)
        assoc1 = np.full(cfg.extractor.max_features, -1, np.int32)
        assoc0[feat1] = slots
        assoc1[feat2] = slots
        ref.Tcw = jnp.eye(4, dtype=jnp.float32)
        ref.mp_idx = jnp.asarray(assoc0)
        cur.mp_idx = jnp.asarray(assoc1)
        slot0 = mapping_mod.insert_keyframe(m, ref, kf0_id, self.client_id)
        slot1 = mapping_mod.insert_keyframe(
            m, cur, kf1_id, self.client_id, parent_slot=slot0, pred_slot=slot0
        )
        mapper.last_kf_slot = slot1
        m.mp = mapping_mod._write_new_mps(
            m.mp, jnp.asarray(slots), jnp.asarray(pts3d[feat1]),
            ref.feats.desc[jnp.asarray(feat1)],
            jnp.asarray([i for i, _ in ids], dtype=jnp.int32),
            self.client_id, kf0_id, slot0,
        )

        # full BA, 20 iterations, first KF fixed (reference
        # GlobalBundleAdjustemntClient at Tracking.cpp:415)
        K = jnp.asarray(cfg.camera.K())
        cam, feat, lm, uv, octv, ok = ms.gather_observations(m.kf, 0)
        inv_s2_tab = jnp.asarray(orb.inv_level_sigma2(cfg.extractor))
        obs = ba_core.BAObservations(
            cam_idx=cam, lm_idx=lm, uv=uv,
            inv_sigma2=inv_s2_tab[jnp.clip(octv, 0, cfg.extractor.n_levels - 1)],
            valid=ok,
        )
        fixed = ~np.asarray(m.kf.valid)
        fixed[slot0] = True
        ba = local_ba.bundle_adjust(
            m.kf.Tcw, m.mp.Xw, obs, K, jnp.asarray(fixed),
            fixed_lm=~m.mp.valid, iterations=20,
        )
        m.kf = m.kf._replace(Tcw=ba.Tcw)
        m.mp = m.mp._replace(Xw=ba.Xw)

        # median-depth scale normalization
        depths = np.asarray(
            lie.transform_points(m.kf.Tcw[slot0], m.mp.Xw[None])[0][:, 2]
        )
        valid_mp = np.asarray(m.mp.valid)
        med = float(np.median(depths[valid_mp]))
        if med <= 0 or not np.isfinite(med):
            # degenerate bootstrap: wipe and retry later
            self._reset_map()
            return
        inv_med = 1.0 / med
        Tcw1 = np.asarray(m.kf.Tcw[slot1]).copy()
        Tcw1[:3, 3] *= inv_med
        m.kf = m.kf._replace(Tcw=m.kf.Tcw.at[slot1].set(jnp.asarray(Tcw1)))
        m.mp = m.mp._replace(Xw=m.mp.Xw * inv_med)

        # refresh landmark stats
        m.mp = ms.update_mp_descriptors_and_normals(
            m.kf, m.mp, orb.scale_factors(cfg.extractor)
        )
        # tracker state
        cur.Tcw = m.kf.Tcw[slot1]
        self.tracker.last_frame = cur
        self.tracker.notify_kf_created(n_new)
        self.tracker.velocity = None
        # the bootstrap frame's trajectory entry was logged BEFORE the BA +
        # median-depth normalization — rewrite it so exports/ATE see the
        # frame at map scale (it was off by the whole unit-baseline factor)
        if self.tracker.trajectory:
            t_last, _ = self.tracker.trajectory[-1]
            self.tracker.trajectory[-1] = (t_last, np.asarray(cur.Tcw))
        if self.comm is not None:
            self.comm.on_new_keyframe(m, slot0)
            self.comm.on_new_keyframe(m, slot1)

    def _reset_map(self):
        self.map = ms.MapState.create(self.config, server=False)
        self.tracker.map = self.map
        self.mapper.map = self.map
        self.tracker.reset()

    # ------------------------------------------------------------------
    def trajectory_tum(self) -> str:
        """TUM-format trajectory of all tracked frames (reference
        Map::WriteStateToCsv trajectory_format=1)."""
        from ..utils.csv_io import trajectory_tum

        return trajectory_tum(self.tracker.trajectory, self.config)
