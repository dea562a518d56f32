"""System facade: construct the pipeline, feed RGB-D frames, save results.

TPU-native equivalent of the reference's System class (src/System.cc —
SURVEY.md §2 #16): owns the MapStore, Tracker, LocalMapper (and LoopCloser
once enabled), exposes TrackRGBD-style per-frame entry, trajectory export
in TUM format, localization-only mode, and map checkpoint save/load.

The reference's three std::threads become: a synchronous tracking step plus
a mapping step executed inline (sync mode) or on a background executor
operating on map snapshots (async mode, tracking/pipeline.py).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Optional

import numpy as np

from .geometry.camera import Intrinsics
from .map.store import MapConfig, MapStore
from .mapping.local_mapper import LocalMapper, MapperConfig
from .tracking.tracker import Tracker, TrackerConfig, TrackState


@dataclass
class SystemConfig:
    intr: Intrinsics = field(default_factory=lambda: Intrinsics(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0, width=640, height=480
    ))
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    mapper: MapperConfig = field(default_factory=MapperConfig)
    map: MapConfig = field(default_factory=MapConfig)
    use_planes: bool = False
    use_loop: bool = False
    enable_reloc: bool = True     # keep vocab+KFDB maintained even without
                                  # loop closing so LOST is recoverable (the
                                  # reference's KeyFrameDatabase always exists)
    gba_distributed: bool | None = None  # post-loop global BA: None = auto
                                  # (dense small maps, sharded mesh solver
                                  # for big ones), True = force sharded
    async_mapping: bool = False   # run mapping/loop on a background thread
    local_ba: bool = True
    localization_only: bool = False
    vocab_path: str | None = None  # pretrained vocabulary (else lazy-trained)
    plane_cfg: object = None       # PlaneMapperConfig override (from YAML)
    depth_map_factor: float = 5000.0  # raw-depth divisor for integer datasets


class System:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        if cfg.map.n_kp != cfg.tracker.n_features:
            # one knob: the store's per-KF keypoint budget always follows
            # the tracker's feature budget (a mismatch breaks every
            # kp-slot-indexed path at the first keyframe)
            import dataclasses

            cfg.map = dataclasses.replace(cfg.map, n_kp=cfg.tracker.n_features)
        self.store = MapStore(cfg.map)
        self.tracker = Tracker(cfg.tracker, cfg.intr, self.store)
        self.tracker.depth_factor = cfg.depth_map_factor
        if (cfg.use_planes or cfg.use_loop) and self.tracker.pipeline_depth > 2:
            # plane accuracy and loop DETECTION are both sensitive to
            # keyframe cadence, which deeper pipelining shifts (the
            # 3-consecutive-detection chain never completes at depth 3 on
            # fast revisits: 0 closures measured on the canonical loop
            # sequence) — cap those configurations at depth 2 so the
            # DEFAULT config is safe on every lane
            self.tracker.pipeline_depth = 2
        self.mapper = LocalMapper(cfg.mapper, cfg.intr, self.store)
        self.plane_mapper = None
        if cfg.use_planes:
            from .mapping.plane_mapper import PlaneMapper, PlaneMapperConfig

            pcfg = cfg.plane_cfg or PlaneMapperConfig()
            self.plane_mapper = PlaneMapper(cfg.intr, self.store, pcfg)
            self.plane_mapper.depth_factor = cfg.depth_map_factor
            # tracking-level plane refinement (SP-SLAM Tracking.cc [SP]):
            # the fused step segments frame planes and jointly optimizes
            # the pose against the map-plane snapshot
            self.tracker.use_planes = True
        self.loop_closer = None
        if cfg.use_loop or cfg.enable_reloc:
            import os

            from .loop.loop_closer import LoopCloser, LoopConfig
            from .loop.vocab import Vocabulary

            path = cfg.vocab_path
            if path is None:
                default = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "vocab_synth.npz",
                )
                path = default if os.path.exists(default) else None
            vocab = Vocabulary(n_words=4096)
            if path:
                vocab.load(path)
            self.loop_closer = LoopCloser(
                cfg.intr, self.store, vocab,
                cfg=LoopConfig(gba_distributed=cfg.gba_distributed),
            )
            self.tracker.relocalizer = (self.loop_closer.vocab, self.loop_closer.kfdb)
        self.trajectory: list[tuple[float, np.ndarray]] = []
        self._rel_trajectory: list[tuple[float, int, np.ndarray]] = []
        self._last_kf_count = 0
        self.pipeline = None
        if cfg.async_mapping:
            from .tracking.pipeline import AsyncMappingPipeline

            self.pipeline = AsyncMappingPipeline(self)
            # keyframe rate adapts to mapping throughput (the reference's
            # bLocalMappingIdle gate in Tracking::NeedNewKeyFrame)
            self.tracker.mapper_queue_fn = self.pipeline.queue_len

    # -----------------------------------------------------------------
    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray, ts: float):
        """Feed one frame. gray: [H,W] float32 0..255; depth: meters.

        Returns (T_cw [7], state) of the most recently RESOLVED frame: the
        tracker runs a depth-1 software pipeline (frame N's device compute
        overlaps frame N-1's host bookkeeping — tracker.process_pipelined),
        so the current frame's pose is typically returned by the NEXT call;
        the full per-frame trajectory is exact after shutdown()/poses().
        """
        for rec in self.tracker.process_pipelined(gray, depth, ts):
            self._absorb(rec)
        return self.tracker.T_cw.copy(), self.tracker.state

    def _absorb(self, rec):
        """Trajectory bookkeeping + mapping hand-off for one resolved frame."""
        # store the frame pose RELATIVE to its reference keyframe (the
        # reference's SaveTrajectoryTUM convention): loop/BA corrections to
        # keyframes then retroactively fix the whole trajectory
        T, ts, state = rec.T, rec.ts, rec.state
        ref = rec.ref_kf if state == TrackState.OK else -1
        if ref >= 0:
            from .geometry import np_lie

            T_rel = np_lie.se3_compose(T, np_lie.se3_inverse(self.store.kf_pose[ref]))
        else:
            T_rel = T
        self._rel_trajectory.append((ts, int(ref), T_rel))
        self.trajectory.append((ts, T))
        if rec.new_kf >= 0 and not self.cfg.localization_only:
            self._last_kf_count = self.store.n_kf
            if self.pipeline is not None:
                self.pipeline.submit(rec.new_kf, rec.gray, rec.depth)
            else:
                if self.plane_mapper is not None and state == TrackState.OK:
                    self.plane_mapper.process_keyframe(rec.new_kf, rec.gray, rec.depth)
                self.mapper.process_keyframe(rec.new_kf, run_ba=self.cfg.local_ba)
                if self.loop_closer is not None:
                    # detect=False keeps the KFDB/vocab maintained for
                    # relocalization without ever closing loops (use_loop=False)
                    closed = self.loop_closer.process_keyframe(
                        rec.new_kf, detect=self.cfg.use_loop
                    )
                    if closed:
                        # realign the tracker with the corrected map
                        self.tracker.external_pose_correction(
                            self.store.kf_pose[rec.new_kf]
                        )
                        self.trajectory[-1] = (ts, self.tracker.T_cw.copy())

    # -----------------------------------------------------------------
    def poses(self) -> np.ndarray:
        """Per-frame T_cw reconstructed through CURRENT keyframe poses, so
        loop-closure / BA corrections apply to the whole trajectory."""
        from .geometry import np_lie

        for rec in self.tracker.flush_pipeline():  # resolve in-flight frame
            self._absorb(rec)
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()  # land any in-flight async global BA

        out = []
        for (ts, ref, T_rel), (_, T_abs) in zip(self._rel_trajectory, self.trajectory):
            if ref >= 0 and self.store.kf_valid[ref]:
                out.append(np_lie.se3_compose(T_rel, self.store.kf_pose[ref]))
            else:
                out.append(T_abs)
        return np.stack(out)

    def save_trajectory_tum(self, path: str):
        """TUM format: ts tx ty tz qx qy qz qw, camera-to-world."""
        import jax.numpy as jnp

        from .geometry.lie import se3_inverse

        poses = self.poses()
        with open(path, "w") as f:
            for (ts, _), T_cw in zip(self.trajectory, poses):
                T_wc = np.asarray(se3_inverse(jnp.asarray(T_cw)))
                qw, qx, qy, qz, tx, ty, tz = T_wc
                f.write(f"{ts:.6f} {tx:.6f} {ty:.6f} {tz:.6f} {qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n")

    def save_keyframe_trajectory_tum(self, path: str):
        import jax.numpy as jnp

        from .geometry.lie import se3_inverse

        st = self.store
        with open(path, "w") as f:
            for k in range(st.n_kf):
                if not st.kf_valid[k]:
                    continue
                T_wc = np.asarray(se3_inverse(jnp.asarray(st.kf_pose[k])))
                qw, qx, qy, qz, tx, ty, tz = T_wc
                f.write(
                    f"{st.kf_ts[k]:.6f} {tx:.6f} {ty:.6f} {tz:.6f} {qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
                )

    def save_metrics(self, path: str):
        for rec in self.tracker.flush_pipeline():
            self._absorb(rec)
        with open(path, "w") as f:
            for m in self.tracker.metrics:
                f.write(json.dumps(m) + "\n")

    # -----------------------------------------------------------------
    def save_map(self, path: str):
        """Checkpoint the full map state (npz pytree)."""
        st = self.store
        np.savez_compressed(
            path,
            **{
                k: getattr(st, k)
                for k in (
                    "kf_pose kf_valid kf_ts kf_frame_id kf_parent kf_uv kf_octave "
                    "kf_angle kf_desc kf_depth kf_ur kf_kp_valid kf_obs "
                    "pt_pos pt_valid pt_desc pt_normal pt_min_dist pt_max_dist "
                    "pt_ref_kf pt_first_kf pt_obs_kf pt_obs_slot pt_n_obs "
                    "pt_visible pt_found pl_coef pl_valid pl_obs_kf pl_obs_pi "
                    "pl_obs_w pl_obs_count pl_ref_kf pl_n_pts"
                ).split()
            },
            n_kf=st.n_kf,
            n_pt=st.n_pt,
            n_pl=st.n_pl,
        )

    def load_map(self, path: str):
        data = np.load(path)
        st = self.store
        cfg_n_kp = st.cfg.n_kp
        for k in data.files:
            if k in ("n_kf", "n_pt", "n_pl"):
                setattr(st, k, int(data[k]))
            else:
                # adopt the saved capacity (the saved map may have grown past
                # this store's initial caps, or been saved from smaller ones)
                setattr(st, k, data[k].copy())
        st.cfg.max_keyframes = st.kf_pose.shape[0]
        st.cfg.max_points = st.pt_pos.shape[0]
        st.cfg.max_planes = st.pl_coef.shape[0]
        # the per-KF keypoint budget and obs-list width are baked into the
        # saved array shapes too; a checkpoint saved with a different n_kp
        # than this tracker's n_features would desync every kp-indexed path
        st.cfg.n_kp = st.kf_uv.shape[1]
        st.cfg.max_obs_per_point = st.pt_obs_kf.shape[1]
        if st.cfg.n_kp != cfg_n_kp:
            raise ValueError(
                f"checkpoint keypoint budget ({st.cfg.n_kp}) != this "
                f"System's configured n_kp ({cfg_n_kp}); construct the "
                f"System with a matching MapConfig/TrackerConfig to load "
                f"this map"
            )
        st.version += 1
        st.topo_version += 1
        # resume tracking against the loaded map
        valid_kfs = np.nonzero(st.kf_valid)[0]
        if len(valid_kfs):
            self.tracker.ref_kf = int(valid_kfs[-1])
            self.tracker.last_kf = self.tracker.ref_kf
            self.tracker.T_cw = st.kf_pose[self.tracker.ref_kf].copy()
            self.tracker.state = TrackState.OK
            self._last_kf_count = st.n_kf

    def activate_localization_mode(self):
        self.cfg.localization_only = True

    def deactivate_localization_mode(self):
        self.cfg.localization_only = False

    def shutdown(self):
        for rec in self.tracker.flush_pipeline():
            self._absorb(rec)
        if self.pipeline is not None:
            self.pipeline.shutdown()
        if self.loop_closer is not None:
            self.loop_closer.wait_gba()
            # map finalization: one more global refinement over the closed
            # map before trajectories/checkpoints are read — the live
            # post-closure GBA ran while keyframes were still streaming in
            if (self.loop_closer.n_loops_closed > 0
                    and not self.cfg.localization_only):
                self.loop_closer._run_gba()
