"""Plane landmark management: per-keyframe segmentation, association with
map planes, "supposed plane" structural relations.

TPU-native equivalent of SP-SLAM's plane pipeline (MapPlane.cc + the plane
association / supposed-plane generation inside Tracking.cc — SURVEY.md
§2 #7, #9 [SP] and §3.1): frame planes are segmented on device
(ops/plane_seg.py), associated to MapPlanes by normal angle +
plane-distance gates, merged as observations, and near-parallel /
near-perpendicular pairs among co-observed planes become structural edges
consumed by the BA (solver/ba.py pp_* arrays).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Intrinsics
from ..geometry.lie import se3_inverse
from ..geometry.plane import normalize_plane, transform_plane
from ..map.store import MapStore
from ..ops.plane_seg import segment_planes


@dataclass(frozen=True)
class PlaneMapperConfig:
    assoc_angle_deg: float = 8.0      # SP-SLAM association gates
    assoc_dist: float = 0.15
    struct_angle_deg: float = 5.0     # tolerance for parallel/perp relations
    min_inliers: int = 4000           # pixels supporting a frame plane
    obs_weight_scale: float = 1e-4    # information per supporting pixel


class PlaneMapper:
    def __init__(self, intr: Intrinsics, store: MapStore,
                 cfg: PlaneMapperConfig = PlaneMapperConfig()):
        self.intr = intr
        self.store = store
        self.cfg = cfg
        # raw-depth divisor when integer depth frames are fed (the tracking
        # path uploads camera-native u16 raw units; System overrides from
        # the dataset YAML, matching Tracker.depth_factor)
        self.depth_factor = 5000.0

    def process_keyframe(self, kf: int, gray: np.ndarray, depth: np.ndarray):
        st = self.store
        cfg = self.cfg
        depth_j = jnp.asarray(depth)
        if jnp.issubdtype(depth_j.dtype, jnp.integer):
            depth_j = depth_j.astype(jnp.float32) / self.depth_factor
        res = segment_planes(depth_j, self.intr)
        valid = np.asarray(res.valid)
        coefs_c = np.asarray(res.coef)
        inliers = np.asarray(res.n_inliers)

        T_cw = jnp.asarray(st.kf_pose[kf])
        T_wc = se3_inverse(T_cw)
        observed_ids = []
        for i in range(len(valid)):
            if not valid[i] or inliers[i] < cfg.min_inliers:
                continue
            pi_c = coefs_c[i]
            pi_w = np.asarray(normalize_plane(transform_plane(T_wc, jnp.asarray(pi_c))))
            l = self._associate(pi_w)
            w = cfg.obs_weight_scale * float(inliers[i])
            if l < 0:
                l = st.add_plane(pi_w, kf, int(inliers[i]))  # grows on demand
            else:
                # running refinement of world coefficients (weight by support)
                w_old = float(st.pl_n_pts[l])
                w_new = float(inliers[i])
                old = st.pl_coef[l]
                new = pi_w if np.dot(old[:3], pi_w[:3]) >= 0 else -pi_w
                mixed = (w_old * old + w_new * new) / (w_old + w_new)
                st.pl_coef[l] = np.asarray(
                    normalize_plane(jnp.asarray(mixed.astype(np.float32)))
                )
                st.pl_n_pts[l] = int(min(w_old + w_new, 2 ** 30))
            st.add_plane_observation(l, kf, pi_cam=pi_c, weight=w)
            observed_ids.append(l)

        self._add_structural_edges(observed_ids)
        return observed_ids

    # -----------------------------------------------------------------
    def _associate(self, pi_w: np.ndarray) -> int:
        """Nearest map plane within angle+distance gates, else -1."""
        st = self.store
        cfg = self.cfg
        ids = np.nonzero(st.pl_valid)[0]
        if len(ids) == 0:
            return -1
        n = st.pl_coef[ids, :3]
        d = st.pl_coef[ids, 3]
        cos = np.abs(n @ pi_w[:3])
        # compare d with matching normal orientation
        sign = np.sign(n @ pi_w[:3] + 1e-12)
        dd = np.abs(d - sign * pi_w[3])
        ang_ok = cos > np.cos(np.radians(cfg.assoc_angle_deg))
        dist_ok = dd < cfg.assoc_dist
        cand = ids[ang_ok & dist_ok]
        if len(cand) == 0:
            return -1
        scores = dd[ang_ok & dist_ok]
        return int(cand[np.argmin(scores)])

    def _add_structural_edges(self, observed_ids):
        """SP-SLAM's supposed-plane relations: co-observed planes that are
        nearly parallel or nearly perpendicular get a structural edge."""
        st = self.store
        tol = np.radians(self.cfg.struct_angle_deg)
        for i in range(len(observed_ids)):
            for j in range(i + 1, len(observed_ids)):
                a, b = observed_ids[i], observed_ids[j]
                if a == b:
                    continue
                na = st.pl_coef[a, :3]
                nb = st.pl_coef[b, :3]
                c = abs(float(np.dot(na, nb)))
                if c > np.cos(tol):
                    st.add_plane_edge(a, b, 0)    # parallel
                elif c < np.sin(tol):
                    st.add_plane_edge(a, b, 1)    # perpendicular
