"""Duplicate-landmark fusion (ORBmatcher::Fuse via LocalMapping::
SearchInNeighbors — SURVEY.md §2 #3/#10): revisited structure must merge
into one landmark instead of duplicating, and free slots must gain
observations (covisibility strengthens)."""

import jax.numpy as jnp
import numpy as np

from spslam_tpu.geometry import Intrinsics, project, se3_apply, se3_exp
from spslam_tpu.map.store import MapConfig, MapStore
from spslam_tpu.mapping.fuse import fuse_into_keyframes, search_in_neighbors

rng = np.random.default_rng(11)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                  width=640, height=480)


def random_desc(n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def build_two_view_scene(n_pts=64):
    """Two keyframes seeing the SAME structure, each with its own copy of
    every landmark (the duplicate state fuse must clean up)."""
    store = MapStore(MapConfig(max_keyframes=16, max_points=1024, n_kp=128,
                               max_obs_per_point=16))
    pts = np.stack(
        [rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
         rng.uniform(4, 7, n_pts)], axis=-1,
    ).astype(np.float32)
    desc = random_desc(n_pts)  # same descriptors in both views (same structure)
    poses = [
        np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
        np.asarray(se3_exp(jnp.array([0.08, 0.0, 0.0, 0.0, 0.15, 0.0]))),
    ]
    n_kp = store.cfg.n_kp
    pids = []
    for c, T in enumerate(poses):
        xc = np.asarray(se3_apply(jnp.array(T), jnp.array(pts)))
        uv = np.asarray(project(INTR, jnp.array(xc)))
        frame_np = dict(
            uv=np.zeros((n_kp, 2), np.float32),
            octave=np.zeros(n_kp, np.int32),
            angle=np.zeros(n_kp, np.float32),
            desc=np.zeros((n_kp, 8), np.uint32),
            depth=np.zeros(n_kp, np.float32),
            u_right=np.full(n_kp, -1.0, np.float32),
            valid=np.zeros(n_kp, bool),
        )
        frame_np["uv"][:n_pts] = uv
        frame_np["desc"][:n_pts] = desc
        frame_np["depth"][:n_pts] = xc[:, 2]
        frame_np["u_right"][:n_pts] = uv[:, 0] - INTR.bf / np.maximum(xc[:, 2], 1e-3)
        frame_np["valid"][:n_pts] = True
        k = store.add_keyframe(T, float(c), frame_np, c)
        dist = np.linalg.norm(pts, axis=-1)
        normal = pts / np.maximum(dist[:, None], 1e-9)
        # each keyframe creates its OWN copy of every landmark (duplicates)
        pids.append(store.add_points_bulk(
            pts + rng.normal(0, 1e-3, pts.shape).astype(np.float32),
            desc, normal, dist, k, np.arange(n_pts),
        ))
    return store, pids, pts


class TestFuse:
    def test_duplicates_merge_via_replace_point(self):
        store, (pids0, pids1), _ = build_two_view_scene()
        n_valid_before = int(store.pt_valid.sum())
        assert n_valid_before == len(pids0) + len(pids1)
        # fuse KF0's points into KF1: every one should hit KF1's duplicate
        n_fused, n_added = fuse_into_keyframes(
            store, INTR, np.asarray(pids0), np.array([1], np.int32)
        )
        n_valid_after = int(store.pt_valid.sum())
        assert n_fused > 0.8 * len(pids0), (n_fused, n_added)
        assert n_valid_after <= n_valid_before - n_fused + 1
        # survivors carry both observations -> covisibility strengthens
        survivors = np.nonzero(store.pt_valid)[0]
        merged = survivors[store.pt_n_obs[survivors] >= 2]
        assert len(merged) >= n_fused
        cov = store.covisibility(0, min_weight=15)
        assert 1 in cov

    def test_free_slot_gains_observation(self):
        store, (pids0, pids1), _ = build_two_view_scene()
        # erase KF1's duplicates first: their kp slots become free
        for p in pids1:
            store.erase_point(int(p))
        before_obs = store.pt_n_obs[pids0].copy()
        n_fused, n_added = fuse_into_keyframes(
            store, INTR, np.asarray(pids0), np.array([1], np.int32)
        )
        assert n_fused == 0
        assert n_added > 0.8 * len(pids0)
        assert (store.pt_n_obs[pids0] > before_obs).sum() == n_added
        # fused points got their stats refreshed from both observations
        assert store.pt_valid[pids0].all()

    def test_search_in_neighbors_shrinks_duplicate_map(self):
        store, (pids0, pids1), _ = build_two_view_scene()
        # make the keyframes covisible (share a few landmarks) so KF0 is a
        # fuse target for KF1 — SearchInNeighbors only visits covisible KFs
        store.add_observations_bulk(pids0[:10], 1, np.arange(100, 110))
        n_before = int(store.pt_valid.sum())
        fused, added = search_in_neighbors(store, INTR, 1)
        assert fused > 0
        assert int(store.pt_valid.sum()) < n_before
