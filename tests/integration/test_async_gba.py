"""Async post-loop global BA (the reference's 4th thread —
LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc, SURVEY.md §3.3):
the solve runs on a dedicated worker while the mapper keeps inserting
keyframes; the merge propagates the correction to keyframes/points created
during the solve through the spanning tree / reference keyframes."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "unit"))

from test_global_ba import INTR, build_store_scene, pose_err  # noqa: E402

from spslam_tpu.geometry import np_lie  # noqa: E402
from spslam_tpu.loop.loop_closer import LoopCloser, LoopConfig  # noqa: E402
from spslam_tpu.solver.global_ba import global_bundle_adjust  # noqa: E402


def _insert_kf_child(store, parent: int, T_rel):
    """Insert a keyframe at T_rel . parent_pose (as the tracker would)."""
    n_kp = store.cfg.n_kp
    frame_np = dict(
        uv=np.zeros((n_kp, 2), np.float32),
        octave=np.zeros(n_kp, np.int32),
        angle=np.zeros(n_kp, np.float32),
        desc=np.zeros((n_kp, 8), np.uint32),
        depth=np.zeros(n_kp, np.float32),
        u_right=np.full(n_kp, -1.0, np.float32),
        valid=np.zeros(n_kp, bool),
    )
    T = np_lie.se3_compose(T_rel, store.kf_pose[parent])
    with store.lock:
        return store.add_keyframe(T, 99.0, frame_np, 99, parent=parent), T


class TestAsyncGBA:
    def test_merge_propagates_to_new_keyframes_and_points(self):
        store, poses_true, pts, pids = build_store_scene()
        res = global_bundle_adjust(store, INTR, write_back=False)
        assert res is not None and not res["wrote"] and res["newton"]

        # the map grows while the solve was "running": one child keyframe
        # hanging off KF 7 and a point referenced to it
        T_rel = np.array([1, 0, 0, 0, 0.05, 0.0, 0.0], np.float32)
        new_kf, T_inserted = _insert_kf_child(store, 7, T_rel)
        with store.lock:
            new_pt = store.add_point(
                np.array([0.5, 0.5, 6.0], np.float32), np.zeros(8, np.uint32),
                np.array([0, 0, 1.0], np.float32), new_kf, 6.0,
            )
        parent_old = store.kf_pose[7].copy()
        pt_old = store.pt_pos[new_pt].copy()

        lc = LoopCloser(INTR, store, cfg=LoopConfig())
        lc._merge_gba(res)

        # snapshot keyframes took the GBA solution (converged to truth)
        assert pose_err(store, poses_true) < 2e-3
        # the new keyframe rode its spanning-tree parent's correction:
        # T_new = T_rel_old . parent_new  where T_rel_old was measured
        # against the parent's PRE-merge pose
        T_rel_old = np_lie.se3_compose(T_inserted, np_lie.se3_inverse(parent_old))
        expect = np_lie.se3_compose(T_rel_old, store.kf_pose[7])
        np.testing.assert_allclose(store.kf_pose[new_kf], expect, atol=1e-5)
        # the new point transformed through its (new) reference keyframe
        Xc = np_lie.se3_apply(T_inserted, pt_old)
        expect_pt = np_lie.se3_apply(
            np_lie.se3_inverse(store.kf_pose[new_kf]), Xc
        )
        np.testing.assert_allclose(store.pt_pos[new_pt], expect_pt, atol=1e-5)

    def test_mapper_not_stalled_during_async_solve(self, monkeypatch):
        store, poses_true, _, _ = build_store_scene()
        lc = LoopCloser(INTR, store, cfg=LoopConfig(gba_async=True))

        import threading

        import spslam_tpu.solver.global_ba as gba_mod

        real = gba_mod.global_bundle_adjust
        solved = threading.Event()

        def slow_gba(st, intr, **kw):
            out = real(st, intr, **kw)     # snapshot + solve the map AS-IS
            solved.set()
            time.sleep(0.6)                # stretch the in-flight window so
            return out                     # insertions race the merge

        monkeypatch.setattr(gba_mod, "global_bundle_adjust", slow_gba)

        lc._global_refine()
        assert lc._gba_future is not None and not lc._gba_future.done()
        assert solved.wait(180.0)

        # keyframe insertions must not block on the in-flight solve
        t0 = time.perf_counter()
        new_kfs = []
        for i in range(5):
            k, _ = _insert_kf_child(
                store, 7, np.array([1, 0, 0, 0, 0.01 * (i + 1), 0, 0], np.float32)
            )
            new_kfs.append(k)
        insert_s = time.perf_counter() - t0
        assert insert_s < 0.3, f"mapper stalled {insert_s:.2f}s during GBA"
        assert not lc._gba_future.done(), "solve should still be in flight"

        before = store.kf_pose[new_kfs[-1]].copy()
        lc.wait_gba()
        # the merge landed and corrected the during-solve keyframes
        assert pose_err(store, poses_true) < 2e-3
        assert not np.allclose(store.kf_pose[new_kfs[-1]], before, atol=1e-6)
