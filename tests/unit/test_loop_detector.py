"""Unit tests for the loop-detector gates (reference LoopClosing::DetectLoop
+ KeyFrameDatabase::DetectLoopCandidates, SURVEY.md §2 #12/#13, §3.3):
candidate retrieval, min-score gating, and the covisibility-consistency
accumulator — so keyframe-cadence changes localize here instead of silently
killing the loop subsystem (the round-2 regression)."""

import numpy as np
import pytest

from spslam_tpu.geometry.camera import Intrinsics
from spslam_tpu.loop.kfdb import KeyFrameDatabase
from spslam_tpu.loop.loop_closer import LoopCloser, LoopConfig
from spslam_tpu.map.store import MapConfig, MapStore


def make_closer(consistency_needed=3):
    intr = Intrinsics(fx=100.0, fy=100.0, cx=32.0, cy=24.0, bf=8.0,
                      width=64, height=48)
    store = MapStore(MapConfig(max_keyframes=32, max_points=512, n_kp=64))
    return LoopCloser(intr, store,
                      cfg=LoopConfig(consistency_needed=consistency_needed))


class TestConsistencyAccumulator:
    def test_accepts_after_n_consecutive_consistent_detections(self):
        lc = make_closer(consistency_needed=3)
        g = {0, 1, 2}
        assert lc._consistency_check([(0, g)])[0] == []          # count 0
        assert lc._consistency_check([(1, {2, 3})])[0] == []     # count 1
        assert lc._consistency_check([(2, {3, 4})])[0] == [2]    # count 2 -> fire

    def test_chain_resets_on_detection_gap(self):
        lc = make_closer(consistency_needed=3)
        lc._consistency_check([(0, {0, 1})])
        lc._consistency_check([(1, {1, 2})])
        lc._consistent = []  # what process_keyframe does on an empty query
        assert lc._consistency_check([(2, {2, 3})])[0] == []
        assert lc._consistency_check([(3, {3, 4})])[0] == []
        assert lc._consistency_check([(4, {4, 5})])[0] == [4]

    def test_disjoint_groups_do_not_accumulate(self):
        lc = make_closer(consistency_needed=2)
        lc._consistency_check([(0, {0, 1})])
        # group shares nothing with the previous detection
        assert lc._consistency_check([(5, {8, 9})])[0] == []

    def test_parallel_chains_tracked_independently(self):
        lc = make_closer(consistency_needed=3)
        lc._consistency_check([(0, {0, 1}), (10, {10, 11})])
        lc._consistency_check([(1, {1, 2}), (11, {11, 12})])
        accepted, _near = lc._consistency_check([(2, {2, 3}), (12, {12, 13})])
        assert set(accepted) == {2, 12}

    def test_near_candidates_one_detection_short(self):
        # the early-closure path (LoopConfig.early_close_inlier_scale) gets
        # candidates exactly one consecutive detection short of the chain
        lc = make_closer(consistency_needed=3)
        acc, near = lc._consistency_check([(0, {0, 1})])
        assert acc == [] and near == []          # count 0: two short
        acc, near = lc._consistency_check([(1, {1, 2})])
        assert acc == [] and near == [1]         # count 1: one short
        acc, near = lc._consistency_check([(2, {2, 3})])
        assert acc == [2] and near == []         # full chain


class TestCandidateRetrieval:
    def _bow(self, words, weight=1.0):
        v = {w: weight for w in words}
        s = sum(v.values())
        return {w: x / s for w, x in v.items()}

    @pytest.mark.parametrize("use_native", [False, True])
    def test_query_returns_similar_excludes_neighbors(self, use_native):
        db = KeyFrameDatabase(n_words=64, use_native=use_native)
        if use_native and not db.is_native:
            pytest.skip("native index unavailable")
        q = self._bow(range(0, 10))
        db.add(0, self._bow(range(0, 10)))     # identical -> score 1
        db.add(1, self._bow(range(5, 15)))     # half overlap
        db.add(2, self._bow(range(40, 50)))    # disjoint
        res = db.query(q, exclude=set(), min_score=0.05)
        ids = [k for k, _ in res]
        assert ids[0] == 0
        assert 2 not in ids
        res = db.query(q, exclude={0}, min_score=0.05)
        assert [k for k, _ in res][0] == 1

    @pytest.mark.parametrize("use_native", [False, True])
    def test_min_score_gate(self, use_native):
        db = KeyFrameDatabase(n_words=64, use_native=use_native)
        if use_native and not db.is_native:
            pytest.skip("native index unavailable")
        q = self._bow(range(0, 10))
        db.add(1, self._bow(range(5, 15)))     # score 0.5
        assert db.query(q, exclude=set(), min_score=0.6) == []
        assert len(db.query(q, exclude=set(), min_score=0.4)) == 1

    @pytest.mark.parametrize("use_native", [False, True])
    def test_erase_removes_candidate(self, use_native):
        db = KeyFrameDatabase(n_words=64, use_native=use_native)
        if use_native and not db.is_native:
            pytest.skip("native index unavailable")
        q = self._bow(range(0, 10))
        db.add(0, self._bow(range(0, 10)))
        assert len(db.query(q, exclude=set(), min_score=0.1)) == 1
        db.erase(0)
        assert db.query(q, exclude=set(), min_score=0.1) == []


class TestMinScoreGate:
    def test_min_score_uses_weakest_covisible_neighbor(self):
        """The gate must be min over ALL covisible KFs (the reference's
        minScore), not over only the strongest neighbors — a gate at the
        strongest neighbor's score (~0.3 for consecutive frames) rejects
        genuine revisit candidates (~0.2) and was the round-2 regression."""
        lc = make_closer()
        st = lc.store
        rng = np.random.default_rng(0)

        # 4 keyframes: 0-1-2 a covisible chain, 3 the query's weak neighbor
        n_kp = st.cfg.n_kp
        for k in range(5):
            frame_np = dict(
                uv=np.zeros((n_kp, 2), np.float32),
                octave=np.zeros(n_kp, np.int32),
                angle=np.zeros(n_kp, np.float32),
                desc=rng.integers(0, 2**32, (n_kp, 8), dtype=np.uint32),
                depth=np.ones(n_kp, np.float32),
                u_right=np.full(n_kp, -1.0, np.float32),
                valid=np.ones(n_kp, bool),
            )
            st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                            float(k), frame_np, k)
        # shared points make 4 covisible with 0 (strong) and 3 (weak-ish)
        pts = st.add_points_bulk(
            rng.normal(size=(40, 3)).astype(np.float32),
            rng.integers(0, 2**32, (40, 8), dtype=np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (40, 1)),
            np.ones(40, np.float32), ref_kf=4, slots=np.arange(40),
        )
        st.add_observations_bulk(pts[:30], 0, np.arange(30))   # weight 30
        st.add_observations_bulk(pts[30:], 3, np.arange(30, 40))  # weight 10

        covis = st.covisibility(4, min_weight=5)
        assert set(int(c) for c in covis) == {0, 3}
        # strongest neighbor listed first: a [:1] truncation would gate on
        # KF 0's score; the full min must consider KF 3 as well
        assert int(covis[0]) == 0
