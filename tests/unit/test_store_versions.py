"""MapStore topology-vs-value versioning and the tracker snapshot cache.

The tracker's local-map snapshot skips recomputing covisibility when only
VALUES changed (BA/PGO write-backs) and re-gathers the same rows; structural
churn must invalidate the id set (spslam_tpu/map/store.py topo_version,
tracker._local_snapshot).
"""

import numpy as np

from spslam_tpu.map.store import MapConfig, MapStore


def _mk_store(n_kp=32):
    return MapStore(MapConfig(max_keyframes=8, max_points=512, n_kp=n_kp))


def _frame(n_kp=32, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        uv=rng.uniform(0, 400, (n_kp, 2)).astype(np.float32),
        octave=np.zeros(n_kp, np.int32),
        angle=np.zeros(n_kp, np.float32),
        desc=rng.integers(0, 2 ** 32, (n_kp, 8), np.uint64).astype(np.uint32),
        depth=np.ones(n_kp, np.float32),
        u_right=np.full(n_kp, -1.0, np.float32),
        valid=np.ones(n_kp, bool),
    )


class TestTopoVersion:
    def test_structural_mutations_bump_topo(self):
        st = _mk_store()
        t0 = st.topo_version
        k = st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), 0.0,
                            _frame(), 0)
        assert st.topo_version > t0
        t1 = st.topo_version
        ids = st.add_points_bulk(
            np.zeros((4, 3), np.float32), np.zeros((4, 8), np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (4, 1)),
            np.ones(4, np.float32), k, np.arange(4),
        )
        assert st.topo_version > t1
        t2 = st.topo_version
        st.erase_point(int(ids[0]))
        assert st.topo_version > t2

    def test_value_writes_do_not_bump_topo(self):
        st = _mk_store()
        st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), 0.0,
                        _frame(), 0)
        topo = st.topo_version
        ver = st.version
        # BA-style write-backs: pose + point positions
        st.set_kf_pose(0, np.array([1, 0, 0, 0, 0.1, 0, 0], np.float32))
        st.pt_pos[:4] += 0.01
        st.version += 1
        assert st.version > ver
        assert st.topo_version == topo

    def test_snapshot_regather_sees_new_values(self):
        """Value-only updates must refresh the snapshot's point data without
        rebuilding the id set."""
        from spslam_tpu.geometry.camera import Intrinsics
        from spslam_tpu.tracking.tracker import Tracker, TrackerConfig

        st = _mk_store()
        k = st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), 0.0,
                            _frame(), 0)
        st.add_points_bulk(
            np.tile(np.array([0, 0, 3], np.float32), (8, 1)),
            np.zeros((8, 8), np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (8, 1)),
            np.full(8, 3.0, np.float32), k, np.arange(8),
        )
        intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                          width=640, height=480)
        tr = Tracker(TrackerConfig(local_points_cap=16), intr, st)
        tr.ref_kf = k
        ids1, pack1, _, _pl1 = tr._local_snapshot()
        # value-only change (what BA write-back does)
        st.pt_pos[0] = [1.0, 2.0, 5.0]
        st.version += 1
        ids2, pack2, _, _pl2 = tr._local_snapshot()
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
        row = int(np.nonzero(np.asarray(ids2) == 0)[0][0])
        np.testing.assert_allclose(np.asarray(pack2)[row, 0:3], [1.0, 2.0, 5.0])
        # structural change invalidates the id set
        st.add_points_bulk(
            np.tile(np.array([0, 0, 4], np.float32), (2, 1)),
            np.zeros((2, 8), np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (2, 1)),
            np.full(2, 4.0, np.float32), k, np.arange(8, 10),
        )
        ids3, _, _, _ = tr._local_snapshot()
        assert (np.asarray(ids3) >= 0).sum() == 10


class TestPrecompileSmoke:
    def test_warm_loop_machinery_runs(self):
        from spslam_tpu.geometry.camera import Intrinsics
        from spslam_tpu.loop.precompile import warm_loop_machinery

        intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                          width=640, height=480)
        warm_loop_machinery(intr)  # must not raise
