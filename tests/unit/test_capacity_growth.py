"""Capacity doubling: the MapStore grows its flat arrays on demand instead
of asserting at the construction-time caps (SURVEY §7's design stance; ids
stay stable across growth)."""

import numpy as np

from spslam_tpu.map.store import MapConfig, MapStore


def _frame(n_kp, seed=0):
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


class TestCapacityGrowth:
    def test_keyframes_grow_past_initial_cap(self):
        st = MapStore(MapConfig(max_keyframes=2, max_points=64, n_kp=8))
        f = _frame(8)
        for k in range(5):
            got = st.add_keyframe(
                np.array([1, 0, 0, 0, 0.1 * k, 0, 0], np.float32), float(k), f, k
            )
            assert got == k
        assert st.cfg.max_keyframes >= 5
        assert st.kf_valid[:5].all()
        # earlier data survived the growth
        np.testing.assert_allclose(st.kf_pose[1, 4], 0.1, atol=1e-6)
        # new rows carry identity quaternions
        assert (st.kf_pose[5:, 0] == 1.0).all()

    def test_points_grow_in_bulk(self):
        st = MapStore(MapConfig(max_keyframes=4, max_points=8, n_kp=64))
        st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), 0.0,
                        _frame(64), 0)
        ids = st.add_points_bulk(
            np.tile(np.array([0, 0, 3], np.float32), (40, 1)),
            np.zeros((40, 8), np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (40, 1)),
            np.ones(40, np.float32), 0, np.arange(40),
        )
        assert st.cfg.max_points >= 48
        assert st.pt_valid[ids].all()
        assert st.pt_visible.shape[0] == st.cfg.max_points

    def test_planes_grow(self):
        st = MapStore(MapConfig(max_planes=1))
        for i in range(4):
            l = st.add_plane(np.array([0, 0, 1, 2.0 + i], np.float32), 0, 100)
            assert l == i
        assert st.cfg.max_planes >= 4
        assert (st.pl_coef[4:, 2] == 1.0).all()

    def test_save_load_roundtrip_after_growth(self, tmp_path):
        from spslam_tpu.geometry.camera import Intrinsics
        from spslam_tpu.system import System, SystemConfig

        intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                          width=640, height=480)
        from spslam_tpu.tracking.tracker import TrackerConfig

        cfg = SystemConfig(intr=intr, tracker=TrackerConfig(n_features=8))
        cfg.map = MapConfig(max_keyframes=2, max_points=16, n_kp=8)
        sys_a = System(cfg)
        st = sys_a.store
        f = _frame(8)
        for k in range(5):
            st.add_keyframe(np.array([1, 0, 0, 0, 0.1 * k, 0, 0], np.float32),
                            float(k), f, k)
        st.add_points_bulk(
            np.tile(np.array([0, 0, 3], np.float32), (30, 1)),
            np.zeros((30, 8), np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (30, 1)),
            np.ones(30, np.float32), 0, np.arange(8).repeat(4)[:30],
        )
        path = str(tmp_path / "grown.npz")
        sys_a.save_map(path)

        cfg_b = SystemConfig(intr=intr, tracker=TrackerConfig(n_features=8))
        cfg_b.map = MapConfig(max_keyframes=2, max_points=16, n_kp=8)
        sys_b = System(cfg_b)
        sys_b.load_map(path)
        assert sys_b.store.n_kf == 5
        assert sys_b.store.cfg.max_keyframes == st.cfg.max_keyframes
        np.testing.assert_array_equal(sys_b.store.kf_pose, st.kf_pose)
        np.testing.assert_array_equal(sys_b.store.pt_pos, st.pt_pos)

    def test_grown_planes_save_load_then_observe(self, tmp_path):
        """Regression: pl_obs_pi/pl_obs_w were missing from save_map, so a
        loaded map adopted grown plane capacity for pl_coef but kept small
        observation arrays — the first observation of a plane id beyond the
        constructor cap crashed with IndexError."""
        from spslam_tpu.geometry.camera import Intrinsics
        from spslam_tpu.system import System, SystemConfig

        intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                          width=640, height=480)
        from spslam_tpu.tracking.tracker import TrackerConfig

        cfg = SystemConfig(intr=intr, tracker=TrackerConfig(n_features=8))
        cfg.map = MapConfig(max_keyframes=4, max_points=64, max_planes=2, n_kp=8)
        sys_a = System(cfg)
        st = sys_a.store
        st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), 0.0,
                        _frame(8), 0)
        for i in range(5):  # grows past max_planes=2
            st.add_plane(np.array([0, 0, 1, 1.0 + i], np.float32), 0, 100)
        path = str(tmp_path / "planes.npz")
        sys_a.save_map(path)

        cfg_b = SystemConfig(intr=intr, tracker=TrackerConfig(n_features=8))
        cfg_b.map = MapConfig(max_keyframes=4, max_points=64, max_planes=2, n_kp=8)
        sys_b = System(cfg_b)
        sys_b.load_map(path)
        stb = sys_b.store
        assert stb.pl_obs_pi.shape[0] == stb.cfg.max_planes
        assert stb.pl_obs_w.shape[0] == stb.cfg.max_planes
        # observing a plane beyond the constructor cap must not crash
        stb.add_plane_observation(4, 0, pi_cam=np.array([0, 0, 1, 5.0], np.float32),
                                  weight=1.0)
        assert stb.pl_obs_count[4] == 1

    def test_shared_mapconfig_not_mutated(self):
        """Regression: capacity growth mutated the caller's MapConfig, so a
        config shared between two stores desynced the second store."""
        shared = MapConfig(max_keyframes=2, max_points=16, n_kp=8)
        a = MapStore(shared)
        b = MapStore(shared)
        f = _frame(8)
        for k in range(4):  # grows store a past the shared cap
            a.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                           float(k), f, k)
        assert shared.max_keyframes == 2, "caller's config must stay untouched"
        for k in range(4):  # store b must grow independently, not crash
            b.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32),
                           float(k), f, k)
        assert b.kf_valid[:4].all()
