"""The distributed global BA wired into the LIVE system (VERDICT r3 ask #2):
loop closure with the sharded mesh solver forced on must match the dense
path's accuracy, and the direct store-level entry must improve geometry.

Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import numpy as np
import pytest

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.solver.global_ba import dist_global_bundle_adjust
from spslam_tpu.system import System, SystemConfig


@pytest.fixture(scope="module")
def loop_seq():
    return make_sequence(n_frames=64, trajectory="loop", depth_noise=0.004)


class TestDistGBAInSystem:
    def test_loop_closure_with_dist_gba(self, loop_seq):
        """Same scenario as test_slam_loop.py's canonical closure, but the
        post-loop global BA runs the sharded solver (gba_distributed=True)
        routed through partition_problem(strategy='segments') +
        dist_bundle_adjust on the local mesh — accuracy must match the
        dense path's gate."""
        seq = loop_seq
        sys_ = System(SystemConfig(
            intr=seq.intr, local_ba=True, use_loop=True, gba_distributed=True
        ))
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        sys_.shutdown()
        assert sys_.loop_closer.n_loops_closed >= 1, "no loop closure fired"
        rmse, _ = ate_rmse(sys_.poses(), seq.poses_gt)
        assert rmse < 0.04, f"ATE with distributed GBA: {rmse}"

    def test_dist_gba_small_map_falls_back(self):
        """Maps too small to shard return False and leave state unchanged."""
        from spslam_tpu.geometry.camera import Intrinsics
        from spslam_tpu.map.store import MapConfig, MapStore

        intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                          width=640, height=480)
        st = MapStore(MapConfig(max_keyframes=8, max_points=256, n_kp=64))
        frame_np = dict(
            uv=np.zeros((64, 2), np.float32), octave=np.zeros(64, np.int32),
            angle=np.zeros(64, np.float32), desc=np.zeros((64, 8), np.uint32),
            depth=np.ones(64, np.float32), u_right=np.full(64, -1.0, np.float32),
            valid=np.ones(64, bool),
        )
        for k in range(2):
            st.add_keyframe(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), 0.0,
                            frame_np, k)
        # only 40 points: under the 64-per-shard floor for any D >= 2
        st.add_points_bulk(
            np.zeros((40, 3), np.float32), np.zeros((40, 8), np.uint32),
            np.tile(np.array([0, 0, 1], np.float32), (40, 1)),
            np.ones(40, np.float32), 0, np.arange(40),
        )
        before = st.kf_pose.copy()
        assert dist_global_bundle_adjust(st, intr, n_shards=8) is False
        np.testing.assert_array_equal(st.kf_pose, before)


class TestDistGBAStoreLevel:
    def test_dist_gba_improves_perturbed_map(self):
        """Store-level check: perturb keyframe poses + points, run the
        sharded GBA, and verify the reprojection geometry recovers toward
        the unperturbed solution."""
        seq = make_sequence(n_frames=24)
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=True))
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        sys_.shutdown()
        st = sys_.store
        n_pts = int(st.pt_valid.sum())
        if n_pts < 64 * 2:
            pytest.skip("not enough points to shard")
        kf_ids = np.nonzero(st.kf_valid)[0]
        pt_ids = np.nonzero(st.pt_valid)[0]
        clean_pose = st.kf_pose[kf_ids].copy()

        rng = np.random.default_rng(3)
        st.kf_pose[kf_ids[1:], 4:7] += rng.normal(0, 0.01, (len(kf_ids) - 1, 3)).astype(np.float32)
        st.pt_pos[pt_ids] += rng.normal(0, 0.01, (len(pt_ids), 3)).astype(np.float32)

        ran = dist_global_bundle_adjust(st, seq.intr, n_iters=12)
        assert ran, "sharded GBA should run on this map"
        err = np.linalg.norm(st.kf_pose[kf_ids, 4:7] - clean_pose[:, 4:7], axis=1)
        # poses must move back toward the clean solution (perturbation ~1cm)
        assert float(np.median(err)) < 0.005, f"median pose error {np.median(err)}"
