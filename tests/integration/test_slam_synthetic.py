import numpy as np
import pytest

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig
from spslam_tpu.tracking.tracker import TrackState


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=20)


class TestSlamEndToEnd:
    def test_point_odometry_ate(self, seq):
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=False))
        states = []
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            _, st = sys_.track_rgbd(gray, depth, ts)
            states.append(st)
        assert states[-1] == TrackState.OK
        n_lost = sum(1 for s in states if s == TrackState.LOST)
        assert n_lost == 0, f"lost tracking {n_lost} times"
        rmse, _ = ate_rmse(sys_.poses(), seq.poses_gt)
        assert rmse < 0.03, f"ATE RMSE too high: {rmse}"

    def test_with_local_ba(self, seq):
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=True))
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        rmse, _ = ate_rmse(sys_.poses(), seq.poses_gt)
        assert rmse < 0.02, f"ATE RMSE with BA too high: {rmse}"
        assert sys_.store.n_kf >= 2
        assert sys_.store.n_pt > 200

    def test_trajectory_save(self, seq, tmp_path):
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=False))
        for (gray, depth), ts in zip(seq.frames[:5], seq.timestamps[:5]):
            sys_.track_rgbd(gray, depth, ts)
        p = tmp_path / "traj.txt"
        sys_.save_trajectory_tum(str(p))
        lines = p.read_text().strip().splitlines()
        assert len(lines) == 5
        assert len(lines[0].split()) == 8

    def test_map_save_load(self, seq, tmp_path):
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=False))
        for (gray, depth), ts in zip(seq.frames[:8], seq.timestamps[:8]):
            sys_.track_rgbd(gray, depth, ts)
        p = str(tmp_path / "map.npz")
        sys_.save_map(p)
        sys2 = System(SystemConfig(intr=seq.intr, local_ba=False))
        sys2.load_map(p)
        assert sys2.store.n_kf == sys_.store.n_kf
        assert sys2.store.n_pt == sys_.store.n_pt
        # localization-only against loaded map keeps tracking
        sys2.activate_localization_mode()
        _, st = sys2.track_rgbd(seq.frames[8][0], seq.frames[8][1], seq.timestamps[8])
        assert st == TrackState.OK
