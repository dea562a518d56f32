import numpy as np
import pytest

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig


@pytest.fixture(scope="module")
def loop_seq():
    # full 360-degree turn with depth noise so odometry drifts measurably
    return make_sequence(n_frames=64, trajectory="loop", depth_noise=0.004)


class TestLoopClosure:
    def test_loop_detected_and_closed(self, loop_seq):
        from spslam_tpu.loop.vocab import Vocabulary

        cfg = SystemConfig(intr=loop_seq.intr, local_ba=True, use_loop=True)
        sys_ = System(cfg)  # uses the pretrained data/vocab_synth.npz
        for (gray, depth), ts in zip(loop_seq.frames, loop_seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        # resolve in-flight pipelined frames (the reference's System::Shutdown
        # before SaveTrajectoryTUM) so trailing keyframes reach the loop closer
        sys_.shutdown()
        assert sys_.loop_closer.vocab.trained
        assert sys_.loop_closer.n_loops_closed >= 1, "no loop closure fired"
        rmse, _ = ate_rmse(sys_.poses(), loop_seq.poses_gt)
        # full-turn rotation with noisy depth is adversarial: odometry drift
        # before closure is ~0.10; closure + global refine must recover it
        assert rmse < 0.04, f"ATE after loop closure: {rmse}"

    def test_no_false_loops_on_short_sequence(self):
        seq = make_sequence(n_frames=10)
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=False, use_loop=True))
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        assert sys_.loop_closer.n_loops_closed == 0
