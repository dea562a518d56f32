import numpy as np
import pytest

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=16)


class TestAsyncPipeline:
    def test_async_matches_sync_quality(self, seq):
        results = {}
        for mode in (False, True):
            s = System(SystemConfig(intr=seq.intr, local_ba=True, async_mapping=mode))
            for (g, d), ts in zip(seq.frames, seq.timestamps):
                s.track_rgbd(g, d, ts)
            s.shutdown()
            rmse, _ = ate_rmse(s.poses(), seq.poses_gt)
            results[mode] = rmse
            assert s.store.n_kf >= 2
        assert results[True] < 0.03, results
        # async must not be wildly worse than sync
        assert results[True] < 3 * max(results[False], 0.003)

    def test_pipelined_ate_close_to_sync(self, seq):
        """Regression gate for the round-1 pipelined-ATE regression: on the
        same sequence, the pipelined tracker (process_pipelined, used by
        System.track_rgbd) must stay within 1.5x of the synchronous
        per-frame path (tracker.process) — VERDICT r1 next-step #2."""
        from spslam_tpu.tracking.tracker import TrackerConfig

        tcfg = TrackerConfig(th_depth=3.2)
        # pipelined (the production path)
        s_pipe = System(SystemConfig(intr=seq.intr, local_ba=True, tracker=tcfg))
        for (g, d), ts in zip(seq.frames, seq.timestamps):
            s_pipe.track_rgbd(g, d, ts)
        s_pipe.shutdown()
        ate_pipe, _ = ate_rmse(s_pipe.poses(), seq.poses_gt)

        # synchronous robust path, same mapping configuration
        s_sync = System(SystemConfig(intr=seq.intr, local_ba=True, tracker=tcfg))
        poses = []
        for (g, d), ts in zip(seq.frames, seq.timestamps):
            T, _ = s_sync.tracker.process(g, d, ts)
            poses.append(T)
            if s_sync.tracker.last_kf >= 0 and s_sync.tracker.frames_since_kf == 0:
                s_sync.mapper.process_keyframe(s_sync.tracker.last_kf, run_ba=True)
        ate_sync, _ = ate_rmse(np.stack(poses), seq.poses_gt)

        assert ate_pipe < 0.012, (ate_pipe, ate_sync)
        assert ate_pipe < 1.5 * max(ate_sync, 0.002), (ate_pipe, ate_sync)

    def test_shutdown_idempotent(self, seq):
        s = System(SystemConfig(intr=seq.intr, async_mapping=True))
        for (g, d), ts in zip(seq.frames[:4], seq.timestamps[:4]):
            s.track_rgbd(g, d, ts)
        s.shutdown()
        s.shutdown()
        assert s.pipeline.idle()
