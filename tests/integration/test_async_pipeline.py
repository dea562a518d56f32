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

    def test_shutdown_idempotent(self, seq):
        s = System(SystemConfig(intr=seq.intr, async_mapping=True))
        for (g, d), ts in zip(seq.frames[:4], seq.timestamps[:4]):
            s.track_rgbd(g, d, ts)
        s.shutdown()
        s.shutdown()
        assert s.pipeline.idle()
