"""SP-SLAM's value proposition (SURVEY.md §6: "planes help most" on
low-texture ICL-NUIM-style scenes): on a near-blank-walls render where FAST
finds few corners and depth is noisy, point-only tracking demonstrably
degrades, and use_planes=True (tracking-level joint point+plane pose
optimization + plane-aware BA) recovers a strict accuracy improvement."""

import numpy as np
import pytest

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig
from spslam_tpu.tracking.tracker import TrackerConfig


@pytest.fixture(scope="module")
def lowtex_seq():
    # seed 7 @ 0.8% depth noise: measured point-only 14-15 mm (vs ~3.3 mm
    # textured) with planes recovering to ~6-7 mm — the configuration where
    # the plane advantage is robustly outside run-to-run variance
    return make_sequence(n_frames=30, low_texture=True, depth_noise=0.008,
                         seed=7)


def _run(seq, use_planes):
    s = System(SystemConfig(
        intr=seq.intr, local_ba=True, use_planes=use_planes,
        tracker=TrackerConfig(th_depth=3.2, pipeline_depth=2),
    ))
    for (gray, depth), ts in zip(seq.frames, seq.timestamps):
        s.track_rgbd(gray, depth, ts)
    s.shutdown()
    rmse, _ = ate_rmse(s.poses(), seq.poses_gt)
    return rmse, s


class TestLowTexture:
    def test_point_only_degrades_and_planes_rescue(self, lowtex_seq):
        rmse_pt, s_pt = _run(lowtex_seq, use_planes=False)
        rmse_pl, s_pl = _run(lowtex_seq, use_planes=True)
        # the scene really is point-starved: an order of magnitude fewer
        # map points than the textured orbit's ~2k, and point-only ATE is
        # >= 3x the textured lane's ~3.5 mm class
        assert int(s_pt.store.pt_valid.sum()) < 900
        assert rmse_pt > 0.010, f"point-only should degrade: {rmse_pt}"
        # planes were found and actively used
        assert int(s_pl.store.pl_valid.sum()) >= 4
        # ... and they pay: strictly better than point-only on this scene
        assert rmse_pl < 0.8 * rmse_pt, (rmse_pt, rmse_pl)
