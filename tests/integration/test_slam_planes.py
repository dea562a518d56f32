import numpy as np
import pytest

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=15)


class TestSlamWithPlanes:
    def test_planes_created_and_ate(self, seq):
        sys_ = System(SystemConfig(intr=seq.intr, local_ba=True, use_planes=True))
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        # the room has 6 walls + boxes; at least a few planes must be mapped
        n_pl = int(sys_.store.pl_valid.sum())
        assert n_pl >= 3, f"only {n_pl} map planes"
        # observations should accumulate across keyframes (association works)
        assert sys_.store.pl_obs_count[: sys_.store.n_pl].max() >= 3
        rmse, _ = ate_rmse(sys_.poses(), seq.poses_gt)
        assert rmse < 0.02, f"ATE with planes: {rmse}"
        # structural edges between perpendicular walls should exist
        assert len(sys_.store.ppe_a) >= 1

    def test_plane_coefficients_match_room(self, seq):
        from spslam_tpu.io.synthetic import make_room

        sys_ = System(SystemConfig(intr=seq.intr, local_ba=True, use_planes=True))
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            sys_.track_rgbd(gray, depth, ts)
        rects = make_room(seed=0)
        gt = []
        for r in rects:
            n = r.normal
            gt.append(np.concatenate([n, [-np.dot(n, r.origin)]]))
        st = sys_.store
        matched = 0
        for l in np.nonzero(st.pl_valid)[0]:
            est = st.pl_coef[l]
            for g in gt:
                gg = np.asarray(g, np.float32)
                e = est if np.dot(est[:3], gg[:3]) > 0 else -est
                ang = np.degrees(
                    np.arccos(np.clip(np.dot(e[:3], gg[:3]), -1, 1))
                )
                if ang < 5.0 and abs(e[3] - gg[3]) < 0.1:
                    matched += 1
                    break
        assert matched >= 3, f"{matched} map planes match the room geometry"
