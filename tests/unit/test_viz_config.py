import os

import numpy as np

from spslam_tpu.config import load_settings, system_config_from_yaml
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig
from spslam_tpu.viz.draw import draw_frame, draw_map_topdown, draw_plane_segmentation

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestConfig:
    def test_load_tum1(self):
        v = load_settings(os.path.join(REPO, "configs/tum1.yaml"))
        assert abs(v["Camera.fx"] - 517.306408) < 1e-6
        assert v["ORBextractor.nFeatures"] == 1024

    def test_system_config(self):
        cfg = system_config_from_yaml(
            os.path.join(REPO, "configs/tum3.yaml"), use_planes=True
        )
        assert abs(cfg.intr.fx - 535.4) < 1e-6
        assert cfg.tracker.n_levels == 8
        assert cfg.plane_cfg.assoc_angle_deg == 8.0


class TestViz:
    def test_draw_outputs(self, tmp_path):
        seq = make_sequence(n_frames=4)
        s = System(SystemConfig(intr=seq.intr, local_ba=False))
        for (g, d), ts in zip(seq.frames, seq.timestamps):
            s.track_rgbd(g, d, ts)
        p1 = draw_map_topdown(s.store, s.poses(), seq.poses_gt, str(tmp_path / "m.png"))
        assert os.path.getsize(p1) > 5000
        import jax.numpy as jnp

        from spslam_tpu.frontend.frame import build_frame
        from spslam_tpu.ops.plane_seg import segment_planes
        from spslam_tpu.ops.pyramid import PyramidSpec

        g, d = seq.frames[0]
        f = build_frame(jnp.asarray(g), jnp.asarray(d), PyramidSpec(4, 1.2, 480, 640), seq.intr)
        p2 = draw_frame(g, np.asarray(f.uv), np.asarray(f.valid), path=str(tmp_path / "f.png"))
        assert os.path.getsize(p2) > 5000
        res = segment_planes(jnp.asarray(d), seq.intr)
        p3 = draw_plane_segmentation(g, res.block_label, path=str(tmp_path / "p.png"))
        assert os.path.getsize(p3) > 5000
