"""TUM-layout end-to-end fixture: render a synthetic sequence, write it to
disk in the TUM RGB-D on-disk format (rgb/ + depth/ PNGs, rgb.txt,
depth.txt, groundtruth.txt), then drive the full CLI pipeline through
io/tum.py exactly like the reference's Examples/RGB-D/rgbd_tum.cc +
associate.py flow (SURVEY.md §2 #22)."""

import os

import numpy as np
import pytest

from spslam_tpu.geometry import np_lie
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.io.tum import load_tum_sequence

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """A 10-frame synthetic sequence written in TUM layout."""
    root = tmp_path_factory.mktemp("tum_seq")
    seq = make_sequence(n_frames=10)
    os.makedirs(root / "rgb")
    os.makedirs(root / "depth")
    rgb_lines, depth_lines, gt_lines = [], [], []
    for (gray, depth), ts, T_cw in zip(seq.frames, seq.timestamps, seq.poses_gt):
        name = f"{ts:.6f}.png"
        cv2.imwrite(str(root / "rgb" / name), np.clip(gray, 0, 255).astype(np.uint8))
        cv2.imwrite(
            str(root / "depth" / name),
            np.clip(depth * 5000.0, 0, 65535).astype(np.uint16),
        )
        rgb_lines.append(f"{ts:.6f} rgb/{name}")
        depth_lines.append(f"{ts:.6f} depth/{name}")
        T_wc = np_lie.se3_inverse(T_cw)  # groundtruth.txt stores T_wc
        qw, qx, qy, qz, tx, ty, tz = T_wc
        gt_lines.append(
            f"{ts:.6f} {tx:.6f} {ty:.6f} {tz:.6f} {qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}"
        )
    (root / "rgb.txt").write_text("# ts filename\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# ts filename\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")
    # settings YAML with the synthetic camera (reference parameter names)
    intr = seq.intr
    (root / "settings.yaml").write_text(
        f"Camera.fx: {intr.fx}\nCamera.fy: {intr.fy}\n"
        f"Camera.cx: {intr.cx}\nCamera.cy: {intr.cy}\n"
        f"Camera.bf: {intr.bf}\nCamera.width: {intr.width}\n"
        f"Camera.height: {intr.height}\nThDepth: 3.2\nDepthMapFactor: 5000.0\n"
        "ORBextractor.nFeatures: 1024\nORBextractor.nLevels: 8\n"
        "ORBextractor.scaleFactor: 1.2\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    return root, seq


class TestTumLoader:
    def test_association_and_depth_roundtrip(self, tum_dir):
        root, seq = tum_dir
        loaded = load_tum_sequence(str(root), config_yaml=str(root / "settings.yaml"))
        assert len(loaded.frames) == len(seq.frames)
        np.testing.assert_allclose(loaded.timestamps, seq.timestamps, atol=1e-6)
        g0, d0 = loaded.frames[0]
        g_ref, d_ref = seq.frames[0]
        assert g0.shape == g_ref.shape
        # uint8/uint16 quantization is the only loss
        assert np.abs(g0 - np.clip(g_ref, 0, 255)).max() <= 1.0
        valid = d_ref > 0
        assert np.abs(d0[valid] - d_ref[valid]).max() < 2e-4 + d_ref.max() / 5000.0

    def test_groundtruth_loaded_as_t_cw(self, tum_dir):
        root, seq = tum_dir
        loaded = load_tum_sequence(str(root), config_yaml=str(root / "settings.yaml"))
        assert loaded.poses_gt is not None
        assert loaded.poses_gt.shape == seq.poses_gt.shape
        for a, b in zip(loaded.poses_gt, seq.poses_gt):
            d = np_lie.se3_compose(a, np_lie.se3_inverse(b))
            assert np.linalg.norm(d[4:7]) < 1e-4
            assert abs(abs(d[0]) - 1.0) < 1e-6

    def test_associations_txt_variant(self, tum_dir):
        root, seq = tum_dir
        lines = []
        for ts in seq.timestamps:
            lines.append(f"{ts:.6f} rgb/{ts:.6f}.png {ts:.6f} depth/{ts:.6f}.png")
        (root / "associations.txt").write_text("\n".join(lines) + "\n")
        try:
            loaded = load_tum_sequence(str(root))
            assert len(loaded.frames) == len(seq.frames)
        finally:
            os.remove(root / "associations.txt")


class TestTumEndToEnd:
    def test_cli_on_tum_layout(self, tum_dir, tmp_path, capsys):
        """Full CLI drive on the on-disk TUM sequence (the reference's
        rgbd_tum.cc flow): track all frames, save trajectory, report ATE."""
        from spslam_tpu.cli import main

        root, seq = tum_dir
        traj = tmp_path / "traj.txt"
        main([
            "--tum", str(root), "--config", str(root / "settings.yaml"),
            "--traj-out", str(traj),
        ])
        out = capsys.readouterr().out
        assert "ATE RMSE" in out
        import json

        stats = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
        assert stats["ate_rmse_m"] < 0.02, out
        # trajectory file in TUM format: one row per frame, 8 columns
        rows = [l for l in traj.read_text().splitlines() if l.strip()]
        assert len(rows) == len(seq.frames)
        assert len(rows[0].split()) == 8
