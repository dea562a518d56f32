"""TUM RGB-D (and ICL-NUIM TUM-compatible) dataset loading.

Equivalent of the reference's Examples/RGB-D/rgbd_tum.cc LoadImages +
associate.py convention (SURVEY.md §2 #22, §6): reads rgb.txt / depth.txt
(or a pre-built associations.txt), pairs them by nearest timestamp, loads
images with OpenCV, applies DepthMapFactor, and reads groundtruth.txt when
present.

ICL-NUIM "living room" sequences ship in TUM-compatible layout, so the same
loader covers both (`load_tum_sequence` with depth_factor=5000).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..geometry.camera import Intrinsics

# Default TUM freiburg intrinsics per sequence family (fr1/fr2/fr3), matching
# the reference's Examples/RGB-D/TUMX.yaml files.
TUM_INTRINSICS = {
    "fr1": dict(fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
                k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314),
    "fr2": dict(fx=520.908620, fy=521.007327, cx=325.141442, cy=249.701764,
                k1=0.231222, k2=-0.784899, p1=-0.003257, p2=-0.000105, k3=0.917205),
    "fr3": dict(fx=535.4, fy=539.2, cx=320.1, cy=247.6),
    "icl": dict(fx=481.20, fy=-480.0, cx=319.5, cy=239.5),
}


@dataclass
class TumSequence:
    frames: List[Tuple[np.ndarray, np.ndarray]] = field(default_factory=list)
    timestamps: np.ndarray = None
    intr: Intrinsics = None
    poses_gt: Optional[np.ndarray] = None  # [F,7] T_cw or None


def _read_file_list(path: str):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1:]))
    return out


def associate(a, b, max_dt=0.02):
    """Greedy nearest-timestamp association (TUM associate.py semantics)."""
    pairs = []
    bi = 0
    for ta, pa in a:
        best, best_dt = None, max_dt
        for tb, pb in b[max(bi - 2, 0): bi + 50]:
            dt = abs(ta - tb)
            if dt < best_dt:
                best, best_dt = (tb, pb), dt
        if best is not None:
            pairs.append((ta, pa, best[0], best[1]))
            bi += 1
    return pairs


def guess_intrinsics(seq_dir: str) -> Intrinsics:
    name = os.path.basename(os.path.normpath(seq_dir)).lower()
    fam = "fr1"
    if "freiburg2" in name or "fr2" in name:
        fam = "fr2"
    elif "freiburg3" in name or "fr3" in name:
        fam = "fr3"
    elif "living" in name or "lr" in name or "icl" in name or "office" in name:
        fam = "icl"
    p = TUM_INTRINSICS[fam]
    return Intrinsics(width=640, height=480, bf=40.0, **p)


def load_intrinsics_yaml(path: str) -> Intrinsics:
    """Read the reference's OpenCV-YAML camera settings (Camera.fx etc.)."""
    import re

    vals = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"\s*Camera\.(\w+)\s*:\s*([-\d.eE+]+)", line)
            if m:
                vals[m.group(1)] = float(m.group(2))
    return Intrinsics(
        fx=vals.get("fx", 525.0), fy=vals.get("fy", 525.0),
        cx=vals.get("cx", 319.5), cy=vals.get("cy", 239.5),
        k1=vals.get("k1", 0.0), k2=vals.get("k2", 0.0),
        p1=vals.get("p1", 0.0), p2=vals.get("p2", 0.0), k3=vals.get("k3", 0.0),
        bf=vals.get("bf", 40.0),
        width=int(vals.get("width", 640)), height=int(vals.get("height", 480)),
    )


def load_groundtruth(path: str, timestamps: np.ndarray) -> Optional[np.ndarray]:
    """groundtruth.txt rows: ts tx ty tz qx qy qz qw (T_wc) -> [F,7] T_cw."""
    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    from ..geometry.lie import se3_inverse

    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.split()[:8]])
    gt = np.array(rows)
    out = []
    for ts in timestamps:
        i = int(np.argmin(np.abs(gt[:, 0] - ts)))
        tx, ty, tz, qx, qy, qz, qw = gt[i, 1:8]
        T_wc = np.array([qw, qx, qy, qz, tx, ty, tz], np.float32)
        out.append(np.asarray(se3_inverse(jnp.array(T_wc))))
    return np.stack(out)


def load_tum_sequence(
    seq_dir: str,
    config_yaml: Optional[str] = None,
    depth_factor: float = 5000.0,
    max_frames: Optional[int] = None,
) -> TumSequence:
    import cv2

    intr = load_intrinsics_yaml(config_yaml) if config_yaml else guess_intrinsics(seq_dir)

    assoc_path = os.path.join(seq_dir, "associations.txt")
    pairs = []
    if os.path.exists(assoc_path):
        with open(assoc_path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                p = line.split()
                # ts_rgb rgb_path ts_depth depth_path (either order)
                if "depth" in p[1]:
                    pairs.append((float(p[2]), [p[3]], float(p[0]), [p[1]]))
                else:
                    pairs.append((float(p[0]), [p[1]], float(p[2]), [p[3]]))
    else:
        rgb = _read_file_list(os.path.join(seq_dir, "rgb.txt"))
        depth = _read_file_list(os.path.join(seq_dir, "depth.txt"))
        pairs = associate(rgb, depth)

    if max_frames:
        pairs = pairs[:max_frames]

    seq = TumSequence(frames=[], intr=intr)
    ts_list = []
    for t_rgb, rgb_p, t_d, d_p in pairs:
        img = cv2.imread(os.path.join(seq_dir, rgb_p[0]), cv2.IMREAD_GRAYSCALE)
        dep = cv2.imread(os.path.join(seq_dir, d_p[0]), cv2.IMREAD_UNCHANGED)
        if img is None or dep is None:
            continue
        seq.frames.append(
            (img.astype(np.float32), dep.astype(np.float32) / depth_factor)
        )
        ts_list.append(t_rgb)
    seq.timestamps = np.array(ts_list)
    seq.poses_gt = load_groundtruth(
        os.path.join(seq_dir, "groundtruth.txt"), seq.timestamps
    )
    return seq
