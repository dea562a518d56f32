"""Synthetic textured RGB-D sequence renderer with exact ground truth.

The sandbox has no datasets and no network (SURVEY.md §4/§7), so integration
tests and benchmarks run on ray-cast renderings of a textured "room" made of
finite textured rectangles (floor/walls/boxes) — plane-dominant geometry
matching SP-SLAM's target scenes (ICL-NUIM-style living room).  The TUM
RGB-D loader (io/tum.py) is used instead whenever real data is present.

Pure numpy; rendering happens once per test/benchmark, outside the timed
SLAM path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from ..geometry.camera import Intrinsics


@dataclass
class TexturedRect:
    """Finite rectangle: origin + two edge vectors, with a procedural texture."""

    origin: np.ndarray  # [3]
    eu: np.ndarray      # [3] edge 1 (texture u axis)
    ev: np.ndarray      # [3] edge 2 (texture v axis)
    texture: np.ndarray  # [th, tw] float32 intensities 0..255

    @property
    def normal(self) -> np.ndarray:
        n = np.cross(self.eu, self.ev)
        return n / np.linalg.norm(n)


def _noise_texture(rng, th=256, tw=256, base=120.0, contrast=90.0, cell=16):
    """Smooth random texture with enough corners for FAST.

    Each call varies the spatial scales and mixes in a few high-contrast
    blobs, so different surfaces are statistically DISTINCT — place
    recognition needs distinguishable views (real rooms have them).
    """
    import cv2

    cell = int(rng.choice([8, 12, 16, 24, 32]))
    small = rng.uniform(-1, 1, size=(max(th // cell, 2), max(tw // cell, 2)))
    tex = cv2.resize(small.astype(np.float32), (tw, th), interpolation=cv2.INTER_CUBIC)
    fine_cell = int(rng.choice([3, 4, 6]))
    fine = rng.uniform(-1, 1, size=(th // fine_cell, tw // fine_cell))
    tex = tex + 0.5 * cv2.resize(fine.astype(np.float32), (tw, th), interpolation=cv2.INTER_NEAREST)
    # distinctive high-contrast blobs (like posters/furniture edges)
    for _ in range(int(rng.integers(4, 10))):
        cy, cx = rng.integers(20, th - 20), rng.integers(20, tw - 20)
        r = int(rng.integers(8, 30))
        sign = rng.choice([-1.5, 1.5])
        yy, xx = np.ogrid[:th, :tw]
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        tex[mask] += sign
    tex = base + contrast * tex / np.abs(tex).max()
    return np.clip(tex, 5, 250).astype(np.float32)


def _low_texture(rng, th=256, tw=256, base=120.0):
    """Near-uniform surface with a handful of faint blobs: the ICL-NUIM-style
    blank-wall regime where FAST finds almost no corners (contrast stays
    mostly under the low threshold) but depth planes remain perfect —
    SP-SLAM's defining scenario (SURVEY.md §6: planes help most on low
    texture)."""
    tex = np.full((th, tw), base, np.float32)
    tex += rng.normal(0, 1.5, (th, tw)).astype(np.float32)  # sensor-ish grain
    for _ in range(int(rng.integers(2, 4))):
        cy, cx = rng.integers(30, th - 30), rng.integers(30, tw - 30)
        r = int(rng.integers(10, 22))
        yy, xx = np.ogrid[:th, :tw]
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
        tex[mask] += rng.choice([-18.0, 18.0])
    return np.clip(tex, 5, 250).astype(np.float32)


def make_room(seed: int = 0, size: float = 6.0, height: float = 3.0,
              low_texture: bool = False) -> List[TexturedRect]:
    """A closed box room + two interior boxes, all textured.

    low_texture=True renders near-blank walls (see _low_texture) — the
    plane-dominant workload of BASELINE config #3."""
    rng = np.random.default_rng(seed)
    s, h = size, height
    rects = []

    def rect(o, eu, ev):
        rects.append(
            TexturedRect(
                origin=np.array(o, np.float64),
                eu=np.array(eu, np.float64),
                ev=np.array(ev, np.float64),
                texture=(_low_texture(rng) if low_texture
                         else _noise_texture(rng)),
            )
        )

    # floor (y = +h/2 with y pointing down in camera convention -> use y up = -)
    rect([-s / 2, h / 2, -s / 2], [s, 0, 0], [0, 0, s])      # floor
    rect([-s / 2, -h / 2, -s / 2], [s, 0, 0], [0, 0, s])     # ceiling
    rect([-s / 2, -h / 2, s / 2], [s, 0, 0], [0, h, 0])      # back wall  (z = +s/2)
    rect([-s / 2, -h / 2, -s / 2], [s, 0, 0], [0, h, 0])     # front wall (z = -s/2)
    rect([-s / 2, -h / 2, -s / 2], [0, 0, s], [0, h, 0])     # left wall
    rect([s / 2, -h / 2, -s / 2], [0, 0, s], [0, h, 0])      # right wall
    # interior boxes (vertical faces only, like furniture)
    for (bx, bz, bw, bh_) in [(-1.2, 1.2, 1.0, 1.2), (1.0, 0.4, 0.8, 0.9)]:
        y0 = h / 2 - bh_
        rect([bx, y0, bz], [bw, 0, 0], [0, bh_, 0])
        rect([bx, y0, bz + bw], [bw, 0, 0], [0, bh_, 0])
        rect([bx, y0, bz], [0, 0, bw], [0, bh_, 0])
        rect([bx + bw, y0, bz], [0, 0, bw], [0, bh_, 0])
    return rects


def render_frame(
    rects: List[TexturedRect],
    T_cw: np.ndarray,
    intr: Intrinsics,
    depth_noise: float = 0.0,
    rng: np.random.Generator | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-cast one RGB-D frame.

    Args:
      T_cw: [7] world->camera (qw qx qy qz tx ty tz), numpy.
    Returns (gray [H,W] float32 0..255, depth [H,W] float32 meters).
    """
    from ..geometry.lie import quat_to_mat  # numpy-compatible via jnp

    import jax.numpy as jnp

    H, W = intr.height, intr.width
    R_cw = np.asarray(quat_to_mat(jnp.array(T_cw[:4]))).astype(np.float64)
    t_cw = T_cw[4:7].astype(np.float64)
    # camera center in world, ray dirs in world
    C = -R_cw.T @ t_cw
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    dirs_c = np.stack(
        [(us - intr.cx) / intr.fx, (vs - intr.cy) / intr.fy, np.ones_like(us, np.float64)],
        axis=-1,
    )
    dirs_w = dirs_c @ R_cw  # (R_cw^T @ d) for each pixel

    best_t = np.full((H, W), np.inf)
    img = np.zeros((H, W), np.float32)

    for r in rects:
        n = r.normal
        denom = dirs_w @ n
        d_plane = -np.dot(n, r.origin)
        tt = -(np.dot(n, C) + d_plane) / np.where(np.abs(denom) < 1e-12, np.inf, denom)
        hit = tt > 1e-6
        X = C[None, None, :] + tt[..., None] * dirs_w
        rel = X - r.origin
        lu2 = np.dot(r.eu, r.eu)
        lv2 = np.dot(r.ev, r.ev)
        a = (rel @ r.eu) / lu2
        bcoord = (rel @ r.ev) / lv2
        inside = (a >= 0) & (a <= 1) & (bcoord >= 0) & (bcoord <= 1)
        closer = hit & inside & (tt < best_t)
        if not closer.any():
            continue
        th, tw = r.texture.shape
        a_safe = np.nan_to_num(np.where(closer, a, 0.0))
        b_safe = np.nan_to_num(np.where(closer, bcoord, 0.0))
        ti = np.clip((b_safe * (th - 1)).astype(np.int32), 0, th - 1)
        tj = np.clip((a_safe * (tw - 1)).astype(np.int32), 0, tw - 1)
        img = np.where(closer, r.texture[ti, tj], img)
        best_t = np.where(closer, tt, best_t)

    # depth = z in camera frame = t * dirs_c_z = t (dirs_c z=1) times norm factor:
    # X_c = R_cw X_w + t_cw ; depth is X_c[2] = t * 1 (since dirs_c z=1 scaled rays)
    depth = np.where(np.isfinite(best_t), best_t, 0.0).astype(np.float32)
    if depth_noise > 0 and rng is not None:
        noisy = depth + rng.normal(0, depth_noise, depth.shape) * np.maximum(depth, 1.0)
        depth = np.where(depth > 0, np.maximum(noisy, 0.05), 0.0).astype(np.float32)
    return img, depth


def orbit_trajectory(n_frames: int, radius: float = 0.8, seed: int = 1) -> np.ndarray:
    """Smooth trajectory inside the room: slow arc + small rotations.

    Returns [F, 7] T_cw poses (world->camera).
    """
    import jax.numpy as jnp

    from ..geometry.lie import mat_to_quat, quat_to_mat, so3_exp_quat

    poses = []
    for i in range(n_frames):
        a = 2.0 * np.pi * i / max(n_frames * 4, 1)  # quarter orbit over sequence
        # camera position orbiting room center, looking inward (+z toward wall)
        cx = radius * np.sin(a)
        cz = -1.0 + 0.3 * np.sin(2 * a)
        cy = 0.15 * np.sin(3 * a)
        yaw = 0.25 * np.sin(a * 2.0)
        pitch = 0.08 * np.sin(a * 3.0)
        q = np.asarray(so3_exp_quat(jnp.array([pitch, yaw, 0.0])))
        # camera->world rotation, then invert to T_cw
        Rwc = np.asarray(quat_to_mat(jnp.array(q)))
        Cw = np.array([cx, cy, cz])
        Rcw = Rwc.T
        tcw = -Rcw @ Cw
        qcw = np.asarray(mat_to_quat(jnp.array(Rcw)))
        poses.append(np.concatenate([qcw, tcw]).astype(np.float32))
    return np.stack(poses)


def loop_trajectory(n_frames: int, seed: int = 1, turns: float = 1.25) -> np.ndarray:
    """Yaw rotation in place (plus small sway) that overshoots a full turn
    (default 1.25 turns), so the final quarter of the sequence RE-TRAVERSES
    the starting views — a sustained revisit window like real loop-closure
    datasets (TUM fr2 loops re-traverse for many seconds), long enough for
    the detector's 3-consecutive-KF consistency chain to accumulate.
    All sway terms are periodic in the turn angle, so overshoot frames pass
    through the same positions as the originals.  Returns [F, 7] T_cw.
    """
    import jax.numpy as jnp

    from ..geometry.lie import mat_to_quat, quat_to_mat, so3_exp_quat

    poses = []
    for i in range(n_frames):
        a = 2.0 * np.pi * turns * i / n_frames
        cx = 0.4 * np.sin(a)
        cz = -0.8 + 0.2 * np.sin(2 * a)
        cy = 0.05 * np.sin(3 * a)
        yaw = a
        pitch = 0.03 * np.sin(2 * a)
        q = np.asarray(so3_exp_quat(jnp.array([pitch, yaw, 0.0])))
        Rwc = np.asarray(quat_to_mat(jnp.array(q)))
        Cw = np.array([cx, cy, cz])
        Rcw = Rwc.T
        tcw = -Rcw @ Cw
        qcw = np.asarray(mat_to_quat(jnp.array(Rcw)))
        poses.append(np.concatenate([qcw, tcw]).astype(np.float32))
    return np.stack(poses)


@dataclass
class SyntheticSequence:
    """Pre-rendered sequence with ground truth."""

    frames: List[Tuple[np.ndarray, np.ndarray]] = field(default_factory=list)
    poses_gt: np.ndarray = None  # [F, 7] T_cw
    timestamps: np.ndarray = None
    intr: Intrinsics = None


def make_sequence(
    n_frames: int = 30,
    intr: Intrinsics | None = None,
    seed: int = 0,
    depth_noise: float = 0.0,
    trajectory: str = "orbit",
    low_texture: bool = False,
) -> SyntheticSequence:
    intr = intr or Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0, width=640, height=480)
    rects = make_room(seed=seed, low_texture=low_texture)
    if trajectory == "loop":
        poses = loop_trajectory(n_frames, seed=seed + 1)
    else:
        poses = orbit_trajectory(n_frames, seed=seed + 1)
    rng = np.random.default_rng(seed + 2)
    seq = SyntheticSequence(
        frames=[], poses_gt=poses, timestamps=np.arange(n_frames) / 30.0, intr=intr
    )
    for i in range(n_frames):
        seq.frames.append(render_frame(rects, poses[i], intr, depth_noise, rng))
    return seq
