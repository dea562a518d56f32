"""Pinhole camera model: projection, unprojection, distortion.

Replaces the reference family's per-frame undistortion + RGB-D
pseudo-stereo handling (Frame::UndistortKeyPoints,
Frame::ComputeStereoFromRGBD — SURVEY.md §2 #4).  Batched, jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Static pinhole + radial-tangential distortion parameters.

    Matches the reference YAML parameter names (Camera.fx/fy/cx/cy,
    Camera.k1..k3/p1/p2, Camera.bf, ThDepth).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 40.0  # baseline*fx for the RGB-D virtual right coordinate
    width: int = 640
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


def project(intr: Intrinsics, xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points [..., 3] -> pixel coords [..., 2] (no distortion:
    the pipeline works on undistorted keypoints like the reference)."""
    z = jnp.maximum(xc[..., 2:3], 1e-6)
    u = intr.fx * xc[..., 0:1] / z + intr.cx
    v = intr.fy * xc[..., 1:2] / z + intr.cy
    return jnp.concatenate([u, v], axis=-1)


def project_with_depth(intr: Intrinsics, xc: jnp.ndarray) -> jnp.ndarray:
    """-> [..., 3] = (u, v, z)."""
    uv = project(intr, xc)
    return jnp.concatenate([uv, xc[..., 2:3]], axis=-1)


def unproject(intr: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords [..., 2] + depth [...] -> camera-frame 3D [..., 3]."""
    d = depth[..., None]
    x = (uv[..., 0:1] - intr.cx) / intr.fx * d
    y = (uv[..., 1:2] - intr.cy) / intr.fy * d
    return jnp.concatenate([x, y, d], axis=-1)


def distort_normalized(intr: Intrinsics, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (intr.k1 + r2 * (intr.k2 + r2 * intr.k3))
    xd = x * radial + 2.0 * intr.p1 * x * y + intr.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + intr.p1 * (r2 + 2.0 * y * y) + 2.0 * intr.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(intr: Intrinsics, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Iteratively undistort pixel coords (fixed-point, like cv2.undistortPoints).

    Static iteration count keeps it jittable; 8 iterations matches OpenCV's
    default accuracy for the mild distortion of RGB-D cameras.
    """
    if not intr.has_distortion:
        return uv
    xd = jnp.stack(
        [(uv[..., 0] - intr.cx) / intr.fx, (uv[..., 1] - intr.cy) / intr.fy], axis=-1
    )
    xn = xd
    for _ in range(iters):
        delta = distort_normalized(intr, xn) - xn
        xn = xd - delta
    return jnp.stack(
        [xn[..., 0] * intr.fx + intr.cx, xn[..., 1] * intr.fy + intr.cy], axis=-1
    )


def virtual_right_u(intr: Intrinsics, u: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """RGB-D pseudo-stereo right-image u coordinate: uR = u - bf/z.

    Invalid (non-positive) depths map to -1, matching the reference's sentinel.
    """
    valid = depth > 1e-6
    return jnp.where(valid, u - intr.bf / jnp.maximum(depth, 1e-6), -1.0)


def in_image(intr: Intrinsics, uv: jnp.ndarray, border: float = 0.0) -> jnp.ndarray:
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < intr.width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < intr.height - border)
    )
