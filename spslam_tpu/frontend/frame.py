"""Frame construction: image + depth -> keypoints, descriptors, 3D backing.

TPU-native equivalent of the reference's Frame::Frame for RGB-D
(src/Frame.cc — SURVEY.md §2 #4): ORB extraction over the pyramid,
keypoint undistortion, depth sampling + virtual-right coordinate, and
camera-frame 3D unprojection.  The 64x48 grid binning for O(1) radius
search is unnecessary here — the matcher gates the full distance matrix on
the MXU instead (ops/match.py).

Everything is a fixed-budget [N_KP] pytree with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Intrinsics, in_image, undistort_points, unproject, virtual_right_u
from ..ops.brief import describe_levels, unpack_bits
from ..ops.fast import detect_levels, level_feature_counts
from ..ops.pyramid import PyramidSpec, build_pyramid_levels


class FrameData(NamedTuple):
    """Per-frame feature bundle (all arrays fixed-budget, mask-disciplined)."""

    uv: jnp.ndarray        # [N, 2] undistorted level-0 pixel coords
    uv_raw: jnp.ndarray    # [N, 2] raw (distorted) level-0 pixel coords
    octave: jnp.ndarray    # [N] int32
    angle: jnp.ndarray     # [N] float32 radians
    score: jnp.ndarray     # [N] float32 FAST response
    desc: jnp.ndarray      # [N, 8] uint32 packed rBRIEF
    bits: jnp.ndarray      # [N, 256] float32 {0,1} unpacked (for MXU matching)
    depth: jnp.ndarray     # [N] float32 (0 where invalid)
    u_right: jnp.ndarray   # [N] float32 virtual right u (-1 where invalid)
    xyz_cam: jnp.ndarray   # [N, 3] camera-frame 3D point (0 where no depth)
    valid: jnp.ndarray     # [N] bool keypoint exists
    has_depth: jnp.ndarray # [N] bool valid AND depth > 0


def _sample_depth(depth_img: jnp.ndarray, uv: jnp.ndarray,
                  full_hw: tuple) -> jnp.ndarray:
    """Nearest-neighbor depth lookup at keypoint coords (the reference reads
    imDepth.at<float>(v, u) at the rounded raw keypoint).

    The depth image may arrive SUBSAMPLED relative to the gray image
    (full_hw): the 900 KB/frame H2D upload rides a ~47 MB/s tunnel wire
    (tools/profile_pipeline.py stage B), so the tracker uploads depth at
    stride 2 (600 -> 150 KB) and the lookup lands on the nearest retained
    sample (<=1 px off at full res — under the depth sensor's own noise
    except exactly on discontinuity edges)."""
    H, W = depth_img.shape
    sx = W / full_hw[1]
    sy = H / full_hw[0]
    x = jnp.clip(jnp.round(uv[..., 0] * sx).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(uv[..., 1] * sy).astype(jnp.int32), 0, H - 1)
    return depth_img[y, x]


@partial(jax.jit, static_argnames=("spec", "intr", "n_features", "th_high", "th_low"))
def build_frame(
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    spec: PyramidSpec,
    intr: Intrinsics,
    n_features: int = 1024,
    th_high: float = 20.0,
    th_low: float = 7.0,
) -> FrameData:
    """gray: [H, W] float32 0..255; depth_img: [H, W] float32 meters (0=invalid)."""
    levels, levels_blur = build_pyramid_levels(gray, spec, blur=True)
    det = detect_levels(levels, spec, n_features=n_features, th_high=th_high, th_low=th_low)
    counts = level_feature_counts(spec, n_features)
    angle, desc = describe_levels(levels_blur, det["xy_level"], counts)

    uv_raw = det["xy"]
    uv = undistort_points(intr, uv_raw)
    valid = det["valid"] & in_image(intr, uv)

    d = _sample_depth(depth_img, uv_raw, (gray.shape[0], gray.shape[1]))
    has_depth = valid & (d > 1e-6)
    d = jnp.where(has_depth, d, 0.0)
    xyz = unproject(intr, uv, d)
    xyz = jnp.where(has_depth[:, None], xyz, 0.0)
    ur = virtual_right_u(intr, uv[..., 0], d)

    return FrameData(
        uv=uv,
        uv_raw=uv_raw,
        octave=det["octave"],
        angle=angle,
        score=det["score"],
        desc=desc,
        bits=unpack_bits(desc),
        depth=d,
        u_right=ur,
        xyz_cam=xyz,
        valid=valid,
        has_depth=has_depth,
    )
