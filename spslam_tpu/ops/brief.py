"""Oriented rBRIEF descriptors: intensity-centroid orientation + rotated
256-bit binary descriptors, packed as [N, 8] uint32.

TPU-native replacement for the reference's IC_Angle + computeOrbDescriptor
(ORBextractor.cc — SURVEY.md §2 #1).  Instead of OpenCV's learned
``bit_pattern_31_`` table (which we do not copy), the sampling pattern is an
isotropic Gaussian BRIEF pattern (Calonder et al.'s G-II scheme: both ends
~N(0, (S/5)^2), clipped) with a fixed seed — rotation-steered per keypoint
exactly like rBRIEF.  Matching quality is validated by recall tests, not
bit-identity.

All per-keypoint work is vmapped gathers over a fixed keypoint budget; the
Hamming matcher then runs on the MXU (see ops/match.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 20          # gathered patch radius (patch is 41x41)
ORIENT_R = 15         # intensity-centroid radius (reference: HALF_PATCH_SIZE)
N_BITS = 256
PATTERN_CLIP = 13.0   # keep rotated samples inside the gathered patch


def _make_pattern(seed: int = 7) -> np.ndarray:
    """[256, 2, 2] float32 — per bit, two (x, y) offsets."""
    rng = np.random.default_rng(seed)
    sigma = 31.0 / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 2, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, PATTERN_CLIP / np.maximum(r, 1e-9))
    return (pts * scale).astype(np.float32)


BRIEF_PATTERN = jnp.asarray(_make_pattern())

# Circular mask for the orientation moment computation.
_yy, _xx = np.mgrid[-ORIENT_R : ORIENT_R + 1, -ORIENT_R : ORIENT_R + 1]
_CIRC = (_yy ** 2 + _xx ** 2 <= ORIENT_R ** 2).astype(np.float32)
ORIENT_MASK = jnp.asarray(_CIRC)
ORIENT_X = jnp.asarray(_xx.astype(np.float32))
ORIENT_Y = jnp.asarray(_yy.astype(np.float32))


def gather_patches(pyr: jnp.ndarray, octave: jnp.ndarray, xy_level: jnp.ndarray, r: int = PATCH_R) -> jnp.ndarray:
    """Gather (2r+1)^2 patches around keypoints from their pyramid level.

    Args:
      pyr: [L, H, W] (blurred for BRIEF, raw for orientation).
      octave: [N] int32 level index.
      xy_level: [N, 2] float32 (x, y) in level coords.
    Returns: [N, 2r+1, 2r+1] float32.
    """
    H, W = pyr.shape[1], pyr.shape[2]
    size = 2 * r + 1

    def one(oct_i, xy):
        cx = jnp.clip(jnp.round(xy[0]).astype(jnp.int32), r, W - r - 1)
        cy = jnp.clip(jnp.round(xy[1]).astype(jnp.int32), r, H - r - 1)
        return jax.lax.dynamic_slice(pyr, (oct_i, cy - r, cx - r), (1, size, size))[0]

    return jax.vmap(one)(octave, xy_level)


def ic_angle(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint patch.

    patches: [N, P, P] with P >= 2*ORIENT_R+1; uses the centered 31x31 disc.
    Returns angles in radians [N].
    """
    P = patches.shape[-1]
    c = P // 2
    sub = patches[:, c - ORIENT_R : c + ORIENT_R + 1, c - ORIENT_R : c + ORIENT_R + 1]
    m10 = jnp.sum(sub * ORIENT_X * ORIENT_MASK, axis=(-2, -1))
    m01 = jnp.sum(sub * ORIENT_Y * ORIENT_MASK, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def brief_descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF over gathered patches.

    patches: [N, 41, 41] blurred-level patches; angles: [N] radians.
    Returns packed descriptors [N, 8] uint32.
    """
    c = patches.shape[-1] // 2
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # [N]
    # Rotate pattern: [256, 2, 2] x per-keypoint rotation.
    px = BRIEF_PATTERN[..., 0]  # [256, 2]
    py = BRIEF_PATTERN[..., 1]
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]  # [N,256,2]
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    ix = jnp.clip(jnp.round(rx).astype(jnp.int32) + c, 0, patches.shape[-1] - 1)
    iy = jnp.clip(jnp.round(ry).astype(jnp.int32) + c, 0, patches.shape[-2] - 1)

    def sample(patch, ix_k, iy_k):
        return patch[iy_k, ix_k]  # [256, 2]

    vals = jax.vmap(sample)(patches, ix, iy)  # [N, 256, 2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # [N, 256]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(bits.shape[0], 8, 32) << shifts[None, None, :]
    return jnp.sum(words, axis=-1).astype(jnp.uint32)  # [N, 8]


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] {0,1} float32 (for MXU Hamming matmul)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


@partial(jax.jit, static_argnames=())
def describe(pyr_raw: jnp.ndarray, pyr_blur: jnp.ndarray, octave: jnp.ndarray, xy_level: jnp.ndarray):
    """Orientation + descriptors for a batch of keypoints.

    Returns (angles [N] rad, desc [N, 8] uint32).
    """
    patches_raw = gather_patches(pyr_raw, octave, xy_level)
    angles = ic_angle(patches_raw)
    patches_blur = gather_patches(pyr_blur, octave, xy_level)
    desc = brief_descriptors(patches_blur, angles)
    return angles, desc
