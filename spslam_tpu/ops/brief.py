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

PATCH_R = 16          # gathered patch radius (patch is 33x33)
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


def _make_moment_matrix() -> np.ndarray:
    """[PATCH_FLAT, 2] float32: columns are the masked x / y moment weights
    embedded in full-patch layout, so (m10, m01) = patches_flat @ M."""
    size = 2 * PATCH_R + 1
    M = np.zeros((size, size, 2), np.float32)
    lo = PATCH_R - ORIENT_R
    hi = PATCH_R + ORIENT_R + 1
    M[lo:hi, lo:hi, 0] = _xx * _CIRC
    M[lo:hi, lo:hi, 1] = _yy * _CIRC
    return M.reshape(size * size, 2)


MOMENT_MATRIX = jnp.asarray(_make_moment_matrix())


def ic_angle(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint patch.

    patches: [N, P, P] with P == 2*PATCH_R+1; uses the centered 31x31 disc.
    Returns angles in radians [N].  Formulated as one [N,1089]x[1089,2]
    matmul (MXU) instead of masked elementwise reductions.
    """
    n = patches.shape[0]
    if patches.shape[-1] == 2 * PATCH_R + 1:
        m = jax.lax.dot_general(
            patches.reshape(n, -1), MOMENT_MATRIX,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.arctan2(m[:, 1], m[:, 0])
    c = patches.shape[-1] // 2
    sub = patches[:, c - ORIENT_R : c + ORIENT_R + 1, c - ORIENT_R : c + ORIENT_R + 1]
    m10 = jnp.sum(sub * ORIENT_X * ORIENT_MASK, axis=(-2, -1))
    m01 = jnp.sum(sub * ORIENT_Y * ORIENT_MASK, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


N_ANGLE_BINS = 30  # ORB paper steers BRIEF with angles discretized to 2*pi/30


def _make_diff_matrix() -> np.ndarray:
    """[PATCH_FLAT, N_ANGLE_BINS * N_BITS] float32.

    Column (b*256 + s) holds +1 at the rotated first sample position and -1
    at the second, for angle bin b: ``patches_flat @ D`` yields every bit
    test's intensity difference for every steering bin in ONE matmul (MXU),
    replacing 512 per-keypoint scalar gathers (VPU-hostile) entirely.
    """
    size = 2 * PATCH_R + 1
    c = PATCH_R
    pat = _make_pattern()  # [256, 2, 2]
    D = np.zeros((size * size, N_ANGLE_BINS * N_BITS), np.float32)
    for b in range(N_ANGLE_BINS):
        th = 2.0 * np.pi * b / N_ANGLE_BINS
        ca, sa = np.cos(th), np.sin(th)
        rx = ca * pat[..., 0] - sa * pat[..., 1]  # [256, 2]
        ry = sa * pat[..., 0] + ca * pat[..., 1]
        ix = np.clip(np.round(rx).astype(np.int64) + c, 0, size - 1)
        iy = np.clip(np.round(ry).astype(np.int64) + c, 0, size - 1)
        flat = iy * size + ix  # [256, 2]
        cols = b * N_BITS + np.arange(N_BITS)
        np.add.at(D, (flat[:, 0], cols), 1.0)
        np.add.at(D, (flat[:, 1], cols), -1.0)
    return D


BRIEF_DIFF_MATRIX = jnp.asarray(_make_diff_matrix())


def brief_descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Steered BRIEF over gathered patches, MXU formulation.

    patches: [N, P, P] blurred-level patches; angles: [N] radians.
    Returns packed descriptors [N, 8] uint32.
    """
    n = patches.shape[0]
    flat = patches.reshape(n, -1)  # [N, 1089]
    # All steering bins at once on the MXU.
    diff_all = jax.lax.dot_general(
        flat, BRIEF_DIFF_MATRIX,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, N_ANGLE_BINS, N_BITS)
    # One-hot bin selection (no gather): bin = round(angle / (2pi/30)) mod 30.
    step = 2.0 * jnp.pi / N_ANGLE_BINS
    bin_idx = jnp.mod(jnp.round(angles / step).astype(jnp.int32), N_ANGLE_BINS)
    onehot = jax.nn.one_hot(bin_idx, N_ANGLE_BINS, dtype=flat.dtype)  # [N, 30]
    diff = jnp.einsum("nb,nbs->ns", onehot, diff_all)  # [N, 256]
    bits = (diff < 0).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(n, 8, 32) << shifts[None, None, :]
    return jnp.sum(words, axis=-1).astype(jnp.uint32)  # [N, 8]


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] {0,1} float32 (for MXU Hamming matmul)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


def gather_patches_level(img: jnp.ndarray, xy: jnp.ndarray, r: int = PATCH_R) -> jnp.ndarray:
    """Gather (2r+1)^2 patches from ONE true-size level image.

    img: [h_l, w_l]; xy: [n, 2] float32 level coords.  Returns [n, 2r+1, 2r+1].
    """
    H, W = img.shape
    size = 2 * r + 1

    def one(p):
        cx = jnp.clip(jnp.round(p[0]).astype(jnp.int32), r, W - r - 1)
        cy = jnp.clip(jnp.round(p[1]).astype(jnp.int32), r, H - r - 1)
        return jax.lax.dynamic_slice(img, (cy - r, cx - r), (size, size))

    return jax.vmap(one)(xy)


@partial(jax.jit, static_argnames=("counts",))
def describe_levels(levels_blur, xy_level: jnp.ndarray, counts: tuple):
    """Orientation + descriptors over true-size pyramid levels.

    Keypoints in xy_level are grouped by level with STATIC per-level counts
    (ops/fast.detect_levels ordering), so each level's patch gather is a
    static slice — no cross-level [L, H, W] buffer needed.

    Returns (angles [N] rad, desc [N, 8] uint32).
    """
    patches = []
    start = 0
    for lvl, c in enumerate(counts):
        if c == 0:
            continue
        xy = jax.lax.slice_in_dim(xy_level, start, start + c, axis=0)
        patches.append(gather_patches_level(levels_blur[lvl], xy))
        start += c
    patches = jnp.concatenate(patches)
    angles = ic_angle(patches)
    desc = brief_descriptors(patches, angles)
    return angles, desc


