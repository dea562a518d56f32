"""Descriptor matching on the MXU.

TPU-native replacement for the reference's ORBmatcher (SearchByProjection /
SearchForInitialization / Fuse — SURVEY.md §2 #3, hot loops 3-4 in §3.1).

Key idea: a 256-bit Hamming distance is ``|a| + |b| - 2 a.b`` over {0,1}
bit vectors, so an entire NxM distance matrix is ONE matmul on the MXU
(bf16 is exact for integer dot products up to 256).  The reference's
grid-based candidate gating becomes a mask added to the distance matrix;
its per-keypoint loops become row-wise top-2 reductions.  The rotation-
histogram consistency check is a 30-bin vote + top-3-bin filter, exactly
like ORBmatcher::ComputeThreeMaxima.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(1e9)
HISTO_BINS = 30

# Reference-family thresholds (ORBmatcher.cc TH_LOW/TH_HIGH).
TH_LOW = 50.0
TH_HIGH = 100.0


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """[Na, 256] x [Nb, 256] {0,1} float -> [Na, Nb] Hamming distances.

    One MXU matmul: d = pa + pb - 2 a.b  (pa/pb = popcounts).
    """
    a = bits_a.astype(jnp.bfloat16)
    b = bits_b.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    pa = jnp.sum(bits_a, axis=-1, keepdims=True)
    pb = jnp.sum(bits_b, axis=-1, keepdims=True)
    return pa + pb.T - 2.0 * dots


class MatchResult(NamedTuple):
    idx: jnp.ndarray    # [Na] int32 best column per row (-1 if no match)
    dist: jnp.ndarray   # [Na] float32 best distance (BIG if none)
    valid: jnp.ndarray  # [Na] bool


def _top2(dist: jnp.ndarray):
    """Row-wise best and second-best over the last axis."""
    best = jnp.min(dist, axis=-1)
    best_idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    masked = dist + BIG * jax.nn.one_hot(best_idx, dist.shape[-1], dtype=dist.dtype)
    second = jnp.min(masked, axis=-1)
    return best, best_idx, second


def rotation_consistency(
    angle_a: jnp.ndarray, angle_b_matched: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Keep matches whose angle difference falls in the 3 most popular of 30
    bins (ORBmatcher's CheckOrientation).  Returns refined validity mask."""
    diff = angle_a - angle_b_matched
    frac = jnp.mod(diff / (2.0 * jnp.pi), 1.0)
    bins = jnp.clip((frac * HISTO_BINS).astype(jnp.int32), 0, HISTO_BINS - 1)
    hist = jnp.sum(
        jax.nn.one_hot(bins, HISTO_BINS, dtype=jnp.float32) * valid[:, None].astype(jnp.float32),
        axis=0,
    )
    _, top3 = jax.lax.top_k(hist, 3)
    in_top3 = (bins[:, None] == top3[None, :]).any(axis=-1)
    return valid & in_top3


@partial(jax.jit, static_argnames=("ratio", "check_rotation"))
def match_descriptors(
    bits_a: jnp.ndarray,
    bits_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    angles_a: jnp.ndarray | None = None,
    angles_b: jnp.ndarray | None = None,
    max_dist: float = TH_LOW,
    ratio: float = 0.9,
    check_rotation: bool = True,
    gate: jnp.ndarray | None = None,
) -> MatchResult:
    """General gated mutual-best matcher.

    gate: optional [Na, Nb] bool of admissible pairs (projection window,
    octave compatibility, epipolar band ... composed by the caller).
    """
    d = hamming_matrix(bits_a, bits_b)
    mask = valid_a[:, None] & valid_b[None, :]
    if gate is not None:
        mask = mask & gate
    d = jnp.where(mask, d, BIG)

    best, best_idx, second = _top2(d)
    ok = (best <= max_dist) & (best < ratio * second)

    # Mutual consistency: the chosen column's best row must be this row.
    col_best_row = jnp.argmin(d, axis=0).astype(jnp.int32)  # [Nb]
    mutual = col_best_row[best_idx] == jnp.arange(d.shape[0], dtype=jnp.int32)
    ok = ok & mutual & valid_a

    if check_rotation and angles_a is not None and angles_b is not None:
        ok = rotation_consistency(angles_a, angles_b[best_idx], ok)

    return MatchResult(
        idx=jnp.where(ok, best_idx, -1),
        dist=jnp.where(ok, best, BIG),
        valid=ok,
    )


def window_gate(
    uv_a: jnp.ndarray,
    uv_b: jnp.ndarray,
    radius_a: jnp.ndarray,
    octave_a: jnp.ndarray | None = None,
    octave_b: jnp.ndarray | None = None,
    octave_slack: int = 1,
) -> jnp.ndarray:
    """[Na, Nb] bool gate: b-keypoints inside a per-a search window, with
    optional pyramid-level compatibility (the reference's radius search in
    GetFeaturesInArea with minLevel/maxLevel)."""
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, axis=-1)
    g = d2 <= (radius_a[:, None] ** 2)
    if octave_a is not None and octave_b is not None:
        diff = octave_b[None, :] - octave_a[:, None]
        g = g & (diff >= -octave_slack) & (diff <= octave_slack)
    return g


@partial(
    jax.jit,
    static_argnames=("max_dist", "ratio", "check_rotation", "octave_slack"),
)
def search_by_projection(
    proj_uv: jnp.ndarray,
    proj_bits: jnp.ndarray,
    proj_valid: jnp.ndarray,
    proj_octave: jnp.ndarray,
    kp_uv: jnp.ndarray,
    kp_bits: jnp.ndarray,
    kp_valid: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_angles: jnp.ndarray,
    proj_angles: jnp.ndarray,
    radius: jnp.ndarray,
    max_dist: float = TH_HIGH,
    ratio: float = 0.9,
    check_rotation: bool = True,
    octave_slack: int = 1,
) -> MatchResult:
    """Match projected map points (rows) against frame keypoints (cols)
    within per-point windows — the reference's SearchByProjection."""
    gate = window_gate(proj_uv, kp_uv, radius, proj_octave, kp_octave,
                       octave_slack=octave_slack)
    return match_descriptors(
        proj_bits,
        kp_bits,
        proj_valid,
        kp_valid,
        proj_angles,
        kp_angles,
        max_dist=max_dist,
        ratio=ratio,
        check_rotation=check_rotation,
        gate=gate,
    )
