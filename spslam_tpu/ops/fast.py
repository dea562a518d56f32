"""FAST-16 corner detection + NMS + tiled top-k keypoint distribution.

TPU-native replacement for the reference's per-cell cv::FAST calls plus the
quadtree keypoint distribution (ORBextractor::ComputeKeyPointsOctTree,
DistributeOctTree — SURVEY.md §2 #1, hot loop 1 in §3.1).

Design notes (tpu-first):
* The 16-pixel Bresenham circle test is evaluated for ALL pixels at once as
  16 shifted copies of the image — a pure VPU stencil XLA fuses well; no
  per-pixel branching.
* The reference's two-threshold scheme (iniThFAST, fall back to minThFAST in
  cells with no response) is reproduced by detecting at the LOW threshold and
  adding a large score bonus to corners that also pass the HIGH threshold:
  per-tile top-k then prefers high-threshold corners and falls back to
  low-threshold ones exactly when the tile has no strong corner.
* The quadtree spatial distribution is replaced by per-tile top-k (static
  shapes) followed by a global per-level top-n — the same "spread keypoints
  spatially, keep the best response" objective with compiler-friendly
  control flow.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pyramid import PyramidSpec

# Bresenham circle of radius 3 (same order as OpenCV FAST_9_16).
CIRCLE_OFFSETS = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-3 + 4, 3),
)
# NOTE: last entry corrected below; keep the canonical table explicit:
CIRCLE_OFFSETS = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)

ARC_LEN = 9  # FAST_9_16 contiguity requirement
SCORE_BONUS = 1e6  # added to corners passing the high threshold


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift so out[y, x] = img[y + dy, x + dx], zero fill (border is masked
    out downstream anyway)."""
    return jnp.roll(img, shift=(-dy, -dx), axis=(0, 1))


def fast_score_map(img: jnp.ndarray, th_low: float, th_high: float) -> jnp.ndarray:
    """Per-pixel FAST-9/16 corner score.

    Score = the OpenCV FAST score: the largest threshold t for which the
    pixel is still a corner, i.e. ``max over 16 arcs of (min arc
    difference)`` on the dominant bright/dark side.  This makes our 3x3 NMS
    pick the same winners as cv::FAST(nonmaxSuppression=true).

    A pixel is a corner iff score > th_low; SCORE_BONUS is added where it
    also passes th_high (two-threshold fallback scheme, see module doc).
    Non-corners get score 0.
    """
    center = img
    ring = jnp.stack([_shift2d(img, dy, dx) for (dx, dy) in CIRCLE_OFFSETS])  # [16,H,W]
    diff = ring - center[None]

    def arc_min_max(d):
        # Sliding circular-window min of length 9 via log-doubling on the
        # ring axis (roll wraps, which is exactly the circular semantics),
        # then max over the 16 window starts: ~6 ops instead of 144.
        w2 = jnp.minimum(d, jnp.roll(d, -1, axis=0))
        w4 = jnp.minimum(w2, jnp.roll(w2, -2, axis=0))
        w8 = jnp.minimum(w4, jnp.roll(w4, -4, axis=0))
        w9 = jnp.minimum(w8, jnp.roll(d, -8, axis=0))
        return jnp.max(w9, axis=0)

    score = jnp.maximum(arc_min_max(diff), arc_min_max(-diff))
    is_low = score > th_low
    is_high = score > th_high
    out = jnp.where(is_low, score, 0.0)
    return out + jnp.where(is_high, SCORE_BONUS, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep only local maxima of the 3x3 neighborhood (ties broken toward the
    top-left cell by strict comparison against shifted versions)."""
    best = score
    keep = jnp.ones_like(score, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = _shift2d(score, dy, dx)
            if (dy, dx) < (0, 0) or ((dy, dx) == (0, -1)):
                keep &= best > nb  # strict vs earlier-scan neighbors
            else:
                keep &= best >= nb
    return jnp.where(keep, score, 0.0)


class LevelKeypoints(NamedTuple):
    xy: jnp.ndarray     # [N, 2] float32 (x, y) in level pixel coords
    score: jnp.ndarray  # [N] float32 (bonus removed)
    valid: jnp.ndarray  # [N] bool


def select_tiled_topk(
    score: jnp.ndarray,
    n_out: int,
    tile: int = 32,
    k_per_tile: int = 8,
) -> LevelKeypoints:
    """Spatially-distributed keypoint selection: top-k per tile, then global
    top-n over tile winners.  All shapes static."""
    H, W = score.shape
    ph = (-H) % tile
    pw = (-W) % tile
    s = jnp.pad(score, ((0, ph), (0, pw)))
    Hp, Wp = H + ph, W + pw
    ty, tx = Hp // tile, Wp // tile
    tiles = s.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3).reshape(ty * tx, tile * tile)
    vals, idx = jax.lax.top_k(tiles, k_per_tile)  # [T, k]
    # Recover global coordinates.
    trow = jnp.arange(ty * tx) // tx
    tcol = jnp.arange(ty * tx) % tx
    yy = trow[:, None] * tile + idx // tile
    xx = tcol[:, None] * tile + idx % tile
    flat_vals = vals.reshape(-1)
    flat_y = yy.reshape(-1)
    flat_x = xx.reshape(-1)
    n_out = min(n_out, flat_vals.shape[0])
    top_vals, top_i = jax.lax.top_k(flat_vals, n_out)
    sel_y = flat_y[top_i].astype(jnp.float32)
    sel_x = flat_x[top_i].astype(jnp.float32)
    valid = top_vals > 0.0
    score_clean = jnp.where(top_vals >= SCORE_BONUS, top_vals - SCORE_BONUS, top_vals)
    xy = jnp.stack([sel_x, sel_y], axis=-1)
    return LevelKeypoints(xy=xy, score=jnp.where(valid, score_clean, 0.0), valid=valid)


def level_feature_counts(spec: PyramidSpec, n_features: int) -> tuple:
    """Per-level desired feature counts, geometric in 1/scale_factor like the
    reference (ORBextractor ctor: mnFeaturesPerLevel)."""
    inv = 1.0 / spec.scale_factor
    counts = []
    acc = 0
    ndesired = n_features * (1 - inv) / (1 - inv ** spec.n_levels)
    for lvl in range(spec.n_levels - 1):
        c = int(round(ndesired * inv ** lvl))
        counts.append(c)
        acc += c
    counts.append(max(n_features - acc, 0))
    return tuple(counts)


@partial(
    jax.jit,
    static_argnames=(
        "spec", "n_features", "th_high", "th_low", "border", "tile", "k_per_tile",
    ),
)
def detect_levels(
    levels,
    spec: PyramidSpec,
    n_features: int = 1024,
    th_high: float = 20.0,
    th_low: float = 7.0,
    border: int = 19,
    tile: int = 32,
    k_per_tile: int = 8,
):
    """FAST detection over a TRUE-SIZE level tuple (build_pyramid_levels):
    the FAST stencil + NMS run fused in VMEM (Pallas kernel on TPU,
    ops/fast_pallas.py) at each level's real resolution instead of paying
    full-resolution cost 8 times.  Keypoints
    stay grouped by level with STATIC per-level counts
    (level_feature_counts), which downstream per-level gathers rely on.
    """
    from .fast_pallas import fast_nms_scores

    counts = level_feature_counts(spec, n_features)
    out_xy_l, out_xy0, out_score, out_oct, out_valid = [], [], [], [], []
    for lvl in range(spec.n_levels):
        h_l, w_l = spec.level_sizes[lvl]
        # select_tiled_topk silently clamps n_out to its padded-tile
        # capacity; a clamped level would misalign describe_levels' static
        # per-level slicing, so fail loudly instead (shapes are static)
        cap = (-(-h_l // tile)) * (-(-w_l // tile)) * k_per_tile
        assert counts[lvl] <= cap, (
            f"level {lvl}: budget {counts[lvl]} exceeds tile capacity {cap} "
            f"({h_l}x{w_l}, tile={tile}, k_per_tile={k_per_tile})"
        )
        score = fast_nms_scores(levels[lvl], th_low, th_high)
        mask = jnp.zeros((h_l, w_l), dtype=bool)
        mask = mask.at[border : h_l - border, border : w_l - border].set(True)
        score = jnp.where(mask, score, 0.0)
        kps = select_tiled_topk(score, counts[lvl], tile=tile, k_per_tile=k_per_tile)
        s = spec.scale_factor ** lvl
        out_xy_l.append(kps.xy)
        out_xy0.append(kps.xy * s)
        out_score.append(kps.score)
        out_oct.append(jnp.full((kps.xy.shape[0],), lvl, dtype=jnp.int32))
        out_valid.append(kps.valid)
    return {
        "xy_level": jnp.concatenate(out_xy_l),
        "xy": jnp.concatenate(out_xy0),
        "score": jnp.concatenate(out_score),
        "octave": jnp.concatenate(out_oct),
        "valid": jnp.concatenate(out_valid),
    }
