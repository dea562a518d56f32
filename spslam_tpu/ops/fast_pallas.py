"""Pallas TPU kernel: fused FAST-9/16 corner score + 3x3 NMS in one pass.

TPU-native replacement for the reference's cv::FAST inner loop
(src/ORBextractor.cc — SURVEY.md §2 #1, hot loop 1).  The jnp formulation
(ops/fast.py fast_score_map + nms3x3) materializes a [16, H, W] ring stack
plus ~50 full-image temporaries in HBM; this kernel keeps the whole image
in VMEM and runs the 16-offset Bresenham test, the log-doubling circular
arc-min, the two-threshold bonus and the 3x3 NMS entirely on-chip, so the
HBM traffic is exactly one image read + one score-map write.

Ring shifts become sublane slices (row offset) + lane rotations
(pltpu.roll, column offset); the wrap-around pollution of roll lands only
in the 4-pixel pad frame, never in the valid score region.

Semantics match ops/fast.py exactly (same score definition, same NMS
tie-breaking) inside the 19-px detection border —
tests/tpu/test_pallas_parity.py asserts bit-exact parity on chip
(`pytest -m tpu tests/`); the CPU lane exercises the jnp fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC_LEN, CIRCLE_OFFSETS, SCORE_BONUS

del ARC_LEN  # (9 is hard-wired in the log-doubling below)

_ROWS = 32  # output rows per grid step


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fast_nms_kernel(img_ref, out_ref, *, th_low: float, th_high: float, rows: int):
    """img_ref: [G*rows + 8, Wp] padded image (pixel (r, c) at [r+4, c+4]).
    out_ref block: [rows, Wp] NMS'd score for image rows [i*rows, i*rows+rows).
    """
    i = pl.program_id(0)

    # One ALIGNED dynamic load of the block's full row window (Mosaic needs
    # dynamic sublane starts to be provably 8-aligned; rows is a multiple
    # of 8, the per-offset +-3 shifts below become static sub-slices).
    # B[j, :] = padded row i*rows + j = image row i*rows + j - 4.
    B = img_ref[pl.ds(i * rows, rows + 8), :]

    # Score region: image rows i*rows-1 .. i*rows+rows (rows+2 of them, one
    # NMS halo row each side).  Score S[j, c+4] is for image (i*rows-1+j, c).
    def ring_rows(dy):
        return B[3 + dy : 3 + dy + rows + 2, :]

    def col_roll(v, dx):
        # out[c] = v[c + dx]; pltpu.roll wants a non-negative shift
        return pltpu.roll(v, (-dx) % v.shape[1], axis=1) if dx else v

    center = ring_rows(0)
    diffs = []
    for (dx, dy) in CIRCLE_OFFSETS:
        diffs.append(col_roll(ring_rows(dy), dx) - center)

    def arc_min_max(ds):
        # circular sliding-window min of length 9 over the 16 ring positions
        # (log-doubling), then max over window starts — same as ops/fast.py.
        w2 = [jnp.minimum(ds[k], ds[(k + 1) % 16]) for k in range(16)]
        w4 = [jnp.minimum(w2[k], w2[(k + 2) % 16]) for k in range(16)]
        w8 = [jnp.minimum(w4[k], w4[(k + 4) % 16]) for k in range(16)]
        m = jnp.minimum(w8[0], ds[8])
        for k in range(1, 16):
            m = jnp.maximum(m, jnp.minimum(w8[k], ds[(k + 8) % 16]))
        return m

    score = jnp.maximum(arc_min_max(diffs), arc_min_max([-d for d in diffs]))
    s = jnp.where(score > th_low, score, 0.0) + jnp.where(
        score > th_high, SCORE_BONUS, 0.0
    )

    # 3x3 NMS on the rows+2 score buffer; same tie-breaking as ops/fast.nms3x3
    # (strict > against neighbors earlier in raster order).
    best = s[1 : rows + 1, :]
    keep = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = col_roll(s[1 + dy : 1 + dy + rows, :], dx)
            strict = (dy, dx) < (0, 0) or (dy, dx) == (0, -1)
            c = best > nb if strict else best >= nb
            keep = c if keep is None else (keep & c)
    out_ref[:, :] = jnp.where(keep, best, 0.0)


@functools.partial(jax.jit, static_argnames=("th_low", "th_high"))
def fast_nms_scores_pallas(
    img: jnp.ndarray, th_low: float, th_high: float
) -> jnp.ndarray:
    """[H, W] image -> [H, W] FAST score map with NMS applied (0 = no corner).

    Equivalent to nms3x3(fast_score_map(img, th_low, th_high)) but fused in
    VMEM.  Wrap-around artifacts of the jnp version's jnp.roll at image
    borders differ; both are masked by the >=19 px detection border.
    """
    h, w = img.shape
    g = pl.cdiv(h, _ROWS)
    h_in = g * _ROWS + 8
    wp = _round_up(w + 8, 128)
    pad = jnp.zeros((h_in, wp), jnp.float32)
    pad = jax.lax.dynamic_update_slice(pad, img.astype(jnp.float32), (4, 4))

    out = pl.pallas_call(
        functools.partial(
            _fast_nms_kernel, th_low=th_low, th_high=th_high, rows=_ROWS
        ),
        out_shape=jax.ShapeDtypeStruct((g * _ROWS, wp), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((h_in, wp), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_ROWS, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(pad)
    return out[:h, 4 : 4 + w]


def fast_nms_scores(img: jnp.ndarray, th_low: float, th_high: float) -> jnp.ndarray:
    """Backend dispatch: Pallas kernel on TPU, jnp reference path elsewhere
    (the CPU test mesh has no Mosaic compiler)."""
    if jax.default_backend() == "tpu":
        return fast_nms_scores_pallas(img, th_low=th_low, th_high=th_high)
    from .fast import fast_score_map, nms3x3

    return nms3x3(fast_score_map(img, th_low, th_high))
