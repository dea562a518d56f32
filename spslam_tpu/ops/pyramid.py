"""Image pyramid construction (scale factor 1.2, 8 levels by default).

TPU-native replacement for the reference's ORBextractor::ComputePyramid
(SURVEY.md §2 #1).  Instead of variable per-level image sizes (dynamic
shapes hostile to XLA), every level is resampled *from the base image* with
bilinear interpolation at a fixed per-level scale and stored in a
fixed-capacity padded buffer [L, H, W] with per-level valid extents carried
statically.  This keeps all downstream kernels static-shape.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PyramidSpec(NamedTuple):
    """Static pyramid description (hashable; safe as a jit static arg)."""

    n_levels: int
    scale_factor: float
    height: int
    width: int

    @property
    def scales(self) -> Tuple[float, ...]:
        return tuple(self.scale_factor ** i for i in range(self.n_levels))

    @property
    def level_sizes(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(
            (
                int(round(self.height / s)),
                int(round(self.width / s)),
            )
            for s in self.scales
        )


def _resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize H x W -> out_h x out_w (align_corners=False, matching
    cv2.resize INTER_LINEAR pixel-center convention)."""
    h, w = img.shape
    sy = h / out_h
    sx = w / out_w
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]
    y0i, y1i, x0i, x1i = y0.astype(jnp.int32), y1.astype(jnp.int32), x0.astype(jnp.int32), x1.astype(jnp.int32)
    a = img[y0i][:, x0i]
    b = img[y0i][:, x1i]
    c = img[y1i][:, x0i]
    d = img[y1i][:, x1i]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian blur (the reference blurs each level with
    GaussianBlur(7,7,2,2) before computing BRIEF)."""
    r = 3
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    v = sum(pad[i : i + img.shape[0], :] * k[i] for i in range(2 * r + 1))
    pad = jnp.pad(v, ((0, 0), (r, r)), mode="edge")
    out = sum(pad[:, i : i + img.shape[1]] * k[i] for i in range(2 * r + 1))
    return out


@partial(jax.jit, static_argnames=("spec", "blur"))
def build_pyramid_levels(img: jnp.ndarray, spec: PyramidSpec, blur: bool = True):
    """True-size pyramid: per-level arrays at their REAL [h_l, w_l] shapes
    (a tuple pytree of statically-shaped arrays), no [L, H, W] padding.

    A padded [L, H, W] layout would waste ~8x stencil work on the upper
    levels (the round-1 design, removed); every downstream consumer works
    per level (FAST, blur, patch gather) on the real shapes.

    Returns (levels, levels_blur) — levels_blur is () when blur=False.
    """
    img = img.astype(jnp.float32)
    levels = []
    blurs = []
    for (h_l, w_l) in spec.level_sizes:
        lvl = _resize_bilinear(img, h_l, w_l) if (h_l, w_l) != img.shape else img
        levels.append(lvl)
        if blur:
            blurs.append(gaussian_blur7(lvl))
    return tuple(levels), tuple(blurs)


def default_spec(height: int, width: int, n_levels: int = 8, scale_factor: float = 1.2) -> PyramidSpec:
    return PyramidSpec(n_levels=n_levels, scale_factor=scale_factor, height=height, width=width)
