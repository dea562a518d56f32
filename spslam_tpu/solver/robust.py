"""Robust-kernel utilities shared by all optimizers.

Equivalent of g2o's RobustKernelHuber + the reference's chi2 gating
constants (Optimizer.cc — SURVEY.md §2 #11).
"""

from __future__ import annotations

import jax.numpy as jnp

# Chi-square 95% quantiles used by the reference for outlier gates.
CHI2_2D = 5.991   # monocular (2-dof) observations
CHI2_3D = 7.815   # stereo/RGB-D (3-dof) observations


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2 = e'We.

    rho'(s) with s = chi2: weight = 1 if s <= delta^2 else delta/sqrt(s).
    """
    s = jnp.maximum(chi2, 1e-12)
    return jnp.where(s <= delta2, 1.0, jnp.sqrt(delta2 / s))


def octave_inv_sigma2(octave: jnp.ndarray, scale_factor: float = 1.2) -> jnp.ndarray:
    """Per-observation information: 1 / scale^(2*octave) — the reference's
    mvInvLevelSigma2."""
    return scale_factor ** (-2.0 * octave.astype(jnp.float32))


def solve6(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD 6x6 system H x = b by a fully UNROLLED Cholesky.

    jnp.linalg.solve on a single 6x6 lowers to XLA's general LU path, which
    is scalar-loop latency on TPU and sits inside every LM iteration of the
    per-frame pose optimization; the unrolled factorization is ~60 fused
    elementwise ops instead.  Supports leading batch dims.
    """
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * 6
    for i in range(6):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)
