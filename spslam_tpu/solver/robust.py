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
