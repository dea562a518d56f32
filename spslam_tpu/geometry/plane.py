"""Plane landmark geometry: Hesse form (n, d), minimal 3-DoF chart, transforms.

TPU-native equivalent of the reference's MapPlane parameterization and the
g2o VertexPlane-style azimuth/elevation/distance minimal chart used by
SP-SLAM's plane edges (SURVEY.md §2 #7, #11).

A plane is a 4-vector ``pi = [nx, ny, nz, d]`` with ``|n| = 1`` and the
incidence relation ``n . x + d = 0``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import quat_rotate, se3_q, se3_t


def normalize_plane(pi: jnp.ndarray) -> jnp.ndarray:
    """Scale so the normal is unit length; canonicalize d >= 0 is NOT applied
    (sign of n is meaningful for association via viewing direction)."""
    n = jnp.linalg.norm(pi[..., 0:3], axis=-1, keepdims=True)
    return pi / jnp.maximum(n, 1e-12)


def plane_point_distance(pi: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Signed point-to-plane distance, broadcast over leading dims."""
    return jnp.sum(pi[..., 0:3] * x, axis=-1) + pi[..., 3]


def transform_plane(T_ab: jnp.ndarray, pi_b: jnp.ndarray) -> jnp.ndarray:
    """Transform plane coefficients from frame b to frame a given SE(3) T_ab
    (which maps points x_a = R x_b + t).

    pi_a = [R n_b, d_b - t . (R n_b)]  (from pi_a^T = pi_b^T T_ab^{-1}).
    """
    n_a = quat_rotate(se3_q(T_ab), pi_b[..., 0:3])
    d_a = pi_b[..., 3] - jnp.sum(se3_t(T_ab) * n_a, axis=-1)
    return jnp.concatenate([n_a, d_a[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Minimal 3-DoF chart: tau = [azimuth, elevation, distance]
# ---------------------------------------------------------------------------


def plane_to_azel(pi: jnp.ndarray) -> jnp.ndarray:
    """Hesse form -> [azimuth, elevation, d]."""
    pi = normalize_plane(pi)
    n = pi[..., 0:3]
    az = jnp.arctan2(n[..., 1], n[..., 0])
    el = jnp.arctan2(n[..., 2], jnp.linalg.norm(n[..., 0:2], axis=-1))
    return jnp.stack([az, el, pi[..., 3]], axis=-1)


def azel_to_plane(tau: jnp.ndarray) -> jnp.ndarray:
    az, el, d = tau[..., 0], tau[..., 1], tau[..., 2]
    ce = jnp.cos(el)
    n = jnp.stack([ce * jnp.cos(az), ce * jnp.sin(az), jnp.sin(el)], axis=-1)
    return jnp.concatenate([n, d[..., None]], axis=-1)


def plane_retract(pi: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Retract a 3-vector update in the tangent of the (az, el, d) chart.

    Jit-safe, used by the GN/LM solver for plane vertices.
    """
    return azel_to_plane(plane_to_azel(pi) + delta)


def plane_error(pi_obs: jnp.ndarray, pi_pred: jnp.ndarray) -> jnp.ndarray:
    """3-vector plane-to-plane error in the minimal chart, with azimuth
    wrap-around handled (angle difference wrapped to [-pi, pi])."""
    t_obs = plane_to_azel(pi_obs)
    t_pred = plane_to_azel(pi_pred)
    diff = t_obs - t_pred
    wrap = jnp.mod(diff[..., 0] + jnp.pi, 2 * jnp.pi) - jnp.pi
    return jnp.stack([wrap, diff[..., 1], diff[..., 2]], axis=-1)


def angle_between_normals(n1: jnp.ndarray, n2: jnp.ndarray) -> jnp.ndarray:
    """Unsigned angle between unit normals (radians), broadcast."""
    c = jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0)
    return jnp.arccos(c)
