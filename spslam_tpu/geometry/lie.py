"""SO(3)/SE(3)/Sim(3) Lie-group operations on batched JAX arrays.

TPU-native replacement for the reference's Eigen/g2o type zoo
(reference family: src/Converter.cc, Thirdparty/g2o se3quat.h / sim3.h —
see SURVEY.md §2 #18, #21).  Everything is pure, jittable, batched via
vmap-compatible broadcasting, float32 by default.

Conventions
-----------
* Rotations are unit quaternions ``q = [w, x, y, z]`` (Hamilton).
* An SE(3) transform is a ``(q, t)`` pair stored as a 7-vector
  ``[qw qx qy qz tx ty tz]``; it maps points ``x_out = R(q) @ x + t``.
  Pose of the camera is stored as ``T_cw`` (world -> camera), matching the
  reference's ``Tcw`` convention.
* A Sim(3) is an 8-vector ``[qw qx qy qz tx ty tz s]`` mapping
  ``x_out = s * R @ x + t``.
* Tangent vectors: se3 = [rho(3), phi(3)] with translation-first ordering;
  sim3 = [rho(3), phi(3), sigma].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------


def quat_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b; broadcasts over leading dims."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.  Broadcasts leading dims."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2*qv x (qv x v + w v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> quaternion [w,x,y,z], batched, branch-free.

    Uses the 4-candidate construction (one per largest diagonal combination)
    and selects the numerically best with where-masks (jit-safe).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate 4*q_i^2 values.
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(cands, axis=-1)

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    sw = safe_sqrt(qw2) * 2.0  # = 4*qw
    qa = jnp.stack([sw / 4.0, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    sx = safe_sqrt(qx2) * 2.0
    qb = jnp.stack([(m21 - m12) / sx, sx / 4.0, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    sy = safe_sqrt(qy2) * 2.0
    qc = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy / 4.0, (m12 + m21) / sy], axis=-1)
    sz = safe_sqrt(qz2) * 2.0
    qd = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz / 4.0], axis=-1)

    all_q = jnp.stack([qa, qb, qc, qd], axis=-2)  # [..., 4, 4]
    q = jnp.take_along_axis(all_q, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# so(3) exp/log
# ---------------------------------------------------------------------------


def so3_exp_quat(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector phi (3,) -> quaternion, with small-angle Taylor guard."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    half = 0.5 * theta
    small = theta2 < 1e-12
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> axis-angle vector (3,)."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(n, w)
    small = n < 1e-9
    k = jnp.where(small, 2.0 / jnp.maximum(w, 1e-12), theta / jnp.maximum(n, 1e-12))
    return k * v


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Vector(s) -> skew-symmetric matrix [v]_x, batched."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# SE(3) as 7-vectors [qw qx qy qz tx ty tz]
# ---------------------------------------------------------------------------



def se3_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)


def se3_q(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., 0:4]


def se3_t(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., 4:7]


def se3_make(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def se3_apply(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return quat_rotate(se3_q(T), x) + se3_t(T)


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(A*B)(x) = A(B(x))."""
    q = quat_mul(se3_q(A), se3_q(B))
    t = quat_rotate(se3_q(A), se3_t(B)) + se3_t(A)
    return se3_make(q, t)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(se3_q(T))
    ti = -quat_rotate(qi, se3_t(T))
    return se3_make(qi, ti)


def se3_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """7-vector -> 4x4 homogeneous matrix (batched)."""
    R = quat_to_mat(se3_q(T))
    t = se3_t(T)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0, 0, 1.0], dtype=T.dtype), T.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M: jnp.ndarray) -> jnp.ndarray:
    return se3_make(mat_to_quat(M[..., :3, :3]), M[..., :3, 3])


def _V_matrix(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): exp([phi]x) translation coupling, batched."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    small = theta2 < 1e-12
    A = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-24))
    B = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, 1e-24)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + A * Phi + B * Phi2


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [rho, phi] (6,) -> SE(3) 7-vector, batched."""
    rho, phi = xi[..., 0:3], xi[..., 3:6]
    q = so3_exp_quat(phi)
    t = (_V_matrix(phi) @ rho[..., None])[..., 0]
    return se3_make(q, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    phi = so3_log(se3_q(T))
    V = _V_matrix(phi)
    rho = jnp.linalg.solve(V, se3_t(T)[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: exp(xi) * T (the g2o SE3 update)."""
    return se3_compose(se3_exp(xi), T)


# ---------------------------------------------------------------------------
# Sim(3) as 8-vectors [qw qx qy qz tx ty tz s]
# ---------------------------------------------------------------------------


def sim3_identity() -> jnp.ndarray:
    return jnp.array([1.0, 0, 0, 0, 0, 0, 0, 1.0], dtype=jnp.float32)


def sim3_make(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    s = jnp.asarray(s, dtype=q.dtype)
    if s.ndim < q.ndim:
        s = jnp.broadcast_to(s[..., None], q.shape[:-1] + (1,))
    elif s.shape[-1] != 1:
        s = s[..., None]
    return jnp.concatenate([quat_normalize(q), t, s], axis=-1)


def sim3_q(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 0:4]


def sim3_t(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 4:7]


def sim3_s(S: jnp.ndarray) -> jnp.ndarray:
    return S[..., 7]


def sim3_apply(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return sim3_s(S)[..., None] * quat_rotate(sim3_q(S), x) + sim3_t(S)


def sim3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    q = quat_mul(sim3_q(A), sim3_q(B))
    s = sim3_s(A) * sim3_s(B)
    t = sim3_s(A)[..., None] * quat_rotate(sim3_q(A), sim3_t(B)) + sim3_t(A)
    return sim3_make(q, t, s)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(sim3_q(S))
    si = 1.0 / jnp.maximum(sim3_s(S), 1e-12)
    ti = -si[..., None] * quat_rotate(qi, sim3_t(S))
    return sim3_make(qi, ti, si)


def sim3_from_se3(T: jnp.ndarray) -> jnp.ndarray:
    ones = jnp.ones(T.shape[:-1] + (1,), dtype=T.dtype)
    return jnp.concatenate([T, ones], axis=-1)


def se3_from_sim3(S: jnp.ndarray) -> jnp.ndarray:
    """Project Sim(3) to SE(3): divide translation by scale (the reference's
    loop-correction convention: [R t/s; 0 1])."""
    t = sim3_t(S) / jnp.maximum(sim3_s(S)[..., None], 1e-12)
    return se3_make(sim3_q(S), t)


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [rho, phi, sigma] (7,) -> Sim(3).

    Uses the closed-form sim3 V-matrix (Strasdat's thesis); small-angle /
    small-scale guarded.
    """
    rho, phi, sigma = xi[..., 0:3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    q = so3_exp_quat(phi)

    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    Phi = hat(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), Phi.shape)

    eps = 1e-6
    sig = sigma
    sig_small = jnp.abs(sig) < eps
    th_small = theta2 < 1e-12

    safe_sig = jnp.where(sig_small, 1.0, sig)
    safe_th = jnp.where(th_small, 1.0, theta)
    safe_th2 = jnp.where(th_small, 1.0, theta2)

    # Coefficients for W = A*I + B*Phi + C*Phi2 (Strasdat sim3 exp)
    C = jnp.where(sig_small, 1.0, (s - 1.0) / safe_sig)

    a = s * jnp.sin(safe_th)
    b = s * jnp.cos(safe_th)
    den = safe_sig * safe_sig + safe_th2

    A_gen = (a * safe_sig + (1.0 - b) * safe_th) / (safe_th * den)
    B_gen = (C - ((b - 1.0) * safe_sig + a * safe_th) / den) / safe_th2

    A_thsmall = jnp.where(
        sig_small, 0.5, ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig)
    )
    B_thsmall = jnp.where(
        sig_small,
        1.0 / 6.0,
        (s * (0.5 * safe_sig * safe_sig - safe_sig + 1.0) - 1.0) / (safe_sig ** 3),
    )
    A_sigsmall = (1.0 - jnp.cos(safe_th)) / safe_th2
    B_sigsmall = (safe_th - jnp.sin(safe_th)) / (safe_th2 * safe_th)

    A = jnp.where(th_small, A_thsmall, jnp.where(sig_small, A_sigsmall, A_gen))
    B = jnp.where(th_small, B_thsmall, jnp.where(sig_small, B_sigsmall, B_gen))

    W = C[..., None, None] * eye + A[..., None, None] * Phi + B[..., None, None] * Phi2
    t = (W @ rho[..., None])[..., 0]
    return sim3_make(q, t, s)


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) -> tangent [rho, phi, sigma] via solving W rho = t."""
    phi = so3_log(sim3_q(S))
    sigma = jnp.log(jnp.maximum(sim3_s(S), 1e-12))
    xi_rot = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # Recover W from sim3_exp internals by calling with unit rho basis:
    e = jnp.eye(3, dtype=S.dtype)
    cols = []
    for i in range(3):
        rho_i = jnp.broadcast_to(e[i], phi.shape)
        xi_i = jnp.concatenate([rho_i, phi, sigma[..., None]], axis=-1)
        cols.append(sim3_t(sim3_exp(xi_i)))
    W = jnp.stack(cols, axis=-1)
    rho = jnp.linalg.solve(W, sim3_t(S)[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
