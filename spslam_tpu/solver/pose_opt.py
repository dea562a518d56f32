"""Motion-only pose optimization (frame-to-map PnP refinement).

TPU-native replacement for the reference's Optimizer::PoseOptimization
(Optimizer.cc — SURVEY.md §3.1 hot loop 3): Levenberg-Marquardt on a single
SE(3) camera vertex with monocular (2-dof) + depth (the RGB-D virtual-right
coordinate folded in as a 3rd residual row) reprojection edges, Huber
kernel, and the reference's 4-round chi2 outlier gating schedule
(4 x 10 iterations, re-classifying inliers between rounds).

Everything is fixed-shape: N observations with validity masks; rounds and
iterations are static; the per-iteration linear solve is a 6x6 Cholesky.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Intrinsics
from ..geometry.lie import quat_rotate, se3_q, se3_retract, se3_t
from .robust import CHI2_2D, CHI2_3D, huber_weight, solve6


class PoseOptResult(NamedTuple):
    T_cw: jnp.ndarray      # [7] optimized pose
    inliers: jnp.ndarray   # [N] bool final inlier classification
    n_inliers: jnp.ndarray # [] int32
    chi2: jnp.ndarray      # [] float32 final robust cost


def _residuals_and_jac(T_cw, pts_w, uv_obs, ur_obs, intr: Intrinsics):
    """Per-observation residual [N,3] = (u, v, uR) errors and Jacobian
    [N,3,6] wrt a left-multiplicative se3 perturbation of T_cw.

    Rows 0-1 are the pinhole reprojection error; row 2 is the virtual right
    u error (uR = u - bf/z), active only where ur_obs >= 0 — this is the
    reference's stereo SE3 edge for RGB-D.
    """
    xc = quat_rotate(se3_q(T_cw), pts_w) + se3_t(T_cw)  # [N,3]
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z = jnp.maximum(z, 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    ur = u - intr.bf * iz

    e_u = uv_obs[..., 0] - u
    e_v = uv_obs[..., 1] - v
    e_r = jnp.where(ur_obs >= 0, ur_obs - ur, 0.0)
    e = jnp.stack([e_u, e_v, e_r], axis=-1)  # [N,3]

    # d(proj)/d(xc)
    du = jnp.stack([intr.fx * iz, jnp.zeros_like(z), -intr.fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(z), intr.fy * iz, -intr.fy * y * iz2], axis=-1)
    dr = du + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), intr.bf * iz2], axis=-1
    )
    dproj = jnp.stack([du, dv, dr], axis=-2)  # [N,3,3]

    # d(xc)/d(xi): [I | -[xc]x] for xi = [rho, phi]
    zeros = jnp.zeros_like(z)
    ones = jnp.ones_like(z)
    dxc = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros, zeros, z, -y], axis=-1),
            jnp.stack([zeros, ones, zeros, -z, zeros, x], axis=-1),
            jnp.stack([zeros, zeros, ones, y, -x, zeros], axis=-1),
        ],
        axis=-2,
    )  # [N,3,6]

    J = -(dproj @ dxc)  # [N,3,6]: de/dxi = -dproj/dxc dxc/dxi
    depth_active = (ur_obs >= 0).astype(e.dtype)
    row_mask = jnp.stack([jnp.ones_like(depth_active), jnp.ones_like(depth_active), depth_active], -1)
    return e * row_mask, J * row_mask[..., None], z


def _plane_residuals_and_jac(T_cw, pl_w, pl_obs_c, pl_w_valid):
    """Plane-to-plane residuals [L,4] and Jacobians [L,4,6] wrt a left-
    multiplicative se3 perturbation (SP-SLAM's tracking plane edges,
    src/Tracking.cc plane association + Optimizer.cc plane-pose edges —
    SURVEY.md §3.1 [SP]).

    pl_w: [L,4] map planes (n,d) in WORLD, n.X + d = 0, |n| = 1.
    pl_obs_c: [L,4] matched observed frame planes in CAMERA frame.
    Prediction: n_c = R n_w, d_c = d_w - n_c . t.  For T' = exp(xi) T:
      dn_c/dphi = -[n_c]x (dn/drho = 0);  dd_c/drho = -n_c (dd/dphi = 0 —
    the two rotational terms cancel exactly).
    Observed normals are sign-aligned to the prediction before differencing.
    """
    q = se3_q(T_cw)
    t = se3_t(T_cw)
    n_c = quat_rotate(q[None, :], pl_w[:, :3])          # [L,3]
    d_c = pl_w[:, 3] - jnp.sum(n_c * t[None, :], axis=-1)
    # sign-align the observation (a plane's (n,d) and (-n,-d) are identical)
    flip = jnp.sum(n_c * pl_obs_c[:, :3], axis=-1) < 0
    obs = jnp.where(flip[:, None], -pl_obs_c, pl_obs_c)
    e_n = obs[:, :3] - n_c                              # [L,3]
    e_d = obs[:, 3] - d_c                               # [L]
    e = jnp.concatenate([e_n, e_d[:, None]], axis=-1)   # [L,4]

    L = pl_w.shape[0]
    zeros3 = jnp.zeros((L, 3, 3), e.dtype)
    nx, ny, nz = n_c[:, 0], n_c[:, 1], n_c[:, 2]
    z0 = jnp.zeros_like(nx)
    skew = jnp.stack([
        jnp.stack([z0, -nz, ny], -1),
        jnp.stack([nz, z0, -nx], -1),
        jnp.stack([-ny, nx, z0], -1),
    ], axis=-2)                                          # [L,3,3] [n_c]x
    # e = obs - pred  =>  J = -d(pred)/dxi
    J_n = jnp.concatenate([zeros3, skew], axis=-1)       # [L,3,6]
    J_d = jnp.concatenate([n_c, jnp.zeros((L, 3), e.dtype)], axis=-1)[:, None, :]
    J = jnp.concatenate([J_n, J_d], axis=-2)             # [L,4,6]
    m = pl_w_valid.astype(e.dtype)
    return e * m[:, None], J * m[:, None, None]


# chi2 gate for the 4-dof plane residual at the working information weights
CHI2_PLANE = 9.49  # 95% of chi2(4)


@partial(jax.jit, static_argnames=("intr", "n_rounds", "n_iters"))
def pose_optimization_joint(
    T_cw_init: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv_obs: jnp.ndarray,
    ur_obs: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    pl_w: jnp.ndarray,
    pl_obs_c: jnp.ndarray,
    pl_valid: jnp.ndarray,
    pl_info: jnp.ndarray,
    intr: Intrinsics,
    n_rounds: int = 2,
    n_iters: int = 5,
) -> PoseOptResult:
    """Joint point + plane motion-only LM (the SP-SLAM tracking refinement).

    Same structure as pose_optimization with plane-to-plane terms added to
    H/b each iteration; plane outliers are re-classified between rounds by
    their chi2 like point edges.

    pl_w [L,4] world planes, pl_obs_c [L,4] matched camera-frame
    observations, pl_valid [L] bool, pl_info [L] information weight applied
    to all 4 residual rows (normal rows are unitless, d is meters — callers
    scale via PLANE_*_INFO below).
    """
    delta2 = jnp.where(ur_obs >= 0, CHI2_3D, CHI2_2D)

    def plane_chi2(T):
        e_p, _ = _plane_residuals_and_jac(T, pl_w, pl_obs_c, pl_valid)
        return jnp.sum(e_p * e_p, axis=-1) * pl_info

    def lm_round(T, inliers, pl_inliers):
        def cond(carry):
            _, _, it, step2 = carry
            return (it < n_iters) & (step2 > 1e-10)

        def body(carry):
            T, lam, it, _ = carry
            e, J, _ = _residuals_and_jac(T, pts_w, uv_obs, ur_obs, intr)
            chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
            w_rob = huber_weight(chi2, delta2)
            w = inv_sigma2 * w_rob * inliers * valid.astype(e.dtype)
            Jw = J * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", Jw, J)
            b = -jnp.einsum("nri,nr->i", Jw, e)
            e_p, J_p = _plane_residuals_and_jac(T, pl_w, pl_obs_c, pl_valid)
            chi2_p = jnp.sum(e_p * e_p, axis=-1) * pl_info
            w_p = (
                pl_info * huber_weight(chi2_p, CHI2_PLANE)
                * pl_inliers * pl_valid.astype(e.dtype)
            )
            Jpw = J_p * w_p[:, None, None]
            H = H + jnp.einsum("nri,nrj->ij", Jpw, J_p)
            b = b - jnp.einsum("nri,nr->i", Jpw, e_p)
            H = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            dx = solve6(H, b)
            T_new = se3_retract(T, dx)
            cost_cur = (
                jnp.sum(jnp.minimum(chi2, delta2 * 10) * inliers * valid)
                + jnp.sum(jnp.minimum(chi2_p, CHI2_PLANE * 10) * pl_inliers)
            )
            e2, _, _ = _residuals_and_jac(T_new, pts_w, uv_obs, ur_obs, intr)
            e2_p, _ = _plane_residuals_and_jac(T_new, pl_w, pl_obs_c, pl_valid)
            cost_new = (
                jnp.sum(jnp.minimum(jnp.sum(e2 * e2, -1) * inv_sigma2, delta2 * 10)
                        * inliers * valid)
                + jnp.sum(jnp.minimum(jnp.sum(e2_p * e2_p, -1) * pl_info,
                                      CHI2_PLANE * 10) * pl_inliers)
            )
            better = cost_new < cost_cur
            T = jnp.where(better, T_new, T)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            step2 = jnp.where(better, jnp.sum(dx * dx), jnp.float32(1e9))
            return T, lam, it + 1, step2

        T, _, _, _ = jax.lax.while_loop(
            cond, body, (T, jnp.float32(1e-3), jnp.int32(0), jnp.float32(1e9))
        )
        return T

    T = T_cw_init
    inliers = valid.astype(jnp.float32)
    pl_inl = pl_valid.astype(jnp.float32)
    for _ in range(n_rounds):
        T = lm_round(T, inliers, pl_inl)
        e, _, _ = _residuals_and_jac(T, pts_w, uv_obs, ur_obs, intr)
        chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
        inliers = (chi2 <= delta2).astype(jnp.float32) * valid.astype(jnp.float32)
        pl_inl = (
            (plane_chi2(T) <= CHI2_PLANE).astype(jnp.float32)
            * pl_valid.astype(jnp.float32)
        )

    final_inl = inliers > 0
    e, _, _ = _residuals_and_jac(T, pts_w, uv_obs, ur_obs, intr)
    chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
    return PoseOptResult(
        T_cw=T,
        inliers=final_inl,
        n_inliers=jnp.sum(final_inl.astype(jnp.int32)),
        chi2=jnp.sum(jnp.where(final_inl, chi2, 0.0)),
    )


@partial(jax.jit, static_argnames=("intr", "n_rounds", "n_iters"))
def pose_optimization(
    T_cw_init: jnp.ndarray,
    pts_w: jnp.ndarray,
    uv_obs: jnp.ndarray,
    ur_obs: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    n_rounds: int = 4,
    n_iters: int = 10,
) -> PoseOptResult:
    """Optimize one camera pose against fixed 3D points.

    Args:
      T_cw_init: [7] initial world->camera pose.
      pts_w: [N, 3] world points (fixed).
      uv_obs: [N, 2] observed undistorted pixel coords.
      ur_obs: [N] observed virtual-right u (< 0 where monocular-only).
      inv_sigma2: [N] per-observation information (by octave).
      valid: [N] bool observation exists.
    """
    delta2_mono = CHI2_2D
    delta2_stereo = CHI2_3D

    def obs_chi2(T, inl):
        e, _, _ = _residuals_and_jac(T, pts_w, uv_obs, ur_obs, intr)
        c = jnp.sum(e * e, axis=-1) * inv_sigma2
        return c

    is_stereo = ur_obs >= 0
    delta2 = jnp.where(is_stereo, delta2_stereo, delta2_mono)

    def robust_cost(chi2, inliers):
        rho = jnp.where(
            chi2 <= delta2,
            chi2,
            2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
        )
        return jnp.sum(rho * inliers * valid)

    def lm_round(T, inliers):
        # while_loop with a convergence test: from a motion-model prediction
        # LM typically converges in 2-4 iterations, so the early exit saves
        # most of the fixed n_iters schedule (this loop is latency-bound on
        # the sequential [N]-sized iterations, not flop-bound)
        def cond(carry):
            _, _, it, step2 = carry
            return (it < n_iters) & (step2 > 1e-10)

        def body(carry):
            T, lam, it, _ = carry
            e, J, _ = _residuals_and_jac(T, pts_w, uv_obs, ur_obs, intr)
            chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
            w_rob = huber_weight(chi2, delta2)
            w = inv_sigma2 * w_rob * inliers.astype(e.dtype) * valid.astype(e.dtype)
            Jw = J * w[:, None, None]
            H = jnp.einsum("nri,nrj->ij", Jw, J)
            b = -jnp.einsum("nri,nr->i", Jw, e)  # GN: dx = -(J'WJ)^{-1} J'We
            H = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
            dx = solve6(H, b)   # unrolled 6x6 Cholesky: one fused kernel
                                # instead of XLA's general LU latency
            T_new = se3_retract(T, dx)
            # Accept if robust cost decreased (current cost reuses e above —
            # one extra residual evaluation per iteration, not two).
            cost_cur = robust_cost(chi2, inliers)
            e_new, _, _ = _residuals_and_jac(T_new, pts_w, uv_obs, ur_obs, intr)
            cost_new = robust_cost(jnp.sum(e_new * e_new, axis=-1) * inv_sigma2, inliers)
            better = cost_new < cost_cur
            T = jax.tree.map(lambda a, b_: jnp.where(better, a, b_), T_new, T)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            step2 = jnp.where(better, jnp.sum(dx * dx), jnp.float32(1e9))
            return T, lam, it + 1, step2

        T, _, _, _ = jax.lax.while_loop(
            cond, body, (T, jnp.float32(1e-3), jnp.int32(0), jnp.float32(1e9))
        )
        return T

    T = T_cw_init
    inliers = valid.astype(jnp.float32)
    for _ in range(n_rounds):
        T = lm_round(T, inliers)
        chi2 = obs_chi2(T, inliers)
        thresh = jnp.where(ur_obs >= 0, delta2_stereo, delta2_mono)
        inliers = (chi2 <= thresh).astype(jnp.float32) * valid.astype(jnp.float32)

    final_inl = inliers > 0
    chi2 = obs_chi2(T, inliers)
    return PoseOptResult(
        T_cw=T,
        inliers=final_inl,
        n_inliers=jnp.sum(final_inl.astype(jnp.int32)),
        chi2=jnp.sum(jnp.where(final_inl, chi2, 0.0)),
    )
