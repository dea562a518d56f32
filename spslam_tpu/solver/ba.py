"""Joint point-plane-pose bundle adjustment with Schur landmark elimination.

TPU-native replacement for the reference's Optimizer::LocalBundleAdjustment
/ GlobalBundleAdjustment (Optimizer.cc — SURVEY.md §2 #11, §3.2 hot loop 5)
including SP-SLAM's plane vertices (minimal azimuth/elevation/distance
chart) and pose-plane observation edges plus parallel/perpendicular
"supposed plane" constraint edges.

Design (tpu-first, see SURVEY.md §7):
* The problem is a fixed-shape SoA pytree: M poses, P points, L planes,
  R point observations, Q plane observations, E plane-plane edges — all
  padded with validity masks, so the whole LM loop jits once per shape.
* Per-iteration linear algebra:
    - point blocks Hpp [P,3,3] are inverted in closed form (batched 3x3),
    - the reduced camera+plane system S (dim 6M + 3L) is assembled DENSE
      with vectorized block scatter-adds and solved by Cholesky.  Planes
      are few (L <= 64) so they ride in the reduced system instead of
      being eliminated.
    - the Schur cross terms iterate over per-point observation PAIRS via a
      padded [P, OMAX] observation table — O(P * OMAX^2) 6x6 matmuls,
      batched on the VPU/MXU.
* Outlier handling mirrors the reference: Huber kernels, then a chi2 gate
  between two LM stages re-classifying observations.
* Fixed poses (boundary keyframes) are handled by zeroing their rows/cols
  in S and pinning the diagonal.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Intrinsics
from ..geometry.lie import quat_rotate, quat_to_mat, se3_q, se3_retract, se3_t
from ..geometry.plane import plane_error, plane_retract, transform_plane
from .robust import CHI2_2D, CHI2_3D, huber_weight


class BAProblem(NamedTuple):
    """Fixed-shape BA problem. Indices refer to the padded arrays; -1 / False
    marks padding."""

    poses: jnp.ndarray        # [M, 7] T_cw
    pose_fixed: jnp.ndarray   # [M] bool (gauge / boundary KFs)
    pose_valid: jnp.ndarray   # [M] bool
    points: jnp.ndarray       # [P, 3] world points
    point_valid: jnp.ndarray  # [P] bool
    # point observations
    obs_cam: jnp.ndarray      # [R] int32 -> M
    obs_pt: jnp.ndarray       # [R] int32 -> P
    obs_uv: jnp.ndarray       # [R, 2]
    obs_ur: jnp.ndarray       # [R] virtual-right u, <0 if mono
    obs_inv_sigma2: jnp.ndarray  # [R]
    obs_valid: jnp.ndarray    # [R] bool
    pt_obs: jnp.ndarray       # [P, OMAX] int32 -> R (-1 pad) observation table
    # plane landmarks
    planes: jnp.ndarray       # [L, 4] world planes (n, d)
    plane_valid: jnp.ndarray  # [L] bool
    pobs_cam: jnp.ndarray     # [Q] int32 -> M
    pobs_plane: jnp.ndarray   # [Q] int32 -> L
    pobs_pi: jnp.ndarray      # [Q, 4] observed plane in camera frame
    pobs_w: jnp.ndarray       # [Q] information weight
    pobs_valid: jnp.ndarray   # [Q] bool
    # plane-plane structural edges ("supposed planes")
    pp_a: jnp.ndarray         # [E] int32 -> L
    pp_b: jnp.ndarray         # [E] int32 -> L
    pp_type: jnp.ndarray      # [E] int32: 0 parallel, 1 perpendicular
    pp_w: jnp.ndarray         # [E]
    pp_valid: jnp.ndarray     # [E] bool


class BAResult(NamedTuple):
    poses: jnp.ndarray
    points: jnp.ndarray
    planes: jnp.ndarray
    obs_inlier: jnp.ndarray   # [R] bool post-gating classification
    pobs_inlier: jnp.ndarray  # [Q] bool
    cost: jnp.ndarray         # final robust cost


# ---------------------------------------------------------------------------
# Residuals and Jacobians
# ---------------------------------------------------------------------------


def point_obs_residuals(poses, points, obs_cam, obs_pt, obs_uv, obs_ur,
                        obs_inv_sigma2, intr: Intrinsics):
    """Reprojection residuals for a flat list of point observations.

    Shared by the single-chip BA below and the distributed BA
    (parallel/dist_ba.py), which calls it on per-shard slices.
    Returns e [R,3], J_c [R,3,6] (pose), J_p [R,3,3] (point), chi2 [R].
    """
    T = poses[obs_cam]               # [R,7]
    X = points[obs_pt]               # [R,3]
    q, t = se3_q(T), se3_t(T)
    xc = quat_rotate(q, X) + t
    x, y, z = xc[..., 0], xc[..., 1], jnp.maximum(xc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    u = intr.fx * x * iz + intr.cx
    v = intr.fy * y * iz + intr.cy
    ur = u - intr.bf * iz

    has_r = obs_ur >= 0
    e = jnp.stack(
        [
            obs_uv[..., 0] - u,
            obs_uv[..., 1] - v,
            jnp.where(has_r, obs_ur - ur, 0.0),
        ],
        axis=-1,
    )

    du = jnp.stack([intr.fx * iz, jnp.zeros_like(z), -intr.fx * x * iz2], axis=-1)
    dv = jnp.stack([jnp.zeros_like(z), intr.fy * iz, -intr.fy * y * iz2], axis=-1)
    dr = du + jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), intr.bf * iz2], axis=-1)
    dproj = jnp.stack([du, dv, dr], axis=-2)  # [R,3,3]

    zeros, ones = jnp.zeros_like(z), jnp.ones_like(z)
    dxc_dxi = jnp.stack(
        [
            jnp.stack([ones, zeros, zeros, zeros, z, -y], axis=-1),
            jnp.stack([zeros, ones, zeros, -z, zeros, x], axis=-1),
            jnp.stack([zeros, zeros, ones, y, -x, zeros], axis=-1),
        ],
        axis=-2,
    )  # [R,3,6]
    J_c = -(dproj @ dxc_dxi)
    R_cw = quat_to_mat(q)            # [R,3,3]; dxc/dXw = R_cw
    J_p = -(dproj @ R_cw)

    row_mask = jnp.stack([ones, ones, has_r.astype(e.dtype)], axis=-1)
    e = e * row_mask
    J_c = J_c * row_mask[..., None]
    J_p = J_p * row_mask[..., None]
    chi2 = jnp.sum(e * e, axis=-1) * obs_inv_sigma2
    return e, J_c, J_p, chi2


def _point_residuals(poses, points, prob: BAProblem, intr: Intrinsics):
    return point_obs_residuals(
        poses, points, prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_ur,
        prob.obs_inv_sigma2, intr,
    )


def _plane_obs_residuals(poses, planes, prob: BAProblem):
    """Pose-plane observation residuals in the minimal (az, el, d) chart.

    e [Q,3], J_c [Q,3,6], J_pl [Q,3,3], chi2 [Q].  Jacobians by forward-mode
    autodiff of the perturbation (Q is small; exactness over hand-derivation).
    """
    T = poses[prob.pobs_cam]
    piw = planes[prob.pobs_plane]

    def resid(xi, dpl, T_i, piw_i, piobs_i):
        T_pert = se3_retract(T_i, xi)
        piw_pert = plane_retract(piw_i, dpl)
        pred = transform_plane(T_pert, piw_pert)
        return plane_error(piobs_i, pred)

    zeros9 = jnp.zeros(9, dtype=poses.dtype)

    def one(T_i, piw_i, piobs_i):
        # single jacfwd over the stacked (xi, dpl) perturbation: one batched
        # JVP pass instead of two (this path is latency-, not flop-bound)
        def resid9(z):
            return resid(z[:6], z[6:9], T_i, piw_i, piobs_i)

        e = resid9(zeros9)
        J = jax.jacfwd(resid9)(zeros9)  # [3, 9]
        return e, J[:, :6], J[:, 6:9]

    e, J_c, J_pl = jax.vmap(one)(T, piw, prob.pobs_pi)
    chi2 = jnp.sum(e * e, axis=-1) * prob.pobs_w
    return e, J_c, J_pl, chi2


def _plane_plane_residuals(planes, prob: BAProblem):
    """Structural edges between planes: parallel (angle between normals) or
    perpendicular (dot of normals) — SP-SLAM's supposed-plane constraints.

    Residual is 1-dimensional per edge. e [E], J_a [E,1,3], J_b [E,1,3].
    """
    def resid(da, db, pa, pb, typ):
        na = plane_retract(pa, da)[0:3]
        nb = plane_retract(pb, db)[0:3]
        dot = jnp.sum(na * nb)
        # parallel: 1 - |dot| -> 0 ; perpendicular: dot -> 0
        return jnp.where(typ == 0, 1.0 - jnp.abs(dot), dot)[None]

    zeros3 = jnp.zeros(3, dtype=planes.dtype)

    def one(pa, pb, typ):
        e = resid(zeros3, zeros3, pa, pb, typ)
        Ja = jax.jacfwd(resid, argnums=0)(zeros3, zeros3, pa, pb, typ)
        Jb = jax.jacfwd(resid, argnums=1)(zeros3, zeros3, pa, pb, typ)
        return e, Ja, Jb

    pa = planes[prob.pp_a]
    pb = planes[prob.pp_b]
    e, J_a, J_b = jax.vmap(one)(pa, pb, prob.pp_type)
    return e, J_a, J_b


# ---------------------------------------------------------------------------
# Assembly + Schur solve
# ---------------------------------------------------------------------------


def _scatter_block_add(S, rows, cols, blocks):
    """S[rows_i + a, cols_i + b] += blocks[i, a, b] for every i.

    rows/cols: [T] int32 top-left offsets (send invalid terms to the dump
    row = S.shape[0]-pad region); blocks: [T, A, B].
    """
    A, B = blocks.shape[1], blocks.shape[2]
    r = rows[:, None] + jnp.arange(A, dtype=rows.dtype)[None, :]
    c = cols[:, None] + jnp.arange(B, dtype=cols.dtype)[None, :]
    return S.at[r[:, :, None], c[:, None, :]].add(blocks)


def _scatter_vec_add(b, rows, vecs):
    A = vecs.shape[1]
    r = rows[:, None] + jnp.arange(A, dtype=rows.dtype)[None, :]
    return b.at[r].add(vecs)


def _inv3x3(A):
    """Batched closed-form 3x3 inverse (adjugate / det) — avoids the LU path
    jnp.linalg.inv takes, which is latency-poison for [P,3,3] batches."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A00 = e * i - f * h
    A01 = c * h - b * i
    A02 = b * f - c * e
    A10 = f * g - d * i
    A11 = a * i - c * g
    A12 = c * d - a * f
    A20 = d * h - e * g
    A21 = b * g - a * h
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    # singular guard scaled to the block magnitude: a block is "singular"
    # when |det| is tiny RELATIVE to its trace^3 (absolute 1e-12 misfires on
    # small-but-valid blocks); singular blocks get a ZERO inverse (no update)
    # rather than a bogus adjugate-scaled one
    scale = jnp.maximum((a + e + i) / 3.0, 1e-12)
    singular = jnp.abs(det) <= 1e-10 * scale ** 3
    inv_det = jnp.where(singular, 0.0, 1.0 / jnp.where(singular, 1.0, det))
    adj = jnp.stack(
        [
            jnp.stack([A00, A01, A02], -1),
            jnp.stack([A10, A11, A12], -1),
            jnp.stack([A20, A21, A22], -1),
        ],
        -2,
    )
    return adj * inv_det[..., None, None]


def _solve_ba_iteration(poses, points, planes, prob: BAProblem, intr, lam,
                        obs_w_extra, pobs_w_extra):
    """One damped GN step. Returns (dx_poses [M,6], dp [P,3], dpl [L,3]).

    MXU-first assembly: the reduced camera system and the Schur pair terms
    are built as one-hot contractions (matmuls) instead of scatter-adds into
    the dense S — colliding scatters serialize on TPU and made each LM
    iteration ~65 ms; the matmul form is <2 ms for the local-BA shapes.
    Only the tiny plane-edge terms (Q<=64, E<=32 blocks) still scatter.
    """
    M = poses.shape[0]
    L = planes.shape[0]
    dim = 6 * M + 3 * L
    DUMP = dim  # extra scratch row/col for masked scatter terms

    e, J_c, J_p, chi2 = _point_residuals(poses, points, prob, intr)
    delta2 = jnp.where(prob.obs_ur >= 0, CHI2_3D, CHI2_2D)
    w = (
        prob.obs_inv_sigma2
        * huber_weight(chi2, delta2)
        * obs_w_extra
        * prob.obs_valid.astype(e.dtype)
    )

    # --- landmark blocks --------------------------------------------------
    # Gathered (not scattered) through the per-point observation table: every
    # valid observation appears in pt_obs (assembly caps obs/point at OMAX),
    # so the sum over the table IS the full Hpp — colliding scatters avoided.
    OMAX = prob.pt_obs.shape[1]
    pair_valid = prob.pt_obs >= 0
    safe_idx = jnp.maximum(prob.pt_obs, 0)                    # [P, OMAX]
    JpW = J_p * w[:, None, None]
    Hpp_terms = jnp.einsum("rai,raj->rij", JpW, J_p)          # [R,3,3]
    bp_terms = -jnp.einsum("rai,ra->ri", JpW, e)              # [R,3]
    P = points.shape[0]
    pv = pair_valid[..., None, None].astype(e.dtype)
    Hpp = jnp.sum(Hpp_terms[safe_idx] * pv, axis=1)           # [P,3,3]
    bp = jnp.sum(bp_terms[safe_idx] * pair_valid[..., None], axis=1)
    # damp + regularize, then closed-form invert
    Hpp = Hpp + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) + 1e-6 * jnp.eye(3))
    Hpp_inv = _inv3x3(Hpp)
    Hpp_inv = jnp.where(prob.point_valid[:, None, None], Hpp_inv, 0.0)

    # --- camera blocks ------------------------------------------------------
    # The camera-camera part of S is BLOCK-DIAGONAL (each observation touches
    # one pose), so it reduces to M 6x6 blocks via one small [M, R] x [R, 36]
    # segment matmul — no scatters, no [3R, 6M] materialization.
    oh_cam = (
        (prob.obs_cam[:, None] == jnp.arange(M, dtype=prob.obs_cam.dtype)[None, :])
        & prob.obs_valid[:, None]
    ).astype(e.dtype)                                         # [R, M]
    JcW = J_c * w[:, None, None]
    Hcc_terms = jnp.einsum("rai,raj->rij", JcW, J_c)          # [R,6,6]
    Hcc_blocks = jnp.einsum("rm,rij->mij", oh_cam, Hcc_terms)  # [M,6,6]
    S_cc = (
        jnp.einsum("mij,mn->minj", Hcc_blocks, jnp.eye(M, dtype=e.dtype))
        .reshape(M * 6, M * 6)
    )
    bc_terms = -jnp.einsum("rai,ra->ri", JcW, e)              # [R,6]
    b_c = jnp.einsum("rm,ri->mi", oh_cam, bc_terms).reshape(M * 6)

    # --- Schur reduction via per-point stacked W ---------------------------
    W_terms = jnp.einsum("rai,raj->rij", JcW, J_p)            # [R,6,3] = Hcp
    W_p = W_terms[safe_idx] * pair_valid[..., None, None]     # [P,OMAX,6,3]
    cam_p = prob.obs_cam[safe_idx]                            # [P,OMAX]
    bp_corr = jnp.einsum("pij,pj->pi", Hpp_inv, bp)           # [P,3]

    # Y[p] = per-point W stacked into the full pose dimension: [P, 6M, 3]
    oh_p = (
        (cam_p[..., None] == jnp.arange(M, dtype=cam_p.dtype)[None, None, :])
        & pair_valid[..., None]
    ).astype(e.dtype)                                         # [P,OMAX,M]
    Y = jnp.einsum("pom,poib->pmib", oh_p, W_p).reshape(P, M * 6, 3)
    # b reduction: bc -= sum_p Y_p Hpp^{-1} bp_p
    b_c = b_c - jnp.einsum("pab,pb->a", Y, bp_corr)
    # S reduction: S -= sum_p Y_p Hpp^{-1} Y_p^T (two batched MXU matmuls)
    Z = jnp.einsum("pab,pbc->pac", Y, Hpp_inv)                # [P,6M,3]
    S_cc = S_cc - jnp.einsum("pac,pbc->ab", Z, Y)

    S = jnp.zeros((dim + 6, dim + 6), e.dtype)
    S = jax.lax.dynamic_update_slice(S, S_cc, (0, 0))
    b = jnp.zeros((dim + 6,), e.dtype)
    b = jax.lax.dynamic_update_slice(b, b_c, (0,))

    # --- plane observation edges (planes live in the reduced system) ------
    ep, Jpc, Jppl, chi2p = _plane_obs_residuals(poses, planes, prob)
    wq = (
        prob.pobs_w
        * huber_weight(chi2p, CHI2_3D)
        * pobs_w_extra
        * prob.pobs_valid.astype(e.dtype)
    )
    JpcW = Jpc * wq[:, None, None]
    cam_q = jnp.where(prob.pobs_valid, prob.pobs_cam * 6, DUMP)
    pl_q = jnp.where(prob.pobs_valid, 6 * M + prob.pobs_plane * 3, DUMP)
    S = _scatter_block_add(S, cam_q, cam_q, jnp.einsum("qai,qaj->qij", JpcW, Jpc))
    S = _scatter_block_add(S, pl_q, pl_q, jnp.einsum("qai,qaj->qij", Jppl * wq[:, None, None], Jppl))
    cross = jnp.einsum("qai,qaj->qij", JpcW, Jppl)
    S = _scatter_block_add(S, cam_q, pl_q, cross)
    S = _scatter_block_add(S, pl_q, cam_q, jnp.swapaxes(cross, -1, -2))
    b = _scatter_vec_add(b, cam_q, -jnp.einsum("qai,qa->qi", JpcW, ep))
    b = _scatter_vec_add(b, pl_q, -jnp.einsum("qai,qa->qi", Jppl * wq[:, None, None], ep))

    # --- plane-plane structural edges -------------------------------------
    epp, Ja, Jb = _plane_plane_residuals(planes, prob)
    we = prob.pp_w * prob.pp_valid.astype(e.dtype)
    a_off = jnp.where(prob.pp_valid, 6 * M + prob.pp_a * 3, DUMP)
    b_off = jnp.where(prob.pp_valid, 6 * M + prob.pp_b * 3, DUMP)
    JaW = Ja * we[:, None, None]
    JbW = Jb * we[:, None, None]
    S = _scatter_block_add(S, a_off, a_off, jnp.einsum("eai,eaj->eij", JaW, Ja))
    S = _scatter_block_add(S, b_off, b_off, jnp.einsum("eai,eaj->eij", JbW, Jb))
    cr = jnp.einsum("eai,eaj->eij", JaW, Jb)
    S = _scatter_block_add(S, a_off, b_off, cr)
    S = _scatter_block_add(S, b_off, a_off, jnp.swapaxes(cr, -1, -2))
    b = _scatter_vec_add(b, a_off, -jnp.einsum("eai,ea->ei", JaW, epp))
    b = _scatter_vec_add(b, b_off, -jnp.einsum("eai,ea->ei", JbW, epp))

    # --- trim dump, damp, pin fixed/invalid entries -----------------------
    S = S[:dim, :dim]
    b = b[:dim]

    pose_free = (prob.pose_valid & ~prob.pose_fixed)
    free_mask6 = jnp.repeat(pose_free, 6)
    plane_free = prob.plane_valid
    free_mask3 = jnp.repeat(plane_free, 3)
    free = jnp.concatenate([free_mask6, free_mask3]).astype(e.dtype)

    S = S * free[:, None] * free[None, :]
    b = b * free
    diag = jnp.diag(S)
    S = S + jnp.diag(lam * diag + 1e-6) + jnp.diag(1.0 - free)

    dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b)
    dx_cam = dx[: 6 * M].reshape(M, 6)
    dx_pl = dx[6 * M :].reshape(L, 3)

    # back-substitute landmarks: dp = Hpp^{-1}(bp - W^T dxc)
    dxc_p = dx_cam[cam_p]                                     # [P,OMAX,6]
    Wt_dx = jnp.einsum("poij,poi->pj", W_p, dxc_p)            # [P,3]
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dx)
    dp = dp * prob.point_valid[:, None]
    return dx_cam, dp, dx_pl


def _total_cost(poses, points, planes, prob, intr, obs_w_extra, pobs_w_extra):
    _, _, _, chi2 = _point_residuals(poses, points, prob, intr)
    delta2 = jnp.where(prob.obs_ur >= 0, CHI2_3D, CHI2_2D)
    rho = jnp.where(
        chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2
    )
    c1 = jnp.sum(rho * prob.obs_valid * obs_w_extra)
    _, _, _, chi2p = _plane_obs_residuals(poses, planes, prob)
    rp = jnp.where(
        chi2p <= CHI2_3D, chi2p, 2.0 * jnp.sqrt(CHI2_3D * jnp.maximum(chi2p, 1e-12)) - CHI2_3D
    )
    c2 = jnp.sum(rp * prob.pobs_valid * pobs_w_extra)
    epp, _, _ = _plane_plane_residuals(planes, prob)
    c3 = jnp.sum(epp[:, 0] ** 2 * prob.pp_w * prob.pp_valid)
    return c1 + c2 + c3


@partial(jax.jit, static_argnames=("intr", "stage1_iters", "stage2_iters"))
def bundle_adjust(
    prob: BAProblem,
    intr: Intrinsics,
    stage1_iters: int = 5,
    stage2_iters: int = 10,
) -> BAResult:
    """Two-stage LM bundle adjustment with a chi2 outlier gate in between
    (the reference's 5+10 LocalBundleAdjustment schedule)."""

    def lm_stage(state, n_iters, obs_w_extra, pobs_w_extra):
        # the current cost rides in the carry, so each iteration evaluates
        # the objective ONCE (for the candidate) instead of twice
        def body(_, carry):
            poses, points, planes, lam, cost = carry
            dxc, dp, dpl = _solve_ba_iteration(
                poses, points, planes, prob, intr, lam, obs_w_extra, pobs_w_extra
            )
            poses_new = jax.vmap(se3_retract)(poses, dxc)
            points_new = points + dp
            planes_new = jax.vmap(plane_retract)(planes, dpl)
            c_new = _total_cost(poses_new, points_new, planes_new, prob, intr, obs_w_extra, pobs_w_extra)
            better = c_new < cost
            poses = jnp.where(better, poses_new, poses)
            points = jnp.where(better, points_new, points)
            planes = jnp.where(better, planes_new, planes)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            cost = jnp.where(better, c_new, cost)
            return poses, points, planes, lam, cost

        poses0, points0, planes0, lam0 = state
        c0 = _total_cost(poses0, points0, planes0, prob, intr, obs_w_extra, pobs_w_extra)
        out = jax.lax.fori_loop(0, n_iters, body, (poses0, points0, planes0, lam0, c0))
        return out[0], out[1], out[2], out[3]

    ones_r = jnp.ones_like(prob.obs_inv_sigma2)
    ones_q = jnp.ones_like(prob.pobs_w)
    poses, points, planes, _ = lm_stage(
        (prob.poses, prob.points, prob.planes, jnp.float32(1e-4)),
        stage1_iters, ones_r, ones_q,
    )

    # chi2 gate
    _, _, _, chi2 = _point_residuals(poses, points, prob, intr)
    delta2 = jnp.where(prob.obs_ur >= 0, CHI2_3D, CHI2_2D)
    obs_inl = (chi2 <= delta2) & prob.obs_valid
    _, _, _, chi2p = _plane_obs_residuals(poses, planes, prob)
    pobs_inl = (chi2p <= CHI2_3D) & prob.pobs_valid

    poses, points, planes, _ = lm_stage(
        (poses, points, planes, jnp.float32(1e-4)),
        stage2_iters, obs_inl.astype(jnp.float32), pobs_inl.astype(jnp.float32),
    )

    # final classification
    _, _, _, chi2 = _point_residuals(poses, points, prob, intr)
    obs_inl = (chi2 <= delta2) & prob.obs_valid
    _, _, _, chi2p = _plane_obs_residuals(poses, planes, prob)
    pobs_inl = (chi2p <= CHI2_3D) & prob.pobs_valid
    cost = _total_cost(poses, points, planes, prob, intr,
                       obs_inl.astype(jnp.float32), pobs_inl.astype(jnp.float32))
    return BAResult(
        poses=poses, points=points, planes=planes,
        obs_inlier=obs_inl, pobs_inlier=pobs_inl, cost=cost,
    )


@partial(jax.jit, static_argnames=("intr", "n_iters"))
def refine_alternating(
    poses, pose_fixed, points, point_valid,
    obs_cam, obs_pt, obs_uv, obs_ur, obs_inv_sigma2, obs_valid,
    intr: Intrinsics,
    n_iters: int = 8,
):
    """Alternating resection-intersection bundle refinement.

    Used as the post-loop-closure global settle (the reference runs a full
    GlobalBundleAdjustment after CorrectLoop — SURVEY §3.3).  Instead of the
    O(P*OMAX^2) Schur pair terms of the full Newton step, each iteration
    does (a) all per-point 3x3 GN solves with poses fixed, then (b) all
    per-pose 6x6 GN solves with points fixed — both are batched segment-sum
    + batched small solves, memory-light and fully parallel on the VPU.
    Converges linearly but is only used to settle an already-good PGO
    result.  Returns (poses, points).
    """
    M = poses.shape[0]
    P = points.shape[0]
    free = (~pose_fixed).astype(poses.dtype)

    def step(_, carry):
        poses, points = carry
        # ---- intersection: update points, poses fixed -------------------
        e, J_c, J_p, chi2 = point_obs_residuals(
            poses, points, obs_cam, obs_pt, obs_uv, obs_ur, obs_inv_sigma2, intr
        )
        delta2 = jnp.where(obs_ur >= 0, CHI2_3D, CHI2_2D)
        # gate wild residuals (points behind/near the camera plane) entirely;
        # this loop is a settle step, not a rescue mission
        sane = (chi2 < 1e4) & jnp.isfinite(chi2)
        w = obs_inv_sigma2 * huber_weight(chi2, delta2) * obs_valid * sane
        JpW = J_p * w[:, None, None]
        Hpp = jnp.zeros((P, 3, 3)).at[obs_pt].add(jnp.einsum("rai,raj->rij", JpW, J_p))
        bp = jnp.zeros((P, 3)).at[obs_pt].add(-jnp.einsum("rai,ra->ri", JpW, e))
        # Marquardt damping: relative to the diagonal scale, so near-singular
        # blocks (depth-unconstrained points) stay solvable in float32
        diag_p = jnp.einsum("pii->p", Hpp) / 3.0
        Hpp = Hpp + (0.05 * diag_p[:, None, None] + 1e-3) * jnp.eye(3)
        dp = jnp.linalg.solve(Hpp, bp[..., None])[..., 0]
        dp = jnp.clip(dp, -0.5, 0.5)  # trust region
        points = points + dp * point_valid[:, None]
        # ---- resection: update poses, points fixed ----------------------
        e, J_c, J_p, chi2 = point_obs_residuals(
            poses, points, obs_cam, obs_pt, obs_uv, obs_ur, obs_inv_sigma2, intr
        )
        sane = (chi2 < 1e4) & jnp.isfinite(chi2)
        w = obs_inv_sigma2 * huber_weight(chi2, delta2) * obs_valid * sane
        JcW = J_c * w[:, None, None]
        Hcc = jnp.zeros((M, 6, 6)).at[obs_cam].add(jnp.einsum("rai,raj->rij", JcW, J_c))
        bc = jnp.zeros((M, 6)).at[obs_cam].add(-jnp.einsum("rai,ra->ri", JcW, e))
        diag_c = jnp.einsum("mii->m", Hcc) / 6.0
        Hcc = Hcc + (0.05 * diag_c[:, None, None] + 1e-3) * jnp.eye(6)
        dx = jnp.linalg.solve(Hcc, bc[..., None])[..., 0] * free[:, None]
        dx = jnp.clip(dx, -0.2, 0.2)
        poses = jax.vmap(se3_retract)(poses, dx)
        return poses, points

    return jax.lax.fori_loop(0, n_iters, step, (poses, points))


def build_point_obs_table(obs_pt: jnp.ndarray, n_points: int, omax: int) -> jnp.ndarray:
    """Host-side helper: per-point observation index table [P, OMAX].

    obs_pt: [R] numpy/int array of point indices (-1 for padding).
    Observations beyond OMAX per point are dropped (reported by caller).
    """
    import numpy as np

    table = np.full((n_points, omax), -1, dtype=np.int32)
    counts = np.zeros(n_points, dtype=np.int32)
    for r, p in enumerate(np.asarray(obs_pt)):
        if p < 0:
            continue
        if counts[p] < omax:
            table[p, counts[p]] = r
            counts[p] += 1
    return jnp.asarray(table)
