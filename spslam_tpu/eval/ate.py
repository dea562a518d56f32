"""Trajectory evaluation: ATE RMSE (Horn/Umeyama alignment) and RPE.

In-repo equivalent of the TUM benchmark's evaluate_ate.py / evaluate_rpe.py
(the reference's external evaluation path — SURVEY.md §4), so benchmarks
run without network access.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def camera_centers(poses_cw: np.ndarray) -> np.ndarray:
    """[F,7] T_cw -> [F,3] camera centers in world: C = -R^T t."""
    import jax.numpy as jnp

    from ..geometry.lie import quat_to_mat

    R = np.asarray(quat_to_mat(jnp.array(poses_cw[:, :4])))
    t = poses_cw[:, 4:7]
    return -np.einsum("fij,fi->fj", R, t)


def horn_align(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares rigid (or similarity) alignment src -> dst.

    Returns (s, R, t) with dst ~ s * R @ src + t  (Umeyama).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = np.trace(np.diag(D) @ S) / var_s
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(
    poses_est_cw: np.ndarray,
    poses_gt_cw: np.ndarray,
    with_scale: bool = False,
) -> Tuple[float, np.ndarray]:
    """Absolute trajectory error after Horn alignment of camera centers.

    Returns (rmse_meters, per-frame translational errors).
    """
    est = camera_centers(poses_est_cw)
    gt = camera_centers(poses_gt_cw)
    s, R, t = horn_align(est, gt, with_scale)
    est_aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est_aligned - gt, axis=-1)
    return float(np.sqrt(np.mean(err ** 2))), err


def rpe_rmse(poses_est_cw: np.ndarray, poses_gt_cw: np.ndarray, delta: int = 1):
    """Relative pose error (translational drift per `delta` frames)."""
    import jax.numpy as jnp

    from ..geometry.lie import se3_compose, se3_inverse

    errs = []
    for i in range(len(poses_est_cw) - delta):
        de = np.asarray(
            se3_compose(jnp.array(poses_est_cw[i + delta]), se3_inverse(jnp.array(poses_est_cw[i])))
        )
        dg = np.asarray(
            se3_compose(jnp.array(poses_gt_cw[i + delta]), se3_inverse(jnp.array(poses_gt_cw[i])))
        )
        rel = np.asarray(
            se3_compose(jnp.array(de), se3_inverse(jnp.array(dg)))
        )
        errs.append(np.linalg.norm(rel[4:7]))
    errs = np.array(errs)
    return float(np.sqrt(np.mean(errs ** 2))), errs
