"""Monocular two-view initialization: essential-matrix RANSAC +
decomposition + triangulation.

Equivalent of the reference's Initializer.cc (SURVEY.md §2 #19 — H/F-model
monocular bootstrap; mostly dead code on the RGB-D path, kept for API
parity and future monocular support).  TPU-native shape: ALL RANSAC
hypotheses evaluated in one batch — each 8-point sample yields E by SVD,
scored by symmetric epipolar error over all matches at once.

Scale is unobservable (monocular); the returned translation is unit-norm.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.camera import Intrinsics
from ..geometry.lie import mat_to_quat, se3_make


class InitResult(NamedTuple):
    T_21: jnp.ndarray      # [7] SE3 pose of view 2 w.r.t. view 1 (unit t)
    points: jnp.ndarray    # [N, 3] triangulated points in view-1 frame
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def _normalized(intr: Intrinsics, uv):
    return jnp.stack(
        [(uv[..., 0] - intr.cx) / intr.fx, (uv[..., 1] - intr.cy) / intr.fy], axis=-1
    )


def _eight_point(x1, x2, w=None):
    """E from >=8 normalized correspondences (x1, x2: [K,2]); optional
    per-row weights enable weighted all-inlier refinement."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)],
        axis=-1,
    )  # [K, 9]
    if w is not None:
        A = A * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    E = Vt[-1].reshape(3, 3)
    # project to essential manifold: two equal singular values
    U, s, Vt2 = jnp.linalg.svd(E)
    s_mean = (s[0] + s[1]) / 2.0
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0]) * s_mean) @ Vt2


def _epipolar_error(E, x1, x2):
    """Symmetric squared epipolar distance (normalized coords)."""
    ones = jnp.ones_like(x1[..., :1])
    h1 = jnp.concatenate([x1, ones], axis=-1)
    h2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = h1 @ E.T          # lines in image 2
    Etx2 = h2 @ E           # lines in image 1
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    d1 = num / jnp.maximum(Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2, 1e-12)
    d2 = num / jnp.maximum(Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2, 1e-12)
    return d1 + d2


def _triangulate(R, t, x1, x2):
    """Midpoint-free DLT triangulation in view-1 frame; x: normalized."""
    # P1 = [I|0], P2 = [R|t]
    def one(a, b):
        A = jnp.stack(
            [
                jnp.array([1.0, 0.0, 0.0, 0.0]) - a[0] * jnp.array([0.0, 0.0, 1.0, 0.0]),
                jnp.array([0.0, 1.0, 0.0, 0.0]) - a[1] * jnp.array([0.0, 0.0, 1.0, 0.0]),
                jnp.concatenate([R[0] - b[0] * R[2], (t[0] - b[0] * t[2])[None]]),
                jnp.concatenate([R[1] - b[1] * R[2], (t[1] - b[1] * t[2])[None]]),
            ]
        )
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(one)(x1, x2)


@partial(jax.jit, static_argnames=("intr", "n_hyp"))
def initialize_two_view(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    intr: Intrinsics,
    key: jnp.ndarray,
    n_hyp: int = 128,
    inlier_th_px: float = 2.0,
) -> InitResult:
    """Relative pose + structure from matched keypoints of two views.

    uv1/uv2: [N,2] matched pixel coords; valid: [N] match exists.
    """
    x1 = _normalized(intr, uv1)
    x2 = _normalized(intr, uv2)
    N = x1.shape[0]
    th = (inlier_th_px / intr.fx) ** 2 * 2.0

    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 8))
    Es = jax.vmap(lambda i8: _eight_point(x1[i8], x2[i8]))(idx)   # [H,3,3]
    errs = jax.vmap(lambda E: _epipolar_error(E, x1, x2))(Es)      # [H,N]
    inl = (errs < th) & valid[None, :]
    best = jnp.argmax(inl.sum(-1))
    inliers = inl[best]
    # all-inlier weighted refinement (two rounds): the minimal-sample E is
    # noise-limited; refitting over every inlier sharpens both pose and
    # the triangulated structure
    E = Es[best]
    for _ in range(2):
        E = _eight_point(x1, x2, inliers.astype(x1.dtype))
        inliers = (_epipolar_error(E, x1, x2) < th) & valid

    # decompose: 4 candidate (R, t), pick the one with most points in front
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U @ Vt)
    U = U * jnp.sign(d)  # ensure proper rotations
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tvec = U[:, 2]

    def score(R, t):
        X = _triangulate(R, t, x1, x2)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        ok = (z1 > 1e-3) & (z2 > 1e-3) & inliers
        return ok.sum(), X, ok

    cands = [(R1, tvec), (R1, -tvec), (R2, tvec), (R2, -tvec)]
    counts = []
    Xs = []
    oks = []
    for R, t in cands:
        c, X, ok = score(R, t)
        counts.append(c)
        Xs.append(X)
        oks.append(ok)
    counts = jnp.stack(counts)
    k = jnp.argmax(counts)
    Rbest = jnp.stack([c[0] for c in cands])[k]
    tbest = jnp.stack([c[1] for c in cands])[k]
    X = jnp.stack(Xs)[k]
    ok = jnp.stack(oks)[k]

    T = se3_make(mat_to_quat(Rbest), tbest)
    return InitResult(T_21=T, points=X, inliers=ok, n_inliers=ok.sum())
