"""Batched Horn-alignment RANSAC for loop-closure geometric verification.

TPU-native equivalent of the reference's Sim3Solver (src/Sim3Solver.cc —
SURVEY.md §2 #14).  The reference iterates 5 RANSAC hypotheses at a time on
the CPU; here ALL hypotheses (default 256) are evaluated in one batched
vmap: sample triples, closed-form Horn alignment per triple (3x3 SVD),
inlier counting as one [H, N] distance matrix.  Scale is fixed to 1 for
RGB-D (the reference does the same via bFixScale=true).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.lie import mat_to_quat, se3_make


class AlignResult(NamedTuple):
    T_ba: jnp.ndarray     # [7] SE3: x_b = R x_a + t
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray


def _horn(pa: jnp.ndarray, pb: jnp.ndarray, w: jnp.ndarray):
    """Weighted closed-form rigid alignment pa -> pb. pa/pb [N,3], w [N]."""
    ws = jnp.maximum(jnp.sum(w), 1e-9)
    ca = jnp.sum(pa * w[:, None], axis=0) / ws
    cb = jnp.sum(pb * w[:, None], axis=0) / ws
    A = ((pb - cb) * w[:, None]).T @ (pa - ca)   # [3,3]
    U, _, Vt = jnp.linalg.svd(A)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ S @ Vt
    t = cb - R @ ca
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_align(
    pa: jnp.ndarray,
    pb: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 256,
    inlier_th: float = 0.08,
) -> AlignResult:
    """RANSAC rigid alignment of matched 3D point pairs.

    pa, pb: [N, 3] corresponding points (a = current KF cam frame,
    b = candidate KF cam frame); valid: [N] match exists.
    """
    N = pa.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(n_hyp, 3))

    def hyp(i3):
        w3 = jnp.ones(3)
        R, t = _horn(pa[i3], pb[i3], w3)
        return R, t

    Rs, ts = jax.vmap(hyp)(idx)                       # [H,3,3], [H,3]
    pred = jnp.einsum("hij,nj->hni", Rs, pa) + ts[:, None, :]
    err = jnp.linalg.norm(pred - pb[None], axis=-1)   # [H,N]
    inl = (err < inlier_th) & valid[None, :]
    counts = inl.sum(-1)
    best = jnp.argmax(counts)

    # refine with all inliers of the best hypothesis (two reweighted rounds)
    w = inl[best].astype(jnp.float32)
    R, t = _horn(pa, pb, w)
    for _ in range(2):
        e = jnp.linalg.norm((pa @ R.T + t) - pb, axis=-1)
        w = ((e < inlier_th) & valid).astype(jnp.float32)
        R, t = _horn(pa, pb, w)
    e = jnp.linalg.norm((pa @ R.T + t) - pb, axis=-1)
    final_inl = (e < inlier_th) & valid
    T = se3_make(mat_to_quat(R), t)
    return AlignResult(T_ba=T, inliers=final_inl, n_inliers=final_inl.sum())
