"""Pose-graph (essential-graph) optimization over SE(3).

TPU-native equivalent of the reference's Optimizer::OptimizeEssentialGraph
(Optimizer.cc — SURVEY.md §2 #11, §3.3): after a loop is accepted, the
keyframe graph (spanning tree + strong covisibility + loop edges) is
relaxed.  The reference optimizes Sim(3) vertices; for RGB-D scale is
observable and fixed to 1, so SE(3) vertices suffice (the reference also
fixes scale for stereo/RGB-D).

Edge residual: r_ij = log( T_ij_meas . T_j . T_i^{-1} . T_ij_cur^{-1} )
written as r = log( T_meas . rel^{-1} ) with rel = T_i . T_j^{-1}; measured
rel is taken from pre-loop poses for graph edges and from the computed loop
transform for loop edges.  Jacobians by forward-mode autodiff of the
retraction (6x6 per edge; E is a few thousand at most).  The dense 6K x 6K
GN system is assembled with block scatter-adds and solved by Cholesky.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.lie import se3_compose, se3_inverse, se3_log, se3_retract


class PoseGraphProblem(NamedTuple):
    poses: jnp.ndarray     # [K, 7] current T_cw estimates
    fixed: jnp.ndarray     # [K] bool
    valid: jnp.ndarray     # [K] bool
    edge_i: jnp.ndarray    # [E] int32
    edge_j: jnp.ndarray    # [E] int32
    edge_T: jnp.ndarray    # [E, 7] measured T_i . T_j^{-1}
    edge_w: jnp.ndarray    # [E] weight
    edge_valid: jnp.ndarray  # [E] bool


def _edge_residual(Ti, Tj, Tmeas):
    rel = se3_compose(Ti, se3_inverse(Tj))
    return se3_log(se3_compose(Tmeas, se3_inverse(rel)))


def _scatter_block_add(S, rows, cols, blocks):
    A, B = blocks.shape[1], blocks.shape[2]
    r = rows[:, None] + jnp.arange(A, dtype=rows.dtype)[None, :]
    c = cols[:, None] + jnp.arange(B, dtype=cols.dtype)[None, :]
    return S.at[r[:, :, None], c[:, None, :]].add(blocks)


def _scatter_vec_add(b, rows, vecs):
    A = vecs.shape[1]
    r = rows[:, None] + jnp.arange(A, dtype=rows.dtype)[None, :]
    return b.at[r].add(vecs)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20):
    """Damped GN on the pose graph. Returns optimized poses [K,7]."""
    K = prob.poses.shape[0]
    dim = 6 * K
    DUMP = dim
    free = (prob.valid & ~prob.fixed)
    free6 = jnp.repeat(free, 6).astype(jnp.float32)

    zeros6 = jnp.zeros(6, dtype=prob.poses.dtype)

    def edge_terms(poses):
        Ti = poses[prob.edge_i]
        Tj = poses[prob.edge_j]

        def one(Ti_, Tj_, Tm_):
            def r_of(xi_i, xi_j):
                return _edge_residual(
                    se3_retract(Ti_, xi_i), se3_retract(Tj_, xi_j), Tm_
                )

            e = r_of(zeros6, zeros6)
            Ji = jax.jacfwd(r_of, argnums=0)(zeros6, zeros6)
            Jj = jax.jacfwd(r_of, argnums=1)(zeros6, zeros6)
            return e, Ji, Jj

        return jax.vmap(one)(Ti, Tj, prob.edge_T)

    def cost(poses):
        e, _, _ = edge_terms(poses)
        return jnp.sum(
            jnp.sum(e * e, axis=-1) * prob.edge_w * prob.edge_valid
        )

    def body(_, carry):
        poses, lam = carry
        e, Ji, Jj = edge_terms(poses)
        w = (prob.edge_w * prob.edge_valid)[:, None, None]
        JiW = Ji * w
        JjW = Jj * w
        io = jnp.where(prob.edge_valid, prob.edge_i * 6, DUMP)
        jo = jnp.where(prob.edge_valid, prob.edge_j * 6, DUMP)

        S = jnp.zeros((dim + 6, dim + 6), poses.dtype)
        b = jnp.zeros((dim + 6,), poses.dtype)
        S = _scatter_block_add(S, io, io, jnp.einsum("eai,eaj->eij", JiW, Ji))
        S = _scatter_block_add(S, jo, jo, jnp.einsum("eai,eaj->eij", JjW, Jj))
        cr = jnp.einsum("eai,eaj->eij", JiW, Jj)
        S = _scatter_block_add(S, io, jo, cr)
        S = _scatter_block_add(S, jo, io, jnp.swapaxes(cr, -1, -2))
        b = _scatter_vec_add(b, io, -jnp.einsum("eai,ea->ei", JiW, e))
        b = _scatter_vec_add(b, jo, -jnp.einsum("eai,ea->ei", JjW, e))
        S = S[:dim, :dim] * free6[:, None] * free6[None, :]
        b = b[:dim] * free6
        S = S + jnp.diag(lam * jnp.diag(S) + 1e-6) + jnp.diag(1.0 - free6)
        dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b)
        poses_new = jax.vmap(se3_retract)(poses, dx.reshape(K, 6))
        better = cost(poses_new) < cost(poses)
        poses = jnp.where(better, poses_new, poses)
        lam = jnp.where(better, lam * 0.5, lam * 4.0)
        return poses, lam

    poses, _ = jax.lax.fori_loop(0, n_iters, body, (prob.poses, jnp.float32(1e-6)))
    return poses
