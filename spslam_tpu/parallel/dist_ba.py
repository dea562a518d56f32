"""Distributed bundle adjustment: keyframes + map blocks sharded across a
device mesh, Schur-complement reduction via psum collectives.

This is the BASELINE.json north-star scaling path (SURVEY.md §2.2, §5):
the reference has NO distributed anything — its locality structure (local
BA windows, covisibility) is what shards.  Landmarks and their observations
are partitioned across devices (each point's observations stay on its
shard, so the Schur pair terms are shard-local); camera poses are
replicated; the reduced camera system S = Hcc - W Hpp^-1 W^T is assembled
per shard and reduced with ONE psum per LM iteration (ring all-reduce over
ICI).  The small dense solve of S runs replicated on every device —
cheaper than distributing a <=3k x 3k Cholesky.

Communication per iteration: one psum of [6M+1, 6M] floats — for M=256
poses that is ~9.4 MB, negligible against ICI bandwidth; everything else is
compute-local.  This is the moral equivalent of ring-attention's "shard the
sequence, reduce the coupling" recipe applied to the keyframe trajectory.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry.camera import Intrinsics
from ..geometry.lie import se3_retract
from ..solver.ba import point_obs_residuals
from ..solver.robust import CHI2_2D, CHI2_3D, huber_weight


class DistBAProblem(NamedTuple):
    """Leading axis of sharded arrays = device axis (size D)."""

    poses: jnp.ndarray         # [M, 7] replicated
    pose_fixed: jnp.ndarray    # [M] bool
    pose_valid: jnp.ndarray    # [M] bool
    points: jnp.ndarray        # [D, Ps, 3] sharded landmark blocks
    point_valid: jnp.ndarray   # [D, Ps]
    obs_cam: jnp.ndarray       # [D, Rs] global camera index
    obs_pt: jnp.ndarray        # [D, Rs] LOCAL point index within the shard
    obs_uv: jnp.ndarray        # [D, Rs, 2]
    obs_ur: jnp.ndarray        # [D, Rs]
    obs_inv_sigma2: jnp.ndarray  # [D, Rs]
    obs_valid: jnp.ndarray     # [D, Rs]
    pt_obs: jnp.ndarray        # [D, Ps, O] LOCAL observation table


def _scatter_block_add(S, rows, cols, blocks):
    A, B = blocks.shape[1], blocks.shape[2]
    r = rows[:, None] + jnp.arange(A, dtype=rows.dtype)[None, :]
    c = cols[:, None] + jnp.arange(B, dtype=cols.dtype)[None, :]
    return S.at[r[:, :, None], c[:, None, :]].add(blocks)


def _scatter_vec_add(b, rows, vecs):
    A = vecs.shape[1]
    r = rows[:, None] + jnp.arange(A, dtype=rows.dtype)[None, :]
    return b.at[r].add(vecs)


def _shard_reduced_system(poses, points, obs_cam, obs_pt, obs_uv, obs_ur,
                          obs_is2, obs_valid, point_valid, pt_obs, lam,
                          intr: Intrinsics, M: int):
    """Per-shard assembly of the reduced system contribution (pre-psum).

    Returns (S [dim+6, dim+6], b [dim+6], Hpp_inv, W_p, cam_p, bp) where the
    last four are shard-local intermediates needed for back-substitution.
    """
    dim = 6 * M
    DUMP = dim

    e, J_c, J_p, chi2 = point_obs_residuals(
        poses, points, obs_cam, obs_pt, obs_uv, obs_ur, obs_is2, intr
    )
    delta2 = jnp.where(obs_ur >= 0, CHI2_3D, CHI2_2D)
    w = obs_is2 * huber_weight(chi2, delta2) * obs_valid.astype(e.dtype)

    JpW = J_p * w[:, None, None]
    Hpp_terms = jnp.einsum("rai,raj->rij", JpW, J_p)
    bp_terms = -jnp.einsum("rai,ra->ri", JpW, e)
    Ps = points.shape[0]
    Hpp = jnp.zeros((Ps, 3, 3), e.dtype).at[obs_pt].add(Hpp_terms)
    bp = jnp.zeros((Ps, 3), e.dtype).at[obs_pt].add(bp_terms)
    Hpp = Hpp + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(Hpp)) + 1e-6 * jnp.eye(3))
    Hpp_inv = jnp.where(point_valid[:, None, None], jnp.linalg.inv(Hpp), 0.0)

    JcW = J_c * w[:, None, None]
    Hcc_terms = jnp.einsum("rai,raj->rij", JcW, J_c)
    bc_terms = -jnp.einsum("rai,ra->ri", JcW, e)
    W_terms = jnp.einsum("rai,raj->rij", JcW, J_p)

    S = jnp.zeros((dim + 6, dim + 6), e.dtype)
    b = jnp.zeros((dim + 6,), e.dtype)
    cam_off = jnp.where(obs_valid, obs_cam * 6, DUMP)
    S = _scatter_block_add(S, cam_off, cam_off, Hcc_terms)
    b = _scatter_vec_add(b, cam_off, bc_terms)

    pair_valid = pt_obs >= 0
    safe_idx = jnp.maximum(pt_obs, 0)
    W_p = W_terms[safe_idx] * pair_valid[..., None, None]   # [Ps,O,6,3]
    cam_p = obs_cam[safe_idx]
    bp_corr = jnp.einsum("pij,pj->pi", Hpp_inv, bp)
    bred = -jnp.einsum("poij,pj->poi", W_p, bp_corr)
    rows = jnp.where(pair_valid, cam_p * 6, DUMP)
    b = _scatter_vec_add(b, rows.reshape(-1), bred.reshape(-1, 6))

    WHinv = jnp.einsum("poij,pjk->poik", W_p, Hpp_inv)
    Spairs = -jnp.einsum("poik,pqjk->poqij", WHinv, W_p)
    pv2 = pair_valid[:, :, None] & pair_valid[:, None, :]
    r2 = jnp.where(pv2, cam_p[:, :, None] * 6, DUMP)
    c2 = jnp.where(pv2, cam_p[:, None, :] * 6, DUMP)
    S = _scatter_block_add(S, r2.reshape(-1), c2.reshape(-1), Spairs.reshape(-1, 6, 6))
    return S[:dim, :dim], b[:dim], Hpp_inv, W_p, cam_p, bp


def _shard_cost(poses, points, obs_cam, obs_pt, obs_uv, obs_ur, obs_is2,
                obs_valid, intr):
    _, _, _, chi2 = point_obs_residuals(
        poses, points, obs_cam, obs_pt, obs_uv, obs_ur, obs_is2, intr
    )
    delta2 = jnp.where(obs_ur >= 0, CHI2_3D, CHI2_2D)
    rho = jnp.where(chi2 <= delta2, chi2,
                    2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2)
    return jnp.sum(rho * obs_valid)


@partial(jax.jit, static_argnames=("intr", "n_iters", "mesh", "axis"))
def dist_bundle_adjust(
    prob: DistBAProblem,
    intr: Intrinsics,
    mesh: Mesh,
    axis: str = "ba",
    n_iters: int = 10,
):
    """LM loop with per-iteration psum-reduced Schur system.

    Returns (poses [M,7], points [D,Ps,3], cost scalar).
    """
    M = prob.poses.shape[0]
    free = (prob.pose_valid & ~prob.pose_fixed)
    free6 = jnp.repeat(free, 6).astype(jnp.float32)

    sharded = P(axis)
    rep = P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rep, sharded, sharded, sharded, sharded, sharded, sharded,
                  sharded, sharded, sharded),
        out_specs=(rep, sharded, rep),
    )
    def run(poses, points, point_valid, obs_cam, obs_pt, obs_uv, obs_ur,
            obs_is2, obs_valid, pt_obs):
        # shard_map adds a leading axis of size 1 per device slice
        points = points[0]
        point_valid = point_valid[0]
        obs_cam, obs_pt = obs_cam[0], obs_pt[0]
        obs_uv, obs_ur = obs_uv[0], obs_ur[0]
        obs_is2, obs_valid, pt_obs = obs_is2[0], obs_valid[0], pt_obs[0]

        def cost(po, pt):
            c = _shard_cost(po, pt, obs_cam, obs_pt, obs_uv, obs_ur,
                            obs_is2, obs_valid, intr)
            return jax.lax.psum(c, axis)

        def body(_, carry):
            poses, points, lam = carry
            S, b, Hpp_inv, W_p, cam_p, bp = _shard_reduced_system(
                poses, points, obs_cam, obs_pt, obs_uv, obs_ur, obs_is2,
                obs_valid, point_valid, pt_obs, lam, intr, M,
            )
            S = jax.lax.psum(S, axis)          # ONE collective per iteration
            b = jax.lax.psum(b, axis)
            S = S * free6[:, None] * free6[None, :]
            b = b * free6
            S = S + jnp.diag(lam * jnp.diag(S) + 1e-6) + jnp.diag(1.0 - free6)
            dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(S), b)
            dx_cam = dx.reshape(M, 6)
            # local landmark back-substitution
            dxc_p = dx_cam[cam_p]
            Wt_dx = jnp.einsum("poij,poi->pj", W_p, dxc_p)
            dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Wt_dx)
            dp = dp * point_valid[:, None]
            poses_new = jax.vmap(se3_retract)(poses, dx_cam)
            points_new = points + dp
            better = cost(poses_new, points_new) < cost(poses, points)
            poses = jnp.where(better, poses_new, poses)
            points = jnp.where(better, points_new, points)
            lam = jnp.where(better, lam * 0.5, lam * 4.0)
            return poses, points, lam

        poses, points, _ = jax.lax.fori_loop(
            0, n_iters, body, (poses, points, jnp.float32(1e-4))
        )
        return poses, points[None], cost(poses, points)

    poses, points, cost = run(
        prob.poses, prob.points, prob.point_valid, prob.obs_cam, prob.obs_pt,
        prob.obs_uv, prob.obs_ur, prob.obs_inv_sigma2, prob.obs_valid,
        prob.pt_obs,
    )
    return poses, points, cost


# ---------------------------------------------------------------------------
# Host-side partitioning
# ---------------------------------------------------------------------------


def partition_problem(
    poses: np.ndarray,
    pose_fixed: np.ndarray,
    points: np.ndarray,
    obs_cam: np.ndarray,
    obs_pt: np.ndarray,
    obs_uv: np.ndarray,
    obs_ur: np.ndarray,
    obs_inv_sigma2: np.ndarray,
    n_shards: int,
    obs_per_point: int = 16,
) -> DistBAProblem:
    """Partition landmarks (with their observations) round-robin into shards.

    Round-robin over point index approximates trajectory-segment blocking
    because points are created in keyframe order.
    """
    n_pts = len(points)
    shard_of_pt = np.arange(n_pts) % n_shards
    local_idx = np.zeros(n_pts, np.int64)
    for s in range(n_shards):
        ids = np.nonzero(shard_of_pt == s)[0]
        local_idx[ids] = np.arange(len(ids))
    Ps = int(np.ceil(n_pts / n_shards))
    Rs = 0
    obs_by_shard = [[] for _ in range(n_shards)]
    for r in range(len(obs_cam)):
        obs_by_shard[shard_of_pt[obs_pt[r]]].append(r)
    Rs = max(max(len(o) for o in obs_by_shard), 1)

    D = n_shards
    pts_sh = np.zeros((D, Ps, 3), np.float32)
    ptv_sh = np.zeros((D, Ps), bool)
    oc = np.zeros((D, Rs), np.int32)
    op = np.zeros((D, Rs), np.int32)
    ouv = np.zeros((D, Rs, 2), np.float32)
    our = np.full((D, Rs), -1.0, np.float32)
    ois = np.ones((D, Rs), np.float32)
    ov = np.zeros((D, Rs), bool)
    pt_obs = np.full((D, Ps, obs_per_point), -1, np.int32)

    for s in range(D):
        ids = np.nonzero(shard_of_pt == s)[0]
        pts_sh[s, : len(ids)] = points[ids]
        ptv_sh[s, : len(ids)] = True
        counts = np.zeros(Ps, np.int32)
        for j, r in enumerate(obs_by_shard[s]):
            p_loc = local_idx[obs_pt[r]]
            oc[s, j] = obs_cam[r]
            op[s, j] = p_loc
            ouv[s, j] = obs_uv[r]
            our[s, j] = obs_ur[r]
            ois[s, j] = obs_inv_sigma2[r]
            ov[s, j] = True
            if counts[p_loc] < obs_per_point:
                pt_obs[s, p_loc, counts[p_loc]] = j
                counts[p_loc] += 1

    return DistBAProblem(
        poses=jnp.asarray(poses),
        pose_fixed=jnp.asarray(pose_fixed),
        pose_valid=jnp.ones(len(poses), bool),
        points=jnp.asarray(pts_sh),
        point_valid=jnp.asarray(ptv_sh),
        obs_cam=jnp.asarray(oc),
        obs_pt=jnp.asarray(op),
        obs_uv=jnp.asarray(ouv),
        obs_ur=jnp.asarray(our),
        obs_inv_sigma2=jnp.asarray(ois),
        obs_valid=jnp.asarray(ov),
        pt_obs=jnp.asarray(pt_obs),
    )
