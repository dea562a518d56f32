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


def _cumcount(keys: np.ndarray) -> np.ndarray:
    """Occurrence index of each element within its key group (vectorized)."""
    if len(keys) == 0:
        return np.zeros(0, np.int64)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    new_group = np.r_[True, sk[1:] != sk[:-1]]
    group_start = np.maximum.accumulate(np.where(new_group, np.arange(len(sk)), 0))
    cc = np.arange(len(sk)) - group_start
    out = np.empty(len(keys), np.int64)
    out[order] = cc
    return out


def assign_segments(pt_ref_kf: np.ndarray, n_kfs: int, n_shards: int) -> np.ndarray:
    """Trajectory-segment / map-block partitioning (the BASELINE.json north
    star): split the keyframe trajectory into n_shards CONTIGUOUS temporal
    segments, balanced by the number of map points each segment owns, and
    assign every point to its owning (reference) keyframe's segment.  Each
    shard thus holds a trajectory segment plus the map block it created —
    observations stay shard-local, inter-segment coupling flows only through
    the psum-reduced camera system (the boundary-KF "halo" is implicit in
    the replicated pose vector).

    Returns shard_of_pt [P] int.
    """
    pt_ref_kf = np.clip(np.asarray(pt_ref_kf, np.int64), 0, n_kfs - 1)
    counts = np.bincount(pt_ref_kf, minlength=n_kfs)
    cum = np.cumsum(counts)
    total = max(int(cum[-1]), 1)
    # a keyframe joins the segment its point-mass midpoint falls into —
    # contiguous (cum is monotone) and balanced by construction
    mid = cum - counts / 2.0
    segment_of_kf = np.minimum(
        (mid * n_shards / total).astype(np.int64), n_shards - 1
    )
    return segment_of_kf[pt_ref_kf]


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
    pt_ref_kf: np.ndarray | None = None,
    strategy: str = "segments",
    return_mapping: bool = False,
) -> DistBAProblem:
    """Partition landmarks (with their observations) into shards — fully
    vectorized (no per-observation Python loops).

    strategy="segments" (default): keyframe trajectory-segment + map-block
    partitioning via assign_segments (each point lands on the shard of its
    owning keyframe; pt_ref_kf defaults to each point's first observing
    camera).  strategy="round_robin": the round-1 layout, kept for A/B
    comparisons.

    With return_mapping=True, returns (prob, shard_of_pt [P], local_idx [P])
    so callers can scatter solved points back to their original order.
    """
    n_pts = len(points)
    D = n_shards
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int64)

    if strategy == "segments":
        if pt_ref_kf is None:
            # owning keyframe = first observing camera (vectorized: minimum
            # obs row per point is its creation observation)
            pt_ref_kf = np.zeros(n_pts, np.int64)
            first = np.full(n_pts, len(obs_cam), np.int64)
            np.minimum.at(first, obs_pt, np.arange(len(obs_cam)))
            seen = first < len(obs_cam)
            pt_ref_kf[seen] = obs_cam[first[seen]]
        shard_of_pt = assign_segments(pt_ref_kf, len(poses), D)
    elif strategy == "round_robin":
        shard_of_pt = np.arange(n_pts) % D
    else:
        raise ValueError(f"unknown partition strategy: {strategy}")

    # local (within-shard) point indices, vectorized
    local_idx = _cumcount(shard_of_pt)
    counts_sh = np.bincount(shard_of_pt, minlength=D)
    Ps = max(int(counts_sh.max()), 1)

    pts_sh = np.zeros((D, Ps, 3), np.float32)
    ptv_sh = np.zeros((D, Ps), bool)
    pts_sh[shard_of_pt, local_idx] = points
    ptv_sh[shard_of_pt, local_idx] = True

    # observations follow their point's shard
    shard_of_obs = shard_of_pt[obs_pt]
    j = _cumcount(shard_of_obs)
    Rs = max(int(np.bincount(shard_of_obs, minlength=D).max()), 1)
    oc = np.zeros((D, Rs), np.int32)
    op = np.zeros((D, Rs), np.int32)
    ouv = np.zeros((D, Rs, 2), np.float32)
    our = np.full((D, Rs), -1.0, np.float32)
    ois = np.ones((D, Rs), np.float32)
    ov = np.zeros((D, Rs), bool)
    oc[shard_of_obs, j] = obs_cam
    op[shard_of_obs, j] = local_idx[obs_pt]
    ouv[shard_of_obs, j] = obs_uv
    our[shard_of_obs, j] = obs_ur
    ois[shard_of_obs, j] = obs_inv_sigma2
    ov[shard_of_obs, j] = True

    # per-point observation table (for the Schur pair terms), vectorized
    pt_obs = np.full((D, Ps, obs_per_point), -1, np.int32)
    occ = _cumcount(obs_pt)
    keep = occ < obs_per_point
    n_dropped = int(len(occ) - keep.sum())
    if n_dropped:
        import logging

        logging.getLogger(__name__).info(
            "dist BA partition: dropped %d observations beyond the "
            "%d-per-point Schur-pair cap", n_dropped, obs_per_point,
        )
    pt_obs[shard_of_obs[keep], local_idx[obs_pt[keep]], occ[keep]] = j[keep]

    prob = DistBAProblem(
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
    if return_mapping:
        return prob, shard_of_pt, local_idx
    return prob


# ---------------------------------------------------------------------------
# Multi-host entry
# ---------------------------------------------------------------------------


_dist_state = {"up": False}


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Guarded jax.distributed.initialize for multi-host meshes.

    Reads SPSLAM_COORDINATOR / SPSLAM_NUM_PROCESSES / SPSLAM_PROCESS_ID when
    arguments are omitted; a no-op (returns False) when no coordinator is
    configured, so single-host runs never touch the distributed runtime.
    Returns True when the multi-process runtime is (already) up.

    Must be called BEFORE any jax computation (distributed.initialize has to
    precede backend initialization) — do not probe jax.process_count() here,
    that would itself initialize the backend.  Exercised for real by the
    2-process CPU test (tests/dist/test_multiprocess.py).
    """
    import os

    if _dist_state["up"]:
        return True
    coordinator = coordinator or os.environ.get("SPSLAM_COORDINATOR")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ.get("SPSLAM_NUM_PROCESSES", "0"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("SPSLAM_PROCESS_ID", "0"))
    )
    if not num_processes:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _dist_state["up"] = True
    return True


def global_mesh(axis: str = "ba") -> Mesh:
    """1-D mesh over every addressable device across all processes (falls
    back to the local devices on a single host)."""
    import jax

    return Mesh(np.array(jax.devices()), (axis,))
