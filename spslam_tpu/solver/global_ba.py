"""Full global bundle adjustment over the whole map.

TPU-native equivalent of the reference's Optimizer::GlobalBundleAdjustment
(src/Optimizer.cc — SURVEY.md §2 #11, §3.3): after a loop closure's pose
graph correction, jointly refine ALL valid keyframes, map points and map
planes with the full Schur-complement Newton steps of solver/ba.py —
not just the 24-pose local window.

Host assembly: the whole map is flattened into one fixed-shape BAProblem
padded to power-of-two bucket sizes, so repeated global BAs reuse a small
set of compiled kernels.  A short alternating resection-intersection settle
(solver/ba.py refine_alternating) runs first to pull the PGO-corrected
geometry close enough for the Newton stage's quadratic convergence.

Memory: the Schur reduction materializes Y [P, 6M, 3]; for very large
M*P products (beyond GBA_MAX_Y_ELEMS) the Newton stage is skipped and the
settle runs longer instead (bounded-memory fallback; the distributed path
in parallel/dist_ba.py is the real answer at that scale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Intrinsics
from .ba import BAProblem, bundle_adjust, refine_alternating
from .robust import octave_inv_sigma2

GBA_MAX_Y_ELEMS = 2 ** 29  # ~2 GiB of f32 for the [P, 6M, 3] Schur tensor

# Padding floors for the dense global problem.  High enough that typical
# single-run maps land in ONE compiled shape — each fresh shape costs a full
# XLA compile (~30-60 s through the TPU tunnel), and the post-loop GBA runs
# mid-sequence where a compile is a fake latency spike.  bench.py pre-warms
# this shape via a dummy map (loop/precompile.py).
GBA_MIN_M = 32      # keyframes
GBA_MIN_P = 8192    # points
GBA_MIN_R = 32768   # observations


def _pow2(n: int, lo: int) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    out = np.full((n,) + x.shape[1:], fill, x.dtype)
    out[: len(x)] = x
    return out


def _flatten_point_obs(st, omax: int):
    """Flatten the store's per-point observation tables into compact flat
    arrays (shared by the dense and distributed global-BA assemblies).

    Returns None if the map is too small, else a dict with compact keyframe
    / point id maps and per-observation (cam_idx, pt_row, uv, ur, octave).
    Call under store.lock if other threads may write.
    """
    kf_ids = np.nonzero(st.kf_valid)[0].astype(np.int32)
    pt_ids = np.nonzero(st.pt_valid)[0].astype(np.int32)
    if len(kf_ids) < 2 or len(pt_ids) < 50:
        return None
    kf_to_idx = np.full(st.cfg.max_keyframes, -1, np.int32)
    kf_to_idx[kf_ids] = np.arange(len(kf_ids), dtype=np.int32)

    # flatten per-point observation tables (row-major per point, <= omax each)
    kf_arr = st.pt_obs_kf[pt_ids]                       # [Np, O]
    slot_arr = st.pt_obs_slot[pt_ids]
    ok = (kf_arr >= 0) & (kf_to_idx[np.maximum(kf_arr, 0)] >= 0) & (slot_arr >= 0)
    cum = np.cumsum(ok, axis=1)
    keep = ok & (cum <= omax)
    n_dropped = int(ok.sum() - keep.sum())
    if n_dropped:
        import logging

        logging.getLogger(__name__).info(
            "global BA: dropped %d observations beyond the %d-per-point cap",
            n_dropped, omax,
        )
    rows, cols = np.nonzero(keep)
    k_sel = kf_arr[rows, cols]
    s_sel = slot_arr[rows, cols]
    return dict(
        kf_ids=kf_ids, pt_ids=pt_ids, kf_to_idx=kf_to_idx,
        rows=rows, cum_cols=cum[rows, cols] - 1,
        cam_idx=kf_to_idx[k_sel],
        uv=st.kf_uv[k_sel, s_sel].astype(np.float32),
        ur=st.kf_ur[k_sel, s_sel].astype(np.float32),
        octave=st.kf_octave[k_sel, s_sel].astype(np.int32),
    )


def assemble_global_problem(store, intr: Intrinsics, omax: int | None = None):
    """Flatten the whole MapStore into a padded BAProblem.

    Returns (prob, kf_ids, pt_ids, pl_ids) or None if the map is too small.
    Call under store.lock if other threads may write.
    """
    st = store
    omax = omax or st.cfg.max_obs_per_point
    flat = _flatten_point_obs(st, omax)
    if flat is None:
        return None
    kf_ids, pt_ids = flat["kf_ids"], flat["pt_ids"]
    kf_to_idx = flat["kf_to_idx"]
    rows = flat["rows"]
    n_obs = len(rows)

    M = _pow2(len(kf_ids), GBA_MIN_M)
    P = _pow2(len(pt_ids), GBA_MIN_P)
    R = _pow2(max(n_obs, 1), GBA_MIN_R)
    obs_cam = np.zeros(R, np.int32)
    obs_pt = np.zeros(R, np.int32)
    obs_uv = np.zeros((R, 2), np.float32)
    obs_ur = np.full(R, -1.0, np.float32)
    obs_oct = np.zeros(R, np.int32)
    obs_valid = np.zeros(R, bool)
    obs_cam[:n_obs] = flat["cam_idx"]
    obs_pt[:n_obs] = rows
    obs_uv[:n_obs] = flat["uv"]
    obs_ur[:n_obs] = flat["ur"]
    obs_oct[:n_obs] = flat["octave"]
    obs_valid[:n_obs] = True
    pt_obs = np.full((P, omax), -1, np.int32)
    pt_obs[rows, flat["cum_cols"]] = np.arange(n_obs, dtype=np.int32)

    poses = np.zeros((M, 7), np.float32)
    poses[:, 0] = 1.0
    poses[: len(kf_ids)] = st.kf_pose[kf_ids]
    pose_valid = np.zeros(M, bool)
    pose_valid[: len(kf_ids)] = True
    pose_fixed = np.zeros(M, bool)
    pose_fixed[0] = True  # gauge: oldest valid keyframe
    points = np.zeros((P, 3), np.float32)
    points[: len(pt_ids)] = st.pt_pos[pt_ids]
    point_valid = np.zeros(P, bool)
    point_valid[: len(pt_ids)] = True

    # planes: all valid, with their stored per-KF observations
    L = max(st.cfg.max_planes, 1)
    pl_ids = np.nonzero(st.pl_valid)[0].astype(np.int32)
    planes = np.zeros((L, 4), np.float32)
    planes[:, 2] = 1.0
    plane_valid = np.zeros(L, bool)
    planes[: len(pl_ids)] = st.pl_coef[pl_ids]
    plane_valid[: len(pl_ids)] = True
    Q = max(L * st.pl_obs_kf.shape[1], 1)
    pobs_cam = np.zeros(Q, np.int32)
    pobs_plane = np.zeros(Q, np.int32)
    pobs_pi = np.tile(np.array([0, 0, 1, 0], np.float32), (Q, 1))
    pobs_w = np.zeros(Q, np.float32)
    pobs_valid = np.zeros(Q, bool)
    if len(pl_ids):
        O = st.pl_obs_kf.shape[1]
        kf_obs = st.pl_obs_kf[pl_ids]                    # [Lp, O]
        ok_pl = (
            (np.arange(O)[None, :] < st.pl_obs_count[pl_ids][:, None])
            & (kf_obs >= 0)
            & (kf_to_idx[np.maximum(kf_obs, 0)] >= 0)
        )
        li_arr, j_arr = np.nonzero(ok_pl)
        q = len(li_arr)
        pobs_cam[:q] = kf_to_idx[kf_obs[li_arr, j_arr]]
        pobs_plane[:q] = li_arr
        pobs_pi[:q] = st.pl_obs_pi[pl_ids[li_arr], j_arr]
        pobs_w[:q] = np.maximum(st.pl_obs_w[pl_ids[li_arr], j_arr], 1e-3)
        pobs_valid[:q] = True
    E = max(len(st.ppe_a), 1)
    pl_index = {int(l): i for i, l in enumerate(pl_ids)}
    pp_a = np.zeros(E, np.int32)
    pp_b = np.zeros(E, np.int32)
    pp_type = np.zeros(E, np.int32)
    pp_w = np.zeros(E, np.float32)
    pp_valid = np.zeros(E, bool)
    e = 0
    for a, b, t in zip(st.ppe_a, st.ppe_b, st.ppe_type):
        if int(a) in pl_index and int(b) in pl_index:
            pp_a[e] = pl_index[int(a)]
            pp_b[e] = pl_index[int(b)]
            pp_type[e] = int(t)
            pp_w[e] = 10.0
            pp_valid[e] = True
            e += 1

    prob = BAProblem(
        poses=jnp.asarray(poses),
        pose_fixed=jnp.asarray(pose_fixed),
        pose_valid=jnp.asarray(pose_valid),
        points=jnp.asarray(points),
        point_valid=jnp.asarray(point_valid),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_ur=jnp.asarray(obs_ur),
        obs_inv_sigma2=octave_inv_sigma2(jnp.asarray(obs_oct)),
        obs_valid=jnp.asarray(obs_valid),
        pt_obs=jnp.asarray(pt_obs),
        planes=jnp.asarray(planes),
        plane_valid=jnp.asarray(plane_valid),
        pobs_cam=jnp.asarray(pobs_cam),
        pobs_plane=jnp.asarray(pobs_plane),
        pobs_pi=jnp.asarray(pobs_pi),
        pobs_w=jnp.asarray(pobs_w),
        pobs_valid=jnp.asarray(pobs_valid),
        pp_a=jnp.asarray(pp_a),
        pp_b=jnp.asarray(pp_b),
        pp_type=jnp.asarray(pp_type),
        pp_w=jnp.asarray(pp_w),
        pp_valid=jnp.asarray(pp_valid),
    )
    return prob, kf_ids, pt_ids, pl_ids


def global_bundle_adjust(
    store,
    intr: Intrinsics,
    settle_iters: int = 4,
    stage1_iters: int = 4,
    stage2_iters: int = 8,
    distributed: bool | None = None,
    write_back: bool = True,
):
    """Run global BA over the whole map and write results back.

    Two phases, mirroring the reference's post-CorrectLoop pipeline:
    1. alternating resection-intersection settle (cheap, memory-light) to
       absorb the PGO correction,
    2. full Schur-complement LM (solver/ba.py bundle_adjust) for quadratic
       final convergence — the part round 2 was missing.

    `distributed`: None (auto) runs the dense single-device Newton while the
    Schur Y tensor fits GBA_MAX_Y_ELEMS and otherwise shards the map over
    the local device mesh (parallel/dist_ba.py); True forces the sharded
    solver; False never uses it (big maps then settle longer, the bounded-
    memory fallback).

    `write_back=True` (default): write results into the store; returns True
    if a Newton-type stage (dense or distributed) ran.
    `write_back=False` (the async GBA thread, loop/loop_closer.py): return
    a result dict {kf_ids, poses, pt_ids, points, pl_ids, planes, newton,
    wrote} for the caller to merge — the map may have GROWN while the solve
    ran, and the caller owns propagating the correction to keyframes/points
    created meanwhile (the reference's RunGlobalBundleAdjustment merge).
    Returns None when the map is too small.  The distributed path cannot
    defer its scatter; it writes inline and reports wrote=True.
    """
    st = store
    if distributed is True:
        if dist_global_bundle_adjust(st, intr, n_iters=stage1_iters + stage2_iters):
            return True if write_back else dict(wrote=True, newton=True)
        # map too small to shard: fall through to the dense path

    with st.lock:
        out = assemble_global_problem(st, intr)
    if out is None:
        return False if write_back else None
    prob, kf_ids, pt_ids, pl_ids = out

    M, P = prob.poses.shape[0], prob.points.shape[0]
    newton = P * 6 * M * 3 <= GBA_MAX_Y_ELEMS
    if not newton and distributed is None:
        # auto mode: the dense Schur tensor would not fit — shard the map
        # over the local mesh instead of degrading to settle-only
        if dist_global_bundle_adjust(st, intr, n_iters=stage1_iters + stage2_iters):
            return True if write_back else dict(wrote=True, newton=True)

    poses, points = prob.poses, prob.points
    if settle_iters > 0:
        poses, points = refine_alternating(
            poses, prob.pose_fixed | ~prob.pose_valid, points, prob.point_valid,
            prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_ur,
            prob.obs_inv_sigma2, prob.obs_valid.astype(jnp.float32),
            intr, n_iters=settle_iters,
        )

    if newton:
        prob = prob._replace(poses=poses, points=points)
        res = bundle_adjust(
            prob, intr, stage1_iters=stage1_iters, stage2_iters=stage2_iters
        )
        new_poses, new_points, new_planes = jax.device_get(
            (res.poses, res.points, res.planes)
        )
    else:
        # bounded-memory fallback: settle longer instead of the Newton stage
        poses, points = refine_alternating(
            poses, prob.pose_fixed | ~prob.pose_valid, points, prob.point_valid,
            prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_ur,
            prob.obs_inv_sigma2, prob.obs_valid.astype(jnp.float32),
            intr, n_iters=3 * settle_iters,
        )
        new_poses, new_points = jax.device_get((poses, points))
        new_planes = None

    if not write_back:
        return dict(
            wrote=False, newton=newton,
            kf_ids=kf_ids, poses=new_poses[: len(kf_ids)],
            pt_ids=pt_ids, points=new_points[: len(pt_ids)],
            pl_ids=pl_ids,
            planes=new_planes[: len(pl_ids)] if new_planes is not None else None,
        )
    with st.lock:
        st.kf_pose[kf_ids] = new_poses[: len(kf_ids)]
        st.pt_pos[pt_ids] = new_points[: len(pt_ids)]
        if new_planes is not None and len(pl_ids):
            st.pl_coef[pl_ids] = new_planes[: len(pl_ids)]
        st.version += 1
    return newton


def dist_global_bundle_adjust(
    store,
    intr: Intrinsics,
    n_shards: int | None = None,
    n_iters: int = 12,
) -> bool:
    """Global BA with keyframes + map blocks sharded over the device mesh.

    The live-System entry to parallel/dist_ba.py (the BASELINE.json north
    star: Optimizer::GlobalBundleAdjustment at scale — SURVEY.md §2.2, §5
    locality row): trajectory-segment partitioning (strategy="segments")
    assigns each map point to its owning keyframe's segment, the sharded LM
    loop reduces the Schur camera system with one psum per iteration, and
    results scatter back into the MapStore.

    Points-only (the reference's GBA is too: plane terms enter through the
    pose-graph and local BA); planes keep their PGO-corrected values.  No
    alternating-settle stage: the sharded LM's damping handles the raw
    post-PGO geometry directly.

    Returns True if the sharded solve ran and wrote back, False when the map
    is too small to shard (callers fall back to the dense path).
    """
    import jax as _jax

    from ..parallel.dist_ba import dist_bundle_adjust, partition_problem

    st = store
    devices = _jax.devices()
    D = n_shards or len(devices)
    D = min(D, len(devices))
    with st.lock:
        flat = _flatten_point_obs(st, st.cfg.max_obs_per_point)
        if flat is None:
            return False
        kf_ids, pt_ids = flat["kf_ids"], flat["pt_ids"]
        if D < 2 or len(pt_ids) < 64 * D:
            return False
        poses = st.kf_pose[kf_ids].astype(np.float32).copy()
        points = st.pt_pos[pt_ids].astype(np.float32).copy()
        # owning keyframe in compact index space (reference keyframe when
        # still valid, else the point's first observing camera)
        ref = st.pt_ref_kf[pt_ids]
        ref_ok = (ref >= 0) & st.kf_valid[np.maximum(ref, 0)]
        pt_ref_compact = np.where(
            ref_ok, flat["kf_to_idx"][np.maximum(ref, 0)], -1
        ).astype(np.int64)

    first = np.full(len(pt_ids), len(flat["rows"]), np.int64)
    np.minimum.at(first, flat["rows"], np.arange(len(flat["rows"])))
    seen = first < len(flat["rows"])
    fallback_ref = np.zeros(len(pt_ids), np.int64)
    fallback_ref[seen] = flat["cam_idx"][first[seen]]
    pt_ref_compact = np.where(pt_ref_compact >= 0, pt_ref_compact, fallback_ref)

    pose_fixed = np.zeros(len(kf_ids), bool)
    pose_fixed[0] = True  # gauge
    from jax.sharding import Mesh

    mesh = Mesh(np.array(devices[:D]), ("ba",))
    prob, shard_of_pt, local_idx = partition_problem(
        poses, pose_fixed, points,
        flat["cam_idx"].astype(np.int32), flat["rows"].astype(np.int64),
        flat["uv"], flat["ur"],
        np.asarray(octave_inv_sigma2(jnp.asarray(flat["octave"]))),
        n_shards=D,
        obs_per_point=st.cfg.max_obs_per_point,
        pt_ref_kf=pt_ref_compact,
        strategy="segments",
        return_mapping=True,
    )
    new_poses, new_points, _cost = _jax.device_get(
        dist_bundle_adjust(prob, intr, mesh, n_iters=n_iters)
    )
    with st.lock:
        st.kf_pose[kf_ids] = new_poses
        st.pt_pos[pt_ids] = new_points[shard_of_pt, local_idx]
        st.version += 1
    return True
