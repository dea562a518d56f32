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


def _pow2(n: int, lo: int) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


def _pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    out = np.full((n,) + x.shape[1:], fill, x.dtype)
    out[: len(x)] = x
    return out


def assemble_global_problem(store, intr: Intrinsics, omax: int | None = None):
    """Flatten the whole MapStore into a padded BAProblem.

    Returns (prob, kf_ids, pt_ids, pl_ids) or None if the map is too small.
    Call under store.lock if other threads may write.
    """
    st = store
    kf_ids = np.nonzero(st.kf_valid)[0].astype(np.int32)
    pt_ids = np.nonzero(st.pt_valid)[0].astype(np.int32)
    if len(kf_ids) < 2 or len(pt_ids) < 50:
        return None
    omax = omax or st.cfg.max_obs_per_point

    M = _pow2(len(kf_ids), 16)
    P = _pow2(len(pt_ids), 1024)

    kf_to_idx = np.full(st.cfg.max_keyframes, -1, np.int32)
    kf_to_idx[kf_ids] = np.arange(len(kf_ids), dtype=np.int32)

    # flatten per-point observation tables (row-major per point, <= omax each)
    kf_arr = st.pt_obs_kf[pt_ids]                       # [Np, O]
    slot_arr = st.pt_obs_slot[pt_ids]
    ok = (kf_arr >= 0) & (kf_to_idx[np.maximum(kf_arr, 0)] >= 0) & (slot_arr >= 0)
    cum = np.cumsum(ok, axis=1)
    keep = ok & (cum <= omax)
    rows, cols = np.nonzero(keep)
    k_sel = kf_arr[rows, cols]
    s_sel = slot_arr[rows, cols]
    n_obs = len(rows)
    R = _pow2(max(n_obs, 1), 2048)

    obs_cam = np.zeros(R, np.int32)
    obs_pt = np.zeros(R, np.int32)
    obs_uv = np.zeros((R, 2), np.float32)
    obs_ur = np.full(R, -1.0, np.float32)
    obs_oct = np.zeros(R, np.int32)
    obs_valid = np.zeros(R, bool)
    obs_cam[:n_obs] = kf_to_idx[k_sel]
    obs_pt[:n_obs] = rows
    obs_uv[:n_obs] = st.kf_uv[k_sel, s_sel]
    obs_ur[:n_obs] = st.kf_ur[k_sel, s_sel]
    obs_oct[:n_obs] = st.kf_octave[k_sel, s_sel]
    obs_valid[:n_obs] = True
    pt_obs = np.full((P, omax), -1, np.int32)
    pt_obs[rows, cum[rows, cols] - 1] = np.arange(n_obs, dtype=np.int32)

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
    q = 0
    for li, l in enumerate(pl_ids):
        for j in range(st.pl_obs_count[l]):
            k = int(st.pl_obs_kf[l, j])
            if k < 0 or kf_to_idx[k] < 0:
                continue
            pobs_cam[q] = kf_to_idx[k]
            pobs_plane[q] = li
            pobs_pi[q] = st.pl_obs_pi[l, j]
            pobs_w[q] = max(st.pl_obs_w[l, j], 1e-3)
            pobs_valid[q] = True
            q += 1
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
) -> bool:
    """Run global BA over the whole map and write results back.

    Two phases, mirroring the reference's post-CorrectLoop pipeline:
    1. alternating resection-intersection settle (cheap, memory-light) to
       absorb the PGO correction,
    2. full Schur-complement LM (solver/ba.py bundle_adjust) for quadratic
       final convergence — the part round 2 was missing.

    Returns True if the Newton stage ran, False if only the settle did.
    """
    st = store
    with st.lock:
        out = assemble_global_problem(st, intr)
    if out is None:
        return False
    prob, kf_ids, pt_ids, pl_ids = out

    poses, points = prob.poses, prob.points
    if settle_iters > 0:
        poses, points = refine_alternating(
            poses, prob.pose_fixed | ~prob.pose_valid, points, prob.point_valid,
            prob.obs_cam, prob.obs_pt, prob.obs_uv, prob.obs_ur,
            prob.obs_inv_sigma2, prob.obs_valid.astype(jnp.float32),
            intr, n_iters=settle_iters,
        )

    M, P = prob.poses.shape[0], prob.points.shape[0]
    newton = P * 6 * M * 3 <= GBA_MAX_Y_ELEMS
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

    with st.lock:
        st.kf_pose[kf_ids] = new_poses[: len(kf_ids)]
        st.pt_pos[pt_ids] = new_points[: len(pt_ids)]
        if new_planes is not None and len(pl_ids):
            st.pl_coef[pl_ids] = new_planes[: len(pl_ids)]
        st.version += 1
    return newton
