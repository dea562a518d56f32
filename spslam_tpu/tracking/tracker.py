"""Per-frame tracking front-end: motion-model / reference-KF tracking,
local-map tracking, keyframe decision.

TPU-native equivalent of the reference's Tracking state machine
(src/Tracking.cc — SURVEY.md §2 #9, §3.1): the functional core (frame
build, projection gating, matching, pose optimization) is jitted device
code with fixed shapes; this module is the thin host shell that sequences
it and talks to the MapStore.

Differences from the reference, by design (SURVEY.md §7):
* no BoW in tracking: reference-KF fallback matches descriptors directly on
  the MXU (the BoW vocabulary is only used for loop closure / relocalization
  candidate retrieval, see loop/).
* the "last frame" temporal points and the local-map points are both handled
  by the same padded projection-match-optimize device pipeline.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from enum import Enum
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Intrinsics, in_image
from ..geometry.lie import quat_rotate, se3_q, se3_t
from ..geometry import np_lie
from ..frontend.frame import FrameData, build_frame
from ..map.store import MapStore
from ..ops.brief import unpack_bits
from ..ops.match import TH_HIGH, TH_LOW, match_descriptors, search_by_projection
from ..ops.pyramid import PyramidSpec
from ..solver.pose_opt import pose_optimization
from ..solver.robust import octave_inv_sigma2


class TrackState(Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@dataclass(frozen=True)
class TrackerConfig:
    n_features: int = 1024
    n_levels: int = 8
    scale_factor: float = 1.2
    th_fast_high: float = 20.0
    th_fast_low: float = 7.0
    th_depth: float = 3.2          # meters: close/far split (reference ThDepth*b)
    local_points_cap: int = 4096   # padded local-map snapshot size
    # Search-window radii at the predicted octave's scale.  The reference
    # uses 15/th*4 px windows at 30 fps inter-frame motion; our benchmark
    # sequences move several times faster per frame, and the window gate is
    # a MASK on an already-dense MXU distance matrix, so wider windows cost
    # nothing — 22/6 px measured 2.5 mm ATE vs 181 mm at 15/4 on the
    # 10-frame fast-motion sequence (see BASELINE.md).
    motion_search_radius: float = 22.0
    local_search_radius: float = 6.0
    min_inliers_motion: int = 20
    min_inliers_track: int = 30
    kf_max_interval: int = 30
    kf_min_interval: int = 1     # KFs are cheap; BA frequency is throttled in
                                 # the mapper instead (reference: mbAbortBA)
    kf_tracked_ratio: float = 0.75   # reference thRefRatio for RGB-D
    kf_min_inliers: int = 15
    new_kf_close_points: int = 100
    max_new_points_per_kf: int = 360
    # pose-jump gate: max deviation of the fused step's result from the
    # constant-velocity prediction (translation meters / rotation radians)
    # before the frame replays through the robust sync path
    jump_gate_t: float = 0.25
    jump_gate_r: float = 0.35
    # max queued+in-flight keyframes before ordinary insertion throttles
    # (the reference's mlNewKeyFrames < 3 bound)
    kf_queue_cap: int = 3
    # software-pipeline depth: in-flight fused dispatches before the oldest
    # resolves.  3 measured 13-18 ms/frame vs 21-22 at depth 2 on chip (the
    # extra slot absorbs mapper device contention) with point-lane accuracy
    # verified unchanged, so 3 is the default.  The extra resolve lag shifts
    # KEYFRAME cadence, and plane-lane accuracy is sensitive to that (longer
    # ref-KF spans mean fewer/wider plane observations: 3.6 mm -> ~40 mm ATE
    # measured at depth 3 with planes) — System therefore downshifts to 2
    # automatically when use_planes is on (system.py), so the default config
    # is safe for every lane and the flagship number needs no opt-in.
    pipeline_depth: int = 3
    # --- tracking-level plane refinement (SP-SLAM Tracking.cc [SP]) -----
    # When System.use_planes is on, the fused step segments frame planes
    # from the (subsampled) depth, associates them to the local map-plane
    # snapshot at the point-stage pose, and runs a short JOINT point+plane
    # LM refine (solver/pose_opt.pose_optimization_joint).  This is what
    # carries tracking through low-texture frames where points alone drift
    # (SURVEY.md §6: planes help most on low texture).
    plane_info: float = 1e5        # per-plane information BASE (sigma
                                   # ~3 mrad/3 mm at nominal support),
                                   # scaled by each observation's pixel
                                   # support in the fused step.  Point
                                   # reproj rows carry fx/z ~100 each so
                                   # planes only steer when points are few/
                                   # weak — exactly the low-texture regime;
                                   # measured: lowtex 13.3 -> 5.5-11.1 mm,
                                   # textured unchanged (3.3 mm), 2 seeds.
    plane_assoc_cos: float = 0.94  # association gates at the predicted pose
    plane_assoc_dist: float = 0.2
    plane_min_support: int = 300   # pixels at the UPLOAD resolution
    # depth H2D subsample stride: the 600 KB u16 depth upload dominates the
    # ~47 MB/s tunnel wire (tools/profile_pipeline.py stage B measured
    # 19.3 ms/frame for the 900 KB pair); stride 2 cuts it to 150 KB and
    # the keypoint depth lookup lands <=1 px off at full res.  1 = full res.
    depth_upload_stride: int = 2
    # URGENT coverage floor: a keyframe inserts even with a deep mapping
    # queue when the inlier count PROJECTED pipeline_depth frames ahead
    # (linear extrapolation of the per-frame decay) falls below this.  On
    # fast rotation coverage decays ~30%/frame and the pipelined tracker
    # has 2 frames in flight on the old local map — reacting on the current
    # count via the reference's relative gates is 2 frames too late and
    # tracking collapses; an absolute floor leaves slow-motion keyframe
    # cadence (the reference's gates) untouched.
    kf_urgent_cover: int = 100


@dataclass
class FrameRecord:
    """Resolved per-frame result handed back to the System by the pipelined
    tracking path (poses may resolve one call later than they were fed)."""
    ts: float
    T: np.ndarray          # T_cw at resolution time
    state: "TrackState"
    ref_kf: int            # reference keyframe at resolution time
    new_kf: int            # keyframe id created for this frame, or -1
    gray: np.ndarray       # original inputs (for plane mapping on KF frames)
    depth: np.ndarray


# Frustum-gate slacks (the reference's IsInFrustum uses 0.8 / 1.2; traced
# into the jitted step at first call — override before any tracking call)
DIST_SLACK_LO = 0.8
DIST_SLACK_HI = 1.2
OCTAVE_SLACK = 1  # +- pyramid levels around the predicted octave

# fixed device capacity of the local map-PLANE snapshot (top by support;
# compiled shapes never change even when the store's plane table grows)
PLANE_CAP = 64


@partial(jax.jit, static_argnames=("intr",))
def project_points(T_cw, pos, normal, min_dist, max_dist, valid, intr: Intrinsics):
    """Project local map points into the frame with the reference's gates
    (Tracking::SearchLocalPoints / MapPoint::IsInFrustum):
    positive depth, in-image, distance within scale range, viewing angle
    cos > 0.5.  Also returns the predicted pyramid octave."""
    xc = quat_rotate(se3_q(T_cw), pos) + se3_t(T_cw)
    z = xc[..., 2]
    u = intr.fx * xc[..., 0] / jnp.maximum(z, 1e-6) + intr.cx
    v = intr.fy * xc[..., 1] / jnp.maximum(z, 1e-6) + intr.cy
    uv = jnp.stack([u, v], axis=-1)

    # camera center in world
    C = -quat_rotate(jnp.concatenate([se3_q(T_cw)[:1], -se3_q(T_cw)[1:]]), se3_t(T_cw))
    vec = pos - C
    dist = jnp.linalg.norm(vec, axis=-1)
    view_cos = jnp.sum(vec * normal, axis=-1) / jnp.maximum(dist, 1e-9)

    ok = (
        valid
        & (z > 0.05)
        & in_image(intr, uv, border=1.0)
        & (dist >= DIST_SLACK_LO * min_dist)
        & (dist <= DIST_SLACK_HI * max_dist)
        & (view_cos > 0.5)
    )
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    oct_pred = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(1.2)).astype(jnp.int32), 0, 7
    )
    return uv, ok, oct_pred, z


@partial(
    jax.jit,
    static_argnames=("max_dist_hamming", "intr", "n_rounds", "n_iters"),
)
def _match_and_optimize(
    T_init,
    pt_pos, pt_normal, pt_min_dist, pt_max_dist, pt_bits, pt_valid,
    frame: FrameData,
    radius_base,
    max_dist_hamming,
    intr: Intrinsics,
    n_rounds: int = 4,
    n_iters: int = 10,
):
    """Project → gated match → pose optimization, all on device.

    Returns (opt_result, match_idx [PL] kp index or -1).
    """
    uv, ok, oct_pred, _ = project_points(
        T_init, pt_pos, pt_normal, pt_min_dist, pt_max_dist, pt_valid, intr
    )
    radius = radius_base * 1.2 ** oct_pred.astype(jnp.float32)
    res = search_by_projection(
        uv, pt_bits, ok, oct_pred,
        frame.uv, frame.bits, frame.valid, frame.octave, frame.angle,
        jnp.zeros_like(oct_pred, dtype=jnp.float32),
        radius,
        max_dist=max_dist_hamming,
        ratio=0.95,
        check_rotation=False,
        octave_slack=OCTAVE_SLACK,
    )
    kp_idx = jnp.maximum(res.idx, 0)
    matched = res.valid
    uv_obs = frame.uv[kp_idx]
    ur_obs = jnp.where(matched, frame.u_right[kp_idx], -1.0)
    inv_s2 = octave_inv_sigma2(frame.octave[kp_idx])
    opt = _compact_pose_opt(
        T_init, pt_pos, uv_obs, ur_obs, inv_s2, matched,
        frame.uv.shape[0], intr, n_rounds, n_iters,
    )
    return opt, jnp.where(matched, res.idx, -1), matched


def _compact_pose_opt(T_init, pt_pos, uv_obs, ur_obs, inv_s2, matched,
                      n_kp: int, intr: Intrinsics, n_rounds: int, n_iters: int):
    """Pose optimization over a COMPACTED observation buffer.

    The local-map snapshot is PL(=4096)-padded but at most n_kp(=1024)
    rows can be matched (one keypoint each), and every LM iteration pays a
    residual+Jacobian evaluation per ROW — compacting matched rows first
    (stable argsort on the mask) cuts the LM loop's per-iteration work ~4x
    with bitwise-equivalent math (unmatched rows carry zero weight).
    The inlier mask is scattered back to the full PL layout.
    """
    PL = pt_pos.shape[0]
    if PL <= n_kp:
        return pose_optimization(
            T_init, pt_pos, uv_obs, ur_obs, inv_s2, matched, intr,
            n_rounds=n_rounds, n_iters=n_iters,
        )
    sel = jnp.argsort(jnp.logical_not(matched), stable=True)[:n_kp]
    opt_c = pose_optimization(
        T_init, pt_pos[sel], uv_obs[sel], ur_obs[sel], inv_s2[sel],
        matched[sel], intr, n_rounds=n_rounds, n_iters=n_iters,
    )
    inliers_full = jnp.zeros_like(matched).at[sel].set(opt_c.inliers)
    return opt_c._replace(inliers=inliers_full & matched)


def _compact_joint_opt(T_init, pt_pos, uv_obs, ur_obs, inv_s2, matched,
                       pl_w, pl_obs, pl_valid, pl_info,
                       n_kp: int, intr: Intrinsics, n_rounds: int, n_iters: int):
    """pose_optimization_joint over a COMPACTED point buffer (same trick as
    _compact_pose_opt) plus the matched plane rows."""
    from ..solver.pose_opt import pose_optimization_joint

    PL = pt_pos.shape[0]
    sel = jnp.argsort(jnp.logical_not(matched), stable=True)[:n_kp]
    opt_c = pose_optimization_joint(
        T_init, pt_pos[sel], uv_obs[sel], ur_obs[sel], inv_s2[sel],
        matched[sel], pl_w, pl_obs, pl_valid, pl_info, intr,
        n_rounds=n_rounds, n_iters=n_iters,
    )
    inliers_full = jnp.zeros_like(matched).at[sel].set(opt_c.inliers)
    return opt_c._replace(inliers=inliers_full & matched)


@partial(
    jax.jit,
    static_argnames=(
        "radius_motion", "radius2", "th_depth",
        "spec", "intr", "n_features", "th_high", "th_low", "depth_factor",
        "use_planes", "plane_info", "plane_assoc_cos", "plane_assoc_dist",
        "plane_min_support",
    ),
)
def track_frame_step(
    frame_gray, frame_depth, T_prev, T_prev2, has_vel,
    pt_pack, pt_desc, pl_pack,
    radius_motion, radius2, th_depth,
    spec: PyramidSpec, intr: Intrinsics, n_features: int,
    th_high: float = 20.0, th_low: float = 7.0,
    depth_factor: float = 5000.0,
    use_planes: bool = False,
    plane_info: float = 1e5,
    plane_assoc_cos: float = 0.94,
    plane_assoc_dist: float = 0.2,
    plane_min_support: int = 300,
):
    """The whole per-frame device pipeline in ONE dispatch: pose prediction
    (constant-velocity model from the two previous DEVICE-resident poses),
    frame build, coarse motion-model match+optimize, tight local-map
    match+optimize, and the keyframe-decision statistics.

    Computing the motion prediction on device (rather than taking T_pred
    from the host) breaks the host-sync dependency between consecutive
    frames: frame N can be dispatched from frame N-1's un-fetched output
    pose, so the ~tens-of-ms device tunnel round trip overlaps the next
    frame's device compute (software pipelining, depth 1).

    The host syncs on NOTHING here: the outputs are packed into TWO device
    buffers whose device->host copies are started asynchronously right after
    dispatch (copy_to_host_async) and consumed two frames later by
    _resolve, so the tunnel round trip never lands on the frame critical
    path.  The split is by consumer cadence: the small buffer (pose +
    stats + match table, ~16 KB) is fetched EVERY frame; the big keyframe-
    insertion bundle (frame_pack + descriptors, ~100 KB) is only fetched on
    frames that actually become keyframes (~1 in 5), saving both copy
    bandwidth and host decode time on ordinary frames.

    Args:
      frame_gray: [H, W] uint8 or float32 intensities 0..255, uploaded in
        the caller's native dtype (the round-3 single-u8-buffer packing cost
        2-3 ms/frame of host conversion to save per-transfer overhead that
        turned out to be per-FLUSH — raw uploads ride the same flush free).
      frame_depth: [H, W] float32 meters, or integer raw units divided by
        `depth_factor` on device (dtype picks the variant at trace time).
      pt_pack: [PL, 9] f32 local-map snapshot (pos | normal | min_d | max_d
        | valid).
      radius_motion/radius2/th_depth: STATIC python floats — per-call scalar
        uploads through the device tunnel cost ~ms each (measured), so
        config constants are baked into the compiled program instead.

    Returns (frame, out_small, out_big), two flat uint32 buffers:
      out_small [12+PL] — fetched every frame:
        [0:12]      scal f32 — T_cw[0:7], n_seed (best-of motion-model /
                    global-fallback inliers), n2, n_close_tracked,
                    close_avail, n_fallback (global-fallback inliers; -1
                    when the fallback was skipped by the seed gate).
        [12:12+PL]  match_pack i32 — -1 if unmatched, else
                    kp_idx + (inlier<<20).
      out_big [18N] — fetched only on keyframe frames:
        [0:10N]     frame_pack f32 [N,10] — uv, octave, angle, depth,
                    u_right, valid, xyz_cam (the keyframe-insertion bundle).
        [10N:18N]   desc u32 [N,8].
    Decode on host with unpack_track_small() / unpack_track_big().
    """
    from ..geometry.lie import se3_compose, se3_inverse

    vel = se3_compose(T_prev, se3_inverse(T_prev2))
    T_pred = jnp.where(has_vel, se3_compose(vel, T_prev), T_prev)
    # no motion prior: double the window (covers fast inter-frame motion
    # right after init / relocalization)
    radius1 = jnp.where(has_vel, radius_motion, 2.0 * radius_motion)
    gray = frame_gray.astype(jnp.float32)
    depth = frame_depth.astype(jnp.float32)
    if jnp.issubdtype(frame_depth.dtype, jnp.integer):
        depth = depth / depth_factor
    pt_pos = pt_pack[:, 0:3]
    pt_normal = pt_pack[:, 3:6]
    pt_mind = pt_pack[:, 6]
    pt_maxd = pt_pack[:, 7]
    pt_valid = pt_pack[:, 8] > 0.5
    pt_bits = unpack_bits(pt_desc)
    frame = build_frame(gray, depth, spec, intr, n_features=n_features,
                        th_high=th_high, th_low=th_low)
    # coarse stage: short LM schedule (it only seeds the tight stage; the
    # reference's full 4x10 schedule belongs to the final optimization)
    opt1, _, _ = _match_and_optimize(
        T_pred, pt_pos, pt_normal, pt_mind, pt_maxd, pt_bits, pt_valid,
        frame, radius1, TH_HIGH, intr, n_rounds=2, n_iters=5,
    )
    # window-free global descriptor fallback (the reference's
    # TrackReferenceKeyFrame role): when the constant-velocity window
    # misses — fast/jerky motion, post-anomaly re-priming — the sync path
    # recovers through its global match, but the fused path previously had
    # no equivalent and re-anomalied forever on fast sequences (every frame
    # then paid the robust-fallback price).  Gated with lax.cond on the
    # motion seed's strength: on ordinary frames (strong seed) the branch is
    # skipped entirely — the fallback's LM loop was the single most
    # expensive piece of the fused program (a cold-seed optimization never
    # early-exits), and round 3 paid it unconditionally (~16% fps,
    # VERDICT r3 weak #1).  As a SEED it also only needs a short 2x5
    # schedule — the tight stage below does the reference's full 4x10.
    def _fallback(_):
        res_fb = match_descriptors(
            pt_bits, frame.bits, pt_valid, frame.valid,
            max_dist=TH_LOW, ratio=0.85, check_rotation=False,
        )
        kp_fb = jnp.maximum(res_fb.idx, 0)
        opt_fb = _compact_pose_opt(
            T_prev, pt_pos, frame.uv[kp_fb],
            jnp.where(res_fb.valid, frame.u_right[kp_fb], -1.0),
            octave_inv_sigma2(frame.octave[kp_fb]),
            res_fb.valid, frame.uv.shape[0], intr, 2, 5,
        )
        return opt_fb.T_cw, opt_fb.n_inliers

    def _no_fallback(_):
        return T_prev, jnp.int32(-1)

    T_fb, n_fb = jax.lax.cond(
        opt1.n_inliers < FALLBACK_SEED_GATE, _fallback, _no_fallback, None
    )
    use_mm = opt1.n_inliers >= n_fb
    T_seed = jnp.where(use_mm, opt1.T_cw, T_fb)
    n_seed = jnp.maximum(opt1.n_inliers, n_fb)
    opt2, match_idx, matched = _match_and_optimize(
        T_seed, pt_pos, pt_normal, pt_mind, pt_maxd, pt_bits, pt_valid,
        frame, radius2, TH_HIGH, intr, n_rounds=4, n_iters=10,
    )
    if use_planes:
        # --- SP-SLAM tracking plane refinement ([SP], src/Tracking.cc):
        # segment frame planes from the (possibly subsampled) depth,
        # associate against the local map-plane snapshot at the point-stage
        # pose, and jointly re-optimize the pose with plane-to-plane edges.
        from ..geometry.plane import transform_plane
        from ..ops.plane_seg import segment_planes

        s = frame_gray.shape[0] // depth.shape[0]
        intr_d = intr._replace(
            fx=intr.fx / s, fy=intr.fy / s, cx=intr.cx / s,
            cy=intr.cy / s, width=intr.width // s, height=intr.height // s,
        ) if s > 1 else intr
        fp = segment_planes(depth, intr_d)
        pl_w = pl_pack[:, 0:4]
        pl_wvalid = pl_pack[:, 4] > 0.5
        pi_pred = transform_plane(opt2.T_cw, pl_w)           # [L,4]
        cos = jnp.einsum("li,ki->lk", pi_pred[:, :3], fp.coef[:, :3])
        sgn = jnp.where(cos >= 0, 1.0, -1.0)                 # [L,K]
        dd = jnp.abs(pi_pred[:, 3:4] - sgn * fp.coef[None, :, 3])
        okm = (
            pl_wvalid[:, None]
            & fp.valid[None, :]
            & (fp.n_inliers[None, :] >= plane_min_support)
            & (jnp.abs(cos) > plane_assoc_cos)
            & (dd < plane_assoc_dist)
        )
        score = jnp.where(okm, jnp.abs(cos), -1.0)
        best = jnp.argmax(score, axis=1)                     # [L]
        has_match = jnp.take_along_axis(score, best[:, None], 1)[:, 0] > 0
        obs = (
            fp.coef[best]
            * jnp.take_along_axis(sgn, best[:, None], 1)
        )                                                     # aligned [L,4]
        kp_j = jnp.maximum(match_idx, 0)
        # information proportional to the observed plane's pixel support
        # (a 20k-pixel wall fit is far more certain than a 1k-pixel sliver;
        # 1000 px at the stride-2 upload resolution = the nominal support)
        sup = fp.n_inliers[best].astype(jnp.float32)
        pl_info_vec = plane_info * jnp.clip(sup / 1000.0, 0.5, 8.0)
        opt2 = _compact_joint_opt(
            opt2.T_cw, pt_pos, frame.uv[kp_j],
            jnp.where(matched, frame.u_right[kp_j], -1.0),
            octave_inv_sigma2(frame.octave[kp_j]), matched,
            pl_w, obs, has_match, pl_info_vec,
            frame.uv.shape[0], intr, 2, 5,
        )
    kp_idx = jnp.maximum(match_idx, 0)
    kp_depth = frame.depth[kp_idx]
    close = (kp_depth > 1e-3) & (kp_depth < th_depth)
    n_close_tracked = jnp.sum((opt2.inliers & close).astype(jnp.int32))
    close_avail = jnp.sum(
        (frame.valid & (frame.depth > 1e-3) & (frame.depth < th_depth)).astype(jnp.int32)
    )
    scal = jnp.concatenate([
        opt2.T_cw,
        jnp.stack([
            n_seed.astype(jnp.float32),
            opt2.n_inliers.astype(jnp.float32),
            n_close_tracked.astype(jnp.float32),
            close_avail.astype(jnp.float32),
            n_fb.astype(jnp.float32),
        ]),
    ])
    match_pack = jnp.where(
        matched,
        jnp.maximum(match_idx, 0) + jnp.where(opt2.inliers, 1 << 20, 0),
        -1,
    ).astype(jnp.int32)
    out_small = jnp.concatenate([
        jax.lax.bitcast_convert_type(scal, jnp.uint32),
        jax.lax.bitcast_convert_type(match_pack, jnp.uint32),
    ])
    # compact keyframe-insertion bundle, 10N words (~40 KB at N=1024):
    #   w0 = uv quantized to 1/16 px (u16 | u16)
    #   w1 = raw depth u16 | (octave + valid bit) u8 | angle/256 u8
    #   desc 8N — u_right and xyz_cam are RECOMPUTED on host from uv+depth
    # (the old raw f32 pack was 72 KB; every KB rides the ~47 MB/s tunnel
    # wire per frame since the copy starts at dispatch)
    w0 = (
        jnp.clip(jnp.round(frame.uv[:, 0] * 16.0), 0, 65535).astype(jnp.uint32)
        | (jnp.clip(jnp.round(frame.uv[:, 1] * 16.0), 0, 65535).astype(jnp.uint32) << 16)
    )
    two_pi = 2.0 * jnp.pi
    ang_b = jnp.round((frame.angle % two_pi) / two_pi * 256.0).astype(jnp.uint32) % 256
    oct_b = (
        (frame.octave.astype(jnp.uint32) & 0x7F)
        | jnp.where(frame.valid, jnp.uint32(0x80), jnp.uint32(0))
    )
    w1 = (
        jnp.clip(jnp.round(frame.depth * depth_factor), 0, 65535).astype(jnp.uint32)
        | (oct_b << 16)
        | (ang_b << 24)
    )
    out_big = jnp.concatenate([w0, w1, frame.desc.reshape(-1)])
    return frame, out_small, out_big


# global-fallback seed gate: the window-free fallback branch only runs when
# the motion-model stage tracked fewer inliers than this (traced into the
# compiled step at first call)
FALLBACK_SEED_GATE = 60

# deferred map-point statistics are applied at keyframe churn or after this
# many ordinary frames, whichever comes first
STATS_FLUSH_FRAMES = 8


def unpack_track_small(buf: np.ndarray, n_local: int):
    """Host-side decode of track_frame_step's per-frame small buffer:
    returns (scal f32[12], match_pack i32[PL])."""
    assert buf.size == 12 + n_local, (
        f"track_frame_step small-output layout mismatch: buffer has "
        f"{buf.size} words, expected 12 + {n_local}"
    )
    scal = buf[:12].view(np.float32)
    mp = buf[12:12 + n_local].view(np.int32)
    return scal, mp


def unpack_track_big(buf: np.ndarray, n_kp: int, intr: Intrinsics,
                     depth_factor: float) -> dict:
    """Host-side decode of the compact keyframe bundle (see track_frame_step)
    into the keyframe-insertion dict; u_right and xyz_cam are recomputed
    from the dequantized uv + depth (uR = u - bf/z; pinhole unprojection —
    quantization error is ~0.06 px / 0.2 mm, below sensor noise)."""
    assert buf.size == 10 * n_kp, (
        f"track_frame_step big-output layout mismatch: buffer has "
        f"{buf.size} words, expected 10*{n_kp}"
    )
    w0 = buf[:n_kp]
    w1 = buf[n_kp : 2 * n_kp]
    desc = buf[2 * n_kp :].reshape(n_kp, 8)
    u = (w0 & 0xFFFF).astype(np.float32) / 16.0
    v = (w0 >> 16).astype(np.float32) / 16.0
    depth = (w1 & 0xFFFF).astype(np.float32) / depth_factor
    octave = ((w1 >> 16) & 0x7F).astype(np.int32)
    valid = ((w1 >> 16) & 0x80) > 0
    angle = ((w1 >> 24) & 0xFF).astype(np.float32) * (2.0 * np.pi / 256.0)
    has_d = depth > 1e-6
    ur = np.where(has_d, u - intr.bf / np.maximum(depth, 1e-6), -1.0).astype(np.float32)
    x = (u - intr.cx) / intr.fx * depth
    y = (v - intr.cy) / intr.fy * depth
    return dict(
        uv=np.stack([u, v], -1),
        octave=octave,
        angle=angle,
        depth=depth,
        u_right=ur,
        valid=valid,
        xyz_cam=np.stack([x, y, depth], -1).astype(np.float32),
        desc=desc,
    )


@jax.jit
def _pack_frame(frame: FrameData):
    """Pack the host-needed FrameData fields into one [N, 10] f32 matrix
    (+ the u32 descriptors) so a keyframe download is 2 transfers, not 8."""
    packed = jnp.concatenate(
        [
            frame.uv,
            frame.octave.astype(jnp.float32)[:, None],
            frame.angle[:, None],
            frame.depth[:, None],
            frame.u_right[:, None],
            frame.valid.astype(jnp.float32)[:, None],
            frame.xyz_cam,
        ],
        axis=-1,
    )
    return packed, frame.desc


class Tracker:
    def __init__(self, cfg: TrackerConfig, intr: Intrinsics, store: MapStore):
        self.cfg = cfg
        self.intr = intr
        self.store = store
        self.spec = PyramidSpec(
            n_levels=cfg.n_levels,
            scale_factor=cfg.scale_factor,
            height=intr.height,
            width=intr.width,
        )
        self.state = TrackState.NOT_INITIALIZED
        self.T_cw = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        self.velocity: Optional[np.ndarray] = None
        self.ref_kf: int = -1
        self.last_kf: int = -1
        self.frames_since_kf = 0
        self.frame_id = 0
        self.last_inliers = 0
        # last-frame cache for temporal matching
        self._last_point_ids: Optional[np.ndarray] = None  # [PL] map point ids
        self.metrics = []
        # optional relocalization hook (set by System when loop closing is
        # on: provides the BoW keyframe database — reference: Tracking::
        # Relocalization via KeyFrameDatabase + PnPsolver, SURVEY §2 #13/#15)
        self.relocalizer = None
        self._reloc_key = None
        # mapper queue probe (set by System in async mode): the reference's
        # Tracking::NeedNewKeyFrame gates ordinary insertion on
        # bLocalMappingIdle and, for RGB-D, still inserts while busy as long
        # as the mapping queue is short (<3) — keyframe rate adapts to
        # mapping throughput
        self.mapper_queue_fn = None
        # pipelined-tracking state (process_pipelined): up to `pipeline_depth`
        # in-flight dispatched frames (device compute + async D2H copies of
        # frame N overlap the host bookkeeping of frames N-1, N-2)
        self.pipeline_depth = cfg.pipeline_depth
        self._pending: list[dict] = []
        self._chain = None                         # (T_N, T_{N-1}) device poses
        self._hv_cache = None                      # cached device (False, True)
        self.jump_gate_t = cfg.jump_gate_t
        self.jump_gate_r = cfg.jump_gate_r
        # raw-depth divisor, applied ON DEVICE when integer depth is fed
        # (float inputs are already meters); System overrides from YAML
        self.depth_factor = 5000.0
        # tracking-level plane refinement (set by System when use_planes):
        # compiles the plane-segmentation + joint-LM branch into the fused
        # step and snapshots the top-PLANE_CAP map planes alongside points
        self.use_planes = False
        import threading

        self._pose_corrected = threading.Event()   # set by loop-closure merge
        # per-section host-time accounting (tools/profile_host.py): None =
        # zero-overhead off; a dict turns on per-frame section timing
        self.perf: Optional[dict] = None
        # ref_tracked only changes at topology churn; cached by
        # (ref_kf, topo_version) — re-deriving it from the full per-point
        # observation tables EVERY frame was a measured host-side sink
        self._ref_tracked_cache = None
        # deferred map-point statistic updates: (ids_seen, ids_found) per
        # frame, applied in one locked batch at keyframe churn / every
        # STATS_FLUSH_FRAMES (the per-frame lock+scatter was host-side cost
        # on the critical path; culling reads these stats only at keyframe
        # cadence, so a few frames of staleness is invisible)
        self._stat_batch: list[tuple[np.ndarray, np.ndarray]] = []

    def _pt(self, key: str, t0: float) -> float:
        """Perf-section accounting helper (no-op unless self.perf is set)."""
        t1 = time.perf_counter()
        self.perf[key] = self.perf.get(key, 0.0) + (t1 - t0)
        return t1

    def _flush_stats(self):
        """Apply the deferred per-frame map-point statistics in one locked
        batch (np.add.at: point ids repeat across frames)."""
        if not self._stat_batch:
            return
        batch, self._stat_batch = self._stat_batch, []
        mp = np.concatenate([b[0] for b in batch])
        mids = np.concatenate([b[1] for b in batch])
        seen = mids[mp >= 0]
        seen = seen[seen >= 0]
        found = mids[mp >= (1 << 20)]
        found = found[found >= 0]
        # under the lock: capacity growth swaps the stat arrays, and an
        # unlocked in-place add could land on the orphaned pre-growth array
        with self.store.lock:
            np.add.at(self.store.pt_visible, seen, 1)
            np.add.at(self.store.pt_found, found, 1)

    def external_pose_correction(self, T_cw: np.ndarray):
        """Called (possibly from the mapping thread) when loop closure or BA
        rewrote the current pose: resets the device prediction chain."""
        self.T_cw = np.asarray(T_cw, np.float32).copy()
        self.velocity = None
        self._pose_corrected.set()

    # -----------------------------------------------------------------
    def process(self, gray: np.ndarray, depth: np.ndarray, ts: float):
        """Track one RGB-D frame; returns (T_cw [7] np, state)."""
        depth_j = jnp.asarray(depth)
        if jnp.issubdtype(depth_j.dtype, jnp.integer):
            depth_j = depth_j.astype(jnp.float32) / self.depth_factor
        frame = build_frame(
            jnp.asarray(gray).astype(jnp.float32), depth_j, self.spec, self.intr,
            n_features=self.cfg.n_features,
            th_high=self.cfg.th_fast_high, th_low=self.cfg.th_fast_low,
        )
        if self.state == TrackState.NOT_INITIALIZED:
            self._initialize(frame, ts)
        else:
            self._track(frame, ts)
        self.frame_id += 1
        return self.T_cw.copy(), self.state

    def _upload_frame(self, gray: np.ndarray, depth: np.ndarray):
        """Upload gray as uint8 + depth as uint16 raw units (900 KB total).

        Tunnel BANDWIDTH is a real cost (~2.4 MB of raw f32 measured ~20 ms
        slower per frame than the 0.9 MB compact pair), so quantizing on
        host wins; the u8-PACKING into one [3,H,W] buffer from round 3 is
        gone though — per-buffer overhead is flush-amortized, so two
        uploads cost the same and skip a 900 KB host stack copy."""
        g = gray if gray.dtype == np.uint8 else np.clip(gray, 0, 255).astype(np.uint8)
        d = (
            depth
            if depth.dtype == np.uint16
            else np.clip(depth * self.depth_factor, 0, 65535).astype(np.uint16)
        )
        s = self.cfg.depth_upload_stride
        if s > 1:
            d = np.ascontiguousarray(d[::s, ::s])
        return jnp.asarray(g), jnp.asarray(d)

    def _dispatch(self, gray: np.ndarray, depth: np.ndarray, ts: float) -> dict:
        """Launch the fused device step for one frame (async, no sync).

        The pose-prediction chain lives on DEVICE: T_prev/T_prev2 are the
        un-fetched output poses of the previous dispatches, so back-to-back
        dispatches never wait on a host round trip.  After a chain reset
        (init, relocalization, loop correction) the chain is rebuilt from
        the host pose/velocity.  Device->host copies of all outputs start
        immediately (async); _resolve reads them 1-2 frames later without
        paying the tunnel round trip.
        """
        cfg = self.cfg
        perf = self.perf
        if perf is not None:
            t = time.perf_counter()
        gray_j, depth_j = self._upload_frame(gray, depth)
        if perf is not None:
            t = self._pt("upload", t)
        ids, pack, desc, pl_pack = self._local_snapshot()
        if perf is not None:
            t = self._pt("snapshot", t)
        if self._pose_corrected.is_set():
            self._chain = None
            self._pose_corrected.clear()
        if self._chain is not None:
            T_prev, T_prev2, has_vel = self._chain[0], self._chain[1], True
        elif self.velocity is not None:
            # re-priming the device chain from host state: self.T_cw is the
            # pose of the last RESOLVED frame, which is len(_pending) frames
            # behind the frame being dispatched — advance the constant-
            # velocity model over the in-flight gap, else the prediction is
            # ~2 frames stale and fast sequences re-anomaly forever (the
            # fused path then never re-establishes and every frame pays the
            # robust fallback)
            Tp = self.T_cw
            for _ in range(len(self._pending)):
                Tp = np_lie.se3_compose(self.velocity, Tp)
            T_prev = jnp.asarray(Tp)
            T_prev2 = jnp.asarray(
                np_lie.se3_compose(np_lie.se3_inverse(self.velocity), Tp)
            )
            has_vel = True
        else:
            T_prev = T_prev2 = jnp.asarray(self.T_cw)
            has_vel = False
        # a FRESH jnp.asarray(bool) per frame costs ~10 ms of tunnel time
        # (measured, tools/profile_ab.py) — reuse two cached device scalars
        if self._hv_cache is None:
            self._hv_cache = (jnp.asarray(False), jnp.asarray(True))
        frame, out_small, out_big = track_frame_step(
            gray_j, depth_j, T_prev, T_prev2, self._hv_cache[int(has_vel)],
            pack, desc, pl_pack,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            self.spec, self.intr, cfg.n_features,
            cfg.th_fast_high, cfg.th_fast_low,
            depth_factor=self.depth_factor,
            use_planes=self.use_planes,
            plane_info=cfg.plane_info,
            plane_assoc_cos=cfg.plane_assoc_cos,
            plane_assoc_dist=cfg.plane_assoc_dist,
            plane_min_support=cfg.plane_min_support,
        )
        T_new = jax.lax.bitcast_convert_type(out_small[0:7], jnp.float32)
        # both output copies start now.  The keyframe bundle (~100 KB) used
        # to stay on device until _resolve decided the frame was a keyframe,
        # but a cold fetch there blocks on the full tunnel round trip behind
        # the queued uploads (~30 ms per keyframe measured,
        # tools/profile_host.py); starting it async here costs ~100 KB of
        # D2H wire per frame and takes the fetch off the critical path
        out_small.copy_to_host_async()
        out_big.copy_to_host_async()
        self._chain = (T_new, T_prev)  # (T_N device, T_{N-1} device)
        if perf is not None:
            self._pt("dispatch", t)
        p = dict(frame=frame, out=out_small, out_big=out_big, ids=ids, ts=ts,
                 gray=gray, depth=depth, frame_id=self.frame_id,
                 force_robust=False)
        self.frame_id += 1
        return p

    def _resolve(self, p: dict) -> "FrameRecord":
        """Host-process one dispatched frame whose async D2H copies have had
        1-2 frames to land: pose/velocity update, map-point statistics,
        keyframe decision/insertion.  Falls back to the robust multi-step
        path on tracking anomalies."""
        cfg = self.cfg
        frame = p["frame"]
        prev_kf = self.last_kf
        # run host logic under the resolved frame's id (dispatches may have
        # advanced self.frame_id past it); restore afterwards
        fid_after = self.frame_id
        self.frame_id = p["frame_id"]
        if p["force_robust"]:
            # an earlier frame failed AFTER this one was dispatched with a
            # bad prediction chain; the built FrameData is still valid, so
            # rerun matching+optimization robustly from the corrected pose
            self._chain = None
            self._track(frame, p["ts"])
            self.frame_id = fid_after
            return FrameRecord(
                ts=p["ts"], T=self.T_cw.copy(), state=self.state,
                ref_kf=self.ref_kf,
                new_kf=self.last_kf if self.last_kf != prev_kf else -1,
                gray=p["gray"], depth=p["depth"],
            )
        perf = self.perf
        if perf is not None:
            t = time.perf_counter()
        buf = np.asarray(p["out"])
        if perf is not None:
            t = self._pt("wait_small", t)
        scal, mp = unpack_track_small(buf, cfg.local_points_cap)
        T_new = scal[0:7]
        n1, n2 = int(scal[7]), int(scal[8])
        n_close_tracked, close_avail = int(scal[9]), int(scal[10])
        # pose-jump gate: the fused step's window-free global fallback can
        # snap to an aliased wrong pose with a self-consistent inlier set
        # (repetitive texture).  A result that deviates wildly from the
        # constant-velocity prediction is treated as an anomaly and the
        # frame replays through the robust sync path (whose narrow-window
        # design cannot jump).  Skipped when there is no velocity prior
        # (post-init / post-reloc / post-loop-correction, where a large
        # correction is legitimate).
        jumped = False
        if self.velocity is not None:
            T_pred_h = np_lie.se3_compose(self.velocity, self.T_cw)
            dT = np_lie.se3_compose(T_new, np_lie.se3_inverse(T_pred_h))
            jump_t = float(np.linalg.norm(dT[4:7]))
            jump_r = 2.0 * float(np.arccos(np.clip(abs(dT[0]), 0.0, 1.0)))
            jumped = jump_t > self.jump_gate_t or jump_r > self.jump_gate_r
        if jumped or n1 < cfg.min_inliers_motion or n2 < cfg.kf_min_inliers:
            # rare anomaly: rerun the robust path on the already-built frame;
            # frames dispatched after this one used its bad output pose
            for q in self._pending:
                q["force_robust"] = True
            self._chain = None
            self._track(frame, p["ts"])
            self.frame_id = fid_after
            return FrameRecord(
                ts=p["ts"], T=self.T_cw.copy(), state=self.state,
                ref_kf=self.ref_kf,
                new_kf=self.last_kf if self.last_kf != prev_kf else -1,
                gray=p["gray"], depth=p["depth"],
            )

        self.velocity = np_lie.se3_compose(T_new, np_lie.se3_inverse(self.T_cw))
        self.T_cw = np.asarray(T_new)
        self.state = TrackState.OK
        self.frames_since_kf += 1
        n2_prev = self.last_inliers
        self.last_inliers = n2

        # map-point visible/found statistics are DEFERRED: append the raw
        # match table and apply in one locked batch at keyframe churn or
        # every STATS_FLUSH_FRAMES — the per-frame mask + lock + scatter was
        # measurable host time on the critical path, and culling (the only
        # consumer) runs at keyframe cadence anyway
        mids = np.asarray(p["ids"])
        self._stat_batch.append((mp, mids))
        if perf is not None:
            t = self._pt("decode", t)

        need_kf = self._need_new_kf(n2, n_close_tracked, close_avail,
                                    n2_prev=n2_prev)
        if perf is not None:
            t = self._pt("need_kf", t)
        if need_kf:
            self._flush_stats()
            matched = mp >= 0
            match_idx = np.where(matched, mp & ((1 << 20) - 1), -1)
            inl = mp >= (1 << 20)
            frame_np = unpack_track_big(
                np.asarray(p["out_big"]), cfg.n_features, self.intr,
                self.depth_factor,
            )
            if perf is not None:
                t = self._pt("kf_fetch", t)
            kf = self._insert_keyframe(
                frame, p["ts"],
                matches_pt_ids=np.where(inl, mids, -1),
                match_kp_idx=match_idx,
                frame_np=frame_np,
            )
            self.ref_kf = kf
            self.last_kf = kf
            self.frames_since_kf = 0
            if perf is not None:
                t = self._pt("kf_insert", t)
        elif len(self._stat_batch) >= STATS_FLUSH_FRAMES:
            self._flush_stats()
            if perf is not None:
                t = self._pt("stats_flush", t)
        self.metrics.append(
            dict(frame=p["frame_id"], state="OK", inliers=n2, kf=int(need_kf))
        )
        if perf is not None:
            self.perf["n_frames"] = self.perf.get("n_frames", 0) + 1
        self.frame_id = fid_after
        return FrameRecord(
            ts=p["ts"], T=self.T_cw.copy(), state=self.state,
            ref_kf=self.ref_kf,
            new_kf=self.last_kf if need_kf else -1,
            gray=p["gray"], depth=p["depth"],
        )

    def process_pipelined(self, gray: np.ndarray, depth: np.ndarray, ts: float):
        """Pipelined tracking (depth = self.pipeline_depth): dispatch frame
        N, then resolve frame N-depth, whose device compute AND async D2H
        copies overlapped the intervening host work — the ~24 ms tunnel
        round trip never lands on the frame critical path.

        Returns a list of FrameRecord for frames that RESOLVED during this
        call (usually one, `depth` calls behind; the rest arrive at
        flush_pipeline()).  Frame order is preserved.
        """
        records = []
        if self.state in (TrackState.NOT_INITIALIZED, TrackState.LOST):
            # synchronous path until tracking is healthy
            records.extend(self.flush_pipeline())
            if self.state in (TrackState.NOT_INITIALIZED, TrackState.LOST):
                prev_kf = self.last_kf
                T, state = self.process(gray, depth, ts)
                self._chain = None
                records.append(FrameRecord(
                    ts=ts, T=T, state=state, ref_kf=self.ref_kf,
                    new_kf=self.last_kf if self.last_kf != prev_kf else -1,
                    gray=gray, depth=depth,
                ))
                return records
        self._pending.append(self._dispatch(gray, depth, ts))
        while len(self._pending) > self.pipeline_depth:
            records.append(self._resolve(self._pending.pop(0)))
        return records

    def flush_pipeline(self):
        """Resolve all in-flight frames (call before reading final state)."""
        records = []
        while self._pending:
            records.append(self._resolve(self._pending.pop(0)))
        self._flush_stats()
        return records

    # -----------------------------------------------------------------
    def _initialize(self, frame: FrameData, ts: float):
        n_depth = int(jnp.sum(frame.has_depth))
        if n_depth < 100:
            return  # wait for a frame with enough depth
        self.T_cw = np.array([1, 0, 0, 0, 0, 0, 0], np.float32)
        # reference StereoInitialization: a map point for EVERY depth-backed
        # keypoint, not just the close-point budget
        kf = self._insert_keyframe(
            frame, ts, matches_pt_ids=None, match_kp_idx=None, unlimited=True
        )
        self.ref_kf = kf
        self.last_kf = kf
        self.state = TrackState.OK
        self.frames_since_kf = 0
        self.last_inliers = n_depth

    # -----------------------------------------------------------------
    def _local_snapshot(self):
        """Padded device snapshot of the local map around ref_kf.

        Two-level cache: the expensive part (covisibility + local point-set
        selection) only depends on map TOPOLOGY (store.topo_version), which
        changes at keyframe/point/observation churn; BA and pose-graph
        write-backs only rewrite VALUES (store.version), for which the same
        rows are simply re-gathered and re-uploaded (~4x cheaper — the
        mapper writes back after every keyframe, and a full rebuild per
        write-back cost ~9 ms/frame on chip)."""
        st = self.store
        key_topo = (st.topo_version, self.ref_kf)
        key_val = st.version
        cached = getattr(self, "_snapshot_cache", None)
        if cached is not None and cached[0] == key_topo:
            if cached[1] == key_val:
                return cached[2]
            with st.lock:
                ids = cached[2][0]
                snap = (ids, *self._snapshot_gather(ids, desc_cached=cached[2][2]))
                # version read INSIDE the locked gather: a writer bumping it
                # between gather and tag would otherwise be masked and the
                # cache would serve stale values as current
                ver = st.version
            self._snapshot_cache = (key_topo, ver, snap)
            return snap
        with st.lock:
            snap = self._local_snapshot_build()
            self._snapshot_cache = (key_topo, st.version, snap)
        return snap

    def refresh_snapshot_values(self):
        """Refresh the local-map snapshot cache from the CURRENT store state.

        Called from the MAPPER thread right after a BA write-back (tracking/
        pipeline.py): the producer of the version bump pays the re-gather +
        upload instead of the tracker's next _dispatch — the ~5 ms/frame the
        gather cost on the tracking critical path (tools/profile_host.py)
        moves into the mapper's idle gaps.  Races are benign: the cache
        tuple is replaced atomically, and a concurrent ref_kf/topology move
        in the tracker just makes this refresh a no-op for it."""
        st = self.store
        cached = getattr(self, "_snapshot_cache", None)
        if cached is None:
            return
        key_topo = (st.topo_version, self.ref_kf)
        if cached[0] != key_topo:
            with st.lock:
                key_topo = (st.topo_version, self.ref_kf)
                snap = self._local_snapshot_build()
                self._snapshot_cache = (key_topo, st.version, snap)
            return
        if cached[1] == st.version:
            return
        with st.lock:
            ids = cached[2][0]
            snap = (ids, *self._snapshot_gather(ids, desc_cached=cached[2][2]))
            ver = st.version
        self._snapshot_cache = (key_topo, ver, snap)

    def _snapshot_gather(self, ids: np.ndarray, desc_cached=None):
        """Re-gather + upload pack/desc (+ plane pack) for an already-
        selected id set.

        desc_cached: pass the previous DEVICE descriptor buffer on a
        value-only refresh to skip its 131 KB re-upload — descriptors for a
        fixed id set only change through the distinctive-descriptor refresh,
        and serving those a few frames stale is invisible to matching while
        the wire bytes are not (~47 MB/s tunnel); a topology change still
        re-uploads fresh descriptors."""
        st = self.store
        sel = np.maximum(ids, 0)
        # one packed f32 upload (pos | normal | min_dist | max_dist | valid)
        # + desc: 2 transfers instead of 7 (tunnel latency is per-buffer)
        pack_np = np.concatenate(
            [
                st.pt_pos[sel],
                st.pt_normal[sel],
                st.pt_min_dist[sel][:, None],
                st.pt_max_dist[sel][:, None],
                ((ids >= 0) & st.pt_valid[sel]).astype(np.float32)[:, None],
            ],
            axis=-1,
        ).astype(np.float32)
        # local map-PLANE snapshot (world coef | valid), top-PLANE_CAP by
        # support — fixed shape regardless of store growth; ~1.3 KB upload
        pl_np = np.zeros((PLANE_CAP, 5), np.float32)
        if self.use_planes:
            pls = np.nonzero(st.pl_valid)[0]
            if len(pls) > PLANE_CAP:
                pls = pls[np.argsort(-st.pl_n_pts[pls], kind="stable")[:PLANE_CAP]]
            pl_np[: len(pls), 0:4] = st.pl_coef[pls]
            pl_np[: len(pls), 4] = 1.0
        desc = (
            desc_cached if desc_cached is not None
            else jnp.asarray(st.pt_desc[sel])
        )
        return jnp.asarray(pack_np), desc, jnp.asarray(pl_np)

    def _local_snapshot_build(self):
        st = self.store
        kfs = st.local_keyframes(self.ref_kf, min_weight=5)
        pts = st.local_points(kfs)
        cap = self.cfg.local_points_cap
        if len(pts) > cap:
            # keep points seen by the NEWEST keyframes first: fresh points
            # must stay matchable (else they starve and get culled as the
            # view moves into new territory), old stable points fill the rest
            newest_obs = st.pt_obs_kf[pts].max(axis=1)
            order = np.argsort(-(newest_obs.astype(np.int64) * 64 + np.minimum(st.pt_n_obs[pts], 63)), kind="stable")
            pts = pts[order[:cap]]
        pad = cap - len(pts)
        ids = np.concatenate([pts, np.full(pad, -1, np.int32)])
        return (ids, *self._snapshot_gather(ids))

    def _track(self, frame: FrameData, ts: float):
        cfg = self.cfg
        ids, pack, desc, _pl = self._local_snapshot()
        pos, normal = pack[:, 0:3], pack[:, 3:6]
        mind, maxd = pack[:, 6], pack[:, 7]
        valid = pack[:, 8] > 0.5
        bits = unpack_bits(desc)

        # --- step 1: motion model (or last pose) coarse alignment ---------
        if self.velocity is not None:
            T_pred = np_lie.se3_compose(self.velocity, self.T_cw)
            radius1 = cfg.motion_search_radius
        else:
            # no motion prior: double the window (covers fast inter-frame
            # motion right after init / relocalization)
            T_pred = self.T_cw
            radius1 = 2.0 * cfg.motion_search_radius
        opt, _, _ = _match_and_optimize(
            jnp.asarray(T_pred), pos, normal, mind, maxd, bits, valid,
            frame, radius1, TH_HIGH, self.intr,
        )
        n1 = int(opt.n_inliers)
        if n1 >= cfg.min_inliers_motion:
            T_cur = opt.T_cw
        else:
            # --- fallback: global descriptor match against local map ------
            res = match_descriptors(
                bits, frame.bits, valid, frame.valid,
                max_dist=TH_LOW, ratio=0.85, check_rotation=False,
            )
            kp_idx = jnp.maximum(res.idx, 0)
            opt_fb = _compact_pose_opt(
                jnp.asarray(self.T_cw), pos, frame.uv[kp_idx],
                jnp.where(res.valid, frame.u_right[kp_idx], -1.0),
                octave_inv_sigma2(frame.octave[kp_idx]),
                res.valid, cfg.n_features, self.intr, 4, 10,
            )
            if int(opt_fb.n_inliers) < cfg.kf_min_inliers:
                T_reloc = self._relocalize(frame)
                if T_reloc is None:
                    self.state = TrackState.LOST
                    self.velocity = None
                    self.metrics.append(
                        dict(frame=self.frame_id, state="LOST", inliers=0)
                    )
                    return
                T_cur = jnp.asarray(T_reloc)
            else:
                T_cur = opt_fb.T_cw

        # --- step 2: track local map (tight radius) -----------------------
        opt2, match_idx, matched = _match_and_optimize(
            T_cur, pos, normal, mind, maxd, bits, valid,
            frame, cfg.local_search_radius, TH_HIGH, self.intr,
        )
        n2 = int(opt2.n_inliers)
        if n2 < cfg.kf_min_inliers:
            self.state = TrackState.LOST
            self.velocity = None
            self.metrics.append(dict(frame=self.frame_id, state="LOST", inliers=n2))
            return

        T_new = np.asarray(opt2.T_cw)
        # velocity update (T_new * T_last^-1)
        self.velocity = np_lie.se3_compose(T_new, np_lie.se3_inverse(self.T_cw))
        self.T_cw = T_new
        self.state = TrackState.OK
        self.frames_since_kf += 1
        n2_prev = self.last_inliers
        self.last_inliers = n2

        # update found/visible stats (locked: growth swaps the arrays)
        inl = np.asarray(opt2.inliers)
        mids = np.asarray(ids)
        seen = mids[np.asarray(matched)]
        found = mids[inl]
        with self.store.lock:
            self.store.pt_visible[seen[seen >= 0]] += 1
            self.store.pt_found[found[found >= 0]] += 1

        # --- step 3: keyframe decision ------------------------------------
        frame_np = self._frame_to_np(frame)
        n_close_tracked = int(
            np.sum(
                (frame_np["depth"][np.asarray(match_idx)[inl]] > 0)
                & (frame_np["depth"][np.asarray(match_idx)[inl]] < cfg.th_depth)
            )
        )
        close_avail = int(
            np.sum(
                (frame_np["depth"] > 0)
                & (frame_np["depth"] < cfg.th_depth)
                & frame_np["valid"]
            )
        )
        need_kf = self._need_new_kf(n2, n_close_tracked, close_avail,
                                    n2_prev=n2_prev)
        if need_kf:
            kf = self._insert_keyframe(
                frame, ts,
                matches_pt_ids=np.where(inl, mids, -1),
                match_kp_idx=np.asarray(match_idx),
                frame_np=frame_np,
            )
            self.ref_kf = kf
            self.last_kf = kf
            self.frames_since_kf = 0
        self.metrics.append(
            dict(frame=self.frame_id, state="OK", inliers=n2, kf=int(need_kf))
        )

    # -----------------------------------------------------------------
    def _need_new_kf(self, n2: int, n_close_tracked: int, close_avail: int,
                     n2_prev: int | None = None) -> bool:
        """Reference Tracking::NeedNewKeyFrame semantics (RGB-D): compare the
        current inlier count against the reference KF's points tracked with
        at least nMinObs observations, where nMinObs relaxes to 2 while the
        map has <= 2 keyframes (otherwise no point can ever reach 3 obs and
        keyframe insertion deadlocks — the round-1 ATE regression)."""
        cfg = self.cfg
        st = self.store
        # ref_tracked depends only on the observation TOPOLOGY around the
        # reference keyframe — cache by (ref_kf, topo_version) instead of
        # re-deriving from the full per-point obs tables every frame (a
        # measured ~ms-class host sink at steady state)
        key = (self.ref_kf, st.topo_version)
        cached = self._ref_tracked_cache
        if cached is not None and cached[0] == key:
            ref_tracked = cached[1]
        else:
            min_obs = 3 if int(st.kf_valid.sum()) > 2 else 2
            ref_pts = st.kf_obs[self.ref_kf]
            ref_pts = ref_pts[ref_pts >= 0]
            # the reference's MapPoint::nObs counts stereo/RGB-D observations
            # DOUBLE (AddObservation: nObs += 2 when mvuRight >= 0), so a
            # depth-backed point reaches nObs=2 from its birth keyframe alone
            obs_kf = st.pt_obs_kf[ref_pts]      # [n, O]
            obs_slot = st.pt_obs_slot[ref_pts]  # [n, O]
            has = obs_kf >= 0
            stereo = has & (st.kf_ur[np.maximum(obs_kf, 0), np.maximum(obs_slot, 0)] >= 0)
            n_obs_w = (has.astype(np.int32) + stereo.astype(np.int32)).sum(axis=1)
            ref_tracked = int(np.sum(n_obs_w >= min_obs))
            self._ref_tracked_cache = (key, ref_tracked)
        need_close = (
            n_close_tracked < cfg.new_kf_close_points
            and close_avail - n_close_tracked > 70
        )
        # urgency: extrapolate the inlier decay over the frames already in
        # flight on the old local map (pipelined dispatches see a new
        # keyframe's points only pipeline_depth frames later)
        n2_proj = n2
        if n2_prev is not None and n2 < n2_prev:
            n2_proj = n2 + self.pipeline_depth * (n2 - n2_prev)
        urgent = n2_proj < cfg.kf_urgent_cover
        weak = n2 < 0.25 * ref_tracked
        queue_len = 0 if self.mapper_queue_fn is None else self.mapper_queue_fn()
        mapper_idle = queue_len == 0
        # reference gating: c1a (max interval) | c1b (min interval + mapper
        # idle) | c1c (weak tracking / urgent close points), all under c2;
        # for RGB-D the reference then inserts even while the mapper is busy
        # as long as its queue is short (InterruptBA + mlNewKeyFrames<3)
        c1a = self.frames_since_kf >= cfg.kf_max_interval
        c1b = self.frames_since_kf >= cfg.kf_min_interval and mapper_idle
        c1c = weak or need_close or urgent
        c2 = (
            (n2 < cfg.kf_tracked_ratio * ref_tracked or need_close)
            and n2 > cfg.kf_min_inliers
        )
        if not (c1a or ((c1b or c1c) and c2)):
            return False
        # urgent insertions (projected coverage collapse) go in even when
        # the mapping queue is deep — the reference InterruptBA()s and
        # inserts in the same situation; here KF insertion itself extends
        # the local map (the tracker creates the depth-backed points
        # inline), so dropping an urgent KF while the mapper is busy starves
        # tracking of map coverage exactly when the view is moving into new
        # territory (on-chip loop-lane failure mode: mapper stall -> queue
        # full -> no KFs -> inliers collapse -> LOST)
        return mapper_idle or queue_len < cfg.kf_queue_cap or c1a or urgent

    # -----------------------------------------------------------------
    def _relocalize(self, frame: FrameData):
        """Global relocalization against the keyframe database.

        Reference: Tracking::Relocalization — BoW candidate retrieval then
        EPnP+RANSAC pose hypotheses (PnPsolver.cc).  RGB-D both sides have
        depth, so 3D-3D Horn RANSAC (loop/sim3.py) replaces EPnP with the
        same role.  Returns T_cw or None.
        """
        if self.relocalizer is None:
            return None
        import jax

        from ..geometry.camera import unproject
        from ..loop.sim3 import ransac_align

        vocab, kfdb = self.relocalizer
        if not vocab.trained:
            return None
        st = self.store
        frame_np_desc = np.asarray(frame.desc)
        valid = np.asarray(frame.valid)
        bow = vocab.bow_vector(frame_np_desc[valid])
        cands = kfdb.query(bow, exclude=set(), min_score=0.01, max_results=5)
        if self._reloc_key is None:
            self._reloc_key = jax.random.PRNGKey(23)
        for cand, _score in cands:
            if not st.kf_valid[cand]:
                continue
            bits_b = unpack_bits(jnp.asarray(st.kf_desc[cand]))
            valid_b = jnp.asarray(st.kf_kp_valid[cand] & (st.kf_depth[cand] > 1e-3))
            res = match_descriptors(
                frame.bits, bits_b, frame.valid & frame.has_depth, valid_b,
                frame.angle, jnp.asarray(st.kf_angle[cand]),
                max_dist=64.0, ratio=0.85,
            )
            m = np.asarray(res.valid)
            if m.sum() < 20:
                continue
            idx = np.maximum(np.asarray(res.idx), 0)
            pb = unproject(
                self.intr,
                jnp.asarray(st.kf_uv[cand][idx]),
                jnp.asarray(st.kf_depth[cand][idx]),
            )
            self._reloc_key, sub = jax.random.split(self._reloc_key)
            align = ransac_align(frame.xyz_cam, pb, jnp.asarray(m), sub)
            if int(align.n_inliers) < 20:
                continue
            # x_cand = T_ba x_frame  =>  T_cw_frame = T_ba^{-1} . T_cw_cand
            T_cw = np_lie.se3_compose(
                np_lie.se3_inverse(np.asarray(align.T_ba)), st.kf_pose[cand]
            )
            self.ref_kf = int(cand)
            self.metrics.append(dict(frame=self.frame_id, state="RELOC", cand=int(cand)))
            return T_cw
        return None

    def _frame_to_np(self, frame: FrameData) -> dict:
        # two device->host transfers for the whole frame bundle: one packed
        # f32 matrix + the u32 descriptors (per-buffer transfer latency over
        # the device tunnel dominates, so fewer/larger buffers win)
        packed, desc = jax.device_get(_pack_frame(frame))
        return dict(
            uv=packed[:, 0:2],
            octave=packed[:, 2].astype(np.int32),
            angle=packed[:, 3],
            depth=packed[:, 4],
            u_right=packed[:, 5],
            valid=packed[:, 6] > 0.5,
            xyz_cam=packed[:, 7:10],
            desc=desc,
        )

    def _insert_keyframe(
        self, frame: FrameData, ts, matches_pt_ids, match_kp_idx, frame_np=None,
        unlimited: bool = False,
    ) -> int:
        """Create a keyframe: bind tracked points to kp slots, then create new
        map points from close-depth unmatched keypoints (reference:
        Tracking::CreateNewKeyFrame RGB-D path)."""
        st = self.store
        frame_np = frame_np or self._frame_to_np(frame)
        with st.lock:
            kf = st.add_keyframe(
                self.T_cw, ts, frame_np, self.frame_id, parent=self.ref_kf
            )

        taken = np.zeros(self.cfg.n_features, bool)
        if matches_pt_ids is not None:
            sel = (matches_pt_ids >= 0) & (match_kp_idx >= 0)
            kps = match_kp_idx[sel]
            pids = matches_pt_ids[sel]
            uniq, first = np.unique(kps, return_index=True)
            with st.lock:
                st.add_observations_bulk(pids[first], kf, uniq)
            taken[uniq] = True

        # new points from depth-backed unmatched keypoints, nearest first
        # (reference CreateNewKeyFrame: all close points + up to a budget of
        # far ones) — fully vectorized
        d = frame_np["depth"]
        cand = np.nonzero(
            frame_np["valid"] & ~taken & (d > 1e-3) & (d < self.cfg.th_depth * 2)
        )[0]
        order = cand[np.argsort(d[cand], kind="stable")]
        if not unlimited:
            n_close = int(np.sum(d[order] <= self.cfg.th_depth))
            n_keep = max(n_close, min(len(order), self.cfg.max_new_points_per_kf))
            order = order[:n_keep]
        if len(order):
            T_wc = np_lie.se3_inverse(self.T_cw)
            pos_w = np_lie.se3_apply(T_wc, frame_np["xyz_cam"][order])
            C = T_wc[4:7]
            vec = pos_w - C
            dist = np.linalg.norm(vec, axis=-1)
            normal = vec / np.maximum(dist[:, None], 1e-9)
            with st.lock:
                st.add_points_bulk(
                    pos_w, frame_np["desc"][order], normal, dist, kf, order,
                    octave=frame_np["octave"][order],
                )
        return kf
