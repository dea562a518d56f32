"""Joint point+plane motion-only pose optimization (SP-SLAM's tracking
plane edges — src/Tracking.cc plane association feeding plane-pose edges in
Optimizer::PoseOptimization, SURVEY.md §3.1 [SP]): with few/noisy points
(the low-texture regime) plane observations must carry the pose."""

import jax.numpy as jnp
import numpy as np

from spslam_tpu.geometry import Intrinsics, np_lie, project, se3_apply
from spslam_tpu.geometry.plane import transform_plane
from spslam_tpu.solver.pose_opt import pose_optimization, pose_optimization_joint

rng = np.random.default_rng(11)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                  width=640, height=480)


def _scene(n_pts=24, px_noise=1.5):
    T_true = np.array([0.9995, 0.02, -0.015, 0.01, 0.05, -0.03, 0.08], np.float32)
    T_true[:4] /= np.linalg.norm(T_true[:4])
    pts = np.stack([
        rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
        rng.uniform(3, 7, n_pts),
    ], -1).astype(np.float32)
    xc = np.asarray(se3_apply(jnp.asarray(T_true), jnp.asarray(pts)))
    uv = np.asarray(project(INTR, jnp.asarray(xc)))
    uv = (uv + rng.normal(0, px_noise, uv.shape)).astype(np.float32)
    ur = uv[:, 0] - INTR.bf / np.maximum(xc[:, 2], 1e-3)
    ur = (ur + rng.normal(0, px_noise, ur.shape)).astype(np.float32)
    # three orthogonal world planes observed exactly in the camera frame
    pl_w = np.array([
        [0, 0, 1, -8.0],
        [1, 0, 0, 2.5],
        [0, 1, 0, 1.8],
    ], np.float32)
    pl_c = np.asarray(transform_plane(jnp.asarray(T_true), jnp.asarray(pl_w)))
    return T_true, pts, uv, ur, pl_w, pl_c


def _pose_err(T, T_true):
    d = np_lie.se3_compose(np.asarray(T), np_lie.se3_inverse(T_true))
    return float(np.linalg.norm(d[4:7]) + 2 * np.arccos(np.clip(abs(d[0]), 0, 1)))


class TestJointPosePlaneOpt:
    def test_planes_improve_pose_with_weak_points(self):
        T_true, pts, uv, ur, pl_w, pl_c = _scene(n_pts=24, px_noise=2.0)
        T0 = T_true + np.array([0, 0, 0, 0, 0.04, -0.03, 0.05], np.float32)
        args = (
            jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(ur),
            jnp.ones(len(pts), jnp.float32), jnp.ones(len(pts), bool),
        )
        res_pt = pose_optimization(jnp.asarray(T0), *args, INTR)
        L = 4
        pl_w_p = np.zeros((L, 4), np.float32)
        pl_c_p = np.zeros((L, 4), np.float32)
        pl_w_p[:3] = pl_w
        pl_c_p[:3] = pl_c
        pl_valid = np.zeros(L, bool)
        pl_valid[:3] = True
        # info 1e5 = sigma ~3 mrad / 3 mm — what a multi-thousand-pixel
        # segment fit statistically supports (point reproj Jacobians carry
        # fx/z ~ 100 per row, so lower info leaves planes outvoted)
        res_j = pose_optimization_joint(
            jnp.asarray(T0), *args,
            jnp.asarray(pl_w_p), jnp.asarray(pl_c_p), jnp.asarray(pl_valid),
            jnp.full(L, 1e5, jnp.float32), INTR, n_rounds=3, n_iters=8,
        )
        e_pt = _pose_err(res_pt.T_cw, T_true)
        e_j = _pose_err(res_j.T_cw, T_true)
        assert e_j < e_pt * 0.7, (e_pt, e_j)
        assert e_j < 8e-3

    def test_exact_with_planes_only_modulo_gauge(self):
        # 3 orthogonal planes fully determine the pose: near-zero points
        T_true, pts, uv, ur, pl_w, pl_c = _scene(n_pts=4, px_noise=8.0)
        T0 = T_true + np.array([0, 0, 0, 0, 0.06, -0.05, 0.04], np.float32)
        L = 4
        pl_w_p = np.zeros((L, 4), np.float32)
        pl_c_p = np.zeros((L, 4), np.float32)
        pl_w_p[:3] = pl_w
        pl_c_p[:3] = pl_c
        pl_valid = np.zeros(L, bool)
        pl_valid[:3] = True
        res = pose_optimization_joint(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(ur),
            jnp.zeros(len(pts), jnp.float32), jnp.zeros(len(pts), bool),
            jnp.asarray(pl_w_p), jnp.asarray(pl_c_p), jnp.asarray(pl_valid),
            jnp.full(L, 1e4, jnp.float32), INTR, n_rounds=3, n_iters=10,
        )
        assert _pose_err(res.T_cw, T_true) < 1e-4

    def test_sign_flipped_observation_handled(self):
        T_true, pts, uv, ur, pl_w, pl_c = _scene()
        L = 4
        pl_w_p = np.zeros((L, 4), np.float32)
        pl_c_p = np.zeros((L, 4), np.float32)
        pl_w_p[:3] = pl_w
        pl_c_p[:3] = -pl_c   # same planes, opposite (n,d) sign
        pl_valid = np.zeros(L, bool)
        pl_valid[:3] = True
        T0 = T_true + np.array([0, 0, 0, 0, 0.05, 0, -0.04], np.float32)
        res = pose_optimization_joint(
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(ur),
            jnp.zeros(len(pts), jnp.float32), jnp.zeros(len(pts), bool),
            jnp.asarray(pl_w_p), jnp.asarray(pl_c_p), jnp.asarray(pl_valid),
            jnp.full(L, 1e4, jnp.float32), INTR, n_rounds=3, n_iters=10,
        )
        assert _pose_err(res.T_cw, T_true) < 1e-4
