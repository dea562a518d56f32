import jax
import jax.numpy as jnp
import numpy as np

from spslam_tpu.geometry import Intrinsics, project, quat_to_mat, se3_apply, se3_exp
from spslam_tpu.solver.initializer import initialize_two_view

rng = np.random.default_rng(9)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


class TestTwoViewInit:
    def test_recovers_relative_pose(self):
        N = 256
        pts = np.stack(
            [rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(3, 8, N)], -1
        ).astype(np.float32)
        T21 = se3_exp(jnp.array([0.3, 0.05, 0.02, 0.02, 0.08, 0.01]))
        uv1 = np.array(project(INTR, jnp.array(pts)))
        uv2 = np.array(project(INTR, se3_apply(T21, jnp.array(pts))))
        uv1 += rng.normal(0, 0.3, uv1.shape)
        uv2 += rng.normal(0, 0.3, uv2.shape)
        # outliers
        out = rng.choice(N, 40, replace=False)
        uv2[out] += rng.uniform(30, 120, (40, 2))
        res = initialize_two_view(
            jnp.array(uv1.astype(np.float32)), jnp.array(uv2.astype(np.float32)),
            jnp.ones(N, bool), INTR, jax.random.PRNGKey(2),
        )
        assert int(res.n_inliers) > 150
        # direction of translation (scale unobservable)
        t_est = np.asarray(res.T_21[4:])
        t_true = np.asarray(T21)[4:]
        cos = np.dot(t_est, t_true) / (np.linalg.norm(t_est) * np.linalg.norm(t_true))
        assert cos > 0.99, cos
        R_est = np.asarray(quat_to_mat(res.T_21[:4]))
        R_true = np.asarray(quat_to_mat(jnp.array(np.asarray(T21)[:4])))
        ang = np.degrees(np.arccos(np.clip((np.trace(R_est.T @ R_true) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang
        # triangulated inlier points should match ground truth up to scale
        inl = np.asarray(res.inliers)
        X = np.asarray(res.points)[inl]
        gt = pts[inl]
        scale = np.median(np.linalg.norm(X, axis=1) / np.linalg.norm(gt, axis=1))
        err = np.linalg.norm(X / scale - gt, axis=1)
        # small-baseline (0.3 m) triangulation at z=3-8 m with 0.3 px noise
        # has a ~7 cm depth-noise floor
        assert np.median(err) < 0.1
