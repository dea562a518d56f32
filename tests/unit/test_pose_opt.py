import numpy as np
import jax.numpy as jnp

from spslam_tpu.geometry import Intrinsics, se3_apply, se3_exp, se3_compose, se3_log, se3_inverse, project
from spslam_tpu.solver.pose_opt import pose_optimization

rng = np.random.default_rng(11)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0, width=640, height=480)


def make_problem(n=256, noise=0.5, outlier_frac=0.0, depth_frac=0.7):
    pts_w = np.stack(
        [
            rng.uniform(-3, 3, n),
            rng.uniform(-2, 2, n),
            rng.uniform(2, 8, n),
        ],
        axis=-1,
    ).astype(np.float32)
    T_true = se3_exp(jnp.array([0.1, -0.05, 0.2, 0.02, -0.03, 0.05], np.float32))
    xc = se3_apply(T_true, jnp.array(pts_w))
    uv = np.array(project(INTR, xc))
    uv += rng.normal(0, noise, uv.shape)
    z = np.asarray(xc)[:, 2]
    ur = uv[:, 0] - INTR.bf / z + rng.normal(0, noise, n)
    has_d = rng.uniform(size=n) < depth_frac
    ur = np.where(has_d, ur, -1.0).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv[idx] += rng.uniform(20, 80, (n_out, 2)) * np.sign(rng.normal(size=(n_out, 2)))
    return T_true, jnp.array(pts_w), jnp.array(uv.astype(np.float32)), jnp.array(ur)


def pose_err(T_est, T_true):
    d = se3_log(se3_compose(T_est, se3_inverse(T_true)))
    return np.linalg.norm(np.asarray(d))


class TestPoseOptimization:
    def test_converges_from_perturbed_init(self):
        T_true, pts, uv, ur = make_problem(noise=0.3)
        T0 = se3_compose(se3_exp(jnp.array([0.05, 0.05, -0.1, 0.03, -0.02, 0.04])), T_true)
        n = pts.shape[0]
        res = pose_optimization(
            T0, pts, uv, ur, jnp.ones(n), jnp.ones(n, bool), INTR
        )
        assert pose_err(res.T_cw, T_true) < 5e-3
        assert int(res.n_inliers) > 0.9 * n

    def test_robust_to_outliers(self):
        T_true, pts, uv, ur = make_problem(noise=0.3, outlier_frac=0.3)
        T0 = se3_compose(se3_exp(jnp.array([0.03, -0.02, 0.05, 0.02, 0.01, -0.02])), T_true)
        n = pts.shape[0]
        res = pose_optimization(T0, pts, uv, ur, jnp.ones(n), jnp.ones(n, bool), INTR)
        assert pose_err(res.T_cw, T_true) < 1e-2
        # outliers should be gated out
        assert int(res.n_inliers) < 0.8 * n
        assert int(res.n_inliers) > 0.55 * n

    def test_respects_valid_mask(self):
        T_true, pts, uv, ur = make_problem(noise=0.3)
        n = pts.shape[0]
        # corrupt the second half but mark invalid
        uv = uv.at[n // 2 :].add(500.0)
        valid = jnp.arange(n) < n // 2
        T0 = se3_compose(se3_exp(jnp.array([0.02, 0.02, -0.02, 0.01, 0.0, 0.01])), T_true)
        res = pose_optimization(T0, pts, uv, ur, jnp.ones(n), valid, INTR)
        assert pose_err(res.T_cw, T_true) < 1e-2
        assert int(res.n_inliers) <= n // 2

    def test_matches_scipy_on_clean_data(self):
        from scipy.optimize import least_squares

        T_true, pts, uv, ur = make_problem(noise=0.5, depth_frac=0.0)
        n = pts.shape[0]
        T0 = se3_compose(se3_exp(jnp.array([0.04, -0.03, 0.06, 0.02, -0.01, 0.03])), T_true)
        res = pose_optimization(T0, pts, uv, ur, jnp.ones(n), jnp.ones(n, bool), INTR, n_rounds=1, n_iters=30)

        pts_np, uv_np = np.asarray(pts), np.asarray(uv)

        def resid(xi):
            T = se3_compose(se3_exp(jnp.array(xi, dtype=jnp.float32)), T0)
            pc = np.asarray(se3_apply(T, jnp.array(pts_np)))
            pr = np.asarray(project(INTR, jnp.array(pc)))
            return (uv_np - pr).ravel()

        sol = least_squares(resid, np.zeros(6), method="lm", xtol=1e-12)
        T_sp = se3_compose(se3_exp(jnp.array(sol.x, dtype=jnp.float32)), T0)
        assert pose_err(res.T_cw, T_sp) < 2e-3


class TestSolve6:
    def test_matches_numpy_solve(self):
        """Unrolled 6x6 Cholesky (used inside every LM iteration) vs the
        numpy dense oracle, single and batched."""
        import numpy as np
        import jax.numpy as jnp

        from spslam_tpu.solver.robust import solve6

        rng = np.random.default_rng(0)
        for _ in range(10):
            A = rng.normal(size=(6, 6))
            H = (A @ A.T + 0.1 * np.eye(6)).astype(np.float32)
            b = rng.normal(size=6).astype(np.float32)
            x = np.asarray(solve6(jnp.asarray(H), jnp.asarray(b)))
            np.testing.assert_allclose(x, np.linalg.solve(H, b), atol=1e-3)
        Hb = np.stack([a @ a.T + 0.1 * np.eye(6)
                       for a in rng.normal(size=(5, 6, 6))]).astype(np.float32)
        bb = rng.normal(size=(5, 6)).astype(np.float32)
        xb = np.asarray(solve6(jnp.asarray(Hb), jnp.asarray(bb)))
        want = np.stack([np.linalg.solve(Hb[i], bb[i]) for i in range(5)])
        np.testing.assert_allclose(xb, want, atol=1e-3)
