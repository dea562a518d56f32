import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rsc

from spslam_tpu.geometry import (
    Intrinsics,
    azel_to_plane,
    mat_to_quat,
    normalize_plane,
    plane_error,
    plane_point_distance,
    plane_retract,
    plane_to_azel,
    project,
    quat_rotate,
    quat_to_mat,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_from_matrix,
    se3_inverse,
    se3_log,
    se3_make,
    se3_matrix,
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
    sim3_make,
    so3_exp_quat,
    so3_log,
    transform_plane,
    undistort_points,
    unproject,
)

rng = np.random.default_rng(0)


def random_quat(n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def wxyz_to_xyzw(q):
    return np.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


class TestQuat:
    def test_rotate_matches_scipy(self):
        q = random_quat(32)
        v = rng.normal(size=(32, 3)).astype(np.float32)
        got = np.asarray(quat_rotate(jnp.array(q), jnp.array(v)))
        want = Rsc.from_quat(wxyz_to_xyzw(q)).apply(v)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_quat_mat_roundtrip(self):
        q = random_quat(64)
        m = quat_to_mat(jnp.array(q))
        q2 = np.asarray(mat_to_quat(m))
        # Same rotation up to sign
        dot = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_mat_to_quat_degenerate(self):
        # 180-degree rotations exercise all four branch candidates
        for axis in np.eye(3):
            m = Rsc.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
            q = np.asarray(mat_to_quat(jnp.array(m)))
            m2 = np.asarray(quat_to_mat(jnp.array(q)))
            np.testing.assert_allclose(m2, m, atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        # keep |phi| < pi: log returns the principal value
        phi = (0.8 * rng.normal(size=(32, 3))).astype(np.float32)
        q = so3_exp_quat(jnp.array(phi))
        phi2 = np.asarray(so3_log(q))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)

    def test_exp_matches_scipy(self):
        phi = rng.normal(size=(16, 3)).astype(np.float32)
        q = np.asarray(so3_exp_quat(jnp.array(phi)))
        want = Rsc.from_rotvec(phi).as_matrix()
        got = np.asarray(quat_to_mat(jnp.array(q)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_small_angle(self):
        phi = np.array([[1e-9, 0, 0], [0, 0, 0]], dtype=np.float32)
        q = np.asarray(so3_exp_quat(jnp.array(phi)))
        np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)
        phi2 = np.asarray(so3_log(jnp.array(q)))
        assert np.all(np.isfinite(phi2))


class TestSE3:
    def random_T(self, n):
        return np.concatenate(
            [random_quat(n), rng.normal(size=(n, 3)).astype(np.float32)], axis=-1
        )

    def test_compose_inverse(self):
        T = jnp.array(self.random_T(16))
        I = se3_compose(T, se3_inverse(T))
        np.testing.assert_allclose(np.abs(np.asarray(I[:, 0])), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[:, 4:]), 0.0, atol=1e-5)

    def test_matrix_consistency(self):
        T = jnp.array(self.random_T(8))
        x = jnp.array(rng.normal(size=(8, 3)).astype(np.float32))
        got = se3_apply(T, x)
        M = se3_matrix(T)
        want = (M[:, :3, :3] @ x[..., None])[..., 0] + M[:, :3, 3]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
        T2 = se3_from_matrix(M)
        np.testing.assert_allclose(
            np.abs(np.sum(np.asarray(T2[:, :4]) * np.asarray(T[:, :4]), -1)),
            1.0,
            atol=1e-5,
        )

    def test_exp_log_roundtrip(self):
        xi = (0.5 * rng.normal(size=(32, 6))).astype(np.float32)
        T = se3_exp(jnp.array(xi))
        xi2 = np.asarray(se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)

    def test_exp_zero(self):
        T = np.asarray(se3_exp(jnp.zeros(6)))
        np.testing.assert_allclose(T, [1, 0, 0, 0, 0, 0, 0], atol=1e-7)


class TestSim3:
    def test_compose_inverse(self):
        q = random_quat(8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        s = np.exp(rng.normal(size=(8,)) * 0.3).astype(np.float32)
        S = sim3_make(jnp.array(q), jnp.array(t), jnp.array(s))
        I = sim3_compose(S, sim3_inverse(S))
        np.testing.assert_allclose(np.abs(np.asarray(I[:, 0])), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(I[:, 4:7]), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(I[:, 7]), 1.0, atol=1e-5)

    def test_apply_scale(self):
        S = sim3_make(jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), jnp.array(2.0))
        x = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(sim3_apply(S, x)), [2, 4, 6], atol=1e-6)

    def test_exp_log_roundtrip(self):
        xi = (0.4 * rng.normal(size=(32, 7))).astype(np.float32)
        S = sim3_exp(jnp.array(xi))
        xi2 = np.asarray(sim3_log(S))
        np.testing.assert_allclose(xi2, xi, atol=2e-4)

    def test_exp_reduces_to_se3(self):
        xi6 = (0.4 * rng.normal(size=(8, 6))).astype(np.float32)
        xi7 = np.concatenate([xi6, np.zeros((8, 1), np.float32)], axis=-1)
        S = np.asarray(sim3_exp(jnp.array(xi7)))
        T = np.asarray(se3_exp(jnp.array(xi6)))
        np.testing.assert_allclose(S[:, :7], T, atol=1e-4)
        np.testing.assert_allclose(S[:, 7], 1.0, atol=1e-6)


class TestCamera:
    intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, k1=0.05, k2=-0.1)

    def test_project_unproject(self):
        uv = jnp.array(rng.uniform(50, 400, size=(64, 2)).astype(np.float32))
        d = jnp.array(rng.uniform(0.5, 5.0, size=(64,)).astype(np.float32))
        xc = unproject(self.intr, uv, d)
        uv2 = project(self.intr, xc)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_undistort_matches_opencv(self):
        import cv2

        uv = rng.uniform(50, 400, size=(128, 2)).astype(np.float32)
        K = np.array(self.intr.K)
        dist = np.array(
            [self.intr.k1, self.intr.k2, self.intr.p1, self.intr.p2, self.intr.k3],
            np.float32,
        )
        want = cv2.undistortPoints(uv.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
        got = np.asarray(undistort_points(self.intr, jnp.array(uv)))
        np.testing.assert_allclose(got, want, atol=0.05)


class TestPlane:
    def test_point_distance(self):
        pi = normalize_plane(jnp.array([0.0, 0.0, 2.0, -4.0]))
        # z = 2 plane; point at z=3 has distance 1
        d = plane_point_distance(pi, jnp.array([0.0, 0.0, 3.0]))
        np.testing.assert_allclose(float(d), 1.0, atol=1e-6)

    def test_transform_preserves_incidence(self):
        q = random_quat(8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        T = se3_make(jnp.array(q), jnp.array(t))
        pi_b = normalize_plane(jnp.array(rng.normal(size=(8, 4)).astype(np.float32)))
        x_b = rng.normal(size=(8, 3)).astype(np.float32)
        # Project points onto the planes
        dist = np.asarray(plane_point_distance(pi_b, jnp.array(x_b)))
        x_on = jnp.array(x_b) - dist[:, None] * pi_b[:, :3]
        pi_a = transform_plane(T, pi_b)
        x_a = se3_apply(T, x_on)
        resid = np.asarray(plane_point_distance(pi_a, x_a))
        np.testing.assert_allclose(resid, 0.0, atol=1e-4)

    def test_azel_roundtrip(self):
        pi = normalize_plane(jnp.array(rng.normal(size=(32, 4)).astype(np.float32)))
        tau = plane_to_azel(pi)
        pi2 = np.asarray(azel_to_plane(tau))
        np.testing.assert_allclose(pi2, np.asarray(pi), atol=1e-5)

    def test_retract_and_error(self):
        pi = normalize_plane(jnp.array([0.3, -0.4, 0.86, 1.5]))
        delta = jnp.array([0.01, -0.02, 0.05])
        pi2 = plane_retract(pi, delta)
        err = np.asarray(plane_error(pi2, pi))
        np.testing.assert_allclose(err, np.asarray(delta), atol=1e-5)
