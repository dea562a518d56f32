import numpy as np
import jax.numpy as jnp

from spslam_tpu.geometry import Intrinsics, normalize_plane
from spslam_tpu.io.synthetic import make_room, make_sequence, orbit_trajectory, render_frame
from spslam_tpu.ops.plane_seg import segment_planes

INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)


def plane_close(est, gt, ang_tol_deg=3.0, d_tol=0.05):
    est = np.asarray(normalize_plane(jnp.array(est)))
    gt = np.asarray(normalize_plane(jnp.array(gt)))
    if np.dot(est[:3], gt[:3]) < 0:
        est = -est
    ang = np.degrees(np.arccos(np.clip(np.dot(est[:3], gt[:3]), -1, 1)))
    return ang < ang_tol_deg and abs(est[3] - gt[3]) < d_tol


class TestPlaneSegmentation:
    def test_single_plane(self):
        # fronto-parallel wall at z = 3
        depth = np.full((480, 640), 3.0, np.float32)
        res = segment_planes(jnp.array(depth), INTR)
        assert bool(res.valid[0])
        assert plane_close(np.asarray(res.coef[0]), [0, 0, 1, -3.0])
        # dominant plane should cover almost everything
        assert int(res.n_inliers[0]) > 0.9 * 480 * 640

    def test_sloped_plane(self):
        # plane z = 2 + 0.3x  ->  n ~ (0.3, 0, -1)/norm, through (0,0,2)
        ys, xs = np.mgrid[0:480, 0:640]
        # ray: x = (u-cx)/fx * z ; z = 2 + 0.3x -> z = 2 / (1 - 0.3*(u-cx)/fx)
        a = 0.3 * (xs - INTR.cx) / INTR.fx
        depth = (2.0 / np.maximum(1 - a, 0.3)).astype(np.float32)
        res = segment_planes(jnp.array(depth), INTR)
        n = np.array([0.3, 0, -1.0])
        n /= np.linalg.norm(n)
        d = -np.dot(n, [0, 0, 2.0])
        assert bool(res.valid[0])
        assert plane_close(np.asarray(res.coef[0]), np.concatenate([n, [d]]))

    def test_two_planes_separated(self):
        # left half wall at z=2, right half at z=4 (depth discontinuity)
        depth = np.full((480, 640), 2.0, np.float32)
        depth[:, 320:] = 4.0
        res = segment_planes(jnp.array(depth), INTR)
        coefs = [np.asarray(res.coef[i]) for i in range(2) if bool(res.valid[i])]
        assert len(coefs) == 2
        ds = sorted(abs(c[3]) for c in coefs)
        assert abs(ds[0] - 2.0) < 0.05 and abs(ds[1] - 4.0) < 0.05

    def test_synthetic_room_planes(self):
        """Rendered room: recovered planes must match the known wall/floor
        geometry transformed into the camera frame."""
        from spslam_tpu.geometry import transform_plane

        rects = make_room(seed=0)
        T = orbit_trajectory(3)[0]
        _, depth = render_frame(rects, T, INTR)
        res = segment_planes(jnp.array(depth), INTR)
        n_valid = int(res.valid.sum())
        assert n_valid >= 2
        # ground-truth planes in camera frame
        gt_planes = []
        for r in rects:
            n = r.normal
            d = -np.dot(n, r.origin)
            pi_c = np.asarray(
                transform_plane(jnp.array(T), jnp.array(np.concatenate([n, [d]]), dtype=np.float32))
            )
            gt_planes.append(pi_c)
        matched = 0
        for i in range(n_valid):
            est = np.asarray(res.coef[i])
            if any(plane_close(est, gt, ang_tol_deg=4.0, d_tol=0.08) for gt in gt_planes):
                matched += 1
        assert matched >= max(2, int(0.6 * n_valid)), f"{matched}/{n_valid} planes match GT"

    def test_no_planes_in_noise(self):
        rng = np.random.default_rng(0)
        depth = rng.uniform(0.5, 6.0, (480, 640)).astype(np.float32)
        res = segment_planes(jnp.array(depth), INTR)
        assert int(res.valid.sum()) == 0
