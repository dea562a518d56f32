import numpy as np
import jax.numpy as jnp

from spslam_tpu.geometry import (
    Intrinsics,
    normalize_plane,
    se3_apply,
    se3_compose,
    se3_exp,
    se3_inverse,
    se3_log,
    project,
    transform_plane,
)
from spslam_tpu.solver.ba import BAProblem, build_point_obs_table, bundle_adjust

rng = np.random.default_rng(42)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0, width=640, height=480)


def make_ba_problem(
    n_cams=6, n_pts=128, n_planes=0, n_pp=0, noise=0.3, pose_noise=0.02,
    point_noise=0.05, omax=8, outlier_frac=0.0,
):
    # Ground truth: cameras on an arc looking at points around origin, z~5
    poses_true = []
    for i in range(n_cams):
        xi = np.array([0.3 * i, 0.02 * i, 0.01 * i, 0.0, 0.05 * i, 0.0], np.float32)
        poses_true.append(np.asarray(se3_exp(jnp.array(xi))))
    poses_true = np.stack(poses_true)
    pts = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(4, 9, n_pts)],
        axis=-1,
    ).astype(np.float32)

    obs_cam, obs_pt, obs_uv, obs_ur = [], [], [], []
    for c in range(n_cams):
        xc = np.asarray(se3_apply(jnp.array(poses_true[c]), jnp.array(pts)))
        uv = np.array(project(INTR, jnp.array(xc)))
        vis = (
            (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480)
            & (xc[:, 2] > 0.1)
        )
        for p in np.nonzero(vis)[0]:
            obs_cam.append(c)
            obs_pt.append(p)
            u = uv[p] + rng.normal(0, noise, 2)
            if rng.uniform() < outlier_frac:
                u = u + rng.uniform(20, 60, 2)
            obs_uv.append(u)
            obs_ur.append(u[0] - INTR.bf / xc[p, 2] + rng.normal(0, noise))
    R = len(obs_cam)
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_uv = np.array(obs_uv, np.float32)
    obs_ur = np.array(obs_ur, np.float32)

    # noisy initialization
    poses_init = poses_true.copy()
    for c in range(1, n_cams):  # keep cam0 at truth (gauge)
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses_init[c] = np.asarray(se3_compose(se3_exp(jnp.array(xi)), jnp.array(poses_true[c])))
    pts_init = pts + rng.normal(0, point_noise, pts.shape).astype(np.float32)

    # planes
    L = max(n_planes, 1)
    planes_true = np.zeros((L, 4), np.float32)
    planes_true[:, 2] = 1.0
    pobs_cam, pobs_pl, pobs_pi = [], [], []
    if n_planes:
        for l in range(n_planes):
            n = rng.normal(size=3)
            n /= np.linalg.norm(n)
            d = rng.uniform(-3, 3)
            planes_true[l] = np.concatenate([n, [d]]).astype(np.float32)
        for c in range(n_cams):
            for l in range(n_planes):
                pi_c = np.array(
                    transform_plane(jnp.array(poses_true[c]), jnp.array(planes_true[l]))
                )
                pi_c[:3] += rng.normal(0, 0.005, 3)
                pi_c[3] += rng.normal(0, 0.01)
                pobs_cam.append(c)
                pobs_pl.append(l)
                pobs_pi.append(np.asarray(normalize_plane(jnp.array(pi_c))))
    Q = max(len(pobs_cam), 1)
    pobs_valid = np.zeros(Q, bool)
    pobs_valid[: len(pobs_cam)] = True
    pobs_cam = np.array(pobs_cam + [0] * (Q - len(pobs_cam)), np.int32)
    pobs_pl = np.array(pobs_pl + [0] * (Q - len(pobs_pl)), np.int32)
    pobs_pi_arr = np.zeros((Q, 4), np.float32)
    pobs_pi_arr[:, 2] = 1.0
    for i, pi in enumerate(pobs_pi):
        pobs_pi_arr[i] = pi

    planes_init = planes_true.copy()
    if n_planes:
        planes_init[:, 3] += rng.normal(0, 0.05, L).astype(np.float32)

    E = max(n_pp, 1)
    prob = BAProblem(
        poses=jnp.array(poses_init),
        pose_fixed=jnp.array([True] + [False] * (n_cams - 1)),
        pose_valid=jnp.ones(n_cams, bool),
        points=jnp.array(pts_init),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.array(obs_cam),
        obs_pt=jnp.array(obs_pt),
        obs_uv=jnp.array(obs_uv),
        obs_ur=jnp.array(obs_ur),
        obs_inv_sigma2=jnp.ones(R),
        obs_valid=jnp.ones(R, bool),
        pt_obs=build_point_obs_table(obs_pt, n_pts, omax),
        planes=jnp.array(planes_init),
        plane_valid=jnp.array([True] * n_planes + [False] * (L - n_planes)),
        pobs_cam=jnp.array(pobs_cam),
        pobs_plane=jnp.array(pobs_pl),
        pobs_pi=jnp.array(pobs_pi_arr),
        pobs_w=jnp.full(Q, 100.0),
        pobs_valid=jnp.array(pobs_valid),
        pp_a=jnp.zeros(E, jnp.int32),
        pp_b=jnp.zeros(E, jnp.int32),
        pp_type=jnp.zeros(E, jnp.int32),
        pp_w=jnp.zeros(E),
        pp_valid=jnp.zeros(E, bool),
    )
    return prob, poses_true, pts, planes_true


def max_pose_err(poses_est, poses_true):
    errs = []
    for c in range(poses_true.shape[0]):
        d = se3_log(se3_compose(jnp.array(np.asarray(poses_est[c])), se3_inverse(jnp.array(poses_true[c]))))
        errs.append(np.linalg.norm(np.asarray(d)))
    return max(errs)


class TestBundleAdjust:
    def test_point_ba_converges(self):
        prob, poses_true, pts_true, _ = make_ba_problem(noise=0.2)
        res = bundle_adjust(prob, INTR)
        init_err = max_pose_err(np.asarray(prob.poses), poses_true)
        final_err = max_pose_err(np.asarray(res.poses), poses_true)
        assert final_err < init_err * 0.2, (init_err, final_err)
        assert final_err < 8e-3  # statistical floor for 0.2px noise, 6 cams
        pt_err = np.linalg.norm(np.asarray(res.points) - pts_true, axis=-1)
        assert np.median(pt_err) < 0.02  # stereo-depth noise floor at z~5m

    def test_outlier_gating(self):
        prob, poses_true, _, _ = make_ba_problem(noise=0.2, outlier_frac=0.15)
        res = bundle_adjust(prob, INTR)
        final_err = max_pose_err(np.asarray(res.poses), poses_true)
        assert final_err < 1e-2
        inl_frac = float(jnp.mean(res.obs_inlier.astype(jnp.float32)))
        assert 0.6 < inl_frac < 0.95

    def test_fixed_pose_stays(self):
        prob, poses_true, _, _ = make_ba_problem()
        res = bundle_adjust(prob, INTR)
        np.testing.assert_allclose(
            np.asarray(res.poses[0]), np.asarray(prob.poses[0]), atol=1e-7
        )

    def test_plane_ba(self):
        prob, poses_true, _, planes_true = make_ba_problem(n_planes=3, noise=0.2)
        res = bundle_adjust(prob, INTR)
        final_err = max_pose_err(np.asarray(res.poses), poses_true)
        assert final_err < 5e-3
        # plane d offsets (init +-0.05) should be pulled back to truth
        for l in range(3):
            est = np.asarray(res.planes[l])
            tru = planes_true[l]
            if np.dot(est[:3], tru[:3]) < 0:
                est = -est
            assert abs(est[3] - tru[3]) < 0.02, (l, est, tru)
            assert np.dot(est[:3], tru[:3]) > 0.999
