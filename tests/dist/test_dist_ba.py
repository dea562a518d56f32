import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from spslam_tpu.geometry import Intrinsics, se3_apply, se3_compose, se3_exp, se3_inverse, se3_log, project
from spslam_tpu.parallel.dist_ba import dist_bundle_adjust, partition_problem

rng = np.random.default_rng(7)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0, width=640, height=480)


def make_problem(n_cams=8, n_pts=512, noise=0.3, pose_noise=0.03):
    poses_true = []
    for i in range(n_cams):
        xi = np.array([0.2 * i, 0.01 * i, 0.0, 0.0, 0.04 * i, 0.0], np.float32)
        poses_true.append(np.asarray(se3_exp(jnp.array(xi))))
    poses_true = np.stack(poses_true)
    pts = np.stack(
        [rng.uniform(-4, 4, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(4, 9, n_pts)],
        -1,
    ).astype(np.float32)
    obs_cam, obs_pt, obs_uv, obs_ur = [], [], [], []
    for c in range(n_cams):
        xc = np.asarray(se3_apply(jnp.array(poses_true[c]), jnp.array(pts)))
        uv = np.array(project(INTR, jnp.array(xc)))
        vis = (uv[:, 0] > 0) & (uv[:, 0] < 640) & (uv[:, 1] > 0) & (uv[:, 1] < 480) & (xc[:, 2] > 0.1)
        for p in np.nonzero(vis)[0]:
            u = uv[p] + rng.normal(0, noise, 2)
            obs_cam.append(c); obs_pt.append(p); obs_uv.append(u)
            obs_ur.append(u[0] - INTR.bf / xc[p, 2] + rng.normal(0, noise))
    poses_init = poses_true.copy()
    for c in range(1, n_cams):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        poses_init[c] = np.asarray(se3_compose(se3_exp(jnp.array(xi)), jnp.array(poses_true[c])))
    pts_init = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool); fixed[0] = True
    return (poses_init, fixed, pts_init,
            np.array(obs_cam, np.int32), np.array(obs_pt, np.int32),
            np.array(obs_uv, np.float32), np.array(obs_ur, np.float32),
            poses_true, pts)


def max_pose_err(est, true):
    errs = []
    for c in range(len(true)):
        d = se3_log(se3_compose(jnp.array(est[c]), se3_inverse(jnp.array(true[c]))))
        errs.append(np.linalg.norm(np.asarray(d)))
    return max(errs)


@pytest.mark.parametrize("n_shards,strategy", [(2, "segments"), (8, "segments"), (8, "round_robin")])
def test_dist_ba_converges(n_shards, strategy):
    assert jax.device_count() >= n_shards, "need virtual CPU devices (conftest)"
    (poses_init, fixed, pts_init, oc, op, ouv, our, poses_true, pts_true) = make_problem()
    prob = partition_problem(
        poses_init, fixed, pts_init, oc, op, ouv, our,
        np.ones(len(oc), np.float32), n_shards, strategy=strategy,
    )
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("ba",))
    poses, points, cost = dist_bundle_adjust(prob, INTR, mesh, n_iters=12)
    init_err = max_pose_err(poses_init, poses_true)
    fin_err = max_pose_err(np.asarray(poses), poses_true)
    assert fin_err < init_err * 0.25, (init_err, fin_err)
    assert fin_err < 8e-3


@pytest.mark.parametrize("d_hi", [4, 8])
def test_dist_matches_single_shard(d_hi):
    """Shard invariance on the trajectory-segment partitioning: 1 shard vs
    d_hi shards must produce the same poses to 1e-4."""
    (poses_init, fixed, pts_init, oc, op, ouv, our, poses_true, _) = make_problem(n_cams=5, n_pts=256)
    results = []
    for d in (1, d_hi):
        prob = partition_problem(
            poses_init, fixed, pts_init, oc, op, ouv, our,
            np.ones(len(oc), np.float32), d, strategy="segments",
        )
        mesh = Mesh(np.array(jax.devices()[:d]), ("ba",))
        poses, _, cost = dist_bundle_adjust(prob, INTR, mesh, n_iters=10)
        results.append((np.asarray(poses), float(cost)))
    # identical optimization math regardless of shard count
    assert abs(results[0][1] - results[1][1]) / max(results[0][1], 1e-9) < 1e-3
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-4)


class TestPartitioning:
    def test_segments_contiguous_and_balanced(self):
        from spslam_tpu.parallel.dist_ba import assign_segments

        rng2 = np.random.default_rng(3)
        n_kfs, n_pts, D = 40, 4000, 8
        pt_ref_kf = np.sort(rng2.integers(0, n_kfs, n_pts))
        shard = assign_segments(pt_ref_kf, n_kfs, D)
        # each keyframe's points land on ONE shard; shards cover contiguous
        # keyframe ranges (trajectory segments)
        seg_of_kf = np.full(n_kfs, -1)
        for k in range(n_kfs):
            s = np.unique(shard[pt_ref_kf == k])
            assert len(s) <= 1
            if len(s):
                seg_of_kf[k] = s[0]
        present = seg_of_kf[seg_of_kf >= 0]
        assert (np.diff(present) >= 0).all()  # contiguous in time
        counts = np.bincount(shard, minlength=D)
        assert counts.max() < 2.0 * n_pts / D  # balanced within 2x

    def test_partition_round_trips_observations(self):
        (poses_init, fixed, pts_init, oc, op, ouv, our, _, _) = make_problem(
            n_cams=4, n_pts=64
        )
        prob = partition_problem(
            poses_init, fixed, pts_init, oc, op, ouv, our,
            np.ones(len(oc), np.float32), 4, strategy="segments",
        )
        assert int(prob.obs_valid.sum()) == len(oc)
        assert int(prob.point_valid.sum()) == len(pts_init)
        # every observation's (camera, uv) survives partitioning
        got = set()
        ov = np.asarray(prob.obs_valid)
        ocam = np.asarray(prob.obs_cam)
        ouv_sh = np.asarray(prob.obs_uv)
        for s in range(4):
            for j in np.nonzero(ov[s])[0]:
                got.add((int(ocam[s, j]), round(float(ouv_sh[s, j, 0]), 3)))
        want = {(int(c), round(float(u[0]), 3)) for c, u in zip(oc, ouv)}
        assert got == want

    def test_init_distributed_noop_without_coordinator(self, monkeypatch):
        from spslam_tpu.parallel.dist_ba import init_distributed

        monkeypatch.delenv("SPSLAM_COORDINATOR", raising=False)
        assert init_distributed() is False
