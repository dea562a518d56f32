"""Global bundle adjustment over a whole MapStore (the reference's
Optimizer::GlobalBundleAdjustment after CorrectLoop — SURVEY.md §2 #11,
§3.3): assemble ALL keyframes/points from the store, run the settle +
full-Schur Newton pipeline, and verify the map actually converges back to
truth from a perturbed state."""

import jax.numpy as jnp
import numpy as np

from spslam_tpu.geometry import Intrinsics, project, se3_apply, se3_compose, se3_exp
from spslam_tpu.map.store import MapConfig, MapStore
from spslam_tpu.solver.global_ba import assemble_global_problem, global_bundle_adjust

rng = np.random.default_rng(7)
INTR = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0,
                  width=640, height=480)


def build_store_scene(n_cams=8, n_pts=200, pose_noise=0.03, point_noise=0.05):
    """MapStore populated from an exact synthetic scene, then perturbed."""
    store = MapStore(MapConfig(max_keyframes=32, max_points=4096, n_kp=256,
                               max_obs_per_point=16))
    poses_true = []
    for i in range(n_cams):
        xi = np.array([0.25 * i, 0.02 * i, 0.0, 0.0, 0.04 * i, 0.0], np.float32)
        poses_true.append(np.asarray(se3_exp(jnp.array(xi))))
    poses_true = np.stack(poses_true)
    pts = np.stack(
        [rng.uniform(-3, 3, n_pts), rng.uniform(-2, 2, n_pts), rng.uniform(4, 9, n_pts)],
        axis=-1,
    ).astype(np.float32)

    n_kp = store.cfg.n_kp
    pids = None
    for c in range(n_cams):
        xc = np.asarray(se3_apply(jnp.array(poses_true[c]), jnp.array(pts)))
        uv = np.asarray(project(INTR, jnp.array(xc)))
        frame_np = dict(
            uv=np.zeros((n_kp, 2), np.float32),
            octave=np.zeros(n_kp, np.int32),
            angle=np.zeros(n_kp, np.float32),
            desc=rng.integers(0, 2 ** 32, (n_kp, 8), dtype=np.uint32),
            depth=np.zeros(n_kp, np.float32),
            u_right=np.full(n_kp, -1.0, np.float32),
            valid=np.zeros(n_kp, bool),
        )
        frame_np["uv"][:n_pts] = uv
        frame_np["depth"][:n_pts] = xc[:, 2]
        frame_np["u_right"][:n_pts] = uv[:, 0] - INTR.bf / np.maximum(xc[:, 2], 1e-3)
        frame_np["valid"][:n_pts] = True
        k = store.add_keyframe(poses_true[c], float(c), frame_np, c)
        if c == 0:
            dist = np.linalg.norm(pts, axis=-1)
            normal = pts / np.maximum(dist[:, None], 1e-9)
            pids = store.add_points_bulk(
                pts, frame_np["desc"][:n_pts], normal, dist, k, np.arange(n_pts)
            )
        else:
            store.add_observations_bulk(pids, k, np.arange(n_pts))

    # perturb everything except the gauge keyframe
    for c in range(1, n_cams):
        xi = rng.normal(0, pose_noise, 6).astype(np.float32)
        store.kf_pose[c] = np.asarray(
            se3_compose(se3_exp(jnp.array(xi)), jnp.array(poses_true[c]))
        )
    store.pt_pos[pids] = pts + rng.normal(0, point_noise, pts.shape).astype(np.float32)
    return store, poses_true, pts, pids


def pose_err(store, poses_true):
    from spslam_tpu.geometry import np_lie

    errs = []
    for c in range(poses_true.shape[0]):
        d = np_lie.se3_compose(store.kf_pose[c], np_lie.se3_inverse(poses_true[c]))
        errs.append(np.linalg.norm(d[4:7]) + np.linalg.norm(d[1:4]))
    return max(errs)


class TestGlobalBA:
    def test_converges_from_perturbation(self):
        store, poses_true, pts, pids = build_store_scene()
        err0 = pose_err(store, poses_true)
        assert err0 > 0.02  # perturbation is real
        ran_newton = global_bundle_adjust(store, INTR)
        assert ran_newton, "Newton stage must run at this problem size"
        err1 = pose_err(store, poses_true)
        assert err1 < err0 * 0.05, (err0, err1)
        pt_err = np.linalg.norm(store.pt_pos[pids] - pts, axis=-1)
        assert np.median(pt_err) < 1e-3

    def test_gauge_fixed(self):
        store, poses_true, _, _ = build_store_scene()
        before = store.kf_pose[0].copy()
        global_bundle_adjust(store, INTR)
        np.testing.assert_allclose(store.kf_pose[0], before, atol=1e-7)

    def test_assembly_respects_erased_keyframes(self):
        store, poses_true, _, _ = build_store_scene()
        store.erase_keyframe(3)
        out = assemble_global_problem(store, INTR)
        assert out is not None
        prob, kf_ids, pt_ids, _ = out
        assert 3 not in kf_ids
        # no observation may reference the erased keyframe
        cams = np.asarray(prob.obs_cam)[np.asarray(prob.obs_valid)]
        assert set(kf_ids[c] for c in np.unique(cams)).issubset(set(kf_ids))
        err_before = pose_err(store, poses_true)
        global_bundle_adjust(store, INTR)
        assert pose_err(store, poses_true) < err_before
