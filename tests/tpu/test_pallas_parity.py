"""On-chip TPU lane (pytest -m tpu): Pallas kernel parity + fused-step smoke.

The CPU suite never executes the Pallas FAST+NMS kernel (fast_nms_scores
dispatches to the jnp fallback off-TPU), so this lane is the kernel's only
automated coverage — it asserts BIT-EXACT parity against the jnp reference
formulation inside the 19-px detection border, at the real pyramid level
sizes, plus an end-to-end fused tracking step on chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _image(h, w, seed):
    rng = np.random.default_rng(seed)
    # smooth blobs + noise: realistic corner density at several scales
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(24):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        s = rng.uniform(2, 18)
        a = rng.uniform(30, 120)
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += rng.normal(0, 4.0, (h, w))
    return np.clip(img, 0, 255).astype(np.float32)


class TestPallasFastNms:
    @pytest.mark.parametrize("shape", [(480, 640), (240, 320), (101, 131)])
    def test_bit_exact_vs_jnp_inside_border(self, shape):
        from spslam_tpu.ops.fast import fast_score_map, nms3x3
        from spslam_tpu.ops.fast_pallas import fast_nms_scores_pallas

        h, w = shape
        img = jnp.asarray(_image(h, w, seed=h * 1000 + w))
        got = np.asarray(fast_nms_scores_pallas(img, 7.0, 20.0))
        want = np.asarray(nms3x3(fast_score_map(img, 7.0, 20.0)))
        b = 19  # detection border used by detect_levels
        np.testing.assert_array_equal(got[b:-b, b:-b], want[b:-b, b:-b])

    def test_dispatch_selects_pallas_on_tpu(self):
        from spslam_tpu.ops import fast_pallas

        assert jax.default_backend() == "tpu"
        img = jnp.asarray(_image(64, 128, seed=3))
        got = np.asarray(fast_pallas.fast_nms_scores(img, 7.0, 20.0))
        want = np.asarray(
            fast_pallas.fast_nms_scores_pallas(img, th_low=7.0, th_high=20.0)
        )
        np.testing.assert_array_equal(got, want)


class TestFusedStepOnChip:
    def test_track_frame_step_smoke(self):
        """One fused tracking dispatch end-to-end on the chip: detects
        features, optimizes a pose, returns finite outputs."""
        from spslam_tpu.io.synthetic import make_sequence
        from spslam_tpu.ops.pyramid import PyramidSpec
        from spslam_tpu.tracking.tracker import TrackerConfig, Tracker
        from spslam_tpu.map.store import MapConfig, MapStore

        seq = make_sequence(n_frames=3)
        cfg = TrackerConfig()
        store = MapStore(MapConfig())
        tracker = Tracker(cfg, seq.intr, store)
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            tracker.process_pipelined(gray, depth, ts)
        records = tracker.flush_pipeline()
        assert tracker.state.name == "OK"
        assert np.isfinite(tracker.T_cw).all()
        assert store.n_kf >= 1


class TestFallbackGateOnChip:
    def test_cond_gated_fallback_and_split_decode(self):
        """The lax.cond global fallback must be SKIPPED when the motion seed
        is strong (scal slot 11 == -1) and must FIRE from a garbage prior;
        the split small/big output buffers must decode at their layouts."""
        from spslam_tpu.io.synthetic import make_sequence
        from spslam_tpu.map.store import MapConfig, MapStore
        from spslam_tpu.tracking.tracker import (
            Tracker, TrackerConfig, track_frame_step,
            unpack_track_big, unpack_track_small,
        )

        seq = make_sequence(n_frames=6)
        cfg = TrackerConfig()
        store = MapStore(MapConfig())
        tracker = Tracker(cfg, seq.intr, store)
        for (gray, depth), ts in zip(seq.frames, seq.timestamps):
            tracker.process_pipelined(gray, depth, ts)
        tracker.flush_pipeline()
        assert tracker.state.name == "OK"

        ids, pack, desc, pl_pack = tracker._local_snapshot()
        gray, depth = seq.frames[-1]
        gray_j, depth_j = tracker._upload_frame(gray, depth)

        def step(T_prev):
            return track_frame_step(
                gray_j, depth_j, jnp.asarray(T_prev), jnp.asarray(T_prev),
                jnp.asarray(False), pack, desc, pl_pack,
                cfg.motion_search_radius, cfg.local_search_radius,
                cfg.th_depth, tracker.spec, tracker.intr, cfg.n_features,
                cfg.th_fast_high, cfg.th_fast_low,
            )

        # strong prior: the true last pose — motion seed tracks, fallback skipped
        _, small, big = step(tracker.T_cw)
        scal, mp = unpack_track_small(np.asarray(small), cfg.local_points_cap)
        fnp = unpack_track_big(np.asarray(big), cfg.n_features, seq.intr,
                               tracker.depth_factor)
        assert scal[11] == -1.0, f"fallback ran despite strong seed: {scal[11]}"
        assert scal[8] > 50, "tight stage should track from the true pose"
        assert fnp["uv"].shape == (cfg.n_features, 2)
        assert fnp["desc"].shape == (cfg.n_features, 8)
        assert np.isfinite(fnp["xyz_cam"]).all() and fnp["valid"].sum() > 100

        # garbage prior: 5 m away — the motion window misses, fallback fires
        T_bad = tracker.T_cw.copy()
        T_bad[4:7] += np.array([5.0, 0, 0], np.float32)
        _, small2, _ = step(T_bad)
        scal2, _ = unpack_track_small(np.asarray(small2), cfg.local_points_cap)
        assert scal2[11] >= 0.0, "fallback must engage from a garbage prior"


class TestPlaneSegBackendParity:
    def test_segmentation_matches_cpu(self):
        """The on-chip covariance path must agree with the CPU reference:
        TPU einsums default to bf16 inputs, and the plane-PCA moment math
        with meter-scale coordinates needs ~6 significant digits — without
        explicit HIGHEST matmul precision the on-chip segmentation shattered
        into garbage fragments (round-5 regression hunt) while the CPU path
        stayed correct."""
        from spslam_tpu.io.synthetic import make_sequence
        from spslam_tpu.ops.plane_seg import segment_planes

        seq = make_sequence(n_frames=3)
        depth = jnp.asarray(seq.frames[2][1])
        res_t = segment_planes(depth, seq.intr)
        with jax.default_device(jax.devices("cpu")[0]):
            res_c = segment_planes(jnp.asarray(np.asarray(depth)), seq.intr)
        vt, vc = np.asarray(res_t.valid), np.asarray(res_c.valid)
        assert vt.sum() == vc.sum()
        ct, cc = np.asarray(res_t.coef)[vt], np.asarray(res_c.coef)[vc]
        # same planes in the same support order, normals within ~0.06 deg
        for a, b in zip(ct, cc):
            if np.dot(a[:3], b[:3]) < 0:
                b = -b
            assert np.dot(a[:3], b[:3]) > 0.9999994, (a, b)
            assert abs(a[3] - b[3]) < 2e-3, (a, b)
