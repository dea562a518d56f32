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
