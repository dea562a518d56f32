import cv2
import numpy as np
import jax.numpy as jnp

from spslam_tpu.geometry import Intrinsics
from spslam_tpu.ops.fast import (
    detect_levels, fast_score_map, level_feature_counts, nms3x3,
)
from spslam_tpu.ops.match import hamming_matrix, match_descriptors
from spslam_tpu.ops.brief import unpack_bits
from spslam_tpu.ops.pyramid import PyramidSpec, build_pyramid_levels
from spslam_tpu.frontend.frame import build_frame

rng = np.random.default_rng(3)


def make_texture(h=480, w=640, seed=3):
    """Smooth random texture with strong corners (upsampled noise)."""
    r = np.random.default_rng(seed)
    small = r.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.float32)


class TestFast:
    def test_corner_detection_matches_opencv(self):
        img = make_texture()
        score = nms3x3(fast_score_map(jnp.array(img), 20.0, 20.0))
        ours = np.argwhere(np.asarray(score) > 0)
        ours = ours[
            (ours[:, 0] > 5) & (ours[:, 0] < 475) & (ours[:, 1] > 5) & (ours[:, 1] < 635)
        ]
        fast = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True, type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16
        )
        kps = fast.detect(img.astype(np.uint8), None)
        cv_pts = np.array([[k.pt[1], k.pt[0]] for k in kps])
        assert len(cv_pts) > 100
        # Every OpenCV corner should have one of ours within 2px (NMS ties differ)
        d = np.min(
            np.linalg.norm(cv_pts[:, None, :] - ours[None, :, :], axis=-1), axis=-1
        )
        recall = np.mean(d <= 2.0)
        assert recall > 0.9, f"FAST recall vs OpenCV too low: {recall}"

    def test_detect_levels_budget_and_spread(self):
        """Live production path (frontend/frame.py): true-size pyramid →
        fused FAST+NMS → static per-level budgets."""
        img = make_texture()
        spec = PyramidSpec(n_levels=8, scale_factor=1.2, height=480, width=640)
        levels, _ = build_pyramid_levels(jnp.array(img), spec, blur=False)
        det = detect_levels(levels, spec, n_features=1024)
        valid = np.asarray(det["valid"])
        assert valid.sum() > 500
        xy = np.asarray(det["xy"])[valid]
        # spatial spread: keypoints should cover at least half the 8x8 cells
        cells = set(map(tuple, (xy // np.array([80, 60])).astype(int).tolist()))
        assert len(cells) >= 32
        # level-0 coords in bounds
        assert xy[:, 0].max() < 640 and xy[:, 1].max() < 480
        # static per-level grouping: octave blocks match level_feature_counts
        counts = level_feature_counts(spec, 1024)
        octave = np.asarray(det["octave"])
        start = 0
        for lvl, c in enumerate(counts):
            assert (octave[start:start + c] == lvl).all()
            start += c
        assert start == len(octave)


class TestHamming:
    def test_matches_numpy_popcount(self):
        a = rng.integers(0, 2 ** 32, size=(64, 8), dtype=np.uint32)
        b = rng.integers(0, 2 ** 32, size=(96, 8), dtype=np.uint32)
        bits_a = unpack_bits(jnp.array(a))
        bits_b = unpack_bits(jnp.array(b))
        got = np.asarray(hamming_matrix(bits_a, bits_b))
        want = np.zeros((64, 96))
        av = np.unpackbits(a.view(np.uint8), axis=-1)
        bv = np.unpackbits(b.view(np.uint8), axis=-1)
        want = (av[:, None, :] != bv[None, :, :]).sum(-1)
        np.testing.assert_array_equal(got, want)

    def test_match_identity(self):
        a = rng.integers(0, 2 ** 32, size=(32, 8), dtype=np.uint32)
        bits = unpack_bits(jnp.array(a))
        valid = jnp.ones(32, bool)
        res = match_descriptors(bits, bits, valid, valid, check_rotation=False, ratio=2.0)
        np.testing.assert_array_equal(np.asarray(res.idx), np.arange(32))


class TestFrameMatching:
    def test_shifted_image_matching_recall(self):
        """Extract on an image and a translated copy; matches should agree
        with the known shift — validates FAST+BRIEF+matcher end to end."""
        img = make_texture()
        shift = 8
        img2 = np.roll(img, shift, axis=1)
        spec = PyramidSpec(n_levels=4, scale_factor=1.2, height=480, width=640)
        intr = Intrinsics(fx=525, fy=525, cx=319.5, cy=239.5, width=640, height=480)
        depth = np.ones((480, 640), np.float32)
        f1 = build_frame(jnp.array(img), jnp.array(depth), spec, intr, n_features=512)
        f2 = build_frame(jnp.array(img2), jnp.array(depth), spec, intr, n_features=512)
        res = match_descriptors(
            f1.bits, f2.bits, f1.valid, f2.valid, f1.angle, f2.angle, max_dist=64.0
        )
        m = np.asarray(res.valid)
        assert m.sum() > 50, f"too few matches: {m.sum()}"
        duv = np.asarray(f2.uv)[np.asarray(res.idx)[m]] - np.asarray(f1.uv)[m]
        err = np.linalg.norm(duv - np.array([shift, 0.0]), axis=-1)
        inlier = np.mean(err < 2.0)
        assert inlier > 0.8, f"shift-consistent inlier ratio too low: {inlier}"

    def test_rotated_image_matching(self):
        """30-degree in-plane rotation: steered BRIEF should still match."""
        img = make_texture()
        M = cv2.getRotationMatrix2D((320, 240), 30, 1.0)
        img2 = cv2.warpAffine(img, M, (640, 480))
        spec = PyramidSpec(n_levels=4, scale_factor=1.2, height=480, width=640)
        intr = Intrinsics(fx=525, fy=525, cx=319.5, cy=239.5, width=640, height=480)
        depth = np.ones((480, 640), np.float32)
        f1 = build_frame(jnp.array(img), jnp.array(depth), spec, intr, n_features=512)
        f2 = build_frame(jnp.array(img2), jnp.array(depth), spec, intr, n_features=512)
        res = match_descriptors(
            f1.bits, f2.bits, f1.valid, f2.valid, f1.angle, f2.angle, max_dist=64.0
        )
        m = np.asarray(res.valid)
        assert m.sum() > 30, f"too few matches under rotation: {m.sum()}"
        # Matched points should map under the known rotation
        p1 = np.asarray(f1.uv)[m]
        p2 = np.asarray(f2.uv)[np.asarray(res.idx)[m]]
        pred = p1 @ M[:, :2].T + M[:, 2]
        err = np.linalg.norm(pred - p2, axis=-1)
        inlier = np.mean(err < 3.0)
        assert inlier > 0.6, f"rotation-consistent inlier ratio too low: {inlier}"
