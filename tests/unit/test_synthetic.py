import numpy as np
import jax.numpy as jnp

from spslam_tpu.geometry import Intrinsics, se3_apply, se3_inverse, unproject
from spslam_tpu.io.synthetic import make_room, make_sequence, orbit_trajectory, render_frame
from spslam_tpu.eval.ate import ate_rmse


class TestRenderer:
    def test_render_and_depth_geometry(self):
        intr = Intrinsics(fx=525.0, fy=525.0, cx=159.5, cy=119.5, width=320, height=240)
        rects = make_room(seed=0)
        T = orbit_trajectory(3)[0]
        img, depth = render_frame(rects, T, intr)
        assert img.shape == (240, 320)
        assert (depth > 0).mean() > 0.95  # closed room: almost all pixels hit
        assert img.std() > 20  # textured
        # Unproject center pixels and verify they lie on some rect plane
        ys, xs = np.mgrid[60:180:30, 60:260:40]
        uv = jnp.array(np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32))
        d = jnp.array(depth[ys.ravel(), xs.ravel()])
        xc = unproject(intr, uv, d)
        xw = np.asarray(se3_apply(se3_inverse(jnp.array(T)), xc))
        dists = []
        for p in xw:
            best = min(
                abs(np.dot(r.normal, p - r.origin)) for r in rects
            )
            dists.append(best)
        assert np.median(dists) < 1e-3

    def test_sequence_and_ate_zero(self):
        seq = make_sequence(n_frames=5)
        assert len(seq.frames) == 5
        rmse, _ = ate_rmse(seq.poses_gt, seq.poses_gt)
        assert rmse < 1e-6  # float32 alignment noise

    def test_ate_detects_error(self):
        seq = make_sequence(n_frames=5)
        noisy = seq.poses_gt.copy()
        noisy[:, 4:] += np.random.default_rng(0).normal(0, 0.05, (5, 3)).astype(np.float32)
        rmse, _ = ate_rmse(noisy, seq.poses_gt)
        assert 0.01 < rmse < 0.2
