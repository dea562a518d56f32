"""A/B: real track_frame_step vs inline replica, interleaved repeats to
defeat tunnel-noise.  Usage: python tools/profile_ab.py [n_per_rep] [reps]"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from spslam_tpu.frontend.frame import build_frame
    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.ops.brief import unpack_bits
    from spslam_tpu.ops.pyramid import PyramidSpec
    from spslam_tpu.tracking.tracker import (
        TrackerConfig, _match_and_optimize, _pack_frame, track_frame_step,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    seq = make_sequence(n_frames=2)
    gray, depth = seq.frames[0]
    intr = seq.intr
    cfg = TrackerConfig()
    spec = PyramidSpec(n_levels=8, scale_factor=1.2, height=intr.height, width=intr.width)

    g = np.clip(gray, 0, 255).astype(np.uint8)
    d = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
    d8 = d[None].view(np.uint8).reshape(depth.shape[0], depth.shape[1], 2)
    frame_u8 = jnp.asarray(np.stack([g, d8[..., 0], d8[..., 1]]))
    gray_j = jnp.asarray(np.clip(gray, 0, 255).astype(np.uint8))
    depth_j = jnp.asarray(np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
    PL = cfg.local_points_cap
    pt_pack = jnp.asarray(np.random.RandomState(0).randn(PL, 9).astype(np.float32))
    pt_desc = jnp.asarray(
        np.random.RandomState(1).randint(0, 2**32, (PL, 8), np.uint64).astype(np.uint32)
    )
    T0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
    pl_pack = jnp.zeros((64, 5), jnp.float32)
    hv = jnp.asarray(True)

    def real(T, T2):
        return track_frame_step(
            gray_j, depth_j, T, T2, hv, pt_pack, pt_desc, pl_pack,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            spec, intr, cfg.n_features, cfg.th_fast_high, cfg.th_fast_low,
        )

    @jax.jit
    def replica(frame_u8, T_prev, T_prev2, hv, pt_pack, pt_desc):
        from spslam_tpu.geometry.lie import se3_compose, se3_inverse
        vel = se3_compose(T_prev, se3_inverse(T_prev2))
        T_pred = jnp.where(hv, se3_compose(vel, T_prev), T_prev)
        gray = frame_u8[0].astype(jnp.float32)
        depth = (
            frame_u8[1].astype(jnp.float32) + frame_u8[2].astype(jnp.float32) * 256.0
        ) / 5000.0
        pt_bits = unpack_bits(pt_desc)
        frame = build_frame(gray, depth, spec, intr, n_features=cfg.n_features,
                            th_high=cfg.th_fast_high, th_low=cfg.th_fast_low)
        o1, _, _ = _match_and_optimize(
            T_pred, pt_pack[:, 0:3], pt_pack[:, 3:6], pt_pack[:, 6], pt_pack[:, 7],
            pt_bits, pt_pack[:, 8] > 0.5, frame, 22.0, 100.0, intr,
            n_rounds=2, n_iters=5)
        o2, mi, m = _match_and_optimize(
            o1.T_cw, pt_pack[:, 0:3], pt_pack[:, 3:6], pt_pack[:, 6], pt_pack[:, 7],
            pt_bits, pt_pack[:, 8] > 0.5, frame, 6.0, 100.0, intr,
            n_rounds=4, n_iters=6)
        fp, de = _pack_frame(frame)
        scal = jnp.concatenate([o2.T_cw, jnp.zeros((5,), jnp.float32)])
        mp = jnp.where(m, jnp.maximum(mi, 0), -1).astype(jnp.int32)
        return frame, scal, mp, fp, de

    def run_real():
        T, T2 = T0, T0
        for _ in range(n):
            frame, scal, mp, fp, de = real(T, T2)
            T2, T = T, scal[0:7]
        jax.block_until_ready(scal)

    def run_replica():
        T, T2 = T0, T0
        for _ in range(n):
            frame, scal, mp, fp, de = replica(frame_u8, T, T2, hv, pt_pack, pt_desc)
            T2, T = T, scal[0:7]
        jax.block_until_ready(scal)

    run_real(); run_replica()  # warm
    ra, rb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); run_real(); ra.append((time.perf_counter() - t0) / n * 1e3)
        t0 = time.perf_counter(); run_replica(); rb.append((time.perf_counter() - t0) / n * 1e3)
    print(f"real    track_frame_step: {['%.2f' % x for x in ra]}  median {np.median(ra):.2f} ms")
    print(f"replica (inline jit)    : {['%.2f' % x for x in rb]}  median {np.median(rb):.2f} ms")


if __name__ == "__main__":
    main()
