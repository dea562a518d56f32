"""Per-stage tracking-path profiler on the live backend.

Measures (steady-state medians, block_until_ready-fenced):
  * device time of the fused track_frame_step and of each frontend stage,
  * host<->device transfer latency over the tunnel (upload/download RTT),
  * System-level per-frame split (dispatch vs resolve vs snapshot rebuild).

Usage: python tools/profile_frame.py [n_iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0  # ms


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
    from spslam_tpu.ops.brief import describe_levels
    from spslam_tpu.ops.fast import detect_levels, level_feature_counts
    from spslam_tpu.ops.pyramid import PyramidSpec, build_pyramid_levels
    from spslam_tpu.tracking.tracker import TrackerConfig, track_frame_step

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    seq = make_sequence(n_frames=3)
    gray, depth = seq.frames[0]
    intr = seq.intr
    cfg = TrackerConfig()
    spec = PyramidSpec(n_levels=8, scale_factor=1.2, height=intr.height, width=intr.width)

    gray_u8 = jnp.asarray(np.clip(gray, 0, 255).astype(np.uint8))
    depth_u16 = jnp.asarray(np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))
    gray_f = gray_u8.astype(jnp.float32)
    depth_f = depth_u16.astype(jnp.float32) / 5000.0

    # --- frontend stages (the LIVE true-size level path used by build_frame)
    r = {}
    levels, levels_blur = jax.block_until_ready(
        build_pyramid_levels(gray_f, spec, blur=True)
    )
    r["build_pyramid_levels"] = timeit(
        lambda: jax.block_until_ready(build_pyramid_levels(gray_f, spec, blur=True)), n
    )
    det = jax.block_until_ready(
        detect_levels(levels, spec, n_features=cfg.n_features)
    )
    r["detect_levels"] = timeit(
        lambda: jax.block_until_ready(
            detect_levels(levels, spec, n_features=cfg.n_features)
        ),
        n,
    )
    counts = level_feature_counts(spec, cfg.n_features)
    r["describe_levels"] = timeit(
        lambda: jax.block_until_ready(
            describe_levels(levels_blur, det["xy_level"], counts)
        ),
        n,
    )
    r["build_frame(all)"] = timeit(
        lambda: jax.block_until_ready(
            build_frame(gray_f, depth_f, spec, intr, n_features=cfg.n_features)
        ),
        n,
    )

    # --- fused step -------------------------------------------------------
    # mirror Tracker._upload_frame (raw native-dtype uploads) and
    # Tracker._local_snapshot_build: [P, 9] pack with the valid flag in
    # column 8
    P = cfg.local_points_cap
    rng = np.random.default_rng(0)
    pack_np = np.concatenate(
        [
            rng.normal(size=(P, 8)).astype(np.float32),
            np.ones((P, 1), np.float32),
        ],
        axis=-1,
    )
    pack = jnp.asarray(pack_np)
    desc = jnp.asarray(rng.integers(0, 2**32, size=(P, 8), dtype=np.uint64).astype(np.uint32))
    pl_pack = jnp.zeros((64, 5), jnp.float32)
    T0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
    gray_j = jnp.asarray(np.clip(gray, 0, 255).astype(np.uint8))
    depth_j = jnp.asarray(np.clip(depth * 5000.0, 0, 65535).astype(np.uint16))

    def fused():
        out = track_frame_step(
            gray_j, depth_j, T0, T0, jnp.asarray(False),
            pack, desc, pl_pack,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            spec, intr, cfg.n_features, cfg.th_fast_high, cfg.th_fast_low,
        )
        jax.block_until_ready(out[1:])

    r["track_frame_step(fused)"] = timeit(fused, n)

    # --- tunnel latency ---------------------------------------------------
    tiny = jnp.zeros(8, jnp.float32)
    jax.block_until_ready(tiny)
    r["device_get(tiny) RTT"] = timeit(lambda: jax.device_get(tiny), n)
    big_up = np.zeros((480, 640), np.uint8)
    r["upload 300KB u8"] = timeit(
        lambda: jax.block_until_ready(jnp.asarray(big_up)), n
    )
    snap_up = np.zeros((4096, 8), np.float32)
    r["upload snapshot f32 128KB"] = timeit(
        lambda: jax.block_until_ready(jnp.asarray(snap_up)), n
    )

    for k, v in r.items():
        print(f"{k:32s} {v:8.2f} ms")


if __name__ == "__main__":
    main()
