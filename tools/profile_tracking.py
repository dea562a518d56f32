"""Stage-level timing of the tracking hot path on the current backend.

Times (median over repeats, after warmup):
  upload, build_pyramid, detect_pyramid, describe, match+opt, the fused
  track_frame_step, device_get of its outputs, and back-to-back dispatch
  throughput (the pipelined steady state).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

from spslam_tpu.frontend.frame import build_frame
from spslam_tpu.geometry.camera import Intrinsics
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.ops.brief import describe, unpack_bits
from spslam_tpu.ops.fast import detect_pyramid
from spslam_tpu.ops.pyramid import PyramidSpec, build_pyramid
from spslam_tpu.tracking.tracker import TrackerConfig, _match_and_optimize, track_frame_step


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)
    seq = make_sequence(n_frames=3)
    intr = seq.intr
    cfg = TrackerConfig(th_depth=5.0)
    spec = PyramidSpec(n_levels=8, scale_factor=1.2, height=intr.height, width=intr.width)
    gray, depth = seq.frames[1]
    gray_u8 = np.clip(gray, 0, 255).astype(np.uint8)
    depth_u16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)

    # --- upload ---
    t_up = timeit(lambda: (jnp.asarray(gray_u8), jnp.asarray(depth_u16)))
    print(f"upload gray+depth      : {t_up:8.2f} ms")

    gray_j = jnp.asarray(gray_u8).astype(jnp.float32)
    depth_j = jnp.asarray(depth_u16).astype(jnp.float32) / 5000.0

    # --- stages ---
    t_pyr = timeit(lambda: build_pyramid(gray_j, spec, blur=True))
    print(f"build_pyramid          : {t_pyr:8.2f} ms")
    pyr, pyr_blur, _ = build_pyramid(gray_j, spec, blur=True)
    t_det = timeit(lambda: detect_pyramid(pyr, spec, n_features=1024))
    print(f"detect_pyramid         : {t_det:8.2f} ms")
    det = detect_pyramid(pyr, spec, n_features=1024)
    t_desc = timeit(lambda: describe(pyr, pyr_blur, det["octave"], det["xy_level"]))
    print(f"describe               : {t_desc:8.2f} ms")
    t_frame = timeit(lambda: build_frame(gray_j, depth_j, spec, intr, n_features=1024))
    print(f"build_frame (fused)    : {t_frame:8.2f} ms")

    frame = build_frame(gray_j, depth_j, spec, intr, n_features=1024)
    PL = cfg.local_points_cap
    rng = np.random.default_rng(0)
    pt_pack = jnp.asarray(rng.normal(size=(PL, 8)).astype(np.float32))
    pt_desc = jnp.asarray(rng.integers(0, 2**32, size=(PL, 8), dtype=np.uint64).astype(np.uint32))
    pt_valid = jnp.asarray(np.ones(PL, bool))
    T0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))
    bits = unpack_bits(pt_desc)
    t_mo = timeit(lambda: _match_and_optimize(
        T0, pt_pack[:, 0:3], pt_pack[:, 3:6], pt_pack[:, 6], pt_pack[:, 7],
        bits, pt_valid, frame, 15.0, 100.0, intr, n_rounds=4, n_iters=6))
    print(f"match+optimize (4x6)   : {t_mo:8.2f} ms")

    # --- fused step ---
    args = (jnp.asarray(gray_u8), jnp.asarray(depth_u16), T0, T0, jnp.asarray(False),
            pt_pack, pt_desc, pt_valid,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            spec, intr, cfg.n_features, cfg.th_fast_high, cfg.th_fast_low)
    t_step = timeit(lambda: track_frame_step(*args))
    print(f"track_frame_step       : {t_step:8.2f} ms")

    out = track_frame_step(*args)
    t_get = timeit(lambda: jax.device_get(out[1:]), n=20)
    print(f"device_get outputs     : {t_get:8.2f} ms")

    # small-transfer round trip (tunnel latency probe)
    small = jnp.zeros((4,), jnp.float32)
    t_rt = timeit(lambda: jax.device_get(small + 1.0), n=20)
    print(f"tiny round trip        : {t_rt:8.2f} ms")

    # back-to-back dispatch: steady-state throughput with chained poses
    def chain(n=10):
        T = T0
        outs = []
        for _ in range(n):
            o = track_frame_step(args[0], args[1], T, T, jnp.asarray(True),
                                 *args[5:11], spec, intr, cfg.n_features,
                                 cfg.th_fast_high, cfg.th_fast_low)
            T = o[1]
            outs.append(o[2])
        return outs

    for _ in range(2):
        jax.block_until_ready(chain())
    t0 = time.perf_counter()
    jax.block_until_ready(chain(20))
    dt = (time.perf_counter() - t0) / 20 * 1000
    print(f"chained step (amortized): {dt:8.2f} ms")


if __name__ == "__main__":
    main()
