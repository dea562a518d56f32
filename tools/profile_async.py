"""Probe async transfer behavior over the device tunnel: can uploads,
dispatch, and output fetches overlap so steady-state per-frame cost
approaches pure device compute?"""
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

from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.ops.pyramid import PyramidSpec
from spslam_tpu.tracking.tracker import TrackerConfig, track_frame_step


def main():
    seq = make_sequence(n_frames=3)
    intr = seq.intr
    cfg = TrackerConfig(th_depth=5.0)
    spec = PyramidSpec(n_levels=8, scale_factor=1.2, height=intr.height, width=intr.width)
    gray, depth = seq.frames[1]
    gray_u8 = np.clip(gray, 0, 255).astype(np.uint8)
    depth_u16 = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
    rng = np.random.default_rng(0)
    PL = cfg.local_points_cap
    pt_pack = jnp.asarray(rng.normal(size=(PL, 8)).astype(np.float32))
    pt_desc = jnp.asarray(rng.integers(0, 2**32, size=(PL, 8), dtype=np.uint64).astype(np.uint32))
    pt_valid = jnp.asarray(np.ones(PL, bool))
    T0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))

    def dispatch(g, d, T):
        return track_frame_step(
            g, d, T, T, jnp.asarray(True), pt_pack, pt_desc, pt_valid,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            spec, intr, cfg.n_features, cfg.th_fast_high, cfg.th_fast_low)

    # warm compile
    g0 = jnp.asarray(gray_u8); d0 = jnp.asarray(depth_u16)
    out = dispatch(g0, d0, T0)
    jax.block_until_ready(out)

    # 1) is device_put asynchronous? (return-time, not completion-time)
    t0 = time.perf_counter()
    gs = [jax.device_put(gray_u8) for _ in range(5)]
    t_ret = (time.perf_counter() - t0) / 5 * 1000
    jax.block_until_ready(gs)
    print(f"device_put return time      : {t_ret:7.2f} ms/each")

    # 2) copy_to_host_async then read later
    o = dispatch(g0, d0, T0)
    small = o[1]
    small.copy_to_host_async()
    time.sleep(0.2)
    t0 = time.perf_counter()
    np.asarray(small)
    print(f"read after async fetch      : {(time.perf_counter()-t0)*1000:7.2f} ms")

    # 3) realistic steady-state loop, pipeline depth K: fresh uploads each
    # frame, chained device pose, async output fetch, resolve K frames late.
    for K in (1, 2, 3, 4, 6):
        N = 30
        pend = []
        T = T0
        # prime
        t0 = time.perf_counter()
        for i in range(N):
            g = jax.device_put(gray_u8)
            d = jax.device_put(depth_u16)
            o = dispatch(g, d, T)
            T = o[1]
            fetch = o[1:]
            for a in fetch:
                a.copy_to_host_async()
            pend.append(fetch)
            if len(pend) > K:
                p = pend.pop(0)
                _ = [np.asarray(a) for a in p]
        for p in pend:
            _ = [np.asarray(a) for a in p]
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"steady-state K={K}           : {dt:7.2f} ms/frame")


if __name__ == "__main__":
    main()
