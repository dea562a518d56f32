"""Isolate what limits the async steady state: uploads vs fetches vs count
of fetched buffers vs batched uploads."""
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

    g0 = jnp.asarray(gray_u8); d0 = jnp.asarray(depth_u16)
    jax.block_until_ready(dispatch(g0, d0, T0))

    N = 30

    def run(label, fresh_upload, fetch_mode):
        T = T0
        pend = []
        t0 = time.perf_counter()
        for i in range(N):
            if fresh_upload:
                g = jax.device_put(gray_u8); d = jax.device_put(depth_u16)
            else:
                g, d = g0, d0
            o = dispatch(g, d, T)
            T = o[1]
            if fetch_mode == "all":
                fet = o[1:]
            elif fetch_mode == "one":
                fet = (o[1],)
            else:
                fet = ()
            for a in fet:
                a.copy_to_host_async()
            pend.append(fet)
            if len(pend) > 3:
                for a in pend.pop(0):
                    np.asarray(a)
        jax.block_until_ready(T)
        for p in pend:
            for a in p:
                np.asarray(a)
        dt = (time.perf_counter() - t0) / N * 1000
        print(f"{label:34s}: {dt:7.2f} ms/frame")

    run("no upload, no fetch", False, "none")
    run("no upload, fetch one", False, "one")
    run("no upload, fetch all(8)", False, "all")
    run("fresh upload, no fetch", True, "none")
    run("fresh upload, fetch all(8)", True, "all")

    # batched upload: one [K,H,W] put per K frames
    K = 8
    gray_k = np.stack([gray_u8] * K)
    depth_k = np.stack([depth_u16] * K)
    T = T0
    pend = []
    t0 = time.perf_counter()
    for c in range(N // K):
        gk = jax.device_put(gray_k)
        dk = jax.device_put(depth_k)
        for i in range(K):
            o = dispatch(gk[i], dk[i], T)
            T = o[1]
            fet = o[1:]
            for a in fet:
                a.copy_to_host_async()
            pend.append(fet)
            if len(pend) > 3:
                for a in pend.pop(0):
                    np.asarray(a)
    jax.block_until_ready(T)
    dt = (time.perf_counter() - t0) / (N // K * K) * 1000
    print(f"{'batched upload K=8, fetch all':34s}: {dt:7.2f} ms/frame")


if __name__ == "__main__":
    main()
