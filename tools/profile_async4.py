"""Test: (A) pre-upload all frames then dispatch loop; (B) chunk-phased
upload/dispatch; (C) single scan-fused dispatch per chunk."""
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


g0 = jnp.asarray(gray_u8)
d0 = jnp.asarray(depth_u16)
jax.block_until_ready(dispatch(g0, d0, T0))
N = 32
frames = [(gray_u8.copy(), depth_u16.copy()) for _ in range(N)]


def fetch(o):
    fet = o[1:]
    for a in fet:
        a.copy_to_host_async()
    return fet


def drain(pend, K=3):
    while len(pend) > K:
        for a in pend.pop(0):
            np.asarray(a)


# A) pre-upload everything, then dispatch loop
t0 = time.perf_counter()
bufs = [(jax.device_put(g), jax.device_put(d)) for g, d in frames]
jax.block_until_ready(bufs[-1])
t_up = time.perf_counter() - t0
T = T0
pend = []
t0 = time.perf_counter()
for i in range(N):
    o = dispatch(bufs[i][0], bufs[i][1], T)
    T = o[1]
    pend.append(fetch(o))
    drain(pend)
drain(pend, 0)
t_disp = time.perf_counter() - t0
print(f"A pre-upload: up {t_up/N*1000:6.2f} + disp {t_disp/N*1000:6.2f} = {(t_up+t_disp)/N*1000:6.2f} ms/frame")

# B) phase-chunked: upload K frames (queue ~empty), then dispatch K
for K in (4, 8):
    T = T0
    pend = []
    t0 = time.perf_counter()
    for c in range(N // K):
        chunk = [(jax.device_put(g), jax.device_put(d)) for g, d in frames[c * K:(c + 1) * K]]
        for g, d in chunk:
            o = dispatch(g, d, T)
            T = o[1]
            pend.append(fetch(o))
        drain(pend, 2)
    drain(pend, 0)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"B phase-chunked K={K}: {dt:6.2f} ms/frame")

# C) scan-fused: one dispatch per K frames over stacked inputs
from functools import partial


@partial(jax.jit, static_argnames=("spec_", "n_features"))
def track_chunk(grays, depths, T_prev, T_prev2, pt_pack, pt_desc, pt_valid, spec_, n_features):
    def step(carry, gd):
        Tp, Tp2 = carry
        g, d = gd
        o = track_frame_step(
            g, d, Tp, Tp2, jnp.asarray(True), pt_pack, pt_desc, pt_valid,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            spec_, intr, n_features, cfg.th_fast_high, cfg.th_fast_low)
        return (o[1], Tp), o[1:]

    (Tl, Tl2), outs = jax.lax.scan(step, (T_prev, T_prev2), (grays, depths))
    return outs


for K in (4, 8):
    gk = np.stack([f[0] for f in frames[:K]])
    dk = np.stack([f[1] for f in frames[:K]])
    o = track_chunk(jnp.asarray(gk), jnp.asarray(dk), T0, T0, pt_pack, pt_desc, pt_valid, spec, cfg.n_features)
    jax.block_until_ready(o)
    T = T0
    pend = []
    t0 = time.perf_counter()
    for c in range(N // K):
        gk = jax.device_put(np.stack([f[0] for f in frames[c * K:(c + 1) * K]]))
        dk = jax.device_put(np.stack([f[1] for f in frames[c * K:(c + 1) * K]]))
        o = track_chunk(gk, dk, T, T, pt_pack, pt_desc, pt_valid, spec, cfg.n_features)
        T = o[0][-1]
        for a in o:
            a.copy_to_host_async()
        pend.append(o)
        if len(pend) > 1:
            for a in pend.pop(0):
                np.asarray(a)
    for p in pend:
        for a in p:
            np.asarray(a)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"C scan-fused K={K}: {dt:6.2f} ms/frame")
