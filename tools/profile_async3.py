"""Steady-state variants: packed single-buffer upload, uploader thread,
fresh numpy each frame (realistic), queue-depth effects."""
import os
import queue
import sys
import threading
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
N = 30


def steady(label, upload_fn, K=3):
    T = T0
    pend = []
    t0 = time.perf_counter()
    for i in range(N):
        g, d = upload_fn(i)
        o = dispatch(g, d, T)
        T = o[1]
        fet = o[1:]
        for a in fet:
            a.copy_to_host_async()
        pend.append(fet)
        if len(pend) > K:
            for a in pend.pop(0):
                np.asarray(a)
    for p in pend:
        for a in p:
            np.asarray(a)
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{label:40s}: {dt:7.2f} ms/frame")


# realistic: fresh numpy buffers each frame
frames = [(gray_u8.copy(), depth_u16.copy()) for _ in range(N)]
steady("fresh np, 2 puts", lambda i: (jax.device_put(frames[i][0]), jax.device_put(frames[i][1])))

# single packed buffer per frame
packed = [np.concatenate([f[0].reshape(-1), f[1].view(np.uint8).reshape(-1)]) for f in frames]
H, W = gray_u8.shape


def unpack_put(i):
    buf = jax.device_put(packed[i])
    g = buf[: H * W].reshape(H, W)
    d = jax.lax.bitcast_convert_type(buf[H * W :].reshape(H, W, 2), jnp.uint16).reshape(H, W)
    return g, d


jax.block_until_ready(dispatch(*unpack_put(0), T0))
steady("fresh np, 1 packed put", unpack_put)

# uploader thread: puts happen on another thread, main loop consumes
def run_threaded(label):
    q = queue.Queue(maxsize=4)

    def uploader():
        for i in range(N):
            g = jax.device_put(frames[i][0])
            d = jax.device_put(frames[i][1])
            q.put((g, d))

    th = threading.Thread(target=uploader)
    T = T0
    pend = []
    t0 = time.perf_counter()
    th.start()
    for i in range(N):
        g, d = q.get()
        o = dispatch(g, d, T)
        T = o[1]
        fet = o[1:]
        for a in fet:
            a.copy_to_host_async()
        pend.append(fet)
        if len(pend) > 3:
            for a in pend.pop(0):
                np.asarray(a)
    for p in pend:
        for a in p:
            np.asarray(a)
    th.join()
    dt = (time.perf_counter() - t0) / N * 1000
    print(f"{label:40s}: {dt:7.2f} ms/frame")


run_threaded("uploader thread, 2 puts")

# shallow queue: block on current frame's T each iteration (K=0 resolve)
steady("fresh np 2 puts, resolve depth1", lambda i: (jax.device_put(frames[i][0]), jax.device_put(frames[i][1])), K=1)
steady("fresh np 2 puts, resolve depth6", lambda i: (jax.device_put(frames[i][0]), jax.device_put(frames[i][1])), K=6)
