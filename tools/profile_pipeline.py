"""Steady-state pipeline decomposition: what actually bounds ms/frame?

Measures, on the live backend:
  A. pure device throughput of track_frame_step (N chained dispatches on an
     already-uploaded frame, one terminal sync) -> device ms/frame,
  B. H2D upload throughput (N async uploads of distinct f32 frames,
     one terminal sync) -> upload ms/frame,
  C. D2H drain throughput for the 4 per-frame output buffers,
  D. the full process_pipelined loop on the synthetic orbit (current bench).

Usage: python tools/profile_pipeline.py [n_iters]
"""

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

    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.ops.pyramid import PyramidSpec
    from spslam_tpu.tracking.tracker import Tracker, TrackerConfig, track_frame_step

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    seq = make_sequence(n_frames=8)
    intr = seq.intr
    cfg = TrackerConfig()
    spec = PyramidSpec(n_levels=8, scale_factor=1.2, height=intr.height, width=intr.width)

    # mirror Tracker._upload_frame's live dtypes: u8 gray + u16 raw depth
    # at the configured upload stride
    s = cfg.depth_upload_stride
    frames_np = [np.clip(g, 0, 255).astype(np.uint8) for g, d in seq.frames]
    depths_np = [
        np.ascontiguousarray(
            np.clip(d * 5000.0, 0, 65535).astype(np.uint16)[::s, ::s]
        )
        for g, d in seq.frames
    ]
    frame_j = jnp.asarray(frames_np[0])
    depth_j = jnp.asarray(depths_np[0])
    PL = cfg.local_points_cap
    pt_pack = jnp.zeros((PL, 9), jnp.float32)
    pt_desc = jnp.zeros((PL, 8), jnp.uint32)
    pl_pack = jnp.zeros((64, 5), jnp.float32)
    T0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))

    hv = jnp.asarray(True)

    def step(frame_b, depth_b, T_prev, T_prev2):
        return track_frame_step(
            frame_b, depth_b, T_prev, T_prev2, hv,
            pt_pack, pt_desc, pl_pack,
            cfg.motion_search_radius, cfg.local_search_radius, cfg.th_depth,
            spec, intr, cfg.n_features, cfg.th_fast_high, cfg.th_fast_low,
        )

    # warmup/compile
    out = step(frame_j, depth_j, T0, T0)
    jax.block_until_ready(out)

    # --- A: pure device throughput (chained dispatches, one sync) --------
    t0 = time.perf_counter()
    Tp, Tp2 = T0, T0
    last = None
    for _ in range(n):
        frame, out, _big = step(frame_j, depth_j, Tp, Tp2)
        Tp2, Tp = Tp, jax.lax.bitcast_convert_type(out[0:7], jnp.float32)
        last = out
    jax.block_until_ready(last)
    dev_ms = (time.perf_counter() - t0) / n * 1000
    print(f"A. device-only throughput      {dev_ms:8.2f} ms/frame")

    # --- B: H2D upload throughput ----------------------------------------
    bufs = [frames_np[i % len(frames_np)].copy() for i in range(n)]
    dbufs = [depths_np[i % len(depths_np)].copy() for i in range(n)]
    t0 = time.perf_counter()
    devs = [(jnp.asarray(b), jnp.asarray(db)) for b, db in zip(bufs, dbufs)]
    jax.block_until_ready(devs)
    up_ms = (time.perf_counter() - t0) / n * 1000
    print(f"B. H2D upload throughput       {up_ms:8.2f} ms/frame "
          f"({(frames_np[0].nbytes + depths_np[0].nbytes)/1024:.0f} KB/frame)")

    # --- B2: upload + dispatch interleaved (no D2H) ----------------------
    t0 = time.perf_counter()
    Tp, Tp2 = T0, T0
    for i in range(n):
        fb = jnp.asarray(bufs[i])
        db = jnp.asarray(dbufs[i])
        frame, out, _big = step(fb, db, Tp, Tp2)
        Tp2, Tp = Tp, jax.lax.bitcast_convert_type(out[0:7], jnp.float32)
    jax.block_until_ready(out)
    b2_ms = (time.perf_counter() - t0) / n * 1000
    print(f"B2. upload+dispatch (no D2H)   {b2_ms:8.2f} ms/frame")

    # --- C: + async D2H of the per-frame small output, drained 2 behind --
    t0 = time.perf_counter()
    Tp, Tp2 = T0, T0
    pend = []
    for i in range(n):
        fb = jnp.asarray(bufs[i])
        db = jnp.asarray(dbufs[i])
        frame, out, _big = step(fb, db, Tp, Tp2)
        Tp2, Tp = Tp, jax.lax.bitcast_convert_type(out[0:7], jnp.float32)
        out.copy_to_host_async()
        pend.append(out)
        if len(pend) > 2:
            np.asarray(pend.pop(0))
    while pend:
        np.asarray(pend.pop(0))
    c_ms = (time.perf_counter() - t0) / n * 1000
    print(f"C. +packed-buffer D2H drain    {c_ms:8.2f} ms/frame")

    # --- C2: only scal drained (36 B) ------------------------------------


    # --- E: device-only per-stage breakdown (chained, one sync each) -----
    from spslam_tpu.frontend.frame import build_frame
    from spslam_tpu.tracking.tracker import _match_and_optimize
    from spslam_tpu.ops.brief import unpack_bits

    gray_f = frame_j.astype(jnp.float32)
    depth_f = depth_j.astype(jnp.float32) / 5000.0

    def bf():
        return build_frame(gray_f, depth_f, spec, intr, n_features=cfg.n_features,
                           th_high=cfg.th_fast_high, th_low=cfg.th_fast_low)

    fr = bf()
    jax.block_until_ready(fr)
    t0 = time.perf_counter()
    for _ in range(n):
        fr = bf()
    jax.block_until_ready(fr)
    print(f"E1. build_frame device-only    {(time.perf_counter()-t0)/n*1000:8.2f} ms")

    bits = unpack_bits(pt_desc)
    pos, nrm = pt_pack[:, 0:3], pt_pack[:, 3:6]
    mind, maxd = pt_pack[:, 6], pt_pack[:, 7]
    pv = pt_pack[:, 8] > 0.5

    def mo(T, r, nr, ni):
        o, mi, m = _match_and_optimize(T, pos, nrm, mind, maxd, bits, pv, fr,
                                       r, 100.0, intr, n_rounds=nr, n_iters=ni)
        return o.T_cw

    for r, nr, ni in ((22.0, 2, 5), (6.0, 4, 6)):
        T = mo(T0, r, nr, ni)  # warm/compile
        jax.block_until_ready(T)
        t0 = time.perf_counter()
        for _ in range(n):
            T = mo(T, r, nr, ni)
        jax.block_until_ready(T)
        print(f"E2/3. match+opt ({nr}x{ni})        {(time.perf_counter()-t0)/n*1000:8.2f} ms")

    # E4: search_by_projection alone vs pose_optimization alone
    from spslam_tpu.tracking.tracker import project_points
    from spslam_tpu.ops.match import search_by_projection
    from spslam_tpu.solver.pose_opt import pose_optimization
    from spslam_tpu.solver.robust import octave_inv_sigma2

    @jax.jit
    def match_only(T):
        uv, ok, op, _ = project_points(T, pos, nrm, mind, maxd, pv, intr)
        rad = 6.0 * 1.2 ** op.astype(jnp.float32)
        res = search_by_projection(
            uv, bits, ok, op, fr.uv, fr.bits, fr.valid, fr.octave, fr.angle,
            jnp.zeros_like(op, dtype=jnp.float32), rad, max_dist=100.0,
            ratio=0.95, check_rotation=False, octave_slack=1)
        return res.idx.sum()

    s = match_only(T0)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(n):
        s = match_only(T0 + 0 * s.astype(jnp.float32) * 1e-20)
    jax.block_until_ready(s)
    print(f"E4. search_by_projection only  {(time.perf_counter()-t0)/n*1000:8.2f} ms")

    @partial(jax.jit, static_argnames=("nr", "ni"))
    def opt_only(T, nr, ni):
        kp = jnp.zeros((PL,), jnp.int32)
        o = pose_optimization(T, pos, fr.uv[kp], jnp.full((PL,), -1.0),
                              octave_inv_sigma2(fr.octave[kp]),
                              pv, intr, n_rounds=nr, n_iters=ni)
        return o.T_cw

    for nr, ni in ((4, 6),):
        T = opt_only(T0, nr, ni)
        jax.block_until_ready(T)
        t0 = time.perf_counter()
        for _ in range(n):
            T = opt_only(T, nr, ni)
        jax.block_until_ready(T)
        print(f"E5. pose_optimization ({nr}x{ni})  {(time.perf_counter()-t0)/n*1000:8.2f} ms")

    # --- D: full System bench loop (current headline path) ---------------
    from spslam_tpu.map.store import MapStore, MapConfig
    seq2 = make_sequence(n_frames=min(n, 40))
    store = MapStore(MapConfig())
    tr = Tracker(cfg, seq2.intr, store)
    # warm
    for g, d in seq2.frames[:3]:
        tr.process_pipelined(g, d, 0.0)
    tr.flush_pipeline()
    store2 = MapStore(MapConfig())
    tr = Tracker(cfg, seq2.intr, store2)
    t0 = time.perf_counter()
    for i, (g, d) in enumerate(seq2.frames):
        tr.process_pipelined(g, d, float(i))
    tr.flush_pipeline()
    d_ms = (time.perf_counter() - t0) / len(seq2.frames) * 1000
    print(f"D. full pipelined track loop   {d_ms:8.2f} ms/frame "
          f"(incl. KF insert + host logic)")


if __name__ == "__main__":
    main()
