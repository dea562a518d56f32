"""Bisect the fused track_frame_step device program: which piece owns the
~16 ms/frame device time?  Builds jit variants with stages knocked out and
times each chained (40 dispatches, one terminal sync).

Usage: python tools/profile_fused.py [n]
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

    from spslam_tpu.frontend.frame import build_frame
    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.ops.brief import unpack_bits
    from spslam_tpu.ops.pyramid import PyramidSpec
    from spslam_tpu.tracking.tracker import TrackerConfig, _match_and_optimize, _pack_frame

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
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
    PL = cfg.local_points_cap
    pt_pack = jnp.asarray(np.random.RandomState(0).randn(PL, 9).astype(np.float32))
    pt_pack = pt_pack.at[:, 8].set(1.0)
    pt_desc = jnp.asarray(
        np.random.RandomState(1).randint(0, 2**32, (PL, 8), np.uint64).astype(np.uint32)
    )
    T0 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.float32))

    def make_variant(do_build, do_coarse, do_tight, do_pack, ret_frame):
        @partial(jax.jit, static_argnames=())
        def fn(frame_u8, T_prev):
            gray = frame_u8[0].astype(jnp.float32)
            depth = (
                frame_u8[1].astype(jnp.float32) + frame_u8[2].astype(jnp.float32) * 256.0
            ) / 5000.0
            pt_pos = pt_pack[:, 0:3]
            pt_normal = pt_pack[:, 3:6]
            pt_mind = pt_pack[:, 6]
            pt_maxd = pt_pack[:, 7]
            pt_valid = pt_pack[:, 8] > 0.5
            pt_bits = unpack_bits(pt_desc)
            frame = build_frame(gray, depth, spec, intr, n_features=cfg.n_features,
                                th_high=cfg.th_fast_high, th_low=cfg.th_fast_low)
            T = T_prev
            if do_coarse:
                o1, _, _ = _match_and_optimize(
                    T, pt_pos, pt_normal, pt_mind, pt_maxd, pt_bits, pt_valid,
                    frame, 22.0, 100.0, intr, n_rounds=2, n_iters=5)
                T = o1.T_cw
            if do_tight:
                o2, mi, m = _match_and_optimize(
                    T, pt_pos, pt_normal, pt_mind, pt_maxd, pt_bits, pt_valid,
                    frame, 6.0, 100.0, intr, n_rounds=4, n_iters=6)
                T = o2.T_cw
            outs = [T]
            if do_pack:
                fp, de = _pack_frame(frame)
                outs += [fp, de]
            if ret_frame:
                outs.append(frame)
            return tuple(outs)
        return fn

    cases = [
        ("build only (no match)      ", make_variant(1, 0, 0, 0, 0)),
        ("build + coarse             ", make_variant(1, 1, 0, 0, 0)),
        ("build + tight              ", make_variant(1, 0, 1, 0, 0)),
        ("build + coarse + tight     ", make_variant(1, 1, 1, 0, 0)),
        ("  + pack outputs           ", make_variant(1, 1, 1, 1, 0)),
        ("  + return FrameData       ", make_variant(1, 1, 1, 1, 1)),
    ]
    for name, fn in cases:
        out = fn(frame_u8, T0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        T = T0
        for _ in range(n):
            out = fn(frame_u8, T)
            T = out[0]
        jax.block_until_ready(out)
        print(f"{name} {(time.perf_counter()-t0)/n*1000:8.2f} ms")

    # --- scalar-upload overhead: same program, k fresh python scalars/call
    @jax.jit
    def with_scalars(frame_u8, T_prev, r1, r2, td, hv):
        gray = frame_u8[0].astype(jnp.float32) + 0 * td
        depth = (
            frame_u8[1].astype(jnp.float32) + frame_u8[2].astype(jnp.float32) * 256.0
        ) / 5000.0
        pt_bits = unpack_bits(pt_desc)
        frame = build_frame(gray, depth, spec, intr, n_features=cfg.n_features,
                            th_high=cfg.th_fast_high, th_low=cfg.th_fast_low)
        o1, _, _ = _match_and_optimize(
            jnp.where(hv, T_prev, T_prev), pt_pack[:, 0:3], pt_pack[:, 3:6],
            pt_pack[:, 6], pt_pack[:, 7], pt_bits, pt_pack[:, 8] > 0.5,
            frame, r1, 100.0, intr, n_rounds=2, n_iters=5)
        o2, _, _ = _match_and_optimize(
            o1.T_cw, pt_pack[:, 0:3], pt_pack[:, 3:6],
            pt_pack[:, 6], pt_pack[:, 7], pt_bits, pt_pack[:, 8] > 0.5,
            frame, r2, 100.0, intr, n_rounds=4, n_iters=6)
        fp, de = _pack_frame(frame)
        return o2.T_cw, fp, de

    out = with_scalars(frame_u8, T0, 22.0, 6.0, 3.2, True)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    T = T0
    for _ in range(n):
        out = with_scalars(frame_u8, T, 22.0, 6.0, 3.2, True)
        T = out[0]
    jax.block_until_ready(out)
    print(f"same + 4 python scalars/call {(time.perf_counter()-t0)/n*1000:8.2f} ms")


if __name__ == "__main__":
    main()
