"""CLI driver: run the SLAM system on a dataset and report ATE + timing.

TPU-native equivalent of the reference's Examples/RGB-D/rgbd_tum.cc
(SURVEY.md §2 #22): loads a sequence (TUM association format, or the
built-in synthetic renderer when no dataset exists), tracks every frame,
prints per-frame timing stats, saves trajectories, and — when ground truth
is available — prints ATE RMSE.

Usage:
  python -m spslam_tpu.cli --synthetic --frames 30 [--planes] [--no-ba]
  python -m spslam_tpu.cli --tum /path/to/sequence [--config configs/tum_fr1.yaml]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="tpu-native point+plane RGB-D SLAM")
    ap.add_argument("--synthetic", action="store_true", help="use the built-in synthetic room sequence")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--tum", type=str, default=None, help="TUM RGB-D sequence directory")
    ap.add_argument("--config", type=str, default=None, help="YAML camera/ORB config")
    ap.add_argument("--planes", action="store_true", help="enable plane landmarks")
    ap.add_argument("--no-ba", action="store_true", help="disable local BA")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--traj-out", type=str, default="trajectory_tum.txt")
    ap.add_argument("--metrics-out", type=str, default=None)
    ap.add_argument("--map-out", type=str, default=None)
    ap.add_argument("--loop", action="store_true", help="enable loop closing")
    ap.add_argument("--async-mapping", action="store_true", help="background mapping thread")
    ap.add_argument(
        "--dp", type=int, default=0, metavar="N",
        help="data-parallel batch evaluation: run N synthetic sequences "
             "concurrently, one per mesh device (SURVEY §2.2 DP row)",
    )
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.dp > 0:
        import jax

        from .io.synthetic import make_sequence
        from .parallel.dp_eval import evaluate_sequences

        n = args.dp
        print(f"rendering {n} synthetic sequences ({args.frames} frames each)...")
        seqs = [make_sequence(n_frames=args.frames, seed=7 * i) for i in range(n)]
        devs = jax.devices()
        print(f"evaluating on {min(n, len(devs))} of {len(devs)} devices...")
        results, agg_fps = evaluate_sequences(seqs, devices=devs)
        for r in results:
            print(f"  {r.name} @ {r.device}: ATE {r.ate_rmse_m*1000:.2f} mm, "
                  f"{r.n_kf} kfs, {r.n_pts} pts")
        print(json.dumps({
            "dp_sequences": n,
            "aggregate_fps": agg_fps,
            "ate_rmse_m": [r.ate_rmse_m for r in results],
        }))
        return

    from .eval.ate import ate_rmse
    from .system import System, SystemConfig

    poses_gt = None
    if args.synthetic or not args.tum:
        from .io.synthetic import make_sequence

        print(f"rendering synthetic sequence ({args.frames} frames)...")
        seq = make_sequence(n_frames=args.frames)
        frames = seq.frames
        timestamps = seq.timestamps
        intr = seq.intr
        poses_gt = seq.poses_gt
    else:
        from .io.tum import load_tum_sequence

        seq = load_tum_sequence(args.tum, config_yaml=args.config)
        frames = seq.frames
        timestamps = seq.timestamps
        intr = seq.intr
        poses_gt = seq.poses_gt

    if args.config:
        from .config import system_config_from_yaml

        cfg = system_config_from_yaml(
            args.config, local_ba=not args.no_ba, use_planes=args.planes,
            use_loop=args.loop, async_mapping=args.async_mapping,
        )
        cfg.intr = intr if args.synthetic or not args.tum else cfg.intr
    else:
        cfg = SystemConfig(
            intr=intr, local_ba=not args.no_ba, use_planes=args.planes,
            use_loop=args.loop, async_mapping=args.async_mapping,
        )
    sys_ = System(cfg)

    times = []
    for i, ((gray, depth), ts) in enumerate(zip(frames, timestamps)):
        t0 = time.perf_counter()
        _, state = sys_.track_rgbd(gray, depth, ts)
        dt = time.perf_counter() - t0
        times.append(dt)
        if i % 10 == 0:
            print(f"frame {i}: state={state.name} {dt*1000:.1f}ms")
    sys_.shutdown()

    times = np.array(times[2:])  # skip compile frames
    print(f"\ntracked {len(frames)} frames | median {np.median(times)*1000:.1f} ms/frame "
          f"({1.0/np.median(times):.1f} fps) | mean {times.mean()*1000:.1f} ms")
    print(f"map: {sys_.store.n_kf} keyframes, {int(sys_.store.pt_valid.sum())} points, "
          f"{int(sys_.store.pl_valid.sum())} planes")

    sys_.save_trajectory_tum(args.traj_out)
    print(f"trajectory saved to {args.traj_out}")
    if args.metrics_out:
        sys_.save_metrics(args.metrics_out)
    if args.map_out:
        sys_.save_map(args.map_out)

    if poses_gt is not None:
        est = sys_.poses()
        rmse, _ = ate_rmse(est, poses_gt[: len(est)])
        print(f"ATE RMSE: {rmse*1000:.2f} mm")
        print(json.dumps({"ate_rmse_m": rmse, "median_ms": float(np.median(times) * 1000)}))


if __name__ == "__main__":
    main()
