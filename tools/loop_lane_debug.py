"""Diagnose the PACED on-chip loop lane (bench.py's config #4): where in the
revisit window does each closure land, what did the detector see per
keyframe, and how much ATE remains per pass.

Runs the exact bench loop-lane configuration (128-frame 1.25-turn yaw,
depth noise, real-time 30 fps pacing, async mapping) on the default backend
for N passes and prints the LoopCloser event log + per-pass ATE.

Usage: python tools/loop_lane_debug.py [n_passes] [n_frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from spslam_tpu.eval.ate import ate_rmse
    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.system import System, SystemConfig
    from spslam_tpu.tracking.tracker import TrackerConfig

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    lseq = None
    for f in os.listdir(cache):
        if f.startswith(f".bench_cache_loop{n_frames}"):
            d = np.load(os.path.join(cache, f))
            lseq = make_sequence(n_frames=1)
            lseq.frames = [
                (np.clip(d["gray"][i], 0, 255).astype(np.uint8),
                 np.clip(d["depth"][i] * 5000.0, 0, 65535).astype(np.uint16))
                for i in range(len(d["gray"]))
            ]
            lseq.poses_gt = d["poses_gt"]
            lseq.timestamps = d["timestamps"]
            break
    if lseq is None:
        lseq = make_sequence(n_frames=n_frames, trajectory="loop",
                             depth_noise=0.004)

    def make_system():
        return System(SystemConfig(
            intr=lseq.intr, local_ba=True, async_mapping=True, use_loop=True,
            tracker=TrackerConfig(th_depth=3.2),
        ))

    warm = make_system()
    for (g, d), ts in zip(lseq.frames[:12], lseq.timestamps[:12]):
        warm.track_rgbd(g, d, ts)
    warm.shutdown()
    if jax.default_backend() != "cpu":
        from spslam_tpu.loop.precompile import (
            warm_loop_machinery, warm_sync_tracking,
        )

        warm_loop_machinery(lseq.intr)
        warm_sync_tracking(lseq.intr, lseq.frames, lseq.timestamps)
    print("warmup done", file=sys.stderr)

    for p in range(n_passes):
        s = make_system()
        times = []
        t_start = time.perf_counter()
        for (g, d), ts in zip(lseq.frames, lseq.timestamps):
            tgt = t_start + (float(ts) - float(lseq.timestamps[0]))
            now = time.perf_counter()
            if now < tgt:
                time.sleep(tgt - now)
            t0 = time.perf_counter()
            s.track_rgbd(g, d, ts)
            times.append(time.perf_counter() - t0)
        s.shutdown()
        st = np.array(times[5:])
        rmse, _ = ate_rmse(s.poses(), lseq.poses_gt)
        lc = s.loop_closer
        print(f"\npass {p}: ATE {rmse*1000:.1f} mm, loops={lc.n_loops_closed}, "
              f"median {np.median(st)*1000:.1f} ms, spike {st.max()*1000:.0f} ms, "
              f"kfs={s.store.n_kf}")
        for ev in lc.events:
            if ev["kind"] == "closed":
                fid = int(s.store.kf_frame_id[ev['kf']])
                print(f"  CLOSED kf={ev['kf']} (frame {fid}) <- cand "
                      f"{ev['cand']} early={ev['early']} "
                      f"assembly={ev['assembly_ms']} ms")
            elif ev["cands"] or ev["chain"]:
                fid = int(s.store.kf_frame_id[ev['kf']])
                print(f"  detect kf={ev['kf']} (frame {fid}) chain={ev['chain']} "
                      f"cands={ev['cands']} acc={ev['accepted']} near={ev['near']}")


if __name__ == "__main__":
    main()
