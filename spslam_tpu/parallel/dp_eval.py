"""Data-parallel multi-sequence evaluation over a device mesh.

TPU-native fill of the reference family's missing batch-evaluation lane
(SURVEY.md §2.2 DP row; the reference's Examples/RGB-D/rgbd_tum.cc runs one
sequence per process).  Sequence evaluation is embarrassingly data-parallel
— each sequence owns an independent map ("map-per-shard"), there is no
gradient or state to synchronize — so the right TPU mapping is one full
SLAM System pinned per mesh device:

* every jitted dispatch and H2D upload a System issues is placed on its own
  device via ``jax.default_device``, so N devices track N sequences
  CONCURRENTLY (JAX dispatch is async; the host round-robins the cheap
  bookkeeping between them);
* the only "collective" is the final host-side gather of per-sequence
  metrics (ATE/fps/map sizes).

This deliberately does NOT shard a single tracking step with shard_map:
per-sequence maps never interact, so any cross-device communication would
be pure overhead — the scaling-book recipe ("pick the mesh axis that makes
the collectives vanish") degenerates to no collectives at all.  The
distributed-BA lane (parallel/dist_ba.py) covers the communicating case.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass
class SeqResult:
    name: str
    device: str
    n_frames: int
    ate_rmse_m: float
    wall_s: float          # whole-batch wall clock (identical across results)
    fps_aggregate: float   # batch frames/sec across the whole run
    n_kf: int
    n_pts: int
    states: List[str] = field(default_factory=list)


def evaluate_sequences(
    sequences,
    make_system: Optional[Callable[[int], object]] = None,
    devices=None,
    names: Optional[Sequence[str]] = None,
):
    """Run one full SLAM System per sequence, one mesh device per System,
    interleaving frames round-robin so all devices work concurrently.

    Args:
      sequences: list of SyntheticSequence-like objects (``.frames``
        [(gray, depth)...], ``.timestamps``, ``.poses_gt``, ``.intr``).
      make_system: optional factory ``i -> System`` (defaults to a
        point-only System with the sequence's intrinsics).
      devices: mesh devices to pin to (default ``jax.devices()``);
        sequences beyond ``len(devices)`` share devices round-robin.

    Systems must use synchronous mapping (``async_mapping=False``):
    ``jax.default_device`` is thread-local, so a background mapping
    thread's dispatches would land on the global default device and
    contend on device 0 instead of the pinned one (asserted below).

    Returns (results, aggregate_fps).
    """
    import jax

    from ..eval.ate import ate_rmse
    from ..system import System, SystemConfig

    devices = list(devices if devices is not None else jax.devices())
    names = list(names or [f"seq{i}" for i in range(len(sequences))])

    systems = []
    for i, seq in enumerate(sequences):
        dev = devices[i % len(devices)]
        if make_system is not None:
            sys_i = make_system(i)
        else:
            sys_i = System(SystemConfig(intr=seq.intr))
        assert not sys_i.cfg.async_mapping, (
            "dp_eval requires async_mapping=False: jax.default_device is "
            "thread-local, so a background mapper would bypass device pinning"
        )
        systems.append((sys_i, dev, seq))

    n_total = sum(len(s.frames) for s in sequences)
    max_len = max(len(s.frames) for s in sequences)
    t0 = time.perf_counter()
    # round-robin: frame t of every sequence before frame t+1 of any —
    # device k's dispatch for sequence k overlaps every other device's work
    for t in range(max_len):
        for sys_i, dev, seq in systems:
            if t >= len(seq.frames):
                continue
            gray, depth = seq.frames[t]
            with jax.default_device(dev):
                sys_i.track_rgbd(gray, depth, float(seq.timestamps[t]))
    for sys_i, dev, _ in systems:
        with jax.default_device(dev):
            sys_i.shutdown()
    wall = time.perf_counter() - t0
    agg_fps = n_total / wall if wall > 0 else float("inf")

    results = []
    for (sys_i, dev, seq), name in zip(systems, names):
        poses = sys_i.poses()
        n = min(len(poses), len(seq.poses_gt))
        ate, _ = ate_rmse(poses[:n], seq.poses_gt[:n])
        results.append(SeqResult(
            name=name,
            device=str(dev),
            n_frames=len(seq.frames),
            ate_rmse_m=ate,
            wall_s=wall,
            fps_aggregate=agg_fps,
            n_kf=int(sys_i.store.kf_valid.sum()),
            n_pts=int(sys_i.store.pt_valid.sum()),
        ))
    return results, agg_fps
