"""Pre-compile the loop-closure machinery's XLA programs.

Each jitted program in the closure path costs a full compile on first use
(~30-60 s through the TPU tunnel, and the persistent compile cache does not
cover remote-compiled programs).  A closure fires MID-SEQUENCE, so without
warming, the first loop closure of a run stalls tracking for minutes and
benchmarks report a fake latency spike.  Every shape below is pinned by the
padding floors in the production call sites (solver/global_ba.py GBA_MIN_*,
loop_closer's edge/point buckets, vocab's 1024 descriptor bucket), so ONE
dummy invocation per program covers the whole run.

Reference anchor: the reference has no analogue — its C++ is ahead-of-time
compiled; this is the TPU-native equivalent of paying that compile at build
time instead of mid-run (SURVEY.md §2 #12, §3.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import Intrinsics


def warm_loop_machinery(intr: Intrinsics, map_cfg=None, pose_graph_iters: int = 20):
    """Compile every device program the loop-closure path dispatches.

    Call once after System construction (bench.py does, before its timed
    loop lane).  Cheap on CPU (compiles are ms), a few minutes one-time on
    the TPU tunnel.
    """
    from ..map.store import MapConfig, MapStore
    from ..ops.brief import unpack_bits
    from ..ops.match import TH_HIGH, match_descriptors, search_by_projection
    from ..solver.global_ba import global_bundle_adjust
    from ..solver.pose_graph import PoseGraphProblem, optimize_pose_graph
    from .loop_closer import _retransform
    from .sim3 import ransac_align

    map_cfg = map_cfg or MapConfig()
    N = map_cfg.n_kp
    rng = np.random.default_rng(0)

    # --- descriptor matching variants used by _geometric_check / reloc ----
    bits = jnp.asarray((rng.uniform(size=(N, 256)) > 0.5).astype(np.float32))
    valid = jnp.ones(N, bool)
    angles = jnp.zeros(N, jnp.float32)
    match_descriptors(bits, bits, valid, valid, angles, angles,
                      max_dist=64.0, ratio=0.85)
    # guided-growth search (SearchBySim3 substitute)
    uv = jnp.asarray(rng.uniform(0, 400, (N, 2)).astype(np.float32))
    octv = jnp.zeros(N, jnp.int32)
    search_by_projection(
        uv, bits, valid, octv, uv, bits, valid, octv, angles, angles,
        jnp.full(N, 10.0, jnp.float32),
        max_dist=TH_HIGH, ratio=0.95, check_rotation=False,
    )
    # 3D-3D RANSAC
    pts = jnp.asarray(rng.normal(0, 1, (N, 3)).astype(np.float32) + np.array([0, 0, 3], np.float32))
    ransac_align(pts, pts, valid, jax.random.PRNGKey(0))

    # --- BoW quantization at the 1024 bucket ------------------------------
    from .vocab import quantize, Vocabulary  # noqa: F401 (quantize is jitted)

    vb = jnp.asarray((rng.uniform(size=(4096, 256)) > 0.5).astype(np.float32))
    quantize(bits, vb, valid)

    # --- pose graph at the production bucket (K = max_keyframes, E = 256) -
    K = map_cfg.max_keyframes
    E = 256
    ident = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (K, 1))
    prob = PoseGraphProblem(
        poses=jnp.asarray(ident),
        fixed=jnp.asarray(np.arange(K) == 0),
        valid=jnp.asarray(np.arange(K) < 4),
        edge_i=jnp.zeros(E, jnp.int32),
        edge_j=jnp.asarray(np.minimum(np.arange(E) % 4, 3).astype(np.int32)),
        edge_T=jnp.asarray(np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (E, 1))),
        edge_w=jnp.ones(E, jnp.float32),
        edge_valid=jnp.asarray(np.arange(E) < 3),
    )
    jax.block_until_ready(optimize_pose_graph(prob, n_iters=pose_graph_iters))

    # --- loop point correction at its 8192 floor --------------------------
    T = jnp.asarray(np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (8192, 1)))
    jax.block_until_ready(_retransform(T, T, jnp.zeros((8192, 3), jnp.float32)))

    # --- dense global BA at the GBA_MIN_* floors --------------------------
    # a dummy store with the minimum viable map compiles the same padded
    # shapes as any in-run map below the floors (2 kfs -> M=32, 60 pts ->
    # P=8192, obs -> R=32768)
    st = MapStore(MapConfig(max_keyframes=map_cfg.max_keyframes,
                            max_points=map_cfg.max_points,
                            max_planes=map_cfg.max_planes, n_kp=N))
    frame_np = dict(
        uv=rng.uniform(50, 400, (N, 2)).astype(np.float32),
        octave=np.zeros(N, np.int32),
        angle=np.zeros(N, np.float32),
        desc=rng.integers(0, 2 ** 32, (N, 8), np.uint64).astype(np.uint32),
        depth=rng.uniform(1.0, 3.0, N).astype(np.float32),
        u_right=np.full(N, -1.0, np.float32),
        valid=np.ones(N, bool),
    )
    for k in range(2):
        st.add_keyframe(np.array([1, 0, 0, 0, 0, 0.1 * k, 0], np.float32),
                        float(k), frame_np, k)
    slots = np.arange(64)
    pos = np.concatenate([
        rng.uniform(-1, 1, (64, 2)).astype(np.float32),
        rng.uniform(2, 4, (64, 1)).astype(np.float32),
    ], axis=1)
    ids = st.add_points_bulk(
        pos, frame_np["desc"][:64],
        np.tile(np.array([0, 0, 1], np.float32), (64, 1)),
        np.ones(64, np.float32), 0, slots,
    )
    st.add_observations_bulk(ids, 1, slots)
    # iteration counts are STATIC args — warm exactly the schedule the live
    # LoopCloser dispatches (LoopConfig.gba_*_iters), else the first mid-run
    # closure still pays a fresh compile
    from .loop_closer import LoopConfig

    lc = LoopConfig()
    global_bundle_adjust(st, intr, settle_iters=lc.gba_settle_iters,
                         stage1_iters=lc.gba_stage1_iters,
                         stage2_iters=lc.gba_stage2_iters, distributed=False)


def warm_sync_tracking(intr: Intrinsics, frames, timestamps):
    """Compile the SYNC/robust tracking-path programs that only execute on
    anomalies (pose-jump replays, LOST, relocalization) — a mid-run first
    use would stall tracking for ~30 s per program on the TPU tunnel.

    Feeds a few real frames into a throwaway System, then teleports the pose
    5 m sideways and tracks one more frame: the motion-model stage fails,
    the global-fallback match+optimize runs, and the relocalization
    machinery (BoW query + keyframe matching + 3D-3D RANSAC) fires.
    """
    import numpy as np

    from ..system import System, SystemConfig

    sys_ = System(SystemConfig(intr=intr))
    n = min(len(frames), 4)
    for (g, d), ts in zip(frames[: n - 1], timestamps[: n - 1]):
        sys_.track_rgbd(g, d, float(ts))
    sys_.tracker.flush_pipeline()
    tr = sys_.tracker
    if tr.state.name == "OK":
        tr.velocity = None
        tr._chain = None
        tr.T_cw = tr.T_cw + np.array([0, 0, 0, 0, 5.0, 0, 0], np.float32)
        g, d = frames[n - 1]
        tr.process(g, d, float(timestamps[n - 1]))
    sys_.shutdown()
