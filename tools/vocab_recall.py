"""Vocabulary-size / score-floor recall study for loop detection.

VERDICT r4 missing #4: the 4096-word flat vocab was inherited, not measured.
This tool sweeps vocabulary size x min-score floor against loop-detection
recall/precision on a suite of harder revisit sequences (varied texture
richness, rotation speed, depth noise) and prints the curve recorded in
BASELINE.md.

Ground truth: pseudo-keyframe i "revisits" pseudo-keyframe j when the two
ground-truth cameras are within POS_TOL meters and their optical axes within
ANG_TOL degrees, with at least MIN_GAP pseudo-keyframes between them.  A
query counts as a HIT when any returned candidate above the floor is a true
revisit of the query (recall is over queries that HAVE a true revisit;
precision over all returned candidates).

Usage: python tools/vocab_recall.py            (full sweep, ~10 min CPU)
       python tools/vocab_recall.py --quick    (one sequence, two sizes)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

POS_TOL = 0.45
ANG_TOL = 25.0
MIN_GAP = 8          # pseudo-keyframes (= 4 frames each -> 32 frames)
KF_STRIDE = 4


def optical_axis(T_cw):
    from spslam_tpu.geometry import np_lie

    # camera +z in world = R_cw^T e_z
    return np_lie.quat_rotate(np_lie.quat_conj(T_cw[0:4]), np.array([0, 0, 1.0]))


def center(T_cw):
    from spslam_tpu.geometry import np_lie

    return np_lie.camera_center(T_cw)


def build_eval_set(quick=False):
    """Render revisit sequences + per-pseudo-KF descriptors."""
    from spslam_tpu.frontend.frame import build_frame
    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.ops.pyramid import PyramidSpec

    import jax.numpy as jnp

    specs = [dict(n_frames=96, trajectory="loop", depth_noise=0.004, seed=0)]
    if not quick:
        specs += [
            dict(n_frames=64, trajectory="loop", depth_noise=0.010, seed=5),
            dict(n_frames=96, trajectory="loop", depth_noise=0.004, seed=9,
                 low_texture=True),
        ]
    out = []
    for sp in specs:
        print(f"rendering {sp} ...", file=sys.stderr)
        seq = make_sequence(**sp)
        spec = PyramidSpec(n_levels=8, scale_factor=1.2,
                           height=seq.intr.height, width=seq.intr.width)
        kfs = []
        for i in range(0, len(seq.frames), KF_STRIDE):
            g, d = seq.frames[i]
            fr = build_frame(jnp.asarray(g, jnp.float32), jnp.asarray(d),
                             spec, seq.intr, n_features=1024)
            desc = np.asarray(fr.desc)[np.asarray(fr.valid)]
            kfs.append(dict(desc=desc, T=seq.poses_gt[i]))
        out.append(dict(tag=str(sp), kfs=kfs))
    return out


def true_revisits(kfs):
    """[i] -> set of j<i-MIN_GAP that are genuine revisits."""
    C = np.stack([center(k["T"]) for k in kfs])
    A = np.stack([optical_axis(k["T"]) for k in kfs])
    n = len(kfs)
    rv = {}
    for i in range(n):
        js = set()
        for j in range(0, i - MIN_GAP):
            if (np.linalg.norm(C[i] - C[j]) < POS_TOL
                    and np.degrees(np.arccos(np.clip(A[i] @ A[j], -1, 1))) < ANG_TOL):
                js.add(j)
        rv[i] = js
    return rv


def evaluate(vocab, eval_set, floors):
    """Returns {floor: (recall, precision, n_queries)} aggregated."""
    from spslam_tpu.loop.kfdb import KeyFrameDatabase
    from spslam_tpu.loop.vocab import bow_similarity

    stats = {f: [0, 0, 0, 0] for f in floors}  # hit, has_rv, good_cand, all_cand
    for seqd in eval_set:
        kfs = seqd["kfs"]
        rv = true_revisits(kfs)
        kfdb = KeyFrameDatabase(n_words=vocab.n_words, use_native=False)
        bows = [vocab.bow_vector(k["desc"]) for k in kfs]
        for i in range(len(kfs)):
            if rv[i]:
                exclude = set(range(max(0, i - MIN_GAP), i))
                cands = kfdb.query(bows[i], exclude, min_score=0.0,
                                   max_results=8)
                for f in stats:
                    cf = [(k, s) for k, s in cands if s >= f]
                    hit = any(k in rv[i] for k, _ in cf)
                    stats[f][0] += int(hit)
                    stats[f][1] += 1
                    stats[f][2] += sum(k in rv[i] for k, _ in cf)
                    stats[f][3] += len(cf)
            kfdb.add(i, bows[i])
    return {
        f: (h / max(q, 1), g / max(a, 1), q)
        for f, (h, q, g, a) in stats.items()
    }


def main():
    quick = "--quick" in sys.argv
    from spslam_tpu.io.synthetic import make_sequence
    from spslam_tpu.loop.vocab import Vocabulary

    eval_set = build_eval_set(quick)

    # training pool: DISJOINT sequences (different room seeds/trajectories)
    print("rendering training pool ...", file=sys.stderr)
    pool = []
    for sp in ([dict(n_frames=40, seed=20)] if quick else
               [dict(n_frames=60, seed=20), dict(n_frames=60, seed=21),
                dict(n_frames=40, seed=22, low_texture=True)]):
        from spslam_tpu.frontend.frame import build_frame
        from spslam_tpu.ops.pyramid import PyramidSpec

        import jax.numpy as jnp

        seq = make_sequence(**sp)
        spec = PyramidSpec(n_levels=8, scale_factor=1.2,
                           height=seq.intr.height, width=seq.intr.width)
        for i in range(0, len(seq.frames), 2):
            g, d = seq.frames[i]
            fr = build_frame(jnp.asarray(g, jnp.float32), jnp.asarray(d),
                             spec, seq.intr, n_features=1024)
            pool.append(np.asarray(fr.desc)[np.asarray(fr.valid)])
    pool = np.concatenate(pool)
    print(f"training pool: {len(pool)} descriptors", file=sys.stderr)

    sizes = [4096, 16384] if quick else [1024, 4096, 16384]
    if len(pool) >= 4 * 65536:
        sizes.append(65536)
    floors = [0.005, 0.010, 0.015, 0.030, 0.050]
    print(f"{'words':>6} {'floor':>6} {'recall':>7} {'precision':>9} {'queries':>8}")
    for n_words in sizes:
        v = Vocabulary(n_words=n_words, train_after=1)
        v._pool = [pool]
        v._pool_count = len(pool)
        v.train()
        if not v.trained:
            print(f"{n_words:>6}  (pool too small: {len(pool)} < {4*n_words})")
            continue
        res = evaluate(v, eval_set, floors)
        for f in floors:
            r, p, q = res[f]
            print(f"{n_words:>6} {f:>6.3f} {r:>7.3f} {p:>9.3f} {q:>8}")


if __name__ == "__main__":
    main()
