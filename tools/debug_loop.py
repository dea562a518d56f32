"""Diagnose why loop closure does not fire on the canonical loop sequence.

Instruments LoopCloser.process_keyframe gates: candidate retrieval, min-score,
consistency accumulation, geometric check.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# sitecustomize imports jax at startup, so env vars are too late here —
# the config knob is the reliable way to force CPU (tests/conftest.py)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from spslam_tpu.eval.ate import ate_rmse
from spslam_tpu.io.synthetic import make_sequence
from spslam_tpu.system import System, SystemConfig
from spslam_tpu.loop import loop_closer as lc_mod

seq = make_sequence(n_frames=64, trajectory="loop", depth_noise=0.004)
cfg = SystemConfig(intr=seq.intr, local_ba=True, use_loop=True)
sys_ = System(cfg)

orig_process = lc_mod.LoopCloser.process_keyframe
orig_geo = lc_mod.LoopCloser._geometric_check

log = []

def patched_geo(self, kf, cand):
    ok, T = orig_geo(self, kf, cand)
    print(f"  GEO kf={kf} cand={cand} -> {'PASS' if ok else 'fail'}")
    return ok, T

lc_mod.LoopCloser._geometric_check = patched_geo

# monkeypatch to print gate internals
import spslam_tpu.loop.vocab as vocab_mod
from spslam_tpu.loop.vocab import bow_similarity


def patched(self, kf):
    st = self.store
    valid_slots = st.kf_kp_valid[kf]
    descs = st.kf_desc[kf][valid_slots]
    if not self.vocab.trained:
        r = orig_process(self, kf)
        print(f"KF {kf}: vocab not trained yet -> {r}")
        return r
    bow = self.vocab.bow_vector(descs)
    covis = st.covisibility(kf, min_weight=5)
    exclude = set(int(c) for c in covis) | {int(kf)}
    exclude |= {
        int(k) for k in range(st.n_kf)
        if abs(int(st.kf_frame_id[k]) - int(st.kf_frame_id[kf])) < 1
        or kf - k < self.cfg.min_interval_kfs
    }
    min_score = 0.015
    covis_scores = [
        s for s in (
            bow_similarity(bow, self.kfdb.bow.get(int(c), {}))
            for c in covis[:10]
        ) if s > 0
    ]
    ms = min(covis_scores) if covis_scores else None
    all_scores = {
        k: bow_similarity(bow, b) for k, b in self.kfdb.bow.items()
    }
    top = sorted(((v, k) for k, v in all_scores.items()), reverse=True)[:5]
    cands_dbg = [(k, round(v, 4)) for v, k in top]
    n_excl = len(exclude & set(self.kfdb.bow.keys()))
    print(f"KF {kf} (frame {int(st.kf_frame_id[kf])}): covis_min={ms if ms is None else round(ms,4)} "
          f"min_score={round(max(min_score, ms or 0),4)} top={cands_dbg} excluded={sorted(exclude & set(self.kfdb.bow.keys()))}")
    r = orig_process(self, kf)
    print(f"   consistent-groups: {[(sorted(g)[:4], c) for g, c in self._consistent][:6]} -> closed={r}")
    return r

lc_mod.LoopCloser.process_keyframe = patched

for (gray, depth), ts in zip(seq.frames, seq.timestamps):
    sys_.track_rgbd(gray, depth, ts)

print("n_kf:", sys_.store.n_kf, "loops:", sys_.loop_closer.n_loops_closed)
rmse, _ = ate_rmse(sys_.poses(), seq.poses_gt)
print("ATE:", rmse)
