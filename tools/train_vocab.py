"""Train the default binary BoW vocabulary offline.

Equivalent role to the reference's pretrained ORBvoc.txt (~1GB, trained on
independent imagery — SURVEY.md §3.4): we render several synthetic rooms
with different seeds and diverse viewpoints, extract rBRIEF descriptors,
and train a flat binary k-means vocabulary (loop/vocab.py).  The result is
committed as data/vocab_synth.npz (~1 MB) and loaded by default.

Usage: python tools/train_vocab.py [n_words] [out_path]
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spslam_tpu.frontend.frame import build_frame  # noqa: E402
from spslam_tpu.io.synthetic import make_room, loop_trajectory, render_frame  # noqa: E402
from spslam_tpu.geometry.camera import Intrinsics  # noqa: E402
from spslam_tpu.ops.pyramid import PyramidSpec  # noqa: E402
from spslam_tpu.loop.vocab import Vocabulary  # noqa: E402


def main():
    n_words = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "vocab_synth.npz"
    )
    intr = Intrinsics(fx=525.0, fy=525.0, cx=319.5, cy=239.5, bf=40.0, width=640, height=480)
    spec = PyramidSpec(8, 1.2, 480, 640)
    voc = Vocabulary(n_words=n_words, train_after=10 ** 9)

    pool = []
    for seed in range(4):  # four different rooms
        rects = make_room(seed=seed + 100)
        poses = loop_trajectory(12, seed=seed)
        for i in range(12):
            gray, depth = render_frame(rects, poses[i], intr)
            f = build_frame(jnp.asarray(gray), jnp.asarray(depth), spec, intr)
            d = np.asarray(f.desc)[np.asarray(f.valid)]
            pool.append(d)
            print(f"room {seed} view {i}: {len(d)} descriptors")
    voc._pool = pool
    voc._pool_count = sum(len(p) for p in pool)
    print(f"training {n_words}-word vocabulary on {voc._pool_count} descriptors...")
    voc.train()
    assert voc.trained
    os.makedirs(os.path.dirname(out), exist_ok=True)
    voc.save(out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
