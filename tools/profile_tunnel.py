"""Characterize the host->device tunnel: bandwidth vs content entropy,
chunking, dtype.  Decides the frame-upload strategy.

Usage: python tools/profile_tunnel.py [n]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    from spslam_tpu.io.synthetic import make_sequence
    seq = make_sequence(n_frames=2)
    gray, depth = seq.frames[0]
    g = np.clip(gray, 0, 255).astype(np.uint8)
    d = np.clip(depth * 5000.0, 0, 65535).astype(np.uint16)
    d8 = d[None].view(np.uint8).reshape(480, 640, 2)
    real = np.stack([g, d8[..., 0], d8[..., 1]])          # 900 KB, realistic
    zeros = np.zeros_like(real)
    rand = np.random.RandomState(0).randint(0, 256, real.shape, np.uint8)

    def t_upload(mk, n=n):
        # distinct buffers each iter to defeat caching
        bufs = [mk(i) for i in range(n)]
        t0 = time.perf_counter()
        devs = [jnp.asarray(b) for b in bufs]
        jax.block_until_ready(devs)
        return (time.perf_counter() - t0) / n * 1000

    jax.block_until_ready(jnp.asarray(real))  # warm
    for name, mk in [
        ("real frame 900KB   ", lambda i: real.copy()),
        ("zeros 900KB        ", lambda i: zeros.copy()),
        ("random 900KB       ", lambda i: rand.copy()),
        ("real gray-only 300KB", lambda i: real[:1].copy()),
        ("random 300KB       ", lambda i: rand[:1].copy()),
        ("random 1800KB      ", lambda i: np.concatenate([rand, rand]).copy()),
    ]:
        ms = t_upload(mk)
        print(f"{name}  {ms:7.2f} ms  ({real.nbytes/1024:.0f}KB-class)")

    # chunked: does splitting one 900KB into 3x300KB change total time?
    t0 = time.perf_counter()
    for i in range(n):
        devs = [jnp.asarray(real[j].copy()) for j in range(3)]
    jax.block_until_ready(devs)
    print(f"3 chunks of 300KB     {(time.perf_counter()-t0)/n*1000:7.2f} ms")


if __name__ == "__main__":
    main()
