"""Tunnel transfer cost curve: device_put / device_get time vs size."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp


def main():
    sizes_kb = [16, 64, 128, 256, 307, 512, 614, 921, 1024, 2048, 4096]
    # warmup
    jax.block_until_ready(jax.device_put(np.zeros(1024, np.uint8)))
    print("upload (device_put, blocking):")
    for kb in sizes_kb:
        a = np.zeros(kb * 1024, np.uint8)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            x = jax.device_put(a)
            jax.block_until_ready(x)
            ts.append(time.perf_counter() - t0)
        med = np.median(ts) * 1000
        print(f"  {kb:6d} KB : {med:8.2f} ms  ({kb/1024/med*1000:7.1f} MB/s)")

    print("download (device_get):")
    for kb in sizes_kb:
        x = jnp.zeros(kb * 1024, jnp.uint8) + 1
        jax.block_until_ready(x)
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
            x = x + 1  # new buffer each time to avoid cached host copy
            jax.block_until_ready(x)
        med = np.median(ts) * 1000
        print(f"  {kb:6d} KB : {med:8.2f} ms  ({kb/1024/med*1000:7.1f} MB/s)")

    # two concurrent uploads from threads
    import threading
    a = np.zeros(614 * 1024, np.uint8)
    b = np.zeros(307 * 1024, np.uint8)

    def put(arr, out, i):
        x = jax.device_put(arr)
        jax.block_until_ready(x)
        out[i] = x

    ts = []
    for _ in range(6):
        out = [None, None]
        t0 = time.perf_counter()
        th1 = threading.Thread(target=put, args=(a, out, 0))
        th2 = threading.Thread(target=put, args=(b, out, 1))
        th1.start(); th2.start(); th1.join(); th2.join()
        ts.append(time.perf_counter() - t0)
    print(f"parallel 614+307 KB puts   : {np.median(ts)*1000:8.2f} ms")

    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        x = jax.device_put(a); y = jax.device_put(b)
        jax.block_until_ready([x, y])
        ts.append(time.perf_counter() - t0)
    print(f"sequential 614+307 KB puts : {np.median(ts)*1000:8.2f} ms")


if __name__ == "__main__":
    main()
