"""Measure host<->device transfer bandwidth on this (tunnel-attached)
TPU — the number that decides whether -park_design's per-iteration
host round trip (~6 GB at 512^3) is seconds (PCIe-class) or minutes.

Usage: python tools/probe_xfer.py [mb=512]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    for size_mb in (64, mb):
        n = size_mb * (1 << 20) // 4
        host = np.random.default_rng(0).random(n, np.float32)
        # H2D
        t0 = time.perf_counter()
        dev = jnp.asarray(host)
        dev.block_until_ready()
        h2d = time.perf_counter() - t0
        # D2H
        t0 = time.perf_counter()
        back = np.asarray(dev)
        d2h = time.perf_counter() - t0
        assert back[0] == host[0]
        print(
            f"{size_mb:5d} MB: H2D {h2d:7.2f} s "
            f"({size_mb / max(h2d, 1e-9):8.1f} MB/s)   "
            f"D2H {d2h:7.2f} s ({size_mb / max(d2h, 1e-9):8.1f} MB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
