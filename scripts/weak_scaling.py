#!/usr/bin/env python
"""Weak-scaling benchmark over the device mesh (BASELINE.md north star:
>=90% weak scaling host -> pod).

Measures sharded LZ4 encode throughput at 1, 2, 4, ... devices with the
PER-DEVICE workload held constant. On a single-chip box, virtual CPU
devices validate the scaling *program*; run on a real slice for numbers:

  python scripts/weak_scaling.py                  # real devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python scripts/weak_scaling.py --virtual    # program check

Multi-host: launch one process per host with jax.distributed configured
(see docs/EXAMPLES.md §7); this script then uses the global device list.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--virtual", action="store_true",
                    help="force the CPU host platform (program check)")
    ap.add_argument("--mb-per-device", type=int, default=8)
    ap.add_argument("--block-kb", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from aocl_compression_tpu.parallel import sharded

    devs = jax.devices()
    B = args.block_kb << 10
    per_dev_blocks = max(1, (args.mb_per_device << 20) // B)

    rng = np.random.default_rng(0)
    words = [b"the ", b"of ", b"compression ", b"data ", b"block "]
    base = bytearray()
    while len(base) < per_dev_blocks * B:
        base += words[rng.integers(0, 5)]
    base = bytes(base[:per_dev_blocks * B])

    results = []
    n = 1
    while n <= len(devs):
        mesh = sharded.make_mesh(n)
        N = per_dev_blocks * n
        arr = np.frombuffer((base * n)[:N * B], np.uint8).reshape(N, B)
        lens = np.full(N, B, np.int32)
        step = sharded.make_training_step(B, mesh)
        out = jax.block_until_ready(step(jnp.asarray(arr),
                                         jnp.asarray(lens)))
        _ = int(out[3])  # force
        best = float("inf")
        for _i in range(args.iters):
            t0 = time.perf_counter()
            out = step(jnp.asarray(arr), jnp.asarray(lens))
            _ = int(out[3])
            best = min(best, time.perf_counter() - t0)
        mbps = N * B / best / 1e6
        results.append((n, mbps))
        eff = mbps / (results[0][1] * n) * 100
        print(f"devices={n:3d}  {mbps:10.1f} MB/s  weak-scaling "
              f"efficiency {eff:5.1f}%")
        n *= 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
