"""Measure full-encode throughput + ratio vs chain-marking SUBM on chip.

Uses deep pipelining (4 in flight) so the ~27 ms axon dispatch floor is
amortized — reports steady-state streaming MB/s like bench.py.
Run: python scripts/exp_subm.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from aocl_compression_tpu.ops import lz4_device as L
from bench import _corpus

G, DEPTH, NW_ = 4, 4, 8
B = 65536
N = 128


def stream_rate(fn, args, iters=8, depth=3):
    out = fn(*args)
    _ = np.asarray(out[1][:4])
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        out = fn(*args)
        pending.append(out[1])
        if len(pending) > depth:
            _ = np.asarray(pending.pop(0))
    for s in pending:
        _ = np.asarray(s)
    return (time.perf_counter() - t0) / iters


def main():
    data = _corpus(B * N)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, dtype=jnp.int32)
    mb = B * N / 1e6

    for subm in (128, 64, 32):
        @jax.jit
        def enc(d, n, subm=subm):
            def one(du8, nn):
                return L._encode_block_v2(du8, nn, B, G, depth=DEPTH,
                                          nw=NW_, subm=subm)
            return jax.vmap(one)(d, n)

        t = stream_rate(enc, (arr, lens))
        out, sizes, tails, flags = enc(arr, lens)
        total = int(np.asarray(sizes).sum()) + 8 * N
        print(f"SUBM={subm:3d}: {t*1e3:7.1f} ms  {mb/t:6.1f} MB/s  "
              f"ratio {len(data)/total:.3f}  flags={int(np.asarray(flags).sum())}")


if __name__ == "__main__":
    main()
