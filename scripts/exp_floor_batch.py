"""Is the pipelined steady state floor-bound? Measure pipelined throughput
of (a) trivial op, (b) sort-only, (c) full encode at depth 2 vs 4, at
N=96 and N=192 blocks. If a fixed per-iteration wall dominates, larger
batches raise MB/s directly. Run from repo root on the chip."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aocl_compression_tpu.ops import lz4_device as L  # noqa: E402
from sweep_r4_device import realfile  # noqa: E402

B = 65536


def pipelined(fn, args, fetch, iters=10, depth=3):
    out = fn(*args)
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    pend = []
    for _ in range(iters):
        out = fn(*args)
        pend.append(fetch(out))
        if len(pend) > depth:
            _ = np.asarray(pend.pop(0))
    for p in pend:
        _ = np.asarray(p)
    return (time.perf_counter() - t0) / iters


def run(N):
    data = realfile(B * N)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)
    mb = B * N / 1e6

    @jax.jit
    def trivial(d):
        return (d.astype(jnp.int32).sum(axis=1),)

    @jax.jit
    def sort_only(d):
        def one(du8):
            idx = jnp.arange(B, dtype=jnp.int32)
            words = L._window_words(du8, B, 8)
            w0 = words[0]
            h = (w0 * jnp.uint32(2654435761)) >> jnp.uint32(32 - 15)
            key = ((h << 16) | idx.astype(jnp.uint32)).astype(jnp.int32)
            ops = jax.lax.sort([key] + [w.astype(jnp.int32) for w in words],
                               num_keys=1, is_stable=False)
            return ops[0].sum()
        return (jax.vmap(one)(d),)

    t = pipelined(trivial, (arr,), lambda r: r[0])
    print(f"N={N}: trivial      {t*1e3:6.1f} ms  {mb/t:7.1f} MB/s", flush=True)
    t = pipelined(sort_only, (arr,), lambda r: r[0])
    print(f"N={N}: sort-only    {t*1e3:6.1f} ms  {mb/t:7.1f} MB/s", flush=True)
    for depth in (2, 4):
        enc = L.make_encoder(B, 4, depth, 8)
        t = pipelined(enc, (arr, lens), lambda r: r[1])
        print(f"N={N}: encode d={depth}  {t*1e3:6.1f} ms  {mb/t:7.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    run(96)
    run(192)
