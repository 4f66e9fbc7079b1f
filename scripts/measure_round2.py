"""Round-2 measurement sweep on the real chip: device zstd / lz4hc / snappy
throughput+ratio, LZ4 accel ladder. Writes results to stdout for
MEASURED.md. Run: python scripts/measure_round2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _corpus

B = 65536
N = 64
MB = B * N / 1e6


def stream_rate(call, fetch, iters=6, depth=3):
    out = call()
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        pending.append(fetch(call()))
        if len(pending) > depth:
            _ = np.asarray(pending.pop(0))
    for s in pending:
        _ = np.asarray(s)
    return (time.perf_counter() - t0) / iters


def main():
    data = _corpus(B * N)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)

    # LZ4 accel ladder (v2 emit)
    from aocl_compression_tpu.ops import lz4_device as L
    for accel, label in ((2, "G=4"), (3, "G=8")):
        G = L.grid_for_accel(accel)
        enc = L.make_encoder(B, G)
        t = stream_rate(lambda: enc(arr, lens), lambda r: r[1])
        out, sizes, tails, flags = enc(arr, lens)
        tot = int(np.asarray(sizes).sum()) + 8 * N
        print(f"lz4 {label}: {MB/t:6.1f} MB/s ratio {B*N/tot:.3f}",
              flush=True)

    # LZ4HC device (exact, depth 16, nw 32, lazy)
    enc = L.make_encoder(B, 0, 16, 32, lazy=1)
    t = stream_rate(lambda: enc(arr, lens), lambda r: r[1], iters=4)
    out, sizes, tails, flags = enc(arr, lens)
    tot = int(np.asarray(sizes).sum()) + 8 * N
    print(f"lz4hc depth16 nw32 lazy: {MB/t:6.1f} MB/s ratio ~{B*N/tot:.3f}"
          f" (body-only approx)", flush=True)

    # zstd device L1 (G=4) and L3 (exact), depth-8 matcher + per-block FSE
    from aocl_compression_tpu.ops import zstd_device as Z
    for G, label in ((4, "L1 G=4"), (0, "L3 exact")):
        enc = Z.make_encoder(B, G)
        t = stream_rate(lambda: enc(arr, lens), lambda r: r[5], iters=4)
        print(f"zstd {label}: {MB/t:6.1f} MB/s (device portion)",
              flush=True)

    # snappy device
    from aocl_compression_tpu.ops import snappy_device as S
    if hasattr(S, "make_encoder"):
        enc = S.make_encoder(B)
        t = stream_rate(lambda: enc(arr, lens), lambda r: r[1], iters=4)
        print(f"snappy device: {MB/t:6.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
