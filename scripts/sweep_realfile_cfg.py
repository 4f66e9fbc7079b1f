"""Sweep lz4-device search configs on the REAL-FILE corpus to find the
cheapest point that still clears the baseline ratio 2.101 (VERDICT r2 #7:
real-file >=125 MB/s at ratio >=2.1). Run on the chip from repo root."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _corpus  # noqa: F401  (sys.path side effect)
from aocl_compression_tpu.ops import lz4_device

B, N = 65536, 96


def realfile(nbytes: int) -> bytes:
    import glob
    real = bytearray()
    paths = (sorted(glob.glob("/root/reference/algos/*/*.c*"))
             + sorted(glob.glob("/root/reference/algos/*/*.h"))
             + sorted(glob.glob("/root/reference/algos/zstd/lib/*/*.c"))
             + sorted(glob.glob("/usr/lib/x86_64-linux-gnu/lib[cm]*.so*"))
             + sorted(glob.glob("/root/reference/gtest/*/*.cpp")))
    for path in paths:
        if len(real) >= nbytes:
            break
        try:
            with open(path, "rb") as f:
                real += f.read(4 << 20)
        except OSError:
            pass
    return bytes(real[:nbytes])


def main():
    data = realfile(B * N)
    assert len(data) == B * N
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)
    mb = B * N / 1e6
    cfgs = [
        (8, 4, 8, 0),    # the 141 MB/s synthetic config (r2 ratio 2.043)
        (8, 8, 16, 1),   # current primary (79.4 MB/s, ratio 2.149)
        (8, 8, 16, 0),   # lazy off
        (8, 8, 8, 1),    # narrow window
        (8, 6, 12, 1),   # mid depth
        (4, 4, 8, 0),    # finer grid, shallow
        (8, 6, 8, 0),
    ]
    for (G, depth, nw, lazy) in cfgs:
        t0 = time.perf_counter()
        enc = lz4_device.make_encoder(B, G, depth, nw, lazy=lazy)
        out, sizes, tails, flags = enc(arr, lens)
        _ = np.asarray(sizes)
        compile_s = time.perf_counter() - t0
        iters = 8
        t0 = time.perf_counter()
        pending = []
        for _ in range(iters):
            _, sizes, _, _ = enc(arr, lens)
            pending.append(sizes)
            if len(pending) > 3:
                _ = np.asarray(pending.pop(0))
        for s in pending:
            _ = np.asarray(s)
        dt = (time.perf_counter() - t0) / iters
        rsz = np.asarray(sizes)
        ratio = (B * N) / float(rsz.sum() + 8.0 * N)
        print(f"G={G} depth={depth} nw={nw} lazy={lazy}: "
              f"{mb/dt:6.1f} MB/s ratio {ratio:.3f} "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
