"""Round-4 device sweep: map the lz4-device speed/ratio Pareto on the
REAL-FILE corpus (VERDICT r3 #1 — find a config or config-election scheme
hitting >=125 MB/s at ratio >=2.1 simultaneously).

Also prints per-16-block-group ratios for the two frontier configs so the
per-batch election design (route compressible vs tough blocks to different
search depths) has data. Run from repo root on the chip.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aocl_compression_tpu.ops import lz4_device  # noqa: E402

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


def run_cfg(arr, lens, G, depth, nw, lazy, iters=8, groups=False):
    mb = B * N / 1e6
    t0 = time.perf_counter()
    enc = lz4_device.make_encoder(B, G, depth, nw, lazy=lazy)
    out, sizes, tails, flags = enc(arr, lens)
    _ = np.asarray(sizes)
    compile_s = time.perf_counter() - t0
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
    if groups:
        per = (B / (rsz.reshape(-1, 8).mean(axis=1) + 8.0)).round(2)
        print(f"  per-8-block-group ratios: {per.tolist()}", flush=True)
    return rsz


def main():
    data = realfile(B * N)
    assert len(data) == B * N
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)
    cfgs = [
        (8, 4, 8, 0),     # r2 fast point (2.043 @ ~130)
        (8, 8, 16, 1),    # r3 primary (2.149 @ 81)
        (8, 8, 8, 0),     # deep search, short cap
        (8, 8, 8, 1),
        (8, 6, 8, 1),
        (8, 4, 16, 0),    # shallow search, long cap
        (8, 4, 12, 0),
        (8, 6, 12, 1),
        (8, 4, 8, 1),     # lazy on the fast point
        (4, 4, 8, 0),     # finer grid
        (16, 8, 16, 1),   # coarse grid, deep search
    ]
    szs = {}
    for (G, depth, nw, lazy) in cfgs:
        szs[(G, depth, nw, lazy)] = run_cfg(
            arr, lens, G, depth, nw, lazy,
            groups=(G, depth, nw, lazy) in ((8, 4, 8, 0), (8, 8, 16, 1)))

    # election headroom: per-block best-of-two between the fast point and
    # the primary — what ratio would a perfect per-block router get?
    a = szs[(8, 4, 8, 0)].astype(np.int64)
    b = szs[(8, 8, 16, 1)].astype(np.int64)
    best = np.minimum(a, b)
    print(f"oracle per-block min(fast,deep) ratio: "
          f"{(B * N) / float(best.sum() + 8.0 * N):.3f}", flush=True)
    # how many blocks actually prefer deep by >2%?
    frac = float(((a - b) > 0.02 * B).mean())
    print(f"blocks where deep saves >2% of B: {frac:.2f}", flush=True)


if __name__ == "__main__":
    main()
