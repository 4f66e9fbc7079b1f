"""Round-3 measurement sweep on the real chip — the backlog that
accumulated while the axon relay was down during development:

  1. snappy device v2 (the LZ4 sort-emit skeleton wiring): throughput,
     ratio AND compile wall time (the round-2 wall was pathological
     >25 min remote compiles; the skeleton compiles in ~8 min for LZ4).
  2. zstd device L1 bit-pack A/B: default word-scatter vs
     AOCL_ZSTD_PACK=ladder (sort + bounded-lookback, ops/bitpack.py).
  3. zstd device decode (ops/zstd_decode_device.py): end-to-end MB/s on
     device-encoded single-block frames.
  4. LZMA device match-finder assist: end-to-end encode rate vs host L6.

Each section is independent; a failure prints and moves on.
Run: python scripts/measure_round3.py   (on the chip, from repo root)
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, ".")

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # axon force-registers ahead of JAX_PLATFORMS; this is the real off-TPU
    # switch (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from bench import _corpus

B = int(os.environ.get("MEASURE_B", 65536))
N = int(os.environ.get("MEASURE_N", 64))
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


def section(name):
    def deco(fn):
        def run(*a):
            print(f"--- {name}", flush=True)
            try:
                fn(*a)
            except Exception:
                traceback.print_exc()
                print(f"{name}: FAILED", flush=True)
        return run
    return deco


@section("snappy device v2 (sort-emit skeleton)")
def snappy_v2(arr, lens, blocks):
    from aocl_compression_tpu.ops import snappy_device as S
    for G, label in ((4, "G=4"), (8, "G=8")):
        t0 = time.perf_counter()
        enc = S.make_encoder(B, G)
        out = jax.block_until_ready(enc(arr, lens))
        compile_s = time.perf_counter() - t0
        t = stream_rate(lambda: enc(arr, lens), lambda r: r[1])
        _, sizes, tails, flags = out
        tot = int(np.asarray(sizes).sum())
        tails = np.asarray(tails)
        tot += int(np.sum(np.where(tails > 0, tails + 1, 0)))  # tail elems
        print(f"snappy v2 {label}: {MB/t:6.1f} MB/s ratio {B*N/max(tot,1):.3f} "
              f"flags {int(np.asarray(flags).sum())} "
              f"(compile {compile_s:.0f}s)", flush=True)


@section("zstd device L1 pack A/B")
def zstd_pack_ab(arr, lens, blocks):
    from aocl_compression_tpu.ops import zstd_device as Z
    for mode in ("", "ladder"):
        os.environ["AOCL_ZSTD_PACK"] = mode
        Z.make_encoder.cache_clear()
        t0 = time.perf_counter()
        enc = Z.make_encoder(B, 4)
        jax.block_until_ready(enc(arr, lens))
        compile_s = time.perf_counter() - t0
        t = stream_rate(lambda: enc(arr, lens), lambda r: r[5], iters=4)
        print(f"zstd L1 G=4 pack={mode or 'scatter'}: {MB/t:6.1f} MB/s "
              f"(compile {compile_s:.0f}s)", flush=True)
    os.environ.pop("AOCL_ZSTD_PACK", None)
    Z.make_encoder.cache_clear()


@section("zstd device decode")
def zstd_decode(arr, lens, blocks):
    from aocl_compression_tpu.ops import zstd_decode_device as ZD
    from aocl_compression_tpu.runtime import native
    chunks = [native.zstd_compress(b, 1) for b in blocks]
    dlens = [len(b) for b in blocks]
    # warm + correctness
    out = ZD.decode_chunks(chunks, dlens)
    n_ok = sum(int(o == b) for o, b in zip(out, blocks))
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        ZD.decode_chunks(chunks, dlens)
    t = (time.perf_counter() - t0) / iters
    print(f"zstd device decode: {MB/t:6.1f} MB/s ({n_ok}/{len(blocks)} "
          f"blocks verified)", flush=True)


@section("device inflate")
def device_inflate(arr, lens, blocks):
    from aocl_compression_tpu.ops import inflate_device as INF
    from aocl_compression_tpu.runtime import native
    chunks = [native.deflate(b, 6, native.DEFLATE_SYNC_CHUNK)
              for b in blocks]
    dlens = [len(b) for b in blocks]
    out = INF.decode_chunks(chunks, dlens)
    n_ok = sum(int(o == b) for o, b in zip(out, blocks))
    t0 = time.perf_counter()
    iters = 4
    for _ in range(iters):
        INF.decode_chunks(chunks, dlens)
    t = (time.perf_counter() - t0) / iters
    print(f"device inflate: {MB/t:6.1f} MB/s ({n_ok}/{len(blocks)} "
          f"chunks verified)", flush=True)


@section("lzma device match-finder assist")
def lzma_assist(arr, lens, blocks):
    from aocl_compression_tpu.ops import lzma_assist as A
    from aocl_compression_tpu.runtime import native
    data = b"".join(blocks)
    # host reference points
    for lv in (1, 6):
        t0 = time.perf_counter()
        c = native.lzma_compress(data, lv)
        t = time.perf_counter() - t0
        print(f"  host L{lv}: {len(data)/1e6/t:6.1f} MB/s "
              f"ratio {len(data)/len(c):.3f}", flush=True)
    t0 = time.perf_counter()
    c = A.compress(data, 6)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    c = A.compress(data, 6)
    t = time.perf_counter() - t0
    assert native.lzma_decompress(c) == data
    print(f"  assist L6: {len(data)/1e6/t:6.1f} MB/s "
          f"ratio {len(data)/len(c):.3f} (first call {warm:.0f}s)",
          flush=True)


def main():
    data = _corpus(B * N)
    blocks = [data[i:i + B] for i in range(0, len(data), B)]
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)
    print(f"devices: {jax.devices()}", flush=True)
    snappy_v2(arr, lens, blocks)
    zstd_pack_ab(arr, lens, blocks)
    zstd_decode(arr, lens, blocks)
    device_inflate(arr, lens, blocks)
    lzma_assist(arr, lens, blocks)


if __name__ == "__main__":
    main()
