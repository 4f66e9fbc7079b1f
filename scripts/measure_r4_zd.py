"""Chip A/B: zstd device decode with content-bucketed scan lengths vs the
round-3 worst-case bounds (AOCL_ZD_WORSTCASE=1). VERDICT r3 item #2 —
the builder's profile said the decode wall was NOT dispatch count (it is
already one batched dispatch) but the fixed-length sequential scans
(MAXL=B/4+unroll literal steps, MAXSEQ=B/3 sequence steps) running 4-6x
longer than typical content needs. Run from repo root on the chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _corpus  # noqa: E402

B = int(os.environ.get("MEASURE_B", 65536))
N = int(os.environ.get("MEASURE_N", 64))
MB = B * N / 1e6


def run(tag):
    from aocl_compression_tpu.ops import zstd_decode_device as ZD
    from aocl_compression_tpu.runtime import native
    ZD.make_decoder.cache_clear()
    data = _corpus(B * N)
    blocks = [data[i * B:(i + 1) * B] for i in range(N)]
    chunks = [native.zstd_compress(b, 1) for b in blocks]
    dlens = [len(b) for b in blocks]
    t0 = time.perf_counter()
    out = ZD.decode_chunks(chunks, dlens)
    compile_s = time.perf_counter() - t0
    n_ok = sum(int(o == b) for o, b in zip(out, blocks))
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        ZD.decode_chunks(chunks, dlens)
    t = (time.perf_counter() - t0) / iters
    print(f"zstd device decode [{tag}]: {MB/t:6.1f} MB/s "
          f"({n_ok}/{N} verified, compile {compile_s:.0f}s)", flush=True)


def run_inflate(tag):
    from aocl_compression_tpu.ops import inflate_device as INF
    from aocl_compression_tpu.runtime import native
    data = _corpus(B * N)
    blocks = [data[i * B:(i + 1) * B] for i in range(N)]
    chunks = [native.deflate(b, 6, native.DEFLATE_SYNC_CHUNK)
              for b in blocks]
    dlens = [len(b) for b in blocks]
    t0 = time.perf_counter()
    out = INF.decode_chunks(chunks, dlens)
    compile_s = time.perf_counter() - t0
    n_ok = sum(int(o == b) for o, b in zip(out, blocks))
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        INF.decode_chunks(chunks, dlens)
    t = (time.perf_counter() - t0) / iters
    print(f"device inflate [{tag}]: {MB/t:6.1f} MB/s "
          f"({n_ok}/{N} verified, compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    os.environ["AOCL_ZD_WORSTCASE"] = "1"
    run("worst-case r3")
    os.environ.pop("AOCL_ZD_WORSTCASE")
    run("bucketed")
    run_inflate("current")
