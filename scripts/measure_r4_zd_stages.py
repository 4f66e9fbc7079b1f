"""Chip stage roofline for the device zstd decoder (VERDICT r4 #2): time
pipeline PREFIXES (stage 1 = literal Huffman scan; +stage 2 = FSE
sequence scan; +stage 3 = LZ77 execute) — per-stage cost from the
deltas, per the CLAUDE.md measuring rule (XLA dead-code-eliminates
untouched stages). Run from repo root on the chip; decode_frames'
correctness is unaffected (prefixes return dummy (out, dlen) shapes).
"""
import os
import sys
import time
import importlib

import numpy as np

sys.path.insert(0, ".")
from bench import _corpus  # noqa: E402

B = int(os.environ.get("MEASURE_B", 65536))
N = int(os.environ.get("MEASURE_N", 64))
MB = B * N / 1e6


def run(stages):
    os.environ["AOCL_ZD_STAGES"] = str(stages)
    import aocl_compression_tpu.ops.zstd_decode_device as ZD
    importlib.reload(ZD)
    from aocl_compression_tpu.runtime import native
    data = _corpus(B * N)
    blocks = [data[i * B:(i + 1) * B] for i in range(N)]
    chunks = [native.zstd_compress(b, 1) for b in blocks]
    dlens = [len(b) for b in blocks]
    t0 = time.perf_counter()
    try:
        ZD.decode_chunks(chunks, dlens)
    except ValueError:
        pass  # size-mismatch expected for prefix returns
    compile_s = time.perf_counter() - t0
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        try:
            ZD.decode_chunks(chunks, dlens)
        except ValueError:
            pass
    t = (time.perf_counter() - t0) / iters
    print(f"stages<={stages}: {t*1e3:7.1f} ms/batch ({MB/t:5.2f} MB/s, "
          f"compile {compile_s:.0f}s)", flush=True)
    return t


if __name__ == "__main__":
    t1 = run(1)
    t2 = run(2)
    t3 = run(3)
    print(f"deltas: literal-scan {t1*1e3:.1f} ms, sequence-scan "
          f"{(t2-t1)*1e3:.1f} ms, execute {(t3-t2)*1e3:.1f} ms", flush=True)
