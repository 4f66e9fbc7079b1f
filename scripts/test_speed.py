#!/usr/bin/env python
"""Perf-report harness — parity with the reference's scripts/test_speed.py
(/root/reference/scripts/test_speed.py:123-512): run the bench over a
dataset directory in two configurations, write a CSV, and print a geo-mean
speed/ratio comparison table per codec.

Configurations compared:
  optimized — framework defaults (device tiers + RAP container)
  vanilla   — optOff host reference paths, no RAP (upstream-equivalent)

Usage:
  python scripts/test_speed.py DATASET_DIR [--csv out.csv] [--iters N]
                               [--methods lz4,zlib,...] [--max-mb MB]

No corpus is bundled (this environment has no network); point it at any
directory of files — e.g. the synthetic corpus from
`python scripts/make_corpus.py /tmp/corpus`.
"""

from __future__ import annotations

import argparse
import csv
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aocl_compression_tpu.api import unified                     # noqa: E402
from aocl_compression_tpu.api.registry import CODEC_ORDER        # noqa: E402

LEVELS = {"lz4": 0, "lz4hc": 9, "snappy": 0, "zlib": 1, "zstd": 3,
          "bzip2": 9, "lzma": 6}


def bench_file_pair(method: str, level: int, data: bytes,
                    iters: int) -> tuple:
    """Interleaved optimized/vanilla min-of-N: the two modes alternate
    within each iteration so host-steal drift hits both equally (running
    one mode to completion first mis-attributed box drift as a mode
    delta — the round-4 'default slower than vanilla' artifact)."""
    kw = {"measure_stats": True}
    if level:
        kw["level"] = level
    ho = unified.setup(method, **kw)
    hv = unified.setup(method, opt_off=True, enable_rap=False, **kw)
    try:
        res = {}
        for tag, h in (("optimized", ho), ("vanilla", hv)):
            res[tag] = {"c": float("inf"), "d": float("inf"),
                        "ratio": 0.0}
        for _ in range(iters):
            for tag, h in (("optimized", ho), ("vanilla", hv)):
                t0 = time.perf_counter()
                c = unified.compress(h, data)
                res[tag]["c"] = min(res[tag]["c"],
                                    time.perf_counter() - t0)
                t0 = time.perf_counter()
                out = unified.decompress(h, c, expected_size=len(data))
                res[tag]["d"] = min(res[tag]["d"],
                                    time.perf_counter() - t0)
                if out != data:
                    raise AssertionError(f"{method} roundtrip FAILED")
                res[tag]["ratio"] = len(data) / max(1, len(c))
        return tuple(
            {"c_mbps": len(data) / res[tag]["c"] / 1e6,
             "d_mbps": len(data) / res[tag]["d"] / 1e6,
             "ratio": res[tag]["ratio"]}
            for tag in ("optimized", "vanilla"))
    finally:
        unified.destroy(ho)
        unified.destroy(hv)


def geomean(xs):
    xs = [x for x in xs if x > 0]
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else 0.0


def bench_stock(method: str, level: int, data: bytes, iters: int):
    """Head-to-head vs the stock CPU implementations baked into this image
    (CPython zlib/bz2/lzma, the zstandard package) — the analog of the
    reference's IPP comparison bench (test/ipp_codec_bench.c, dlopen'd
    third-party libs). lz4/lz4hc/snappy have no stock library here."""
    import bz2 as _bz2
    import lzma as _lzma
    import zlib as _zlib

    if method == "zlib":
        comp = lambda: _zlib.compress(data, level)
        dec = lambda c: _zlib.decompress(c)
    elif method == "bzip2":
        comp = lambda: _bz2.compress(data, max(1, min(level, 9)))
        dec = lambda c: _bz2.decompress(c)
    elif method == "lzma":
        comp = lambda: _lzma.compress(data, format=_lzma.FORMAT_ALONE,
                                      preset=min(level, 9))
        dec = lambda c: _lzma.decompress(c, format=_lzma.FORMAT_ALONE)
    elif method == "zstd":
        import zstandard
        comp = lambda: zstandard.ZstdCompressor(level=level).compress(data)
        dec = lambda c: zstandard.ZstdDecompressor().decompress(
            c, max_output_size=2 * len(data) + 64)
    else:
        return None
    best_c = best_d = float("inf")
    c = b""
    for _ in range(iters):
        t0 = time.perf_counter()
        c = comp()
        best_c = min(best_c, time.perf_counter() - t0)
    for _ in range(iters):
        t0 = time.perf_counter()
        out = dec(c)
        best_d = min(best_d, time.perf_counter() - t0)
    assert out == data
    return {"c_mbps": len(data) / best_c / 1e6,
            "d_mbps": len(data) / best_d / 1e6,
            "ratio": len(data) / max(1, len(c))}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset")
    ap.add_argument("--csv", default="speed_report.csv")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--methods", default=",".join(CODEC_ORDER))
    ap.add_argument("--max-mb", type=int, default=16)
    ap.add_argument("--vs-stock", action="store_true",
                    help="also benchmark the stock CPU libraries "
                         "(zlib/bz2/lzma/zstandard) as a third mode")
    args = ap.parse_args()

    files = sorted(
        os.path.join(args.dataset, f) for f in os.listdir(args.dataset)
        if os.path.isfile(os.path.join(args.dataset, f)))
    if not files:
        print(f"no files in {args.dataset}", file=sys.stderr)
        return 2
    methods = [m.strip() for m in args.methods.split(",") if m.strip()]

    rows = []
    for path in files:
        with open(path, "rb") as f:
            data = f.read(args.max_mb << 20)
        for m in methods:
            ro, rv = bench_file_pair(m, LEVELS.get(m, 0), data, args.iters)
            pairs = [("optimized", ro), ("vanilla", rv)]
            if args.vs_stock:
                rs = bench_stock(m, LEVELS.get(m, 0) or 6, data, args.iters)
                if rs is not None:
                    pairs.append(("stock", rs))
            for mode, r in pairs:
                rows.append({"file": os.path.basename(path), "method": m,
                             "mode": mode,
                             **{k: round(v, 3) for k, v in r.items()}})
                print(f"{m:7s} {mode:9s} {os.path.basename(path):20s} "
                      f"c {r['c_mbps']:8.1f} MB/s  d {r['d_mbps']:8.1f} "
                      f"MB/s  ratio {r['ratio']:.3f}")

    with open(args.csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"\nwrote {args.csv}")

    # geo-mean comparison table (reference prints prettytable; plain text)
    print(f"\n{'method':8s} {'c opt':>9s} {'c van':>9s} {'speedup':>8s} "
          f"{'d opt':>9s} {'d van':>9s} {'ratio opt':>10s} {'ratio van':>10s}")
    for m in methods:
        sel = lambda mode, k: [r[k] for r in rows
                               if r["method"] == m and r["mode"] == mode]
        co, cv = geomean(sel("optimized", "c_mbps")), geomean(
            sel("vanilla", "c_mbps"))
        do_, dv = geomean(sel("optimized", "d_mbps")), geomean(
            sel("vanilla", "d_mbps"))
        ro, rv = geomean(sel("optimized", "ratio")), geomean(
            sel("vanilla", "ratio"))
        print(f"{m:8s} {co:9.1f} {cv:9.1f} {co / cv if cv else 0:7.2f}x "
              f"{do_:9.1f} {dv:9.1f} {ro:10.3f} {rv:10.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
