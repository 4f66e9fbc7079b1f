#!/usr/bin/env python
"""Interleaved min-of-N A/B: our zstd host codec vs stock (zstandard pkg).

Usage: python scripts/ab_zstd.py [--levels 1,3] [--iters 7] [--decode]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, ".")

import zstandard

from aocl_compression_tpu.runtime import native

FILES = ["csrc.c", "libc", "pysrc", "records.bin"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,3")
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--dataset", default="/tmp/realset")
    ap.add_argument("--decode", action="store_true")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    datas = {}
    for name in FILES:
        with open(os.path.join(args.dataset, name), "rb") as f:
            datas[name] = f.read()

    native.get_lib()
    for level in levels:
        rows = []
        for name, data in datas.items():
            best_o = best_s = float("inf")
            co = cs = b""
            for _ in range(args.iters):
                t0 = time.perf_counter()
                co = native.zstd_compress(data, level)
                best_o = min(best_o, time.perf_counter() - t0)
                t0 = time.perf_counter()
                cs = zstandard.ZstdCompressor(level=level).compress(data)
                best_s = min(best_s, time.perf_counter() - t0)
            # verify ours decodes with stock
            assert zstandard.ZstdDecompressor().decompress(
                co, max_output_size=2 * len(data) + 64) == data
            o_mb = len(data) / best_o / 1e6
            s_mb = len(data) / best_s / 1e6
            ro = len(data) / len(co)
            rs = len(data) / len(cs)
            rows.append((name, o_mb, s_mb, ro, rs))
            print(f"L{level} {name:12s} ours {o_mb:7.1f} MB/s r{ro:.4f} | "
                  f"stock {s_mb:7.1f} MB/s r{rs:.4f} | "
                  f"x{o_mb/s_mb:.3f} ratio{'+' if ro>=rs else '-'}")
        g = math.exp(sum(math.log(r[1] / r[2]) for r in rows) / len(rows))
        print(f"L{level} geomean speed ratio: {g:.3f}x")
        if args.decode:
            for name, data in datas.items():
                co = native.zstd_compress(data, level)
                best_o = best_s = float("inf")
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    d1 = native.zstd_decompress(co, len(data))
                    best_o = min(best_o, time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    d2 = zstandard.ZstdDecompressor().decompress(
                        co, max_output_size=2 * len(data) + 64)
                    best_s = min(best_s, time.perf_counter() - t0)
                assert d1 == data and d2 == data
                o_mb = len(data) / best_o / 1e6
                s_mb = len(data) / best_s / 1e6
                print(f"L{level} dec {name:12s} ours {o_mb:7.1f} | "
                      f"stock {s_mb:7.1f} | x{o_mb/s_mb:.3f}")


if __name__ == "__main__":
    main()
