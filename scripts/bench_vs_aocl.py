"""Head-to-head vs the REFERENCE's own lz4/lz4hc, built as a test oracle.

The stock python packages cover zlib/bz2/lzma/zstd but not lz4 — this
script compiles /root/reference/algos/lz4 (+2-line ISA stubs, optimized
tiers enabled via aocl_setup_lz4*) into /tmp/liblz4ref.so and runs the
same min-of-N protocol as scripts/test_speed.py over a dataset
directory. Oracle ONLY: nothing from the reference enters the repo;
streams are cross-verified in both directions.

Usage: python scripts/bench_vs_aocl.py DATASET_DIR [--levels 1,9,12]
"""
import argparse
import ctypes
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

REF = "/root/reference/algos/lz4"
ORACLE = "/tmp/liblz4ref.so"
STUB = "/tmp/lz4ref_stub.c"

STUB_SRC = """
#include <stdint.h>
int32_t get_cpu_opt_flags(int x) { (void)x; return ~0; }
int32_t get_disable_opt_flags(int x) { (void)x; return 0; }
void aocl_register_log_fp(void* f) { (void)f; }
"""


def build_oracle() -> bool:
    if os.path.exists(ORACLE):
        return True
    if not os.path.isdir(REF):
        print("reference lz4 sources not present; skipping", file=sys.stderr)
        return False
    with open(STUB, "w") as f:
        f.write(STUB_SRC)
    r = subprocess.run(
        ["gcc", "-O3", "-march=x86-64-v3", "-shared", "-fPIC", "-o", ORACLE,
         f"{REF}/lz4.c", f"{REF}/lz4hc.c", STUB,
         "-I", REF, "-I", "/root/reference/algos/common",
         "-I", "/root/reference"],
        capture_output=True)
    if r.returncode:
        print(r.stderr.decode()[:500], file=sys.stderr)
        return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--levels", default="1,9,12")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    if not build_oracle():
        return 1

    lib = ctypes.CDLL(ORACLE)
    for name in ("aocl_setup_lz4", "aocl_setup_lz4hc"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_char_p
        fn.argtypes = [ctypes.c_int] * 2 + [ctypes.c_size_t] * 3
        fn(0, 3, 0, 0, 0)  # optOff=0, optLevel=3 (AVX2 tier)
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_default.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int, ctypes.c_int]
    lib.LZ4_compress_HC.restype = ctypes.c_int
    lib.LZ4_compress_HC.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_decompress_safe.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_int, ctypes.c_int]

    from aocl_compression_tpu.runtime import native

    files = sorted(
        f for f in os.listdir(args.dataset)
        if os.path.isfile(os.path.join(args.dataset, f)))
    levels = [int(x) for x in args.levels.split(",")]
    geo = {}

    def best(fn, iters):
        b = 9e9
        r = None
        for _ in range(iters):
            t0 = time.perf_counter()
            r = fn()
            b = min(b, time.perf_counter() - t0)
        return r, b

    for fname in files:
        data = open(os.path.join(args.dataset, fname), "rb").read()
        mb = len(data) / 1e6
        dst = ctypes.create_string_buffer(2 * len(data) + 1024)
        back = ctypes.create_string_buffer(len(data))
        for lvl in levels:
            if lvl <= 1:
                r, tb = best(lambda: lib.LZ4_compress_default(
                    data, dst, len(data), len(dst)), args.iters)
                c, ob = best(lambda: native.lz4_compress(data, 1),
                             args.iters)
            else:
                r, tb = best(lambda: lib.LZ4_compress_HC(
                    data, dst, len(data), len(dst), lvl), args.iters)
                c, ob = best(lambda: native.lz4hc_compress(data, lvl),
                             args.iters)
            comp = dst.raw[:r]
            rd, tdb = best(lambda: lib.LZ4_decompress_safe(
                comp, back, len(comp), len(back)), args.iters)
            o, odb = best(lambda: native.lz4_decompress(c, len(data)),
                          args.iters)
            # cross-interop both directions
            assert o == data and rd == len(data)
            assert lib.LZ4_decompress_safe(c, back, len(c),
                                           len(back)) == len(data)
            assert native.lz4_decompress(comp, len(data)) == data
            print(f"{fname:14s} L{lvl:2d}: ours c {mb/ob:7.1f} d "
                  f"{mb/odb:7.1f} r {len(data)/len(c):6.3f} | AOCL c "
                  f"{mb/tb:7.1f} d {mb/tdb:7.1f} r {len(data)/r:6.3f}",
                  flush=True)
            for k, v in (("oc", mb / ob), ("od", mb / odb),
                         ("ac", mb / tb), ("ad", mb / tdb),
                         ("or", len(data) / len(c)),
                         ("ar", len(data) / r)):
                geo.setdefault((lvl, k), []).append(v)

    g = lambda xs: math.exp(sum(math.log(x) for x in xs) / len(xs))
    for lvl in levels:
        print(f"L{lvl} geomeans: ours c {g(geo[(lvl,'oc')]):.1f} d "
              f"{g(geo[(lvl,'od')]):.1f} r {g(geo[(lvl,'or')]):.3f} | "
              f"AOCL c {g(geo[(lvl,'ac')]):.1f} d {g(geo[(lvl,'ad')]):.1f} "
              f"r {g(geo[(lvl,'ar')]):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
