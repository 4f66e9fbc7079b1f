#!/usr/bin/env python
"""Head-to-head vs the REFERENCE's own compiled library (all 7 codecs).

Builds /root/reference with its own CMake (Release, AOCL_DYNAMIC_DISPATCHER
on, huf_decompress_amd64.S included — the genuine article) out-of-source
into /tmp/aocl_build, then drives its unified API (aocl_llc_*) against our
native host codecs with the same min-of-N interleaved protocol. Oracle
ONLY: nothing from the reference enters the repo; streams are
cross-verified in BOTH directions (framing adapters where the unified API
frames differ from ours: lzma size field).

Usage:
  python scripts/oracle_bench.py DATASET [--codecs lz4,zstd] [--iters 5]
  python scripts/oracle_bench.py DATASET --codecs zstd --levels 1,3
"""
from __future__ import annotations

import argparse
import ctypes
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

BUILD = "/tmp/aocl_build"
LIB = f"{BUILD}/lib/libaocl_compression.so"

# unified API enum order (reference api/aocl_compression.h:110-119)
CODECS = ["lz4", "lz4hc", "lzma", "bzip2", "snappy", "zlib", "zstd"]
DEFAULT_LEVELS = {
    "lz4": [0], "lz4hc": [9, 12], "lzma": [6], "bzip2": [9],
    "snappy": [0], "zlib": [1, 6, 9], "zstd": [1, 3, 19],
}


class Desc(ctypes.Structure):
    _fields_ = [
        ("inBuf", ctypes.c_char_p), ("outBuf", ctypes.c_void_p),
        ("workBuf", ctypes.c_void_p), ("inSize", ctypes.c_size_t),
        ("outSize", ctypes.c_size_t), ("level", ctypes.c_size_t),
        ("optVar", ctypes.c_size_t), ("numThreads", ctypes.c_int),
        ("numMPIranks", ctypes.c_int), ("memLimit", ctypes.c_size_t),
        ("measureStats", ctypes.c_int), ("cSize", ctypes.c_uint64),
        ("dSize", ctypes.c_uint64), ("cTime", ctypes.c_uint64),
        ("dTime", ctypes.c_uint64), ("cSpeed", ctypes.c_float),
        ("dSpeed", ctypes.c_float), ("optOff", ctypes.c_int),
        ("optLevel", ctypes.c_int),
    ]


def build_oracle() -> bool:
    if os.path.exists(LIB):
        return True
    if not os.path.isdir("/root/reference"):
        print("reference not present; skipping", file=sys.stderr)
        return False
    r = subprocess.run(
        ["cmake", "-S", "/root/reference", "-B", BUILD, "-G", "Ninja",
         "-DCMAKE_BUILD_TYPE=Release",
         f"-DCMAKE_LIBRARY_OUTPUT_DIRECTORY={BUILD}/lib",
         f"-DCMAKE_ARCHIVE_OUTPUT_DIRECTORY={BUILD}/lib"],
        capture_output=True)
    if r.returncode:
        print(r.stderr.decode()[-800:], file=sys.stderr)
        return False
    # the reference hardcodes its install-tree lib dir (CMakeLists:446);
    # retarget the generated rules instead of writing to /root/reference
    subprocess.run(["sed", "-i", f"s|/root/reference/lib|{BUILD}/lib|g",
                    f"{BUILD}/build.ninja"], check=False)
    r = subprocess.run(["ninja", "-C", BUILD], capture_output=True)
    if r.returncode:
        print(r.stderr.decode()[-800:], file=sys.stderr)
        return False
    return os.path.exists(LIB)


class Oracle:
    def __init__(self) -> None:
        self.lib = ctypes.CDLL(LIB)
        self.lib.aocl_llc_compress.restype = ctypes.c_int64
        self.lib.aocl_llc_compress.argtypes = [ctypes.POINTER(Desc),
                                               ctypes.c_int]
        self.lib.aocl_llc_decompress.restype = ctypes.c_int64
        self.lib.aocl_llc_decompress.argtypes = [ctypes.POINTER(Desc),
                                                 ctypes.c_int]
        self.lib.aocl_llc_setup.restype = ctypes.c_int32
        self.lib.aocl_llc_setup.argtypes = [ctypes.POINTER(Desc),
                                            ctypes.c_int]
        self.lib.aocl_llc_destroy.restype = None
        self.lib.aocl_llc_destroy.argtypes = [ctypes.POINTER(Desc),
                                              ctypes.c_int]

    def handle(self, codec: int, data: bytes, level: int,
               outcap: int) -> tuple:
        d = Desc()
        d.inBuf = data
        d.inSize = len(data)
        out = ctypes.create_string_buffer(outcap)
        d.outBuf = ctypes.cast(out, ctypes.c_void_p)
        d.outSize = outcap
        d.level = level
        d.optVar = 0
        d.numThreads = 1
        d.numMPIranks = 0
        d.memLimit = 1 << 32
        d.measureStats = 0
        d.optOff = 0
        d.optLevel = 3  # AVX2 tier
        rc = self.lib.aocl_llc_setup(ctypes.byref(d), codec)
        if rc != 0:
            raise RuntimeError(f"setup({codec}) -> {rc}")
        return d, out

    def compress(self, codec: int, d: Desc) -> int:
        n = self.lib.aocl_llc_compress(ctypes.byref(d), codec)
        if n <= 0:
            raise RuntimeError(f"ref compress({codec}) -> {n}")
        return n


def ours_fns(codec: str, level: int):
    from aocl_compression_tpu.runtime import native
    if codec == "lz4":
        return (lambda b: native.lz4_compress(b, 1),
                lambda c, n: native.lz4_decompress(c, n))
    if codec == "lz4hc":
        return (lambda b: native.lz4hc_compress(b, level),
                lambda c, n: native.lz4_decompress(c, n))
    if codec == "lzma":
        return (lambda b: native.lzma_compress(b, level),
                lambda c, n: native.lzma_decompress(c, n))
    if codec == "bzip2":
        return (lambda b: native.bz2_compress(b, level),
                lambda c, n: native.bz2_decompress(c, n))
    if codec == "snappy":
        return (lambda b: native.snappy_compress(b),
                lambda c, n: native.snappy_uncompress(c))
    if codec == "zlib":
        return (lambda b: native.deflate(b, level, native.DEFLATE_ZLIB),
                lambda c, n: native.inflate(c, n, native.DEFLATE_ZLIB))
    if codec == "zstd":
        return (lambda b: native.zstd_compress(b, level),
                lambda c, n: native.zstd_decompress(c, n))
    raise KeyError(codec)


def ours_direct(codec: str, level: int, data: bytes):
    """C-direct timed calls with persistent pre-faulted buffers.

    The oracle side's aocl_llc_* writes into a create_string_buffer that
    was zeroed (page-faulted) at setup, OUTSIDE the timed region — the
    reference's own codec_bench methodology (test/codec_bench.c). Going
    through our Python convenience wrappers instead charges a fresh
    uninitialized PyBytes to every timed call: the kernel zero-fill
    page faults land INSIDE the timed decode, ~25% at 2.5 GB/s. This
    path compares codec to codec: both sides reuse warm buffers.

    Returns (enc() -> clen, dec(clen) -> dlen, comp_bytes(clen),
    dec_bytes(dlen)).
    """
    from aocl_compression_tpu.runtime import native
    native.get_lib()
    lib = ctypes.CDLL(native._LIBPATH)
    n = len(data)
    inb = ctypes.create_string_buffer(data, n)
    outcap = 2 * n + (1 << 16)
    outb = ctypes.create_string_buffer(outcap)
    decb = ctypes.create_string_buffer(n + 64)
    I64 = ctypes.c_int64
    SZ = ctypes.c_size_t
    VP = ctypes.c_void_p
    INT = ctypes.c_int

    def fn(name, *at):
        f = getattr(lib, name)
        f.restype = I64
        f.argtypes = list(at)
        return f

    if codec in ("lz4", "lz4hc"):
        d = fn("atpu_lz4_decompress", VP, I64, VP, I64)
        if codec == "lz4":
            c = fn("atpu_lz4_compress", VP, I64, VP, I64, INT)
            enc = lambda: c(inb, n, outb, outcap, 1)
        else:
            c = fn("atpu_lz4hc_compress", VP, I64, VP, I64, INT)
            enc = lambda: c(inb, n, outb, outcap, level)
        dec = lambda cl: d(outb, cl, decb, n)
    elif codec == "lzma":
        c = fn("atpu_lzma_compress", VP, SZ, VP, SZ, INT)
        d = fn("atpu_lzma_decompress", VP, SZ, VP, SZ)
        enc = lambda: c(inb, n, outb, outcap, level)
        dec = lambda cl: d(outb, cl, decb, n)
    elif codec == "bzip2":
        c = fn("atpu_bz2_compress", VP, SZ, VP, SZ, INT)
        d = fn("atpu_bz2_decompress", VP, SZ, VP, SZ)
        enc = lambda: c(inb, n, outb, outcap, level)
        dec = lambda cl: d(outb, cl, decb, n)
    elif codec == "snappy":
        c = fn("atpu_snappy_compress", VP, I64, VP, I64)
        d = fn("atpu_snappy_uncompress", VP, I64, VP, I64)
        enc = lambda: c(inb, n, outb, outcap)
        dec = lambda cl: d(outb, cl, decb, n + 64)
    elif codec == "zlib":
        c = fn("atpu_deflate", VP, SZ, VP, SZ, INT, INT)
        d = fn("atpu_inflate", VP, SZ, VP, SZ, INT)
        enc = lambda: c(inb, n, outb, outcap, level, 0)
        dec = lambda cl: d(outb, cl, decb, n, 0)
    elif codec == "zstd":
        c = fn("atpu_zstd_compress", VP, SZ, VP, SZ, INT, VP, SZ)
        d = fn("atpu_zstd_decompress", VP, SZ, VP, SZ, VP, SZ)
        enc = lambda: c(inb, n, outb, outcap, level, None, 0)
        dec = lambda cl: d(outb, cl, decb, n, None, 0)
    else:
        raise KeyError(codec)
    return (enc, dec,
            lambda cl: outb.raw[:cl],
            lambda dl: decb.raw[:dl])


def to_ref_frame(codec: str, ours: bytes) -> bytes:
    """Adapt our stream to what aocl_llc_decompress expects."""
    if codec == "lzma":
        # ours: .lzma ALONE (5B props + 8B size); ref: 5B props + raw
        return ours[:5] + ours[13:]
    return ours


def to_our_frame(codec: str, ref: bytes, rawlen: int) -> bytes:
    if codec == "lzma":
        # the reference's LzmaEncode writes no end marker, so the ALONE
        # header must carry the real size, not the unknown-size marker
        return ref[:5] + rawlen.to_bytes(8, "little") + ref[5:]
    return ref


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--codecs", default=",".join(CODECS))
    ap.add_argument("--levels", default=None,
                    help="override levels (single codec only)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-interop", action="store_true")
    args = ap.parse_args()
    if not build_oracle():
        return 1
    oracle = Oracle()

    files = sorted(f for f in os.listdir(args.dataset)
                   if os.path.isfile(os.path.join(args.dataset, f)))
    codecs = args.codecs.split(",")

    from aocl_compression_tpu.runtime import native
    native.get_lib()

    geo: dict = {}
    for codec in codecs:
        ci = CODECS.index(codec)
        levels = ([int(x) for x in args.levels.split(",")]
                  if args.levels else DEFAULT_LEVELS[codec])
        for lvl in levels:
            rows = []
            for fname in files:
                data = open(os.path.join(args.dataset, fname), "rb").read()
                mb = len(data) / 1e6
                ofn, odfn = ours_fns(codec, lvl)
                oenc, odec, ocomp, odecb = ours_direct(codec, lvl, data)
                d, out = oracle.handle(ci, data, lvl,
                                       2 * len(data) + (1 << 16))
                # interleaved min-of-N: ours and the oracle alternate
                # within each iteration so slow host drifts hit both
                bo = bref = bod = brefd = 9e9
                co = rn = None
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    clen = oenc()
                    bo = min(bo, time.perf_counter() - t0)
                    assert clen > 0
                    t0 = time.perf_counter()
                    rn = oracle.compress(ci, d)
                    bref = min(bref, time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    dlen = odec(clen)
                    bod = min(bod, time.perf_counter() - t0)
                    assert dlen == len(data)
                    co = ocomp(clen)
                    assert odecb(dlen) == data
                    # oracle decompress round: feed its own stream back
                    d2, out2 = oracle.handle(ci, out.raw[:rn], lvl,
                                             len(data) + 64)
                    d2.dSize = len(data)  # snappy path reads expected size
                    t0 = time.perf_counter()
                    dn = oracle.lib.aocl_llc_decompress(ctypes.byref(d2),
                                                        ci)
                    brefd = min(brefd, time.perf_counter() - t0)
                    assert dn == len(data), (codec, lvl, fname, dn)
                    assert out2.raw[:dn] == data
                    oracle.lib.aocl_llc_destroy(ctypes.byref(d2), ci)
                refc = out.raw[:rn]
                if not args.no_interop:
                    # both directions through the FRAME adapters
                    d3, out3 = oracle.handle(ci, to_ref_frame(codec, co),
                                             lvl, len(data) + 64)
                    d3.dSize = len(data)
                    dn = oracle.lib.aocl_llc_decompress(ctypes.byref(d3),
                                                        ci)
                    assert dn == len(data) and out3.raw[:dn] == data, \
                        (codec, lvl, fname, "ref cannot decode ours", dn)
                    oracle.lib.aocl_llc_destroy(ctypes.byref(d3), ci)
                    assert odfn(to_our_frame(codec, refc, len(data)),
                                len(data)) == data, \
                        (codec, lvl, fname, "we cannot decode ref")
                oracle.lib.aocl_llc_destroy(ctypes.byref(d), ci)
                ro, rr = len(data) / len(co), len(data) / rn
                row = (fname, mb / bo, mb / bref, mb / bod, mb / brefd,
                       ro, rr)
                rows.append(row)
                print(f"{codec:6s} L{lvl:2d} {fname:13s} enc "
                      f"{row[1]:7.1f}/{row[2]:7.1f} ({row[1]/row[2]:.2f}x)"
                      f" dec {row[3]:7.1f}/{row[4]:7.1f} "
                      f"({row[3]/row[4]:.2f}x) ratio {ro:.4f}/{rr:.4f} "
                      f"{'+' if ro >= rr else '-'}", flush=True)
            g = lambda i: math.exp(
                sum(math.log(r[i]) for r in rows) / len(rows))
            print(f"== {codec} L{lvl} geomean: enc {g(1):.1f}/{g(2):.1f} "
                  f"= {g(1)/g(2):.3f}x | dec {g(3):.1f}/{g(4):.1f} = "
                  f"{g(3)/g(4):.3f}x | ratio {g(5):.4f}/{g(6):.4f}",
                  flush=True)
            geo[(codec, lvl)] = (g(1) / g(2), g(3) / g(4), g(5), g(6))
    return 0


if __name__ == "__main__":
    sys.exit(main())
