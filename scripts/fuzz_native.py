"""Mutation fuzzer for the native host runtime (csrc/*.cpp).

Build-then-mutate (the reference's gtest pattern, gtest/lz4/lz4_gtest.cpp:
212-299): compress real payloads with each codec, then hammer the decoder
with bit-flips, truncations, extensions, splices, and pure-random buffers.
A decoder may return an error or even garbage bytes — but it must never
read/write out of bounds. Run under the ASAN build to enforce that:

    make -C csrc asan
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
        ASAN_OPTIONS=detect_leaks=0 \
        python scripts/fuzz_native.py --lib csrc/libaocl_tpu_host_asan.so

Exit code 0 = no sanitizer findings (ASAN aborts the process otherwise).
Standalone ctypes loader — no package imports, so LD_PRELOAD stays clean.
"""

import argparse
import ctypes
import os
import sys

import numpy as np

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_i64 = ctypes.c_int64
_i32 = ctypes.c_int32
_sz = ctypes.c_size_t


def load(path):
    lib = ctypes.CDLL(path)
    sigs = [
        ("atpu_lz4_compress_bound", _i64, [_i64]),
        ("atpu_lz4_compress", _i64, [_u8p, _i64, _u8p, _i64, _i32]),
        ("atpu_lz4hc_compress", _i64, [_u8p, _i64, _u8p, _i64, _i32]),
        ("atpu_lz4_decompress", _i64, [_u8p, _i64, _u8p, _i64]),
        ("atpu_lz4_decompress_dict", _i64,
         [_u8p, _i64, _u8p, _i64, _u8p, _i64]),
        ("atpu_lz4_decompressed_size", _i64, [_u8p, _i64]),
        ("atpu_snappy_max_compressed_length", _i64, [_i64]),
        ("atpu_snappy_compress", _i64, [_u8p, _i64, _u8p, _i64]),
        ("atpu_snappy_uncompressed_length", _i64, [_u8p, _i64]),
        ("atpu_snappy_uncompress", _i64, [_u8p, _i64, _u8p, _i64]),
        ("atpu_rap_frame_len", _i64, [_i32]),
        ("atpu_rap_write", _i64, [_u8p, _i64, _i32, _u32p, _u32p, _u32p]),
        ("atpu_rap_parse", _i64, [_u8p, _i64, _u32p, _u32p, _u32p, _i32]),
        ("atpu_rap_skip", _i64, [_u8p, _i64]),
        ("atpu_zstd_decompress", _i64, [_u8p, _sz, _u8p, _sz, _u8p, _sz]),
        ("atpu_zstd_frame_content_size", _i64, [_u8p, _sz]),
        ("atpu_zstd_frame_compressed_size", _i64, [_u8p, _sz]),
        ("atpu_zstd_compress", _i64, [_u8p, _sz, _u8p, _sz, _i32, _u8p, _sz]),
        ("atpu_zstd_compress_bound", _i64, [_i64]),
        ("atpu_deflate", _i64, [_u8p, _sz, _u8p, _sz, _i32, _i32]),
        ("atpu_deflate_bound", _i64, [_i64]),
        ("atpu_inflate", _i64, [_u8p, _sz, _u8p, _sz, _i32]),
        ("atpu_inflate_plan", _i64,
         [_u8p, _sz, _u8p, _u8p, ctypes.POINTER(_i64)]),
        ("atpu_bz2_compress", _i64, [_u8p, _sz, _u8p, _sz, _i32]),
        ("atpu_bz2_decompress", _i64, [_u8p, _sz, _u8p, _sz]),
        ("atpu_lzma_compress", _i64, [_u8p, _sz, _u8p, _sz, _i32]),
        ("atpu_lzma_decompress", _i64, [_u8p, _sz, _u8p, _sz]),
        ("atpu_lzma_unpacked_size", _i64, [_u8p, _sz]),
        ("atpu_zstd_frame_plan", _i64,
         [_u8p, _sz, ctypes.POINTER(_i32), ctypes.POINTER(ctypes.c_uint16),
          _u32p, _i64, ctypes.POINTER(_i64)]),
        ("atpu_inflate_stream_new", ctypes.c_void_p, [_i32]),
        ("atpu_inflate_stream_free", None, [ctypes.c_void_p]),
        ("atpu_inflate_stream_feed", _i64, [ctypes.c_void_p, _u8p, _sz]),
        ("atpu_inflate_stream_run", _i64,
         [ctypes.c_void_p, _u8p, _sz, _i32, ctypes.POINTER(_i32)]),
        ("atpu_bz2_stream_new", ctypes.c_void_p, []),
        ("atpu_bz2_stream_free", None, [ctypes.c_void_p]),
        ("atpu_bz2_stream_feed", _i64, [ctypes.c_void_p, _u8p, _sz]),
        ("atpu_bz2_stream_run", _i64,
         [ctypes.c_void_p, _u8p, _sz, _i32, ctypes.POINTER(_i32)]),
        ("atpu_lzma_compress_cand", _i64,
         [_u8p, _sz, _u8p, _sz, _i32, ctypes.POINTER(_i64),
          ctypes.POINTER(_i32), ctypes.POINTER(_i32), _i64]),
    ]
    for name, res, args in sigs:
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    return lib


def p(a):
    if len(a) == 0:
        a = np.zeros(1, dtype=a.dtype)
    return a.ctypes.data_as(_u8p)


def p32(a):
    return a.ctypes.data_as(_u32p)


def payloads(rng):
    text = (b"the quick brown fox jumps over the lazy dog. " * 300)
    rec = rng.integers(0, 256, 48, dtype=np.uint8).tobytes() * 200
    rand = rng.integers(0, 256, 8192, dtype=np.uint8).tobytes()
    runs = b"\x00" * 5000 + b"ab" * 2000 + b"\xff" * 3000
    return [text, rec, rand, runs, b"", b"x", text[:37]]


def mutate(rng, buf):
    """One mutation of a valid stream."""
    b = bytearray(buf)
    op = rng.integers(0, 6)
    if len(b) == 0 or op == 0:        # random buffer
        return rng.integers(0, 256, int(rng.integers(1, 4096)),
                            dtype=np.uint8).tobytes()
    if op == 1:                        # flip random bytes
        for _ in range(int(rng.integers(1, 9))):
            i = int(rng.integers(0, len(b)))
            b[i] = int(rng.integers(0, 256))
        return bytes(b)
    if op == 2:                        # truncate
        return bytes(b[:int(rng.integers(0, len(b)))])
    if op == 3:                        # extend with garbage
        return bytes(b) + rng.integers(
            0, 256, int(rng.integers(1, 64)), dtype=np.uint8).tobytes()
    if op == 4:                        # splice two halves at random points
        i = int(rng.integers(0, len(b)))
        j = int(rng.integers(0, len(b)))
        return bytes(b[:i]) + bytes(b[j:])
    # op == 5: hammer the first 16 bytes (headers/magic/props)
    for _ in range(4):
        i = int(rng.integers(0, min(16, len(b))))
        b[i] = int(rng.integers(0, 256))
    return bytes(b)


def run(lib, runs, seed):
    rng = np.random.default_rng(seed)
    pls = payloads(rng)

    # --- build valid streams per codec -------------------------------------
    streams = {k: [] for k in
               ("lz4", "snappy", "zstd", "inflate", "bz2", "lzma", "rap")}
    for pl in pls:
        src = np.frombuffer(pl, dtype=np.uint8)
        n = len(pl)
        cap = max(64, int(lib.atpu_lz4_compress_bound(n)))
        dst = np.zeros(cap, dtype=np.uint8)
        r = lib.atpu_lz4_compress(p(src), n, p(dst), cap, 1)
        if r > 0:
            streams["lz4"].append(dst[:r].tobytes())
        for lvl in (1, 6, 12):  # HC levels drive the hash-chain matcher
            r = lib.atpu_lz4hc_compress(p(src), n, p(dst), cap, lvl)
            if r > 0:
                streams["lz4"].append(dst[:r].tobytes())
        cap = max(64, int(lib.atpu_snappy_max_compressed_length(n)))
        dst = np.zeros(cap, dtype=np.uint8)
        r = lib.atpu_snappy_compress(p(src), n, p(dst), cap)
        if r > 0:
            streams["snappy"].append(dst[:r].tobytes())
        cap = max(128, int(lib.atpu_zstd_compress_bound(n)))
        dst = np.zeros(cap, dtype=np.uint8)
        r = lib.atpu_zstd_compress(p(src), n, p(dst), cap, 3, None, 0)
        if r > 0:
            streams["zstd"].append(dst[:r].tobytes())
        cap = max(128, int(lib.atpu_deflate_bound(n)))
        dst = np.zeros(cap, dtype=np.uint8)
        r = lib.atpu_deflate(p(src), n, p(dst), cap, 6, 0)
        if r > 0:
            streams["inflate"].append(dst[:r].tobytes())
        cap = n + n // 2 + 600
        dst = np.zeros(cap, dtype=np.uint8)
        r = lib.atpu_bz2_compress(p(src), n, p(dst), cap, 9)
        if r > 0:
            streams["bz2"].append(dst[:r].tobytes())
        dst = np.zeros(cap + 1024, dtype=np.uint8)
        r = lib.atpu_lzma_compress(p(src), n, p(dst), cap + 1024, 6)
        if r > 0:
            streams["lzma"].append(dst[:r].tobytes())
    # a valid RAP frame
    offs = np.array([32, 100, 200], dtype=np.uint32)
    lens = np.array([68, 100, 50], dtype=np.uint32)
    dls = np.array([500, 600, 700], dtype=np.uint32)
    fl = int(lib.atpu_rap_frame_len(3))
    frame = np.zeros(fl + 256, dtype=np.uint8)
    r = lib.atpu_rap_write(p(frame), fl + 256, 3, p32(offs), p32(lens),
                           p32(dls))
    assert r > 0
    streams["rap"].append(frame[:r].tobytes())

    # --- mutate + decode ----------------------------------------------------
    DCAP = 1 << 17
    dout = np.zeros(DCAP, dtype=np.uint8)
    o1 = np.zeros(4096, dtype=np.uint32)
    o2 = np.zeros(4096, dtype=np.uint32)
    o3 = np.zeros(4096, dtype=np.uint32)
    dict_buf = np.frombuffer(pls[0][:4096], dtype=np.uint8).copy()
    plan_meta = np.zeros((8, 22), dtype=np.int32)
    plan_huf = np.zeros((8, 2048), dtype=np.uint16)
    plan_fse = np.zeros((8, 3, 512), dtype=np.uint32)
    counts = {k: 0 for k in streams}
    for it in range(runs):
        kind = list(streams)[int(rng.integers(0, len(streams)))]
        base = streams[kind]
        if not base:
            continue
        m = mutate(rng, base[int(rng.integers(0, len(base)))])
        a = np.frombuffer(m, dtype=np.uint8).copy()
        ln = len(m)
        # vary the output capacity: ample, tight, tiny, zero
        cap = [DCAP, 1024, 7, 0][int(rng.integers(0, 4))]
        if kind == "lz4":
            lib.atpu_lz4_decompress(p(a), ln, p(dout), cap)
            lib.atpu_lz4_decompressed_size(p(a), ln)
            lib.atpu_lz4_decompress_dict(p(a), ln, p(dout), cap,
                                         p(dict_buf), len(dict_buf))
        elif kind == "snappy":
            lib.atpu_snappy_uncompressed_length(p(a), ln)
            lib.atpu_snappy_uncompress(p(a), ln, p(dout), cap)
        elif kind == "zstd":
            lib.atpu_zstd_frame_content_size(p(a), ln)
            lib.atpu_zstd_frame_compressed_size(p(a), ln)
            lib.atpu_zstd_decompress(p(a), ln, p(dout), cap, None, 0)
            # device-decode planner: header cracking over hostile input
            consumed = _i64(0)
            lib.atpu_zstd_frame_plan(
                p(a), ln, plan_meta.ctypes.data_as(ctypes.POINTER(_i32)),
                plan_huf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                p32(plan_fse), 8, ctypes.byref(consumed))
        elif kind == "inflate":
            lib.atpu_inflate(p(a), ln, p(dout), cap, int(rng.integers(0, 2)))
            # device-inflate planner: first-block header cracking over
            # hostile input (ops/inflate_device.py entry)
            ll_lens = np.zeros(288, np.uint8)
            d_lens = np.zeros(32, np.uint8)
            boff = _i64(0)
            lib.atpu_inflate_plan(p(a), ln, p(ll_lens), p(d_lens),
                                  ctypes.byref(boff))
            # resumable stream decode: feed in random-size pieces
            ctx = lib.atpu_inflate_stream_new(int(rng.integers(0, 2)))
            if ctx:
                done = _i32(0)
                pos = 0
                while pos < ln:
                    k = int(rng.integers(1, 1500))
                    lib.atpu_inflate_stream_feed(ctx, p(a[pos:]),
                                                 min(k, ln - pos))
                    pos += k
                    if lib.atpu_inflate_stream_run(
                            ctx, p(dout), max(cap, 1), 0,
                            ctypes.byref(done)) < 0:
                        break
                lib.atpu_inflate_stream_run(ctx, p(dout), max(cap, 1), 1,
                                            ctypes.byref(done))
                lib.atpu_inflate_stream_free(ctx)
        elif kind == "bz2":
            lib.atpu_bz2_decompress(p(a), ln, p(dout), cap)
            ctx = lib.atpu_bz2_stream_new()
            if ctx:
                done = _i32(0)
                pos = 0
                while pos < ln:
                    k = int(rng.integers(1, 3000))
                    lib.atpu_bz2_stream_feed(ctx, p(a[pos:]),
                                             min(k, ln - pos))
                    pos += k
                    if lib.atpu_bz2_stream_run(
                            ctx, p(dout), max(cap, 1), 0,
                            ctypes.byref(done)) < 0:
                        break
                lib.atpu_bz2_stream_run(ctx, p(dout), max(cap, 1), 1,
                                        ctypes.byref(done))
                lib.atpu_bz2_stream_free(ctx)
        elif kind == "lzma":
            lib.atpu_lzma_unpacked_size(p(a), ln)
            lib.atpu_lzma_decompress(p(a), ln, p(dout), cap)
        elif kind == "rap":
            lib.atpu_rap_skip(p(a), ln)
            lib.atpu_rap_parse(p(a), ln, p32(o1), p32(o2), p32(o3),
                               int(rng.integers(0, 8)))
        counts[kind] += 1
    # encoders with deliberately short dst buffers must error, not overrun
    for pl in pls:
        src = np.frombuffer(pl, dtype=np.uint8)
        n = len(pl)
        for cap in (0, 1, 5, max(0, n // 4)):
            dst = np.zeros(max(cap, 1), dtype=np.uint8)
            assert lib.atpu_lz4_compress(p(src), n, p(dst), cap, 1) <= cap
            assert lib.atpu_snappy_compress(p(src), n, p(dst), cap) <= cap
            lib.atpu_zstd_compress(p(src), n, p(dst), cap, 1, None, 0)
            lib.atpu_deflate(p(src), n, p(dst), cap, 6, 0)
            lib.atpu_bz2_compress(p(src), n, p(dst), cap, 1)
            lib.atpu_lzma_compress(p(src), n, p(dst), cap, 1)
    # hostile candidate arrays must never corrupt the cand encoder
    for pl in pls[:3]:
        src2 = np.frombuffer(pl, dtype=np.uint8)
        n = len(pl)
        nc = int(rng.integers(1, 64))
        cp = rng.integers(-5, max(n, 1) + 50, nc).astype(np.int64)
        cp.sort()
        cl = rng.integers(-3, 300, nc).astype(np.int32)
        cd = rng.integers(-2, max(n, 1) + 99, nc).astype(np.int32)
        dst2 = np.zeros(n + n // 2 + 1024, dtype=np.uint8)
        lib.atpu_lzma_compress_cand(
            p(src2), n, p(dst2), len(dst2), 6,
            cp.ctypes.data_as(ctypes.POINTER(_i64)),
            cl.ctypes.data_as(ctypes.POINTER(_i32)),
            cd.ctypes.data_as(ctypes.POINTER(_i32)), nc)
    print("fuzz ok:", dict(counts), flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lib", default=os.path.join(
        os.path.dirname(__file__), "..", "csrc", "libaocl_tpu_host.so"))
    ap.add_argument("--runs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    return run(load(a.lib), a.runs, a.seed)


if __name__ == "__main__":
    sys.exit(main())
