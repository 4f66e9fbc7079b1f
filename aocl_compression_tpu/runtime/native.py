"""ctypes bindings for the native host runtime (csrc/libaocl_tpu_host.so).

The native library holds the host-tier codecs (own-implementation LZ4 block,
LZ4HC, Snappy raw) and the RAP container writer/parser — the TPU-native
equivalent of the reference's C/C++ codec layer (SURVEY.md §2.2) and threads
runtime (§2.1 F6/F7). Built lazily with `make` on first import if missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIBPATH = os.path.join(_CSRC, "libaocl_tpu_host.so")

_lib = None
_lock = threading.Lock()

_u8p = ctypes.POINTER(ctypes.c_uint8)
_u32p = ctypes.POINTER(ctypes.c_uint32)
_i64 = ctypes.c_int64
_i32 = ctypes.c_int32


def _build() -> None:
    subprocess.run(["make", "-C", _CSRC, "-s"], check=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        srcs = [os.path.join(_CSRC, f) for f in os.listdir(_CSRC)
                if f.endswith(".cpp")]
        if (not os.path.exists(_LIBPATH)
                or any(os.path.getmtime(s) > os.path.getmtime(_LIBPATH)
                       for s in srcs)):
            _build()
        lib = ctypes.CDLL(_LIBPATH)
        for name, restype, argtypes in [
            ("atpu_lz4_compress_bound", _i64, [_i64]),
            ("atpu_lz4_compress", _i64, [_u8p, _i64, _u8p, _i64, _i32]),
            ("atpu_lz4_compress_tail", _i64,
             [_u8p, _i64, _u8p, _i64, _i32, ctypes.POINTER(_i64)]),
            ("atpu_lz4_decompress", _i64, [_u8p, _i64, _u8p, _i64]),
            ("atpu_lz4_decompressed_size", _i64, [_u8p, _i64]),
            ("atpu_lz4hc_compress", _i64, [_u8p, _i64, _u8p, _i64, _i32]),
            ("atpu_lz4hc_compress_tail", _i64,
             [_u8p, _i64, _u8p, _i64, _i32, ctypes.POINTER(_i64)]),
            ("atpu_snappy_max_compressed_length", _i64, [_i64]),
            ("atpu_snappy_compress", _i64, [_u8p, _i64, _u8p, _i64]),
            ("atpu_snappy_uncompressed_length", _i64, [_u8p, _i64]),
            ("atpu_snappy_uncompress", _i64, [_u8p, _i64, _u8p, _i64]),
            ("atpu_rap_frame_len", _i64, [_i32]),
            ("atpu_rap_write", _i64, [_u8p, _i64, _i32, _u32p, _u32p, _u32p]),
            ("atpu_rap_parse", _i64, [_u8p, _i64, _u32p, _u32p, _u32p, _i32]),
            ("atpu_rap_skip", _i64, [_u8p, _i64]),
            ("atpu_rap_frame_bound", _i64, [_i64, _i64]),
            ("atpu_xxh32", ctypes.c_uint32, [_u8p, _i64, ctypes.c_uint32]),
            ("atpu_xxh32_init", None, [ctypes.c_void_p, ctypes.c_uint32]),
            ("atpu_xxh32_update", None, [ctypes.c_void_p, _u8p, _i64]),
            ("atpu_xxh32_digest", ctypes.c_uint32, [ctypes.c_void_p]),
            ("atpu_lz4_compress_continue", _i64,
             [_u8p, _i64, _u8p, _i64, _i32, _i64]),
            ("atpu_lz4_decompress_dict", _i64,
             [_u8p, _i64, _u8p, _i64, _u8p, _i64]),
            ("atpu_zstd_decompress", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _u8p,
              ctypes.c_size_t]),
            ("atpu_zstd_decompress_frame", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _u8p,
              ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t)]),
            ("atpu_zstd_frame_content_size", _i64, [_u8p, ctypes.c_size_t]),
            ("atpu_zstd_frame_compressed_size", _i64,
             [_u8p, ctypes.c_size_t]),
            ("atpu_xxh64", ctypes.c_uint64,
             [_u8p, ctypes.c_size_t, ctypes.c_uint64]),
            ("atpu_deflate", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32, _i32]),
            ("atpu_inflate", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32]),
            ("atpu_deflate_bound", _i64, [_i64]),
            ("atpu_adler32", ctypes.c_uint32,
             [_u8p, ctypes.c_size_t, ctypes.c_uint32]),
            ("atpu_crc32", ctypes.c_uint32,
             [_u8p, ctypes.c_size_t, ctypes.c_uint32]),
            ("atpu_inflate_consumed", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t,
              ctypes.POINTER(ctypes.c_size_t)]),
            ("atpu_inflate_plan", _i64,
             [_u8p, ctypes.c_size_t, _u8p, _u8p,
              ctypes.POINTER(_i64)]),
            ("atpu_bz2_compress", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32]),
            ("atpu_bz2_decompress", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t]),
            ("atpu_bz2_prepare", _i64,
             [_u8p, ctypes.c_size_t, _i32, _u8p, ctypes.c_size_t,
              ctypes.POINTER(_i64), ctypes.POINTER(_i64), _u32p, _i32]),
            ("atpu_bz2_emit", _i64,
             [_i32, _i32, _u8p, ctypes.POINTER(_i64), ctypes.POINTER(_i64),
              _u32p, _u8p, ctypes.c_size_t]),
            ("atpu_lzma_compress", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32]),
            ("atpu_lzma_decompress", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t]),
            ("atpu_lzma_unpacked_size", _i64, [_u8p, ctypes.c_size_t]),
            ("atpu_lzma2_ctx_new", ctypes.c_void_p, []),
            ("atpu_lzma2_ctx_free", None, [ctypes.c_void_p]),
            ("atpu_lzma2_decode_chunk", _i64,
             [ctypes.c_void_p, _u8p, ctypes.c_size_t, _u8p,
              ctypes.c_size_t, ctypes.c_size_t, ctypes.c_uint64, _i32,
              _i32, ctypes.c_size_t]),
            ("atpu_lzma2_mark_uncompressed", None, [ctypes.c_void_p]),
            ("atpu_zstd_compress", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32, _u8p,
              ctypes.c_size_t]),
            ("atpu_zstd_compress_ex", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32, _u8p,
              ctypes.c_size_t, _i32]),
            ("atpu_zstd_compress_bound", _i64, [_i64]),
            ("atpu_zstd_build_dict_header", _i64,
             [ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
              ctypes.POINTER(ctypes.c_uint32),
              ctypes.POINTER(ctypes.c_uint32),
              ctypes.POINTER(ctypes.c_uint32), _u8p, ctypes.c_size_t]),
            ("atpu_zstd_set_stats", None,
             [ctypes.POINTER(ctypes.c_uint32),
              ctypes.POINTER(ctypes.c_uint32),
              ctypes.POINTER(ctypes.c_uint32),
              ctypes.POINTER(ctypes.c_uint32)]),
            ("atpu_inflate_stream_new", ctypes.c_void_p, [_i32]),
            ("atpu_inflate_stream_free", None, [ctypes.c_void_p]),
            ("atpu_inflate_stream_feed", _i64,
             [ctypes.c_void_p, _u8p, ctypes.c_size_t]),
            ("atpu_inflate_stream_pending", _i64, [ctypes.c_void_p]),
            ("atpu_inflate_stream_tail", _i64, [ctypes.c_void_p]),
            ("atpu_inflate_stream_run", _i64,
             [ctypes.c_void_p, _u8p, ctypes.c_size_t, _i32,
              ctypes.POINTER(_i32)]),
            ("atpu_bz2_stream_new", ctypes.c_void_p, []),
            ("atpu_bz2_stream_free", None, [ctypes.c_void_p]),
            ("atpu_bz2_stream_feed", _i64,
             [ctypes.c_void_p, _u8p, ctypes.c_size_t]),
            ("atpu_bz2_stream_pending", _i64, [ctypes.c_void_p]),
            ("atpu_bz2_stream_run", _i64,
             [ctypes.c_void_p, _u8p, ctypes.c_size_t, _i32,
              ctypes.POINTER(_i32)]),
            ("atpu_lzma_compress_cand", _i64,
             [_u8p, ctypes.c_size_t, _u8p, ctypes.c_size_t, _i32,
              ctypes.POINTER(_i64), ctypes.POINTER(_i32),
              ctypes.POINTER(_i32), _i64]),
            ("atpu_zstd_frame_plan", _i64,
             [_u8p, ctypes.c_size_t, ctypes.POINTER(_i32),
              ctypes.POINTER(ctypes.c_uint16), _u32p, _i64,
              ctypes.POINTER(_i64)]),
        ]:
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = argtypes
        _lib = lib
        return _lib


def _as_u8p(buf: np.ndarray):
    return buf.ctypes.data_as(_u8p)


def _tobuf(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8)


# --- zero-copy output buffers -------------------------------------------------
# Outputs were staged in a fresh numpy buffer and then COPIED into bytes
# via .tobytes(): for MB-sized results the fault-in of the staging pages
# plus the copy halved effective throughput once the C cores got fast
# (measured: lz4 decode 1.7 GB/s raw vs ~0.45 GB/s through the wrapper).
# Instead allocate the final `bytes` uninitialized — the CPython pattern
# for building a bytes in place while holding the sole reference — let
# the codec write straight into it, and shrink in place at the end.

_PyBytes_FromStringAndSize = ctypes.pythonapi.PyBytes_FromStringAndSize
_PyBytes_FromStringAndSize.restype = ctypes.py_object
_PyBytes_FromStringAndSize.argtypes = [ctypes.c_void_p, ctypes.c_ssize_t]
_PyBytes_AsString = ctypes.pythonapi.PyBytes_AsString
_PyBytes_AsString.restype = ctypes.c_void_p
_PyBytes_AsString.argtypes = [ctypes.py_object]
def _alloc_out(cap: int):
    """(bytes object, u8 pointer) over `cap` uninitialized bytes."""
    obj = _PyBytes_FromStringAndSize(None, max(cap, 1))
    ptr = ctypes.cast(_PyBytes_AsString(obj), _u8p)
    return obj, ptr


def _finish_out(obj: bytes, n: int) -> bytes:
    """Finalize an _alloc_out buffer at its written length.

    Exact-size results (decode with a known size — the hot path) return
    the buffer itself with no copy; smaller results (encode outputs land
    well under their bound) copy out the written prefix, which is what
    the old staging-buffer path paid anyway."""
    if len(obj) == n:
        return obj
    return ctypes.string_at(_PyBytes_AsString(obj), n)


# --- LZ4 --------------------------------------------------------------------

def lz4_compress_bound(n: int) -> int:
    return get_lib().atpu_lz4_compress_bound(n)


def lz4_compress(data: bytes, accel: int = 1) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    cap = lib.atpu_lz4_compress_bound(len(data))
    ref, dp = _alloc_out(cap)
    n = lib.atpu_lz4_compress(_as_u8p(src), len(data), dp, cap, accel)
    if n < 0:
        raise ValueError("lz4 host compress failed")
    return _finish_out(ref, n)


class XXH32Stream:
    """Incremental XXH32 (csrc atpu_xxh32_init/update/digest) — the LZ4F
    streaming compressor's content checksum without buffering."""

    def __init__(self, seed: int = 0):
        self._lib = get_lib()
        self._st = ctypes.create_string_buffer(48)
        self._lib.atpu_xxh32_init(ctypes.cast(self._st, ctypes.c_void_p),
                                  seed)

    def update(self, data: bytes) -> None:
        if not data:
            return
        buf = _tobuf(data)
        self._lib.atpu_xxh32_update(
            ctypes.cast(self._st, ctypes.c_void_p), _as_u8p(buf), len(data))

    def digest(self) -> int:
        return int(self._lib.atpu_xxh32_digest(
            ctypes.cast(self._st, ctypes.c_void_p)))


def lz4_compress_continue(block: bytes, history: bytes,
                          accel: int = 1) -> bytes:
    """Compress one linked block: matches may reference `history` (the
    previous <=64 KiB of the stream). csrc atpu_lz4_compress_continue."""
    lib = get_lib()
    hist = history[-65536:]
    joined = _tobuf(hist + block)
    cap = lib.atpu_lz4_compress_bound(len(block))
    ref, dp = _alloc_out(cap)
    srcp = ctypes.cast(_as_u8p(joined), ctypes.c_void_p).value or 0
    n = lib.atpu_lz4_compress_continue(
        ctypes.cast(srcp + len(hist), ctypes.POINTER(ctypes.c_uint8)),
        len(block), dp, cap, accel, len(hist))
    if n < 0:
        raise ValueError("lz4 linked-block compress failed")
    return _finish_out(ref, n)


def lz4_compress_tail(data: bytes, accel: int = 1) -> tuple:
    """Compress and also return the trailing-literal count of the final
    literal-only sequence (needed by the RAP boundary stitcher)."""
    lib = get_lib()
    src = _tobuf(data)
    cap = lib.atpu_lz4_compress_bound(len(data))
    ref, dp = _alloc_out(cap)
    tail = _i64(0)
    n = lib.atpu_lz4_compress_tail(_as_u8p(src), len(data), dp,
                                   cap, accel, ctypes.byref(tail))
    if n < 0:
        raise ValueError("lz4 host compress failed")
    return _finish_out(ref, n), tail.value


def lz4hc_compress_tail(data: bytes, level: int = 9) -> tuple:
    lib = get_lib()
    src = _tobuf(data)
    cap = lib.atpu_lz4_compress_bound(len(data))
    ref, dp = _alloc_out(cap)
    tail = _i64(0)
    n = lib.atpu_lz4hc_compress_tail(_as_u8p(src), len(data), dp,
                                     cap, level, ctypes.byref(tail))
    if n < 0:
        raise ValueError("lz4hc host compress failed")
    return _finish_out(ref, n), tail.value


def lz4_decompress(data: bytes, expected_size: int) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    ref, dp = _alloc_out(expected_size)
    n = lib.atpu_lz4_decompress(_as_u8p(src), len(data), dp, expected_size)
    if n < 0:
        raise ValueError("lz4 host decompress failed (corrupt stream?)")
    return _finish_out(ref, n)


def lz4_decompressed_size(data: bytes) -> int:
    """Exact decompressed size from a structural token scan (no byte
    movement); -1 if the stream structure is malformed."""
    lib = get_lib()
    src = _tobuf(data)
    return int(lib.atpu_lz4_decompressed_size(_as_u8p(src), len(data)))


def lz4hc_compress(data: bytes, level: int = 9) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    cap = lib.atpu_lz4_compress_bound(len(data))
    ref, dp = _alloc_out(cap)
    n = lib.atpu_lz4hc_compress(_as_u8p(src), len(data), dp, cap, level)
    if n < 0:
        raise ValueError("lz4hc host compress failed")
    return _finish_out(ref, n)


# --- Snappy -----------------------------------------------------------------

def snappy_max_compressed_length(n: int) -> int:
    return get_lib().atpu_snappy_max_compressed_length(n)


def snappy_compress(data: bytes) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    cap = lib.atpu_snappy_max_compressed_length(len(data))
    ref, dp = _alloc_out(cap)
    n = lib.atpu_snappy_compress(_as_u8p(src), len(data), dp, cap)
    if n < 0:
        raise ValueError("snappy host compress failed")
    return _finish_out(ref, n)


def snappy_uncompressed_length(data: bytes) -> int:
    n = get_lib().atpu_snappy_uncompressed_length(_as_u8p(_tobuf(data)),
                                                  len(data))
    if n < 0:
        raise ValueError("snappy: bad length preamble")
    return n


def snappy_uncompress(data: bytes) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    expected = snappy_uncompressed_length(data)
    ref, dp = _alloc_out(expected)
    n = lib.atpu_snappy_uncompress(_as_u8p(src), len(data), dp, expected)
    if n < 0:
        raise ValueError("snappy host decompress failed (corrupt stream?)")
    return _finish_out(ref, n)


# --- RAP container ----------------------------------------------------------

def rap_frame_len(n_main: int) -> int:
    return get_lib().atpu_rap_frame_len(n_main)


def rap_write(n_main: int, offsets, lens, dlens) -> bytes:
    lib = get_lib()
    offs = np.ascontiguousarray(offsets, dtype=np.uint32)
    lns = np.ascontiguousarray(lens, dtype=np.uint32)
    dls = np.ascontiguousarray(dlens, dtype=np.uint32)
    dst = np.empty(lib.atpu_rap_frame_len(n_main), dtype=np.uint8)
    n = lib.atpu_rap_write(_as_u8p(dst), dst.size, n_main,
                           offs.ctypes.data_as(_u32p),
                           lns.ctypes.data_as(_u32p),
                           dls.ctypes.data_as(_u32p))
    if n < 0:
        raise ValueError("rap write failed")
    return dst[:n].tobytes()


def rap_parse(data: bytes) -> Optional[tuple]:
    """Returns (offsets, lens, dlens) arrays, or None for a legacy stream.

    The 65,536-entry capacity is format-inherent, not an implementation
    cap: the RAP header stores the main-thread count in a 2-byte field
    (reference threads/threads.h:60), so one frame can describe at most
    65,535 chunks (4 GiB of payload at 64 KiB blocks). Larger payloads
    must be split into multiple RAP streams by the caller.
    """
    lib = get_lib()
    src = _tobuf(data)
    cap = 1 << 16
    offs = np.empty(cap, dtype=np.uint32)
    lns = np.empty(cap, dtype=np.uint32)
    dls = np.empty(cap, dtype=np.uint32)
    n = lib.atpu_rap_parse(_as_u8p(src), len(data),
                           offs.ctypes.data_as(_u32p),
                           lns.ctypes.data_as(_u32p),
                           dls.ctypes.data_as(_u32p), cap)
    if n < 0:
        raise ValueError("malformed RAP frame")
    if n == 0:
        return None
    return offs[:n].copy(), lns[:n].copy(), dls[:n].copy()


def rap_skip(data: bytes) -> int:
    """Bytes to skip past a RAP frame (0 if none) — aocl_skip_rap_frame_mt."""
    return get_lib().atpu_rap_skip(_as_u8p(_tobuf(data)), len(data))


def rap_frame_bound(src_size: int, chunk_size: int) -> int:
    return get_lib().atpu_rap_frame_bound(src_size, chunk_size)


def lz4_decompress_with_history(data: bytes, expected_size: int,
                                history: bytes) -> bytes:
    """Decode an LZ4 block whose back-references may reach into `history`
    (LZ4-frame linked blocks)."""
    lib = get_lib()
    src = _tobuf(data)
    hist = _tobuf(history) if history else np.empty(0, dtype=np.uint8)
    ref, dp = _alloc_out(expected_size)
    n = lib.atpu_lz4_decompress_dict(
        _as_u8p(src), len(data), dp, expected_size,
        _as_u8p(hist) if len(history) else _u8p(), len(history))
    if n < 0:
        raise ValueError("lz4 dict decompress failed (corrupt stream?)")
    return _finish_out(ref, n)


# --- xxHash32 (LZ4 frame checksums) -------------------------------------------

def xxh32(data: bytes, seed: int = 0) -> int:
    if len(data) == 0:
        return get_lib().atpu_xxh32(_u8p(), 0, seed)
    return get_lib().atpu_xxh32(_as_u8p(_tobuf(data)), len(data), seed)


# --- zstd (own C++ decoder, csrc/zstd_decode.cpp) ----------------------------

def zstd_frame_content_size(data: bytes) -> Optional[int]:
    """Declared content size of the first frame, or None if unknown."""
    n = get_lib().atpu_zstd_frame_content_size(_as_u8p(_tobuf(data)),
                                               len(data))
    return int(n) if n >= 0 else None


def zstd_decompress(data: bytes, expected_size: Optional[int] = None,
                    dictionary: Optional[bytes] = None) -> bytes:
    """Decode a stream of concatenated zstd frames (incl. skippable) with
    the own C++ decoder — no third-party zstd anywhere on this path.

    Capacity: expected_size if given, else the sum of declared frame
    content sizes when known, else grow-and-retry (the decoder returns a
    distinct dst-too-small error so retries are cheap).
    """
    if not data:
        return b""
    lib = get_lib()
    src = _tobuf(data)
    d = _tobuf(dictionary) if dictionary else None
    dp = _as_u8p(d) if d is not None and d.size else None
    dlen = int(d.size) if d is not None else 0
    if expected_size is not None:
        cap = max(1, expected_size)
    else:
        # Walk the frame chain summing declared content sizes: an exact
        # capacity makes the decode zero-copy (no shrink) and kills the
        # former 2x over-allocation. Any unknown-size frame falls back to
        # the grow-and-retry heuristic.
        total, off = 0, 0
        while off < len(data):
            view = src[off:]
            fsz = lib.atpu_zstd_frame_compressed_size(_as_u8p(view),
                                                      len(data) - off)
            if fsz <= 0:
                total = -1
                break
            csz = lib.atpu_zstd_frame_content_size(_as_u8p(view),
                                                   len(data) - off)
            if csz < 0:
                total = -1
                break
            total += int(csz)
            off += int(fsz)
        if total >= 0 and off == len(data):
            cap = max(1, total)
        else:
            probe = lib.atpu_zstd_frame_content_size(_as_u8p(src), len(data))
            cap = max(64, int(probe) * 2 + 64) if probe > 0 else \
                max(64, 4 * len(data))
    while True:
        ref, outp = _alloc_out(cap)
        n = lib.atpu_zstd_decompress(_as_u8p(src), len(data), outp,
                                     cap, dp, dlen)
        if n >= 0:
            return _finish_out(ref, n)
        if n == -2 and cap < (1 << 31):  # dst too small
            cap *= 4
            continue
        if n == -4:
            raise ValueError("zstd: content checksum mismatch")
        if n == -3:
            raise ValueError("zstd: bad dictionary")
        raise ValueError("zstd: corrupt stream")


def xxh64(data: bytes, seed: int = 0) -> int:
    return int(get_lib().atpu_xxh64(_as_u8p(_tobuf(data)), len(data), seed))


# --- deflate / zlib (own C++ codec, csrc/deflate.cpp) -------------------------

DEFLATE_ZLIB, DEFLATE_RAW, DEFLATE_SYNC_CHUNK = 0, 1, 2


def inflate_consumed(data: bytes):
    """Raw inflate returning (decoded, src_bytes_consumed) — lets framing
    layers (gzip members, xz chunks) locate trailers."""
    lib = get_lib()
    src = _tobuf(data)
    cap = max(64, 4 * len(data))
    consumed = ctypes.c_size_t(0)
    while True:
        ref, dp = _alloc_out(cap)
        n = lib.atpu_inflate_consumed(_as_u8p(src), len(data), dp,
                                      cap, ctypes.byref(consumed))
        if n >= 0:
            return _finish_out(ref, n), int(consumed.value)
        if n == -2 and cap < (1 << 31):
            cap *= 4
            continue
        raise ValueError("inflate: corrupt stream")


def crc32(data: bytes, start: int = 0) -> int:
    """Own CRC-32 (gzip/xz polynomial)."""
    lib = get_lib()
    src = _tobuf(data)
    return int(lib.atpu_crc32(_as_u8p(src) if len(data) else None,
                              len(data), start & 0xFFFFFFFF))


def gzip_compress(data: bytes, level: int = 6) -> bytes:
    """gzip member (RFC 1952) over the own raw deflate — the reference's
    zlib ships the gzip surface (gzwrite/compress with windowBits+16);
    own header/CRC32/ISIZE assembly, stock-gzip interoperable."""
    import struct
    body = deflate(data, level, DEFLATE_RAW)
    hdr = b"\x1f\x8b\x08\x00" + b"\x00" * 4 + b"\x00\xff"
    return (hdr + body
            + struct.pack("<II", crc32(data), len(data) & 0xFFFFFFFF))


def gzip_decompress(data: bytes) -> bytes:
    """Decode one or more concatenated gzip members with own inflate;
    verifies CRC32 and ISIZE."""
    import struct
    out = bytearray()
    pos = 0
    while pos < len(data):
        if len(data) - pos < 18 or data[pos:pos + 2] != b"\x1f\x8b" \
                or data[pos + 2] != 8:
            raise ValueError("gzip: bad header")
        flg = data[pos + 3]
        p = pos + 10
        if flg & 4:  # FEXTRA
            xlen = struct.unpack_from("<H", data, p)[0]
            p += 2 + xlen
        if flg & 8:  # FNAME
            p = data.index(b"\x00", p) + 1
        if flg & 16:  # FCOMMENT
            p = data.index(b"\x00", p) + 1
        if flg & 2:  # FHCRC
            p += 2
        # own inflate consumes the whole remaining raw stream up to the
        # deflate final block; decode then locate the 8-byte trailer by
        # re-deflating is wasteful — instead inflate returns the decoded
        # bytes and we find the trailer via the structural consumed size
        decoded, consumed = inflate_consumed(data[p:])
        p += consumed
        want_crc, want_isize = struct.unpack_from("<II", data, p)
        p += 8
        if crc32(bytes(decoded)) != want_crc:
            raise ValueError("gzip: crc32 mismatch")
        if (len(decoded) & 0xFFFFFFFF) != want_isize:
            raise ValueError("gzip: length mismatch")
        out += decoded
        pos = p
    return bytes(out)


def deflate(data: bytes, level: int = 6, mode: int = DEFLATE_ZLIB) -> bytes:
    """Own DEFLATE encoder: mode 0 = zlib stream, 1 = raw (final block),
    2 = raw sync-flushed chunk (RAP container format)."""
    lib = get_lib()
    src = _tobuf(data)
    cap = lib.atpu_deflate_bound(len(data)) + 16
    ref, dp = _alloc_out(cap)
    n = lib.atpu_deflate(_as_u8p(src), len(data), dp, cap, level, mode)
    if n < 0:
        raise ValueError("deflate failed")
    return _finish_out(ref, n)


def zstd_decompress_frame(data: bytes):
    """Decode ONE zstd frame from the head of `data`.

    Returns (decoded_bytes, consumed_src_bytes), or None when `data` does
    not yet contain a complete frame (streaming: wait for more input).
    Raises on corruption. Skippable frames decode to b"" and are consumed.
    """
    if len(data) < 8:
        return None
    lib = get_lib()
    src = _tobuf(data)
    fsz = lib.atpu_zstd_frame_compressed_size(_as_u8p(src), len(data))
    if fsz == -5:  # incomplete frame: wait for more input
        return None
    if fsz < 0:
        raise ValueError("zstd: corrupt frame")
    probe = lib.atpu_zstd_frame_content_size(_as_u8p(src), len(data))
    cap = max(64, int(probe) * 2 + 64) if probe > 0 else max(
        64, 4 * int(fsz))
    consumed = ctypes.c_size_t(0)
    while True:
        ref, dp = _alloc_out(cap)
        n = lib.atpu_zstd_decompress_frame(
            _as_u8p(src), int(fsz), dp, cap, None, 0,
            ctypes.byref(consumed))
        if n >= 0:
            if consumed.value == 0 or consumed.value > len(data):
                return None
            return _finish_out(ref, n), int(consumed.value)
        if n == -2 and cap < (1 << 31):
            cap *= 4
            continue
        raise ValueError("zstd: corrupt frame")


def inflate(data: bytes, expected_size: Optional[int] = None,
            raw: bool = False) -> bytes:
    """Own DEFLATE decoder (zlib stream verified via adler32, or raw)."""
    lib = get_lib()
    src = _tobuf(data)
    cap = expected_size if expected_size is not None else max(
        64, 4 * len(data))
    while True:
        ref, dp = _alloc_out(cap)
        n = lib.atpu_inflate(_as_u8p(src), len(data), dp, max(cap, 1),
                             1 if raw else 0)
        if n >= 0:
            return _finish_out(ref, n)
        if n == -2 and expected_size is None and cap < (1 << 31):
            cap *= 4
            continue
        if n == -4:
            raise ValueError("zlib: adler32 mismatch")
        raise ValueError("inflate: corrupt stream")


def adler32(data: bytes, start: int = 1) -> int:
    return int(get_lib().atpu_adler32(_as_u8p(_tobuf(data)), len(data),
                                      start))


# --- bzip2 (own C++ codec, csrc/bzip2.cpp) ------------------------------------

def bz2_compress(data: bytes, level: int = 9) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    cap = len(data) + len(data) // 2 + 600
    ref, dp = _alloc_out(cap)
    n = lib.atpu_bz2_compress(_as_u8p(src), len(data), dp, cap, level)
    if n < 0:
        raise ValueError("bz2 compress failed")
    return _finish_out(ref, n)


def bz2_decompress(data: bytes, expected_size: Optional[int] = None) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    cap = expected_size if expected_size is not None else max(
        256, 8 * len(data))
    while True:
        ref, dp = _alloc_out(cap)
        n = lib.atpu_bz2_decompress(_as_u8p(src), len(data), dp,
                                    max(cap, 1))
        if n >= 0:
            return _finish_out(ref, n)
        if n == -2 and expected_size is None and cap < (1 << 31):
            cap *= 4
            continue
        if n == -4:
            raise ValueError("bz2: CRC mismatch")
        raise ValueError("bz2: corrupt stream")


def bz2_prepare(data: bytes, level: int):
    """RLE1 + block split + per-block CRC (the device-BWT path's stage 1).
    Returns (rle1 buffer, offsets, lens, crcs)."""
    lib = get_lib()
    src = _tobuf(data)
    rle = np.empty(len(data) + len(data) // 2 + 64, dtype=np.uint8)
    max_blocks = rle.size // (100000 * level) + 2
    offs = np.empty(max_blocks, dtype=np.int64)
    lens = np.empty(max_blocks, dtype=np.int64)
    crcs = np.empty(max_blocks, dtype=np.uint32)
    nb = lib.atpu_bz2_prepare(
        _as_u8p(src), len(data), level, _as_u8p(rle), rle.size,
        offs.ctypes.data_as(ctypes.POINTER(_i64)),
        lens.ctypes.data_as(ctypes.POINTER(_i64)),
        crcs.ctypes.data_as(_u32p), max_blocks)
    if nb < 0:
        raise ValueError("bz2 prepare failed")
    return rle, offs[:nb], lens[:nb], crcs[:nb]


def bz2_emit(level: int, Ls: bytes, lens, orig_ptrs, crcs) -> bytes:
    """Write a .bz2 stream from per-block BWT outputs (device tier)."""
    lib = get_lib()
    lsbuf = _tobuf(Ls)
    lens64 = np.ascontiguousarray(lens, dtype=np.int64)
    origs = np.ascontiguousarray(orig_ptrs, dtype=np.int64)
    crcs32 = np.ascontiguousarray(crcs, dtype=np.uint32)
    total = int(lens64.sum())
    dst = np.empty(total + total // 2 + 600, dtype=np.uint8)
    n = lib.atpu_bz2_emit(
        level, len(lens64), _as_u8p(lsbuf),
        lens64.ctypes.data_as(ctypes.POINTER(_i64)),
        origs.ctypes.data_as(ctypes.POINTER(_i64)),
        crcs32.ctypes.data_as(_u32p), _as_u8p(dst), dst.size)
    if n < 0:
        raise ValueError("bz2 emit failed")
    return dst[:n].tobytes()


# --- LZMA (own C++ codec, csrc/lzma.cpp) ---------------------------------------

def lzma_compress(data: bytes, level: int = 6) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    cap = len(data) + len(data) // 2 + 256
    ref, dp = _alloc_out(cap)
    n = lib.atpu_lzma_compress(_as_u8p(src), len(data), dp, cap, level)
    if n < 0:
        raise ValueError("lzma compress failed")
    return _finish_out(ref, n)


def lzma_decompress(data: bytes,
                    expected_size: Optional[int] = None) -> bytes:
    lib = get_lib()
    src = _tobuf(data)
    if expected_size is None:
        declared = lib.atpu_lzma_unpacked_size(_as_u8p(src), len(data))
        cap = int(declared) if declared >= 0 else max(256, 8 * len(data))
    else:
        cap = expected_size
    while True:
        ref, dp = _alloc_out(cap)
        n = lib.atpu_lzma_decompress(_as_u8p(src), len(data), dp,
                                     max(cap, 1))
        if n >= 0:
            return _finish_out(ref, n)
        if n == -2 and cap < (1 << 31):
            cap = max(cap * 4, 1024)
            continue
        raise ValueError("lzma: corrupt stream")


def zstd_compress(data: bytes, level: int = 3,
                  dictionary: Optional[bytes] = None,
                  checksum: bool = False) -> bytes:
    """Own zstd encoder (csrc/zstd_encode.cpp), levels -64..22 (negative
    = --fast tiers, reference clevels.h row 0 + targetLength accel),
    raw-content or structured dictionary support, optional
    Content_Checksum emission (reference ZSTD_c_checksumFlag)."""
    lib = get_lib()
    src = _tobuf(data)
    d = _tobuf(dictionary) if dictionary else None
    cap = lib.atpu_zstd_compress_bound(len(data)) + 64
    ref, dp2 = _alloc_out(cap)
    n = lib.atpu_zstd_compress_ex(
        _as_u8p(src), len(data), dp2, cap, level,
        _as_u8p(d) if d is not None and d.size else None,
        int(d.size) if d is not None else 0,
        1 if checksum else 0)
    if n < 0:
        raise ValueError("zstd compress failed")
    return _finish_out(ref, n)


def zstd_build_dict_header(lit_freq, dict_id: int, ll_freq=None,
                           of_freq=None, ml_freq=None) -> bytes:
    """Serialize a structured-dictionary entropy header (magic + dictID +
    Huffman table from the literal histogram + FSE ncounts trained from
    the code histograms when given, else predefined + default repcodes);
    the dictionary trainer appends content after it. Reference
    capability: zdict.c ZDICT_analyzeEntropy emission."""
    lib = get_lib()
    freq = (ctypes.c_uint32 * 256)(*[int(x) for x in lit_freq])

    def arr(x, n):
        return (ctypes.c_uint32 * n)(*[int(v) for v in x]) if x is not None \
            else None
    cap = 1024
    ref, dp = _alloc_out(cap)
    n = lib.atpu_zstd_build_dict_header(
        freq, dict_id & 0xFFFFFFFF, arr(ll_freq, 36), arr(of_freq, 32),
        arr(ml_freq, 53), dp, cap)
    if n < 0:
        raise ValueError("zstd dict header build failed")
    return _finish_out(ref, n)


class ZstdStatsCapture:
    """Training-time histogram capture around zstd_compress calls (the
    dictionary builder's stats pass). Not thread-safe by design."""

    def __enter__(self):
        lib = get_lib()
        self.lit = (ctypes.c_uint32 * 256)()
        self.ll = (ctypes.c_uint32 * 36)()
        self.of = (ctypes.c_uint32 * 32)()
        self.ml = (ctypes.c_uint32 * 53)()
        lib.atpu_zstd_set_stats(self.lit, self.ll, self.of, self.ml)
        return self

    def __exit__(self, *exc):
        get_lib().atpu_zstd_set_stats(None, None, None, None)
        return False


class InflateStream:
    """Resumable streaming inflate over the C runtime's z_stream analog
    (csrc/deflate.cpp atpu_inflate_stream_*; reference capability:
    algos/zlib/inflate.c incremental decode). Memory stays O(window):
    consumed input is trimmed inside the context each run."""

    _CHUNK = 256 * 1024

    def __init__(self, raw: bool = False):
        self._lib = get_lib()
        self._ctx = self._lib.atpu_inflate_stream_new(1 if raw else 0)
        if not self._ctx:
            raise MemoryError("inflate stream alloc")
        self.done = False

    def __del__(self):
        ctx, self._ctx = getattr(self, "_ctx", None), None
        if ctx:
            self._lib.atpu_inflate_stream_free(ctx)

    def pending_input(self) -> int:
        """Bytes of compressed input buffered (bounded-memory assert hook)."""
        return int(self._lib.atpu_inflate_stream_pending(self._ctx))

    def tail_bytes(self) -> int:
        """Unconsumed WHOLE input bytes (excludes a partially consumed
        byte when the deflate stream ended mid-byte) — lets framing
        layers locate the member trailer."""
        return int(self._lib.atpu_inflate_stream_tail(self._ctx))

    def decode(self, data: bytes, final: bool = False) -> bytes:
        """Feed ``data`` and return whatever decodes now."""
        if self._ctx is None:
            raise ValueError("stream closed")
        if data:
            buf = _tobuf(data)
            if self._lib.atpu_inflate_stream_feed(
                    self._ctx, _as_u8p(buf), len(data)) < 0:
                raise MemoryError("inflate stream feed")
        out = []
        dst = np.empty(self._CHUNK, dtype=np.uint8)
        flag = _i32(0)
        while True:
            n = self._lib.atpu_inflate_stream_run(
                self._ctx, _as_u8p(dst), dst.size, 1 if final else 0,
                ctypes.byref(flag))
            if n == -4:
                raise ValueError("zlib: adler32 mismatch")
            if n < 0:
                raise ValueError("inflate: corrupt stream")
            out.append(dst[:n].tobytes())
            self.done = bool(flag.value)
            # n == 0 means no further progress without more input (the run
            # itself stops ~258 B short of dst.size, so compare against 0,
            # not the chunk size)
            if self.done or n == 0:
                break
        return b"".join(out)


class Bz2DecodeStream:
    """Resumable streaming bzip2 decode over the C runtime
    (csrc/bzip2.cpp atpu_bz2_stream_*; reference capability:
    algos/bzip2/decompress.c BZ2_bzDecompress incremental calls).
    Memory is O(blockSize) — one block's BWT state plus pending input;
    consumed input is trimmed inside the context each run."""

    _CHUNK = 256 * 1024

    def __init__(self):
        self._lib = get_lib()
        self._ctx = self._lib.atpu_bz2_stream_new()
        if not self._ctx:
            raise MemoryError("bz2 stream alloc")
        self.done = False

    def __del__(self):
        ctx, self._ctx = getattr(self, "_ctx", None), None
        if ctx:
            self._lib.atpu_bz2_stream_free(ctx)

    def pending_input(self) -> int:
        """Bytes of compressed input buffered (bounded-memory assert hook)."""
        return int(self._lib.atpu_bz2_stream_pending(self._ctx))

    def decode(self, data: bytes, final: bool = False) -> bytes:
        """Feed ``data`` and return whatever decodes now."""
        if self._ctx is None:
            raise ValueError("stream closed")
        if data:
            buf = _tobuf(data)
            if self._lib.atpu_bz2_stream_feed(
                    self._ctx, _as_u8p(buf), len(data)) < 0:
                raise MemoryError("bz2 stream feed")
        out = []
        dst = np.empty(self._CHUNK, dtype=np.uint8)
        flag = _i32(0)
        while True:
            n = self._lib.atpu_bz2_stream_run(
                self._ctx, _as_u8p(dst), dst.size, 1 if final else 0,
                ctypes.byref(flag))
            if n == -4:
                raise ValueError("bzip2: block CRC mismatch")
            if n < 0:
                raise ValueError("bzip2: corrupt stream")
            out.append(dst[:n].tobytes())
            self.done = bool(flag.value)
            if self.done or n < dst.size:
                break
        return b"".join(out)


_PLAN_STRIDE = 22
_PLAN_MAXBLOCKS = 512


def zstd_frame_plan(data: bytes, off: int = 0):
    """Crack ONE zstd frame's headers into a device decode plan
    (csrc/zstd_decode.cpp atpu_zstd_frame_plan). Returns
    (nblocks, meta, huf, fse, consumed); nblocks == 0 for skippable
    frames, -1 for valid-size frames the planner cannot plan (caller
    decodes those on the host); None when the frame is corrupt."""
    lib = get_lib()
    view = np.frombuffer(data, dtype=np.uint8)[off:]
    meta = np.zeros((_PLAN_MAXBLOCKS, _PLAN_STRIDE), np.int32)
    huf = np.zeros((_PLAN_MAXBLOCKS, 2048), np.uint16)
    fse = np.zeros((_PLAN_MAXBLOCKS, 3, 512), np.uint32)
    consumed = _i64(0)
    nb = lib.atpu_zstd_frame_plan(
        _as_u8p(view), view.size,
        meta.ctypes.data_as(ctypes.POINTER(_i32)),
        huf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        fse.ctypes.data_as(_u32p), _PLAN_MAXBLOCKS,
        ctypes.byref(consumed))
    if nb == -2 and consumed.value > 0:   # too many blocks: host path
        return -1, None, None, None, int(consumed.value)
    if nb < 0:
        return None
    # stream/section offsets are relative to the view; absolutize them
    # (consumers only read an offset whose paired length/type says it is
    # live, so shifting unused zero entries is harmless)
    m = meta[:nb]
    if nb and off:
        for col in (1, 7, 9, 11, 13, 16):  # PM_BOFF, PM_S*OFF, PM_SEQOFF
            m[:, col] += off
    return int(nb), m, huf[:nb], fse[:nb], int(consumed.value)


def lzma_compress_cand(data: bytes, level: int, cpos, clen, cdist) -> bytes:
    """Candidate-driven LZMA encode (csrc atpu_lzma_compress_cand): the
    device match-finder assist entry. cpos/clen/cdist are the elected
    sequences (absolute positions, sorted ascending)."""
    lib = get_lib()
    src = _tobuf(data)
    cap = len(data) + (len(data) // 3) + 256 + 13
    dst = np.empty(cap, dtype=np.uint8)
    cp = np.ascontiguousarray(cpos, dtype=np.int64)
    cl = np.ascontiguousarray(clen, dtype=np.int32)
    cd = np.ascontiguousarray(cdist, dtype=np.int32)
    n = lib.atpu_lzma_compress_cand(
        _as_u8p(src), len(data), _as_u8p(dst), cap, level,
        cp.ctypes.data_as(ctypes.POINTER(_i64)),
        cl.ctypes.data_as(ctypes.POINTER(_i32)),
        cd.ctypes.data_as(ctypes.POINTER(_i32)), cp.size)
    if n < 0:
        raise ValueError("lzma candidate compress failed")
    return dst[:n].tobytes()
