"""Native-API surface: each codec's upstream-style entry points.

The reference exports every codec's full native upstream API alongside the
unified one (SURVEY.md §0; e.g. LZ4_compress_default algos/lz4/lz4.c:2967,
compress2 algos/zlib/compress.c:153, BZ2_bzBuffToBuffCompress, LzmaEncode,
snappy::RawCompress, ZSTD_compressCCtx) and lazily self-initializes when a
native API is called without aocl_llc_setup (AOCL_SETUP_NATIVE,
lz4.c:5017-5028). This module is that surface for the TPU framework: thin
Python equivalents with upstream naming and semantics, delegating to the
codec registry with a lazily-created default handle per codec.

Bytes-in/bytes-out replaces the C (dst, dstCapacity) out-parameter style;
*_bound functions mirror the capacity helpers.
"""

from __future__ import annotations

import struct
import threading
from typing import Dict, Optional

from .api import unified
from .api.handle import Handle

_lock = threading.Lock()
_handles: Dict[tuple, Handle] = {}


def _handle(codec: str, **kw) -> Handle:
    """Lazy per-codec default handle — AOCL_SETUP_NATIVE parity."""
    key = (codec, tuple(sorted(kw.items())))
    with _lock:
        h = _handles.get(key)
        if h is None:
            h = unified.setup(codec, **kw)
            _handles[key] = h
        return h


# --- LZ4 (algos/lz4/lz4.c) ----------------------------------------------------

def LZ4_compressBound(input_size: int) -> int:
    return input_size + input_size // 255 + 16


def LZ4_compress_default(src: bytes) -> bytes:
    return unified.compress(_handle("lz4", enable_rap=False), src)


def LZ4_compress_fast(src: bytes, acceleration: int = 1) -> bytes:
    return unified.compress(
        _handle("lz4", enable_rap=False, opt_var=max(1, acceleration)), src)


def LZ4_decompress_safe(src: bytes, dst_capacity: int) -> bytes:
    return unified.decompress(_handle("lz4", enable_rap=False), src,
                              expected_size=dst_capacity)


# --- LZ4HC (algos/lz4/lz4hc.c) -------------------------------------------------

def LZ4_compress_HC(src: bytes, compression_level: int = 9) -> bytes:
    return unified.compress(
        _handle("lz4hc", enable_rap=False, level=compression_level), src)


# --- Snappy (algos/snappy/snappy.cc) -------------------------------------------

def snappy_compress(src: bytes) -> bytes:
    return unified.compress(_handle("snappy", enable_rap=False), src)


def snappy_uncompress(src: bytes) -> bytes:
    return unified.decompress(_handle("snappy", enable_rap=False), src)


def snappy_max_compressed_length(n: int) -> int:
    return 32 + n + n // 6


def snappy_uncompressed_length(src: bytes) -> int:
    from .runtime import native
    return native.snappy_uncompressed_length(src)


# --- zlib (algos/zlib) ----------------------------------------------------------

def compress2(src: bytes, level: int = 6) -> bytes:
    return unified.compress(
        _handle("zlib", enable_rap=False, level=level), src)


def uncompress(src: bytes, dest_len: Optional[int] = None) -> bytes:
    return unified.decompress(_handle("zlib", enable_rap=False), src,
                              expected_size=dest_len)


def compressBound(n: int) -> int:
    return n + (n >> 12) + (n >> 14) + (n >> 25) + 13


# --- bzip2 (algos/bzip2) --------------------------------------------------------

def BZ2_bzBuffToBuffCompress(src: bytes, block_size_100k: int = 9,
                             work_factor: int = 0) -> bytes:
    return unified.compress(_handle("bzip2", level=block_size_100k), src)


def BZ2_bzBuffToBuffDecompress(src: bytes,
                               dest_len: Optional[int] = None) -> bytes:
    return unified.decompress(_handle("bzip2"), src, expected_size=dest_len)


# --- LZMA (algos/lzma) ----------------------------------------------------------

def LzmaEncode(src: bytes, level: int = 6) -> bytes:
    """Returns props(5B) + raw stream — the reference adapter's on-wire
    layout before it splices in the unified buffer (api/codec.cpp:206-243).
    FORMAT_ALONE is props + 8B size + stream; strip the size field."""
    full = unified.compress(_handle("lzma", level=level), src)
    return full[:5] + full[13:]


def LzmaDecode(src: bytes, unc_len: int) -> bytes:
    alone = src[:5] + struct.pack("<Q", unc_len) + src[5:]
    return unified.decompress(_handle("lzma"), alone,
                              expected_size=unc_len)


# --- ZSTD (algos/zstd) ----------------------------------------------------------

def ZSTD_compressBound(n: int) -> int:
    return n + (n >> 8) + 64


def ZSTD_compress(src: bytes, level: int = 3) -> bytes:
    return unified.compress(
        _handle("zstd", enable_rap=False, level=level), src)


def ZSTD_decompress(src: bytes,
                    dst_capacity: Optional[int] = None) -> bytes:
    return unified.decompress(_handle("zstd", enable_rap=False), src,
                              expected_size=dst_capacity)


def lzma_easy_buffer_encode(data: bytes, preset: int = 6) -> bytes:
    """xz-utils-compatible one-shot .xz encode — the reference's
    experimental shim (algos/lzma/xzlzma/XzLzma.h:95); own container
    implementation over the own LZMA codec (codecs/xz.py)."""
    from .codecs import xz
    return xz.xz_compress(data, preset)


def lzma_stream_buffer_decode(data: bytes) -> bytes:
    """xz-utils-compatible one-shot .xz decode (XzLzma.h:143)."""
    from .codecs import xz
    return xz.xz_decompress(data)


def ZSTD_getFrameContentSize(src: bytes) -> int:
    from .runtime import native
    n = native.zstd_frame_content_size(bytes(src))
    return -1 if n is None else n


def ZDICT_trainFromBuffer(samples, dict_size: int = 16384) -> bytes:
    """Dictionary builder — reference algos/zstd/lib/dictBuilder parity."""
    from .codecs.zstd import train_dictionary
    return train_dictionary(samples, dict_size)


def ZSTD_compress_usingDict(src: bytes, dictionary: bytes,
                            level: int = 3) -> bytes:
    return unified.compress(
        _handle("zstd", enable_rap=False, level=level,
                dictionary=dictionary), src)


def ZSTD_decompress_usingDict(src: bytes, dictionary: bytes,
                              dst_capacity: Optional[int] = None) -> bytes:
    return unified.decompress(
        _handle("zstd", enable_rap=False, dictionary=dictionary), src,
        expected_size=dst_capacity)


# --- LZ4 Frame (algos/lz4/lz4frame.c) -------------------------------------------

def LZ4F_compressFrame(src: bytes, **opts) -> bytes:
    from .codecs.lz4_frame import compress_frame
    return compress_frame(src, **opts)


def LZ4F_decompressFrame(src: bytes) -> bytes:
    from .codecs.lz4_frame import decompress_frame
    return decompress_frame(src)


def XXH32(data: bytes, seed: int = 0) -> int:
    from .runtime import native
    return native.xxh32(data, seed)
