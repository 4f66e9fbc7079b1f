"""zlib / bzip2 / lzma adapters backed by CPython's battle-tested codecs.

These are the *host-tier* (tier 0) compatibility paths for the three formats
whose reference implementations are vendored upstream codebases
(/root/reference/algos/zlib, /root/reference/algos/bzip2,
/root/reference/algos/lzma). They guarantee format-exact streams from day one;
the TPU device pipelines (deflate/BWT/range-coder kernels) register at higher
tiers as they land and are cross-checked against these.

Adapter quirks mirrored from the reference:
  - lzma: the reference adapter splices the 5-byte props header before the
    stream (/root/reference/api/codec.cpp:206-243). Python's lzma with
    FORMAT_ALONE produces exactly props+size+stream; we use FORMAT_ALONE for
    on-disk parity with the reference's lzma mode.
  - zlib: levels 1-9, default 6 (reference compress2, algos/zlib/compress.c:153).
  - bzip2: level = blockSize100k 1-9 (reference BZ2_bzBuffToBuffCompress).
"""

from __future__ import annotations

import bz2
import lzma
import zlib
from typing import Optional

from ..api.handle import Handle
from ..utils import dispatch
from ..utils.config import TIER_HOST
from .base import Codec


class ZlibCodec(Codec):
    name = "zlib"
    version = "1.3-stdlib"
    min_level, max_level, default_level = 1, 9, 6

    def compress_bound(self, n: int) -> int:
        # deflate bound: n + n/1000 + 12 plus zlib wrapper slack
        return n + (n >> 10) + 64

    def compress(self, handle: Handle, data: bytes) -> bytes:
        fn = dispatch.resolve("zlib", "compress", handle.max_tier,
                              handle.opt_off)
        return fn(data, self.clamp_level(handle.level or self.default_level))

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        fn = dispatch.resolve("zlib", "decompress", handle.max_tier,
                              handle.opt_off)
        return fn(data, expected_size)


@dispatch.register("zlib", "compress", TIER_HOST, "zlib_compress_host")
def _zlib_compress_host(data: bytes, level: int) -> bytes:
    return zlib.compress(data, level)


@dispatch.register("zlib", "decompress", TIER_HOST, "zlib_decompress_host")
def _zlib_decompress_host(data: bytes, expected_size=None) -> bytes:
    return zlib.decompress(data)


class Bzip2Codec(Codec):
    name = "bzip2"
    version = "1.0.8-stdlib"
    min_level, max_level, default_level = 1, 9, 9

    def compress_bound(self, n: int) -> int:
        # reference bound: n + n/100 + 600 (BZ2_bzBuffToBuffCompress docs)
        return n + (n // 100) + 600

    def compress(self, handle: Handle, data: bytes) -> bytes:
        fn = dispatch.resolve("bzip2", "compress", handle.max_tier,
                              handle.opt_off)
        return fn(data, self.clamp_level(handle.level or self.default_level))

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        fn = dispatch.resolve("bzip2", "decompress", handle.max_tier,
                              handle.opt_off)
        return fn(data, expected_size)


@dispatch.register("bzip2", "compress", TIER_HOST, "bzip2_compress_host")
def _bzip2_compress_host(data: bytes, level: int) -> bytes:
    return bz2.compress(data, level)


@dispatch.register("bzip2", "decompress", TIER_HOST, "bzip2_decompress_host")
def _bzip2_decompress_host(data: bytes, expected_size=None) -> bytes:
    return bz2.decompress(data)


class LzmaCodec(Codec):
    name = "lzma"
    version = "22.01-stdlib"
    min_level, max_level, default_level = 0, 9, 6

    def compress_bound(self, n: int) -> int:
        # reference: inSize + inSize/3 + 128 style slack + 13B header
        return n + (n // 3) + 128 + 13

    def compress(self, handle: Handle, data: bytes) -> bytes:
        fn = dispatch.resolve("lzma", "compress", handle.max_tier,
                              handle.opt_off)
        return fn(data, self.clamp_level(handle.level or self.default_level))

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        fn = dispatch.resolve("lzma", "decompress", handle.max_tier,
                              handle.opt_off)
        return fn(data, expected_size)


@dispatch.register("lzma", "compress", TIER_HOST, "lzma_compress_host")
def _lzma_compress_host(data: bytes, level: int) -> bytes:
    # FORMAT_ALONE = legacy .lzma: 5B props + 8B size + raw stream — the
    # byte layout the reference adapter assembles (api/codec.cpp:206-243).
    return lzma.compress(data, format=lzma.FORMAT_ALONE, preset=level)


@dispatch.register("lzma", "decompress", TIER_HOST, "lzma_decompress_host")
def _lzma_decompress_host(data: bytes, expected_size=None) -> bytes:
    return lzma.decompress(data, format=lzma.FORMAT_ALONE)
