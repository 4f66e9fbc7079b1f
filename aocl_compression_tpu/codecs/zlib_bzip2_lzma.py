"""zlib / bzip2 / lzma codec adapters — OWN implementations end to end.

Host tier: own C++ (csrc/deflate.cpp levels 1-9 + inflate; csrc/bzip2.cpp
RLE1/BWT/MTF/RLE2/multi-table Huffman; csrc/lzma.cpp range coder +
hash-chain matcher, FORMAT_ALONE layout). XLA tier: the static-Huffman
deflate pipeline (level 1) and the device-BWT bzip2 block sort. The
CPython `zlib`/`bz2`/`lzma` modules appear below ONLY for checksums
(zlib.adler32) and as documented format constants; production
compress/decompress never calls them.

Reference analogs: /root/reference/algos/{zlib,bzip2,lzma}.
Adapter quirks mirrored from the reference:
  - lzma: the 5-byte props header is spliced before the stream
    (api/codec.cpp:206-243); FORMAT_ALONE = props+size+stream.
  - zlib: levels 1-9, default 6 (compress2, algos/zlib/compress.c:153).
  - bzip2: level = blockSize100k 1-9 (BZ2_bzBuffToBuffCompress).
"""

from __future__ import annotations

import struct
import zlib  # adler32 checksum only — codecs are own C++
from typing import Optional

from ..api.handle import Handle
from ..parallel import container
from ..utils import dispatch
from ..utils.config import (TIER_HOST, TIER_MESH, TIER_XLA,
                            forced_tier_from_env, get_config)
from .base import Codec


def _device_opt_in(handle: Handle) -> bool:
    """Explicit device-tier request: opt_var >= 2 (the lz4 accel-gate
    convention), num_shards > 1 (mesh demand), or AOCL_ENABLE_INSTRUCTIONS
    naming a device tier. Without one, dispatch routes by measured speed
    (utils.calibration) — the reference's only-upgrade-when-faster rule."""
    return (handle.opt_var >= 2 or handle.num_shards > 1
            or (forced_tier_from_env() or TIER_HOST) > TIER_HOST)


_ZLIB_HEADER = b"\x78\x01"
_ZLIB_FINAL = b"\x03\x00"  # empty BFINAL static block


class ZlibCodec(Codec):
    """zlib with RAP block parallelism (reference: RAP paths inside
    compress2/uncompress, algos/zlib/compress.c:211-340, uncompr.c:180-198).

    Stream layout under RAP: [RAP frame][2B zlib header][sync-flushed raw
    deflate chunk]xN[empty final block][adler32]. Skipping the RAP frame
    yields a bit-valid zlib stream for stock decoders.

    Level 1 maps to the static-Huffman device pipeline when the XLA tier
    is allowed — the reference's deflate_quick level-1 strategy
    (algos/zlib/deflate_quick.c, ZLIB_DEFLATE_FAST_MODE); level 2 to the
    dynamic-Huffman device pipeline (deflate_medium's dynamic blocks,
    algos/zlib/deflate_medium.c); levels 3-9 use the host deflate.
    """

    name = "zlib"
    version = "1.3-tpu"
    min_level, max_level, default_level = 1, 9, 6

    def compress_bound(self, n: int) -> int:
        from ..runtime import native
        cfg = get_config()
        return (n + (n >> 8) + 64
                + native.rap_frame_bound(n, cfg.default_block_size))

    def _block_size(self, handle: Handle, level: Optional[int] = None) -> int:
        if handle.block_size:
            return handle.block_size
        cfg = get_config()
        lvl = level if level is not None else \
            self.clamp_level(handle.level or self.default_level)
        if lvl <= 2 and _device_opt_in(handle) and (
                handle.max_tier is None or handle.max_tier >= TIER_XLA):
            # device static-Huffman tier: blocks within the 16-bit limit
            return min(cfg.default_block_size, 1 << 16)
        # reference partition rule: chunk = search window x WINDOW_FACTOR
        # (threads/threads.c:57; 32K deflate window x 4) — smaller chunks
        # truncate back-references and cost ratio on the host tiers
        return max(cfg.default_block_size, 4 * 32768)

    def _adapter(self, handle: Handle,
                 level: int) -> container.BlockCodecAdapter:
        # device tier for the quick (level 1, static) and medium
        # (level 2, dynamic) strategies; higher levels keep host ratio
        # semantics. num_shards > 1 requests the mesh tier (reference:
        # zlib MT inside compress2, algos/zlib/compress.c:211-340).
        max_tier = handle.max_tier if level <= 2 else TIER_HOST
        cb, ctier = dispatch.resolve_with_tier(
            "zlib", "compress_blocks", max_tier, handle.opt_off,
            calibrated=not _device_opt_in(handle))
        if ctier == TIER_MESH:
            shards = handle.num_shards * max(1, handle.num_hosts)
            _cb = cb
            cb = lambda blocks, lvl: _cb(blocks, lvl,
                                         num_shards=shards or None)
        elif ctier == TIER_HOST:
            _cbh = cb
            cb = lambda blocks, lvl: _cbh(blocks, lvl,
                                          workers=handle.num_shards or None)
        from ..utils.config import device_decode_enabled
        dcap = handle.max_tier if device_decode_enabled() else TIER_HOST
        db, dtier = dispatch.resolve_with_tier(
            "zlib", "decompress_blocks", dcap, handle.opt_off)
        if dtier == TIER_HOST:
            _dbh = db
            db = lambda chunks, dlens: _dbh(
                chunks, dlens, workers=handle.num_shards or None)
        return container.BlockCodecAdapter(
            compress_blocks=lambda blocks: cb(blocks, level),
            decompress_blocks=db,
            preamble=lambda total: _ZLIB_HEADER)

    def compress(self, handle: Handle, data: bytes) -> bytes:
        level = self.clamp_level(handle.level or self.default_level)
        rap = (handle.enable_rap if handle.enable_rap is not None
               else get_config().enable_rap and not container.st_fallback(
                   handle, _device_opt_in(handle) and level <= 2))
        if rap:
            out = container.compress_rapped(
                data, self._block_size(handle, level),
                self._adapter(handle, level))
            if out is not None:
                trailer = _ZLIB_FINAL + struct.pack(
                    ">I", zlib.adler32(data) & 0xFFFFFFFF)
                return out + trailer
        fn = dispatch.resolve("zlib", "compress",
                              handle.max_tier if level <= 2 else TIER_HOST,
                              handle.opt_off,
                              calibrated=not _device_opt_in(handle))
        return fn(data, level)

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        out = container.decompress_rapped(data, self._adapter(handle, 1))
        if out is not None:
            # verify the adler32 trailer appended at compress time (stock
            # zlib would; the RAP path must not silently pass corruption)
            if len(data) >= 4:
                want = struct.unpack(">I", data[-4:])[0]
                if zlib.adler32(out) & 0xFFFFFFFF != want:
                    raise ValueError("zlib: adler32 mismatch on RAP stream")
            return out
        fn = dispatch.resolve("zlib", "decompress", handle.max_tier,
                              handle.opt_off)
        return fn(data, expected_size)


@dispatch.register("zlib", "compress", TIER_HOST, "zlib_compress_host")
def _zlib_compress_host(data: bytes, level: int) -> bytes:
    # own C++ deflate (csrc/deflate.cpp): hash-chain lazy matcher +
    # dynamic/static/stored block choice; CPython zlib is now a test oracle
    from ..runtime import native
    return native.deflate(data, level, native.DEFLATE_ZLIB)


@dispatch.register("zlib", "decompress", TIER_HOST, "zlib_decompress_host")
def _zlib_decompress_host(data: bytes, expected_size=None) -> bytes:
    from ..runtime import native
    return native.inflate(data, expected_size)


@dispatch.register("zlib", "compress_blocks", TIER_HOST,
                   "zlib_compress_blocks_host")
def _zlib_compress_blocks_host(blocks, level: int, workers=None):
    """Per-block sync-flushed raw deflate (concatenatable chunks),
    fanned out over the host pool (reference MT compress2,
    algos/zlib/compress.c:211-340)."""
    from ..parallel import host_pool
    from ..runtime import native
    frags = host_pool.parallel_map(
        lambda b: native.deflate(b, level, native.DEFLATE_SYNC_CHUNK),
        blocks, workers=workers, total_bytes=sum(len(b) for b in blocks))
    return frags, [len(b) for b in blocks]


@dispatch.register("zlib", "decompress_blocks", TIER_HOST,
                   "zlib_decompress_blocks_host")
def _zlib_decompress_blocks_host(chunks, dlens, workers=None):
    # parallel RAP fan-out (reference MT uncompress, uncompr.c:180-198)
    from ..parallel import host_pool
    from ..runtime import native
    return host_pool.parallel_map(
        lambda cd: native.inflate(cd[0], cd[1], raw=True),
        list(zip(chunks, dlens)), workers=workers,
        total_bytes=int(sum(dlens)))


@dispatch.register("zlib", "decompress_blocks", TIER_XLA,
                   "zlib_decompress_blocks_xla")
def _zlib_decompress_blocks_xla(chunks, dlens):
    """Device inflate tier (ops/inflate_device.py): C++ cracks each
    chunk's first-block header, the TPU scan decodes symbols + executes
    LZ77; planner rejects and multi-block chunks re-decode on the host.
    Opt-in via AOCL_DEVICE_DECODE, like lz4/zstd device decode."""
    from ..ops import inflate_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    if max(dlens, default=0) > MAX_DEVICE_BLOCK:
        return _zlib_decompress_blocks_host(chunks, dlens)
    return inflate_device.decode_chunks(list(chunks), list(dlens))


@dispatch.register("zlib", "compress_blocks", TIER_XLA,
                   "zlib_compress_blocks_xla")
def _zlib_compress_blocks_xla(blocks, level: int):
    from ..ops import deflate_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    if max(len(b) for b in blocks) > MAX_DEVICE_BLOCK:
        return _zlib_compress_blocks_host(blocks, level)
    if level >= 2:  # dynamic-Huffman blocks (deflate_medium analog)
        return deflate_device.encode_blocks_dyn(blocks, accel=2)
    return deflate_device.encode_blocks(blocks, accel=2)


@dispatch.register("zlib", "compress", TIER_XLA, "zlib_compress_xla")
def _zlib_compress_xla(data: bytes, level: int) -> bytes:
    """Single-shot zlib stream through the device static-Huffman pipeline."""
    from ..ops import deflate_device
    from ..runtime import native
    if len(data) < 1024:  # dispatch overhead dwarfs tiny inputs: own C++
        return native.deflate(data, level, native.DEFLATE_ZLIB)
    bs = min(get_config().default_block_size, 1 << 16)
    blocks = container.split_blocks(data, bs)
    enc = (deflate_device.encode_blocks_dyn if level >= 2
           else deflate_device.encode_blocks)
    chunks, _ = enc(blocks, accel=2)
    return (_ZLIB_HEADER + b"".join(chunks) + _ZLIB_FINAL
            + struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF))


@dispatch.register("zlib", "compress_blocks", TIER_MESH,
                   "zlib_compress_blocks_mesh")
def _zlib_compress_blocks_mesh(blocks, level: int, num_shards=None):
    """Mesh-tier zlib encode: the device static-Huffman pipeline sharded
    over the block axis (reference analog: the OpenMP fan-out inside
    compress2, algos/zlib/compress.c:211-340)."""
    from ..ops import deflate_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    from ..parallel import sharded
    if max(len(b) for b in blocks) > MAX_DEVICE_BLOCK:
        return _zlib_compress_blocks_host(blocks, level)
    enc = (deflate_device.encode_blocks_dyn if level >= 2
           else deflate_device.encode_blocks)
    return sharded.sharded_block_call(
        blocks,
        lambda padded, sh: enc(padded, accel=2, shardings=sh),
        num_shards)


class Bzip2Codec(Codec):
    name = "bzip2"
    version = "1.0.8-tpu"
    min_level, max_level, default_level = 1, 9, 9

    def compress_bound(self, n: int) -> int:
        # reference bound: n + n/100 + 600 (BZ2_bzBuffToBuffCompress docs)
        return n + (n // 100) + 600

    def compress(self, handle: Handle, data: bytes) -> bytes:
        fn, tier = dispatch.resolve_with_tier(
            "bzip2", "compress", handle.max_tier, handle.opt_off,
            calibrated=not _device_opt_in(handle))
        level = self.clamp_level(handle.level or self.default_level)
        block = 100_000 * level
        if (tier == TIER_HOST and not handle.opt_off
                and len(data) > 2 * block):
            # MT fan-out as CONCATENATED .bz2 streams (the format's own
            # multi-stream rule — the pbzip2 layout; stock bunzip2 and
            # this decoder both accept it). Each worker compresses whole
            # blockLimit-sized chunks, so the per-block BWT context and
            # the ratio match the serial encoder; the only overhead is
            # one ~14-byte stream header/footer per chunk. Reference
            # analog: the threads/threads.c per-thread partitions.
            from ..parallel import host_pool
            chunks = [data[i:i + block]
                      for i in range(0, len(data), block)]
            frags = host_pool.parallel_map(
                lambda ch: fn(ch, level), chunks,
                workers=handle.num_shards, total_bytes=len(data))
            return b"".join(frags)
        return fn(data, level)

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        fn = dispatch.resolve("bzip2", "decompress", handle.max_tier,
                              handle.opt_off)
        return fn(data, expected_size)


@dispatch.register("bzip2", "compress", TIER_HOST, "bzip2_compress_host")
def _bzip2_compress_host(data: bytes, level: int) -> bytes:
    # own C++ pipeline (csrc/bzip2.cpp): RLE1 -> prefix-doubling cyclic BWT
    # -> MTF -> RLE2 -> multi-table Huffman; CPython bz2 is now a test oracle
    from ..runtime import native
    return native.bz2_compress(data, level)


@dispatch.register("bzip2", "decompress", TIER_HOST, "bzip2_decompress_host")
def _bzip2_decompress_host(data: bytes, expected_size=None) -> bytes:
    from ..runtime import native
    return native.bz2_decompress(data, expected_size)


@dispatch.register("bzip2", "compress", TIER_XLA, "bzip2_compress_xla")
def _bzip2_compress_xla(data: bytes, level: int) -> bytes:
    """Device-BWT tier: RLE1/CRC on host (C++), the block sort — the hot
    O(n log n) stage, reference blocksort.c — as the TPU prefix-doubling
    sort pipeline (ops/bwt_device.py), entropy stages back in C++."""
    from ..ops import bwt_device
    from ..runtime import native
    if len(data) < 4096:  # dispatch overhead dwarfs tiny inputs
        return native.bz2_compress(data, level)
    rle, offs, lens, crcs = native.bz2_prepare(data, level)
    Ls, origs = [], []
    for off, ln in zip(offs, lens):
        if ln == 0:
            continue
        L, I = bwt_device.bwt(rle[off:off + ln].tobytes())
        Ls.append(L)
        origs.append(I)
    keep = lens > 0
    return native.bz2_emit(level, b"".join(Ls), lens[keep], origs,
                           crcs[keep])


class LzmaCodec(Codec):
    name = "lzma"
    version = "22.01-tpu"
    min_level, max_level, default_level = 0, 9, 6

    def compress_bound(self, n: int) -> int:
        # reference: inSize + inSize/3 + 128 style slack + 13B header
        return n + (n // 3) + 128 + 13

    def compress(self, handle: Handle, data: bytes) -> bytes:
        fn = dispatch.resolve("lzma", "compress", handle.max_tier,
                              handle.opt_off,
                              calibrated=not _device_opt_in(handle))
        return fn(data, self.clamp_level(handle.level or self.default_level))

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        fn = dispatch.resolve("lzma", "decompress", handle.max_tier,
                              handle.opt_off)
        return fn(data, expected_size)


@dispatch.register("lzma", "compress", TIER_HOST, "lzma_compress_host")
def _lzma_compress_host(data: bytes, level: int) -> bytes:
    # own C++ range coder + hash-chain match finder (csrc/lzma.cpp).
    # FORMAT_ALONE byte layout: 5B props+dictSize, 8B size, raw stream —
    # what the reference adapter assembles (api/codec.cpp:206-243).
    # CPython lzma is now a test oracle only.
    from ..runtime import native
    return native.lzma_compress(data, level)


@dispatch.register("lzma", "decompress", TIER_HOST, "lzma_decompress_host")
def _lzma_decompress_host(data: bytes, expected_size=None) -> bytes:
    from ..runtime import native
    return native.lzma_decompress(data, expected_size)


@dispatch.register("lzma", "compress", TIER_XLA, "lzma_compress_xla")
def _lzma_compress_xla(data: bytes, level: int) -> bytes:
    """Device match-finder assist (ops/lzma_assist.py): the TPU elects
    (pos, len, dist) sequences — the LzFind.c stage — and the host range-
    codes candidate-driven with no hash chains. A distinct speed point:
    ~2x the host L6 encode at a ratio between host L0 and L1 (matches
    bounded to 64 KiB blocks; measured numbers in MEASURED.md)."""
    from ..ops import lzma_assist
    return lzma_assist.compress(data, level)
