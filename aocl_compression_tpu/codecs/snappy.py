"""Snappy codec — raw format.

Capability parity: SURVEY.md §2.2 A5 (reference: /root/reference/algos/snappy/
snappy.cc — RawCompress :2512, RawUncompress :2282,
GetUncompressedLengthFromMTCompressedBuffer :596-604).

MT/RAP layout mirrors the reference: the stream keeps ONE varint length
preamble placed right after the RAP frame; chunk fragments are raw element
streams (no per-chunk preamble) so the concatenation after skipping the RAP
frame is a single valid snappy stream for legacy decoders.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from ..api.handle import Handle
from ..parallel import container
from ..runtime import native
from ..utils import dispatch
from ..utils.config import TIER_HOST, TIER_MESH, TIER_XLA, get_config
from .base import Codec


def _varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _varint_len(data: bytes) -> int:
    for i, b in enumerate(data[:5]):
        if not (b & 0x80):
            return i + 1
    raise ValueError("bad varint")


def _strip_preamble(stream: bytes) -> bytes:
    return stream[_varint_len(stream):]


class SnappyCodec(Codec):
    name = "snappy"
    version = "2020-07-11-tpu"
    min_level, max_level, default_level = 0, 0, 0

    def compress_bound(self, n: int) -> int:
        cfg = get_config()
        return (native.snappy_max_compressed_length(n)
                + native.rap_frame_bound(n, cfg.default_block_size))

    def _block_size(self, handle: Handle) -> int:
        return handle.block_size or get_config().default_block_size

    def _adapter(self, handle: Handle) -> container.BlockCodecAdapter:
        accel = max(1, handle.opt_var)
        # device tier = throughput mode, engaged via opt_var (acceleration);
        # num_shards > 1 requests the mesh tier (reference: snappy MT behind
        # RawCompress, snappy.cc:2512)
        cap = handle.max_tier if accel >= 2 or handle.num_shards > 1 \
            else TIER_HOST
        cb, ctier = dispatch.resolve_with_tier(
            self.name, "compress_blocks", cap, handle.opt_off)
        if ctier == TIER_MESH:
            shards = handle.num_shards * max(1, handle.num_hosts)
            _cb = cb
            cb = lambda blocks, accel: _cb(blocks, accel,
                                           num_shards=shards or None)
        elif ctier == TIER_HOST:
            _cbh = cb
            cb = lambda blocks, accel: _cbh(blocks, accel,
                                            workers=handle.num_shards or None)
        from ..utils.config import device_decode_enabled
        dcap = handle.max_tier if device_decode_enabled() else TIER_HOST
        db, dtier = dispatch.resolve_with_tier(
            self.name, "decompress_blocks", dcap, handle.opt_off)
        bs = self._block_size(handle)
        if dtier == TIER_HOST:
            decompress = lambda chunks, dlens: db(
                chunks, dlens, bs, workers=handle.num_shards or None)
        else:
            decompress = lambda chunks, dlens: db(chunks, dlens, bs)
        return container.BlockCodecAdapter(
            compress_blocks=lambda blocks: cb(blocks, accel),
            decompress_blocks=decompress,
            preamble=_varint)

    def compress(self, handle: Handle, data: bytes) -> bytes:
        rap = (handle.enable_rap if handle.enable_rap is not None
               else get_config().enable_rap and not container.st_fallback(
                   handle, max(1, handle.opt_var) >= 2))
        if rap:
            out = container.compress_rapped(data, self._block_size(handle),
                                            self._adapter(handle))
            if out is not None:
                return out
        fn = dispatch.resolve(self.name, "compress", handle.max_tier,
                              handle.opt_off)
        return fn(data)

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        out = container.decompress_rapped(data, self._adapter(handle))
        if out is not None:
            return out
        return native.snappy_uncompress(data)

    def uncompressed_length(self, data: bytes) -> int:
        """Parity with GetUncompressedLengthFromMTCompressedBuffer: reads the
        varint length, skipping a RAP frame if present (snappy.cc:596-604)."""
        return native.snappy_uncompressed_length(
            container.skip_rap_frame(data))


@dispatch.register("snappy", "compress", TIER_HOST, "snappy_compress_host")
def _compress_host(data: bytes) -> bytes:
    return native.snappy_compress(data)


@dispatch.register("snappy", "compress_blocks", TIER_HOST,
                   "snappy_compress_blocks_host")
def _compress_blocks_host(blocks: Sequence[bytes], accel: int = 1,
                          workers=None):
    # raw element fragments: compress each block, strip its varint preamble;
    # snappy elements are self-delimiting so no boundary stitch is needed
    from ..parallel import host_pool
    frags = host_pool.parallel_map(
        lambda b: _strip_preamble(native.snappy_compress(b)), blocks,
        workers=workers, total_bytes=sum(len(b) for b in blocks))
    return frags, [len(b) for b in blocks]


@dispatch.register("snappy", "decompress_blocks", TIER_HOST,
                   "snappy_decompress_blocks_host")
def _decompress_blocks_host(chunks: Sequence[bytes], dlens: Sequence[int],
                            block_size: int, workers=None) -> List[bytes]:
    # parallel RAP fan-out (reference MT RawUncompress, snappy.cc:2282+)
    from ..parallel import host_pool
    return host_pool.parallel_map(
        lambda cd: native.snappy_uncompress(_varint(cd[1]) + cd[0]),
        list(zip(chunks, dlens)), workers=workers,
        total_bytes=int(sum(dlens)))


# --- device-tier variants (ops/snappy_device.py) ------------------------------

@dispatch.register("snappy", "compress_blocks", TIER_XLA,
                   "snappy_compress_blocks_xla")
def _compress_blocks_xla(blocks: Sequence[bytes], accel: int = 1):
    from ..ops import snappy_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    if max(len(b) for b in blocks) > MAX_DEVICE_BLOCK:
        return _compress_blocks_host(blocks, accel)  # 16-bit packing limit
    return snappy_device.encode_blocks(blocks, accel)


@dispatch.register("snappy", "decompress_blocks", TIER_XLA,
                   "snappy_decompress_blocks_xla")
def _decompress_blocks_xla(chunks: Sequence[bytes], dlens: Sequence[int],
                           block_size: int) -> List[bytes]:
    from ..ops import snappy_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    if max(dlens, default=0) > MAX_DEVICE_BLOCK:
        return _decompress_blocks_host(chunks, dlens, block_size)
    return snappy_device.decode_blocks(chunks, dlens, block_size)


@dispatch.register("snappy", "compress_blocks", TIER_MESH,
                   "snappy_compress_blocks_mesh")
def _compress_blocks_mesh(blocks: Sequence[bytes], accel: int = 1,
                          num_shards=None):
    """Mesh-tier snappy encode: the XLA pipeline sharded over the block
    axis (reference analog: snappy MT RawCompress fan-out)."""
    from ..ops import snappy_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    from ..parallel import sharded
    if max(len(b) for b in blocks) > MAX_DEVICE_BLOCK:
        return _compress_blocks_host(blocks, accel)
    frags = sharded.sharded_block_call(
        blocks,
        lambda padded, sh: snappy_device.encode_blocks(
            padded, accel, shardings=sh)[0],
        num_shards)
    return frags, [len(b) for b in blocks]
