"""LZ4 Frame format (LZ4F) — interchange container for LZ4 blocks.

Capability parity with the reference's lz4frame support
(/root/reference/algos/lz4/lz4frame.c, enabled by LZ4_FRAME_FORMAT_SUPPORT,
CMakeLists.txt:311-325; checksums via xxhash). Implemented from the public
LZ4 Frame spec v1.6.1:

  magic 0x184D2204 | FLG BD [content size] [dictID] HC | blocks... |
  EndMark 0x00000000 | [content checksum]

  block: u32 LE size (bit 31 = stored/uncompressed) + data + [block xxh32]

Blocks are compressed with the framework's LZ4 block codec through the
dispatch registry, so frames get the host C++ or device pipeline per the
active tier. Independent blocks map 1:1 onto the batch-parallel device
encoder; linked-block frames are decoded (history window carried) but
always produced as independent (the parallel-friendly mode).
"""

from __future__ import annotations

import struct
from typing import Optional

from ..runtime import native
from ..utils import dispatch
from . import lz4 as _lz4  # noqa: F401  (registers the lz4 dispatch tiers)

MAGIC = 0x184D2204
_BLOCK_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def _hc(descriptor: bytes) -> int:
    return (native.xxh32(descriptor, 0) >> 8) & 0xFF


def compress_frame(data: bytes, block_size_id: int = 4,
                   content_checksum: bool = True,
                   block_checksum: bool = False,
                   store_content_size: bool = True,
                   accel: int = 1, max_tier: Optional[int] = None,
                   opt_off: bool = False) -> bytes:
    """Build an LZ4 frame with independent blocks."""
    if block_size_id not in _BLOCK_SIZES:
        raise ValueError("block_size_id must be 4..7")
    bs = _BLOCK_SIZES[block_size_id]

    flg = (1 << 6) | (1 << 5)  # version 01, independent blocks
    if block_checksum:
        flg |= 1 << 4
    if store_content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    desc = bytes([flg, block_size_id << 4])
    if store_content_size:
        desc += struct.pack("<Q", len(data))

    out = bytearray(struct.pack("<I", MAGIC))
    out += desc
    out.append(_hc(desc))

    # default path obeys the measured-speed policy (an explicit max_tier is
    # the caller's tier opt-in, like handle.opt_var >= 2 on the main API)
    comp = dispatch.resolve("lz4", "compress", max_tier, opt_off,
                            calibrated=max_tier is None)
    for i in range(0, len(data), bs):
        blk = data[i:i + bs]
        c = comp(blk, accel)
        if len(c) >= len(blk):  # incompressible: store raw
            out += struct.pack("<I", len(blk) | 0x80000000)
            payload = blk
        else:
            out += struct.pack("<I", len(c))
            payload = c
        out += payload
        if block_checksum:
            out += struct.pack("<I", native.xxh32(payload, 0))

    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", native.xxh32(data, 0))
    return bytes(out)


def decompress_frame(data: bytes, max_tier: Optional[int] = None,
                     opt_off: bool = False) -> bytes:
    """Decode an LZ4 frame (independent or linked blocks, checksums
    verified)."""
    if len(data) < 7 or struct.unpack_from("<I", data)[0] != MAGIC:
        raise ValueError("not an LZ4 frame (bad magic)")
    pos = 4
    flg = data[pos]
    if (flg >> 6) != 1:
        raise ValueError("unsupported LZ4 frame version")
    indep = bool(flg & (1 << 5))
    has_bchk = bool(flg & (1 << 4))
    has_csize = bool(flg & (1 << 3))
    has_cchk = bool(flg & (1 << 2))
    has_dict = bool(flg & 1)
    if has_dict:
        # legal frames per the LZ4 frame spec, but this decoder has no
        # dictionary plumbing — decoding without the dict would silently
        # produce wrong bytes, so reject loudly
        raise ValueError("lz4 frame: dictionary-linked frames not supported")
    if flg & (1 << 1):
        raise ValueError("lz4 frame: reserved FLG bit set")
    bd = data[pos + 1]
    if bd & 0x8F:
        raise ValueError("lz4 frame: reserved BD bits set")
    bs = _BLOCK_SIZES.get((bd >> 4) & 7)
    if bs is None:
        raise ValueError("bad block-size descriptor")
    desc_len = 2 + (8 if has_csize else 0) + (4 if has_dict else 0)
    desc = data[pos:pos + desc_len]
    hc = data[pos + desc_len]
    if hc != _hc(desc):
        raise ValueError("frame descriptor checksum mismatch")
    content_size = struct.unpack_from("<Q", data, pos + 2)[0] \
        if has_csize else None
    pos += desc_len + 1

    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated frame (missing EndMark)")
        raw = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if raw == 0:
            break
        stored = bool(raw & 0x80000000)
        n = raw & 0x7FFFFFFF
        if pos + n > len(data):
            raise ValueError("truncated block")
        payload = data[pos:pos + n]
        pos += n
        if has_bchk:
            want = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            if native.xxh32(payload, 0) != want:
                raise ValueError("block checksum mismatch")
        if stored:
            out += payload
        elif indep:
            out += native.lz4_decompress(payload, bs)
        else:
            # linked blocks: decode against the trailing 64K history window
            out += native.lz4_decompress_with_history(
                payload, bs, bytes(out[-65536:]))
    if has_cchk:
        if pos + 4 > len(data):
            raise ValueError("truncated content checksum")
        want = struct.unpack_from("<I", data, pos)[0]
        if native.xxh32(bytes(out), 0) != want:
            raise ValueError("content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise ValueError("content size mismatch")
    return bytes(out)
