"""Bounded-memory streaming compression/decompression.

The reference's native APIs expose streaming contexts (z_stream deflate/
inflate, ZSTD_compressStream); the unified API is one-shot. This module
gives the framework a streaming surface with bounded memory: input is
consumed in arbitrary-size writes, compressed block-by-block, and emitted
incrementally as a SERIAL stream in each codec's standard concatenatable
layout — exactly the bytes a stock decoder (and this framework's one-shot
decompress) accepts:

  zlib  — [2B header][sync-flushed raw chunk]xN[final block][adler32]
          (the same layout the RAP path produces after skip_rap_frame)
  zstd  — concatenated standard frames (RFC 8878 permits concatenation)
  bzip2 — concatenated .bz2 streams (the format's multi-stream rule)

DecompressStream decodes ALL three codecs incrementally with bounded
memory: zstd frame-by-frame (the C runtime reports per-frame consumed
sizes), zlib through the C runtime's resumable inflate context
(native.InflateStream — O(32 KiB window) state, consumed input trimmed
every run), bzip2 block-at-a-time through native.Bz2DecodeStream
(O(blockSize) state). No path buffers the whole stream.

Reference analogs: deflate()/inflate() streaming (algos/zlib/deflate.c),
ZSTD_compressStream2 (algos/zstd/lib/compress/zstd_compress.c).
"""

from __future__ import annotations

import struct
import zlib as _zlib  # adler32 checksum only

from .runtime import native

_ZLIB_HEADER = b"\x78\x01"
_ZLIB_FINAL = b"\x03\x00"

_STREAM_CODECS = ("zlib", "zstd", "bzip2")


class CompressStream:
    """Incremental compressor with bounded memory (~2 x block_size).

    >>> cs = CompressStream("zstd", level=3)
    >>> out = cs.write(part1) + cs.write(part2) + cs.finish()
    """

    def __init__(self, codec: str, level: int = 0,
                 block_size: int = 1 << 20):
        if codec not in _STREAM_CODECS:
            raise ValueError(
                f"streaming supports {_STREAM_CODECS}, not {codec!r} "
                "(lz4/snappy block formats need stream-level preambles; "
                "use the LZ4 frame format codecs.lz4_frame for lz4)")
        self.codec = codec
        self.level = level
        self.block_size = block_size
        self._buf = bytearray()
        self._started = False
        self._finished = False
        self._adler = 1
        self._total_in = 0

    def _compress_block(self, block: bytes) -> bytes:
        if self.codec == "zlib":
            self._adler = _zlib.adler32(block, self._adler)
            return native.deflate(block, self.level or 6,
                                  native.DEFLATE_SYNC_CHUNK)
        if self.codec == "zstd":
            return native.zstd_compress(block, self.level or 3)
        return native.bz2_compress(block, self.level or 9)

    def write(self, data: bytes) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        self._buf += data
        self._total_in += len(data)
        out = bytearray()
        if not self._started:
            if self.codec == "zlib":
                out += _ZLIB_HEADER
            self._started = True
        while len(self._buf) >= self.block_size:
            block = bytes(self._buf[:self.block_size])
            del self._buf[:self.block_size]
            out += self._compress_block(block)
        return bytes(out)

    def finish(self) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        self._finished = True
        out = bytearray()
        if not self._started:
            if self.codec == "zlib":
                out += _ZLIB_HEADER
            self._started = True
        if self._buf or self._total_in == 0:
            out += self._compress_block(bytes(self._buf))
            self._buf.clear()
        if self.codec == "zlib":
            out += _ZLIB_FINAL
            out += struct.pack(">I", self._adler & 0xFFFFFFFF)
        return bytes(out)


class DecompressStream:
    """Incremental decompressor — all codecs decode as input arrives.

    zstd: frame-by-frame (the C runtime reports consumed sizes);
    zlib: resumable C inflate context (O(window) memory);
    bzip2: block-at-a-time C context (O(blockSize) memory).
    """

    def __init__(self, codec: str):
        if codec not in _STREAM_CODECS:
            raise ValueError(f"streaming supports {_STREAM_CODECS}")
        self.codec = codec
        self._buf = bytearray()  # zstd only: partial-frame holdback
        self._finished = False
        self._ctx = None
        if codec == "zlib":
            self._ctx = native.InflateStream(raw=False)
        elif codec == "bzip2":
            self._ctx = native.Bz2DecodeStream()

    def pending_input(self) -> int:
        """Compressed bytes currently buffered (bounded-memory hook)."""
        if self._ctx is not None:
            return self._ctx.pending_input()
        return len(self._buf)

    def write(self, data: bytes) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        if self._ctx is not None:
            return self._ctx.decode(data)
        self._buf += data
        out = bytearray()
        while True:
            res = native.zstd_decompress_frame(bytes(self._buf))
            if res is None:
                break  # incomplete frame: wait for more input
            decoded, consumed = res
            out += decoded
            del self._buf[:consumed]
            if not self._buf:
                break
        return bytes(out)

    def finish(self) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        self._finished = True
        if self._ctx is not None:
            return self._ctx.decode(b"", final=True)
        if not self._buf:
            return b""
        data = bytes(self._buf)
        self._buf.clear()
        # leftover bytes must form complete frame(s)
        out = bytearray()
        while data:
            res = native.zstd_decompress_frame(data)
            if res is None:
                raise ValueError("zstd stream truncated mid-frame")
            decoded, consumed = res
            out += decoded
            data = data[consumed:]
        return bytes(out)
