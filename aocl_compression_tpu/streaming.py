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
  gzip  — one RFC 1952 member over the same raw-deflate chunking
          (header, CRC32 + ISIZE trailer); decode accepts concatenated
          members like stock gzip
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

_STREAM_CODECS = ("zlib", "gzip", "zstd", "bzip2")

_GZIP_HEADER = b"\x1f\x8b\x08\x00" + b"\x00" * 4 + b"\x00\xff"


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
        self._crc = 0
        self._total_in = 0

    def _compress_block(self, block: bytes) -> bytes:
        if self.codec == "zlib":
            self._adler = _zlib.adler32(block, self._adler)
            return native.deflate(block, self.level or 6,
                                  native.DEFLATE_SYNC_CHUNK)
        if self.codec == "gzip":
            self._crc = native.crc32(block, self._crc)
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
            elif self.codec == "gzip":
                out += _GZIP_HEADER
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
            elif self.codec == "gzip":
                out += _GZIP_HEADER
            self._started = True
        if self._buf or self._total_in == 0:
            out += self._compress_block(bytes(self._buf))
            self._buf.clear()
        if self.codec == "zlib":
            out += _ZLIB_FINAL
            out += struct.pack(">I", self._adler & 0xFFFFFFFF)
        elif self.codec == "gzip":
            out += _ZLIB_FINAL  # final empty raw block
            out += struct.pack("<II", self._crc & 0xFFFFFFFF,
                               self._total_in & 0xFFFFFFFF)
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
        self._buf = bytearray()  # zstd/gzip: holdback buffer
        self._finished = False
        self._ctx = None
        if codec == "zlib":
            self._ctx = native.InflateStream(raw=False)
        elif codec == "bzip2":
            self._ctx = native.Bz2DecodeStream()
        elif codec == "gzip":
            # member state machine: header -> body (raw inflate ctx with a
            # fed-but-unconsumed mirror so the trailer can be located) ->
            # trailer -> header (concatenated members)
            self._gz_state = "header"
            self._gz_inf = None
            self._gz_mirror = bytearray()
            self._gz_crc = 0
            self._gz_isize = 0
            self._gz_members = 0

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
        if self.codec == "gzip":
            self._buf += data
            return self._gz_pump(final=False)
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

    def _gz_pump(self, final: bool) -> bytes:
        import struct as _struct
        out = bytearray()
        while True:
            if self._gz_state == "header":
                hdr = self._gz_header_len(bytes(self._buf))
                if hdr is None:
                    if final and self._buf:
                        raise ValueError("gzip: truncated header")
                    break
                del self._buf[:hdr]
                self._gz_inf = native.InflateStream(raw=True)
                self._gz_mirror = bytearray()
                self._gz_crc = 0
                self._gz_isize = 0
                self._gz_state = "body"
            elif self._gz_state == "body":
                chunk = bytes(self._buf)
                self._buf.clear()
                self._gz_mirror += chunk
                part = self._gz_inf.decode(chunk, final=final)
                if part:
                    out += part
                    self._gz_crc = native.crc32(part, self._gz_crc)
                    self._gz_isize += len(part)
                consumed = len(self._gz_mirror) \
                    - self._gz_inf.tail_bytes()
                del self._gz_mirror[:consumed]
                if self._gz_inf.done:
                    self._buf[:0] = self._gz_mirror
                    self._gz_mirror = bytearray()
                    self._gz_inf = None
                    self._gz_state = "trailer"
                else:
                    if final:
                        raise ValueError("gzip: truncated member body")
                    break
            else:  # trailer
                if len(self._buf) < 8:
                    if final:
                        raise ValueError("gzip: truncated trailer")
                    break
                want_crc, want_isize = _struct.unpack_from(
                    "<II", bytes(self._buf[:8]))
                del self._buf[:8]
                if want_crc != (self._gz_crc & 0xFFFFFFFF) \
                        or want_isize != (self._gz_isize & 0xFFFFFFFF):
                    raise ValueError("gzip: CRC/ISIZE mismatch")
                self._gz_members += 1
                self._gz_state = "header"
        return bytes(out)

    @staticmethod
    def _gz_header_len(data: bytes):
        """Parsed member-header length, or None if more input is needed."""
        import struct as _struct
        if len(data) < 10:
            return None
        if data[:2] != b"\x1f\x8b" or data[2] != 8:
            raise ValueError("gzip: bad header")
        flg = data[3]
        p = 10
        if flg & 4:  # FEXTRA
            if len(data) < p + 2:
                return None
            xlen = _struct.unpack_from("<H", data, p)[0]
            p += 2 + xlen
        if flg & 8:  # FNAME
            q = data.find(b"\x00", p)
            if q < 0:
                return None
            p = q + 1
        if flg & 16:  # FCOMMENT
            q = data.find(b"\x00", p)
            if q < 0:
                return None
            p = q + 1
        if flg & 2:  # FHCRC
            p += 2
        return p if len(data) >= p else None

    def finish(self) -> bytes:
        if self._finished:
            raise ValueError("stream already finished")
        self._finished = True
        if self._ctx is not None:
            return self._ctx.decode(b"", final=True)
        if self.codec == "gzip":
            out = self._gz_pump(final=True)
            if self._gz_state != "header" or self._buf:
                raise ValueError("gzip: incomplete trailing member")
            return out
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
