"""Deflate (static-Huffman) device pipeline tests.

Oracle: CPython's zlib (stock inflate) must decode device-encoded streams
bit-exactly — the strongest format-compliance check available."""

import random
import zlib

import pytest

from aocl_compression_tpu.ops import deflate_device as dev

B = 1024


def _payload(kind: str, n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    if kind == "text":
        words = [b"hash ", b"match ", b"the ", b"block ", b"stream "]
        out = bytearray()
        while len(out) < n:
            out += rng.choice(words)
        return bytes(out[:n])
    if kind == "rle":
        return b"a" * n
    if kind == "periodic":
        return (b"abcxyz" * (n // 6 + 1))[:n]
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "mixed":
        return (_payload("text", n // 2, seed)
                + _payload("random", n - n // 2, seed + 1))
    if kind == "high":  # bytes >= 144 exercise the 9-bit literal codes
        return bytes(144 + rng.randrange(112) for _ in range(n))
    raise ValueError(kind)


KINDS = ["text", "rle", "periodic", "random", "mixed", "high"]


def _inflate_chunks(chunks):
    d = zlib.decompressobj(-15)
    return d.decompress(b"".join(chunks) + dev.FINAL_BLOCK)


@pytest.mark.parametrize("kind", KINDS)
def test_stock_inflate_decodes_device_chunks(kind):
    blocks = [_payload(kind, B, s) for s in range(3)] + \
             [_payload(kind, 333, 9)]
    chunks, dlens = dev.encode_blocks(blocks)
    assert dlens == [len(b) for b in blocks]
    # per-chunk raw inflate
    for c, b in zip(chunks, blocks):
        assert zlib.decompressobj(-15).decompress(c) == b
    # concatenation + final block is one valid deflate stream
    assert _inflate_chunks(chunks) == b"".join(blocks)


@pytest.mark.parametrize("kind", ["text", "rle", "mixed"])
def test_grid_mode(kind):
    blocks = [_payload(kind, 4096, s) for s in range(2)]
    chunks, _ = dev.encode_blocks(blocks, accel=2)
    assert _inflate_chunks(chunks) == b"".join(blocks)


def test_long_runs_split_pieces():
    """Runs > 258 force the piece splitter (255-byte fulls, 3-258 last)."""
    for n in (258, 259, 260, 261, 513, 514, 517, 1000):
        blk = b"x" * n + b"trailing literals here"
        chunks, _ = dev.encode_blocks([blk])
        assert zlib.decompressobj(-15).decompress(chunks[0]) == blk


def test_zlib_wrapper_roundtrip():
    """Full zlib stream (header + chunks + final + adler) via stock zlib."""
    import struct
    data = _payload("text", 5000)
    chunks, _ = dev.encode_blocks([data])
    stream = (dev.ZLIB_HEADER + b"".join(chunks) + dev.FINAL_BLOCK
              + struct.pack(">I", zlib.adler32(data) & 0xFFFFFFFF))
    assert zlib.decompress(stream) == data


def test_unified_api_zlib_device_level1():
    import aocl_compression_tpu as actpu
    data = _payload("text", 50000)
    h = actpu.setup("zlib", level=1, block_size=8192, max_tier=1)
    c = actpu.compress(h, data)
    assert actpu.decompress(h, c) == data
    # ST interop: skip RAP -> stock zlib decodes
    from aocl_compression_tpu.parallel import container
    assert zlib.decompress(container.skip_rap_frame(c)) == data
