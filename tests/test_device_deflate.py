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


# --- dynamic-Huffman blocks (deflate_medium analog) ---------------------------

def test_dynamic_blocks_stock_inflate(corpus):
    """Dynamic-block chunks must decode with stock zlib and beat static."""
    import zlib as Z
    from aocl_compression_tpu.ops import deflate_device as D
    data = corpus["mixed"]
    blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
    dyn, _ = D.encode_blocks_dyn(blocks, accel=2)
    st, _ = D.encode_blocks(blocks, accel=2)
    out = Z.decompress(b"".join(dyn) + D.FINAL_BLOCK, wbits=-15)
    assert out == data
    assert sum(map(len, dyn)) < sum(map(len, st))


def test_dynamic_blocks_own_inflate(corpus):
    """Own C++ inflate must decode device dynamic blocks too."""
    from aocl_compression_tpu.ops import deflate_device as D
    from aocl_compression_tpu.runtime import native
    data = corpus["text_64k"]
    blocks = [data[i:i + 65536] for i in range(0, len(data), 65536)]
    dyn, dlens = D.encode_blocks_dyn(blocks, accel=2)
    for c, d in zip(dyn, dlens):
        assert native.inflate(c, d, raw=True) == blocks[0][:d]


def test_level2_routes_to_dynamic(corpus, monkeypatch):
    """Unified API level 2 + device opt-in (opt_var >= 2, the lz4 accel
    convention) engages the dynamic device pipeline and the stream stays a
    valid zlib stream for stock decoders. Without the opt-in the measured
    policy keeps level 2 on the faster host deflate (see
    test_tier_policy.py)."""
    import zlib as Z
    import aocl_compression_tpu as actpu
    from aocl_compression_tpu.utils import dispatch
    monkeypatch.delenv("AOCL_ENABLE_INSTRUCTIONS", raising=False)
    data = corpus["text_300k"]
    h = actpu.setup("zlib", level=2, opt_var=2)
    dispatch.enable_audit(True)
    try:
        c = actpu.compress(h, data)
        hits = dispatch.audit_hits()
    finally:
        dispatch.enable_audit(False)
    try:
        assert actpu.decompress(h, c, expected_size=len(data)) == data
        # num_shards defaults to auto (reference numThreads=0), so the
        # mesh variant fields the call; it must route to the device
        # pipeline either way
        assert any(k.startswith("zlib_compress") and "host" not in k
                   for k in hits), hits
        from aocl_compression_tpu.parallel import container
        body = container.skip_rap_frame(c)
        assert Z.decompress(body) == data
        # first deflate block after the 2-byte zlib header must be
        # BTYPE=10 (dynamic)
        assert (body[2] >> 1) & 3 == 2, bin(body[2])
    finally:
        actpu.destroy(h)


def test_dynamic_degenerate_blocks():
    """Single-symbol and tiny blocks fall back or stay valid."""
    import zlib as Z
    from aocl_compression_tpu.ops import deflate_device as D
    for data in (b"\x00" * 5000, b"a" * 8192, b"ab" * 4000):
        dyn, _ = D.encode_blocks_dyn([data], accel=2)
        assert Z.decompress(dyn[0] + D.FINAL_BLOCK, wbits=-15) == data
