"""Device zstd DECODER tests (ops/zstd_decode_device.py).

Stock zstd (zstandard) and the own C++ encoder are the stream sources;
every mode the planner exports must decode bit-exactly on the device
tier: 4-stream and 1-stream Huffman literals, raw/RLE literals,
predefined/FSE/RLE/repeat sequence tables, rep-code offsets, multi-frame
streams, and the RAP chunk entry. Unsupported shapes (multi-block
frames, dictionaries) must fall back to the host path transparently."""

import os
import random

import pytest
import zstandard

import aocl_compression_tpu as actpu
from aocl_compression_tpu.ops import zstd_decode_device as ZDD
from aocl_compression_tpu.runtime import native


def _payload(kind: str, n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    if kind == "text":
        words = [b"decode ", b"stream ", b"the ", b"frame ", b"huffman "]
        out = bytearray()
        while len(out) < n:
            out += rng.choice(words)
        return bytes(out[:n])
    if kind == "rle":
        return b"z" * n
    if kind == "periodic":
        return (b"abcxyz" * (n // 6 + 1))[:n]
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "mixed":
        return (_payload("text", n // 2, seed)
                + _payload("random", n - n // 2, seed + 1))
    raise ValueError(kind)


KINDS = ["text", "rle", "periodic", "random", "mixed"]


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_device_decode_stock_frames(kind, level):
    data = _payload(kind, 50000, seed=level)
    c = zstandard.ZstdCompressor(level=level).compress(data)
    assert ZDD.decode_frames(c, expected_size=len(data)) == data


@pytest.mark.parametrize("kind", KINDS)
def test_device_decode_own_frames(kind):
    data = _payload(kind, 50000, seed=7)
    for level in (1, 3, 12):
        c = native.zstd_compress(data, level)
        assert ZDD.decode_frames(c, expected_size=len(data)) == data


def test_device_decode_small_and_edge():
    for d in (b"", b"x", b"ab" * 3, b"tiny payload", b"q" * 300):
        c = zstandard.ZstdCompressor(level=3).compress(d)
        assert ZDD.decode_frames(c, expected_size=len(d)) == d


def test_device_decode_one_stream_literals():
    # regen <= 1023 forces the single-stream literal layout (RFC 8878:
    # Size_Format 00) — a distinct scan path on device
    d = _payload("text", 900, seed=3)
    c = zstandard.ZstdCompressor(level=19).compress(d)
    assert ZDD.decode_frames(c, expected_size=len(d)) == d


def test_device_decode_multiframe_and_chunks():
    data = _payload("mixed", 120000, seed=9)
    frames = [native.zstd_compress(data[i:i + 30000], 3)
              for i in range(0, len(data), 30000)]
    assert ZDD.decode_frames(b"".join(frames), len(data)) == data
    dlens = [30000] * 4
    outs = ZDD.decode_chunks(frames, dlens)
    assert b"".join(outs) == data
    assert [len(o) for o in outs] == dlens


def test_device_decode_skippable_frame_passthrough():
    data = _payload("text", 20000, seed=11)
    import struct
    skip = struct.pack("<II", 0x184D2A50, 4) + b"RAP!"
    c = skip + native.zstd_compress(data, 3)
    assert ZDD.decode_frames(c, expected_size=len(data)) == data


def test_device_decode_host_fallback_for_big_frames():
    # > 64 KiB content in one frame exceeds the device gate; the result
    # must still be correct (host fallback inside decode_frames)
    data = _payload("text", 200000, seed=13)
    c = zstandard.ZstdCompressor(level=3).compress(data)
    assert ZDD.decode_frames(c, expected_size=len(data)) == data


def test_device_decode_size_mismatch_raises():
    data = _payload("text", 30000, seed=17)
    c = native.zstd_compress(data, 3)
    with pytest.raises(ValueError):
        ZDD.decode_frames(c, expected_size=len(data) + 1)


def test_unified_api_device_decode_tier(monkeypatch):
    # AOCL_DEVICE_DECODE opts the decode path onto the XLA tier; the RAP
    # stream must round-trip and the audit must show the XLA variant
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    monkeypatch.setenv("AOCL_DEVICE_DECODE", "1")
    from aocl_compression_tpu.utils import dispatch
    data = _payload("mixed", 150000, seed=19)
    h = actpu.setup("zstd", level=3, block_size=1 << 16)
    try:
        c = actpu.compress(h, data)
        dispatch.reset_audit()
        dispatch.enable_audit(True)
        out = actpu.decompress(h, c, expected_size=len(data))
        hits = dispatch.audit_hits()
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)
    assert out == data
    assert any("decompress" in k and "xla" in k for k in hits), hits
