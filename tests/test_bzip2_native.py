"""Own bzip2 codec (csrc/bzip2.cpp) + device-BWT tier vs stdlib bz2 oracle.

Reference parity: algos/bzip2/ (blocksort.c BWT, compress.c MTF/RLE/Huffman,
decompress.c, crctable.c). CPython bz2 appears only as the cross-check.
"""

import bz2 as stock
import random

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.runtime import native


def _payloads():
    random.seed(21)
    base = open("/root/reference/algos/bzip2/compress.c", "rb").read()
    return {
        "text": base,
        "empty": b"",
        "one": b"A",
        "rle": b"z" * 250000,
        "rand": bytes(random.randrange(256) for _ in range(60000)),
        "multi_block": (base * 30)[:1_100_000],
        "period": b"abcd" * 40000,
        "run_boundary": b"x" * 255 + b"y" + b"x" * 256 + b"q" * 4,
    }


@pytest.mark.parametrize("level", [1, 5, 9])
def test_own_compress_stock_decode(level):
    for name, p in _payloads().items():
        c = native.bz2_compress(p, level)
        assert stock.decompress(c) == p, (level, name)


@pytest.mark.parametrize("level", [1, 5, 9])
def test_stock_compress_own_decode(level):
    for name, p in _payloads().items():
        c = stock.compress(p, level)
        assert native.bz2_decompress(c, len(p)) == p, (level, name)
        assert native.bz2_decompress(c) == p, (level, name)


def test_own_roundtrip_all_levels():
    p = _payloads()["text"]
    for level in range(1, 10):
        c = native.bz2_compress(p, level)
        assert native.bz2_decompress(c, len(p)) == p


def test_multistream():
    a = native.bz2_compress(b"hello ", 1)
    b = stock.compress(b"world", 9)
    assert native.bz2_decompress(a + b) == b"hello world"


def test_ratio_competitive():
    p = _payloads()["text"]
    own = len(native.bz2_compress(p, 9))
    ref = len(stock.compress(p, 9))
    assert own < ref * 1.03, (own, ref)


def test_crc_detects_corruption():
    p = _payloads()["text"]
    c = bytearray(native.bz2_compress(p, 5))
    random.seed(31)
    for _ in range(200):
        bad = bytearray(c)
        bad[random.randrange(len(bad))] ^= 1 << random.randrange(8)
        try:
            out = native.bz2_decompress(bytes(bad), len(p))
            assert out == p or out != p  # no crash; wrong output would
            # normally be caught by CRC — allow correct-decode of benign
            # flips (e.g. in padding) only if output matches
            if out != p:
                raise AssertionError("undetected corruption")
        except ValueError:
            pass


def test_device_bwt_tier_matches_host(monkeypatch):
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    p = _payloads()["text"]
    h = actpu.setup("bzip2", level=1)
    try:
        c = actpu.compress(h, p)
        assert stock.decompress(c) == p
        assert actpu.decompress(h, c, len(p)) == p
    finally:
        actpu.destroy(h)


def test_unified_api_bzip2_own():
    from aocl_compression_tpu.utils import dispatch
    p = _payloads()["multi_block"]
    h = actpu.setup("bzip2", level=9)
    try:
        dispatch.enable_audit(True)
        c = actpu.compress(h, p)
        hits = dispatch.audit_hits()
        assert "bzip2_compress_host" in hits or "bzip2_compress_xla" in hits
        assert actpu.decompress(h, c, len(p)) == p
        assert stock.decompress(c) == p
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)
