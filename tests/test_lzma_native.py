"""Own LZMA codec (csrc/lzma.cpp) vs stdlib lzma as oracle.

Reference parity: algos/lzma/ (LzmaEnc.c, LzmaDec.c, LzFind.c). CPython
lzma appears only as the cross-check — both directions must interop.
"""

import lzma as stock
import random

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.runtime import native


def _payloads():
    random.seed(17)
    base = open("/root/reference/algos/lzma/LzmaDec.c", "rb").read()
    return {
        "text": base,
        "empty": b"",
        "one": b"A",
        "rle": b"z" * 120000,
        "rand": bytes(random.randrange(256) for _ in range(50000)),
        "period": b"abcdefg" * 15000,
        "mixed": base[:30000] + bytes(random.randrange(256)
                                      for _ in range(20000)) + base[:40000],
    }


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_own_compress_stock_decode(level):
    for name, p in _payloads().items():
        c = native.lzma_compress(p, level)
        assert stock.decompress(c, format=stock.FORMAT_ALONE) == p, \
            (level, name)


@pytest.mark.parametrize("level", [0, 6, 9])
def test_stock_compress_own_decode(level):
    for name, p in _payloads().items():
        c = stock.compress(p, format=stock.FORMAT_ALONE, preset=level)
        assert native.lzma_decompress(c, len(p)) == p, (level, name)
        assert native.lzma_decompress(c) == p, (level, name)


def test_own_roundtrip():
    p = _payloads()["text"]
    for level in range(10):
        c = native.lzma_compress(p, level)
        assert native.lzma_decompress(c, len(p)) == p


def test_unknown_size_end_marker():
    # stdlib writes size=unknown + end marker for streamed output
    p = _payloads()["text"][:60000]
    co = stock.LZMACompressor(format=stock.FORMAT_ALONE)
    c = co.compress(p) + co.flush()
    assert native.lzma_decompress(c) == p


def test_nondefault_props_decode():
    p = _payloads()["text"][:50000]
    filt = [{"id": stock.FILTER_LZMA1, "preset": 6, "lc": 0, "lp": 2,
             "pb": 1}]
    c = stock.compress(p, format=stock.FORMAT_ALONE, filters=filt)
    assert native.lzma_decompress(c, len(p)) == p


def test_corrupt_streams_raise_not_crash():
    p = _payloads()["text"][:40000]
    c = bytearray(native.lzma_compress(p, 6))
    random.seed(19)
    for _ in range(200):
        bad = bytearray(c)
        bad[random.randrange(len(bad))] ^= 1 << random.randrange(8)
        try:
            out = native.lzma_decompress(bytes(bad), len(p))
            assert len(out) <= len(p)
        except ValueError:
            pass
    for cut in range(1, 30):
        try:
            native.lzma_decompress(bytes(c[:-cut]), len(p))
        except ValueError:
            pass


def test_unified_api_lzma_own():
    from aocl_compression_tpu.utils import dispatch
    p = _payloads()["text"]
    h = actpu.setup("lzma", level=6)
    try:
        dispatch.enable_audit(True)
        c = actpu.compress(h, p)
        assert "lzma_compress_host" in dispatch.audit_hits()
        assert actpu.decompress(h, c, len(p)) == p
        assert stock.decompress(c, format=stock.FORMAT_ALONE) == p
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)


def test_known_size_plus_end_marker_accepted():
    """LZMA ALONE permits an optional end marker alongside a declared
    size (liblzma accepts such streams). The decoder exits at the declared
    size and must not trip over the trailing marker (ADVICE r2)."""
    import struct
    p = _payloads()["text"]
    s = stock.compress(p, format=stock.FORMAT_ALONE)  # unknown size+marker
    assert s[5:13] == b"\xff" * 8
    patched = s[:5] + struct.pack("<Q", len(p)) + s[13:]
    assert native.lzma_decompress(patched, len(p)) == p
