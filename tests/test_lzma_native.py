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


class TestDeviceAssist:
    """TPU match-finder assist (ops/lzma_assist.py + lzma_encode_cand):
    elected candidates drive the range coder; output must stay standard
    FORMAT_ALONE that stock liblzma decodes."""

    def _data(self, n=200000):
        import numpy as np
        rng = np.random.default_rng(11)
        words = [b"candidate ", b"range ", b"coder ", b"sequence ",
                 b"elected "]
        parts = []
        tot = 0
        while tot < n:
            w = words[int(rng.integers(0, len(words)))]
            parts.append(w)
            tot += len(w)
        return b"".join(parts)[:n]

    def test_assist_roundtrip_and_stock(self):
        import lzma as stock
        from aocl_compression_tpu.ops import lzma_assist
        data = self._data()
        c = lzma_assist.compress(data, 6)
        assert native.lzma_decompress(c) == data
        assert stock.decompress(c, format=stock.FORMAT_ALONE) == data

    def test_assist_bad_candidates_cannot_corrupt(self):
        # hostile candidates (wrong len/dist) must be validated away:
        # the stream still round-trips
        import numpy as np
        data = self._data(60000)
        cp = np.asarray([10, 500, 1000, 40000], np.int64)
        cl = np.asarray([300, 68, 5, 99], np.int32)
        cd = np.asarray([7, 499, 100000, 1], np.int32)  # dist>pos dropped
        c = native.lzma_compress_cand(data, 6, cp, cl, cd)
        assert native.lzma_decompress(c) == data

    def test_assist_empty_candidates(self):
        import numpy as np
        data = self._data(30000)
        z = np.zeros(0, np.int64)
        c = native.lzma_compress_cand(
            data, 6, z, np.zeros(0, np.int32), np.zeros(0, np.int32))
        assert native.lzma_decompress(c) == data

    def test_assist_via_unified_api_opt_in(self, monkeypatch):
        monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
        import aocl_compression_tpu as actpu
        from aocl_compression_tpu.utils import dispatch
        data = self._data(150000)
        h = actpu.setup("lzma", opt_var=2)
        try:
            dispatch.reset_audit()
            dispatch.enable_audit(True)
            c = actpu.compress(h, data)
            hits = dispatch.audit_hits()
            out = actpu.decompress(h, c, expected_size=len(data))
        finally:
            dispatch.enable_audit(False)
            actpu.destroy(h)
        assert out == data
        assert any("lzma_compress_xla" in k for k in hits), hits

    def test_default_routing_stays_host(self):
        import aocl_compression_tpu as actpu
        from aocl_compression_tpu.utils import dispatch
        data = self._data(150000)
        h = actpu.setup("lzma")
        try:
            dispatch.reset_audit()
            dispatch.enable_audit(True)
            c = actpu.compress(h, data)
            hits = dispatch.audit_hits()
        finally:
            dispatch.enable_audit(False)
            actpu.destroy(h)
        assert any("lzma_compress_host" in k for k in hits), hits


class TestOptimalParse:
    """Levels 6+ run the price-based DP parse (csrc/lzma.cpp
    lzma_run_optimal); these pin its edges: chunk boundaries, the
    nice-length jump, periodic data, and the ratio win itself."""

    @pytest.mark.parametrize("level", [6, 7, 8, 9])
    def test_all_optimal_levels_roundtrip_and_stock(self, level):
        base = open("/root/reference/algos/zstd/lib/compress/"
                    "zstd_compress.c", "rb").read()[:120000]
        c = native.lzma_compress(base, level)
        assert native.lzma_decompress(c, len(base)) == base
        assert stock.decompress(c, format=stock.FORMAT_ALONE) == base

    def test_chunk_boundary_sizes(self):
        # DP chunks are 4096 + 273 slack; exercise exact/straddling sizes
        base = open("/root/reference/algos/zstd/lib/compress/"
                    "zstd_compress.c", "rb").read()
        for n in (4095, 4096, 4097, 4369, 4370, 8191, 8192, 8193, 12561):
            p = base[:n]
            c = native.lzma_compress(p, 7)
            assert native.lzma_decompress(c, len(p)) == p, n
            assert stock.decompress(c, format=stock.FORMAT_ALONE) == p, n

    def test_tiny_and_edge_inputs(self):
        for p in (b"", b"A", b"AB", b"ABC", b"ABCD", b"A" * 5,
                  bytes(range(256)) * 2):
            c = native.lzma_compress(p, 9)
            assert native.lzma_decompress(c, len(p)) == p, p[:8]
            assert stock.decompress(c, format=stock.FORMAT_ALONE) == p

    def test_periodic_nice_jump(self):
        # long rep candidates fire the nice-length DP jump every node
        p = b"abcdefgh" * 4096 + b"tail-literals"
        c = native.lzma_compress(p, 8)
        assert len(c) < len(p) // 100  # periodic must compress hard
        assert native.lzma_decompress(c, len(p)) == p
        assert stock.decompress(c, format=stock.FORMAT_ALONE) == p

    def test_optimal_beats_lazy_ratio(self):
        base = open("/root/reference/algos/zstd/lib/compress/"
                    "zstd_compress.c", "rb").read()[:300000]
        lazy = len(native.lzma_compress(base, 5))
        opt = len(native.lzma_compress(base, 7))
        assert opt < lazy * 0.97, (opt, lazy)

    def test_incompressible_random(self):
        import random as _r
        rng = _r.Random(17)
        p = bytes(rng.randrange(256) for _ in range(50000))
        c = native.lzma_compress(p, 9)
        assert native.lzma_decompress(c, len(p)) == p
        assert stock.decompress(c, format=stock.FORMAT_ALONE) == p
