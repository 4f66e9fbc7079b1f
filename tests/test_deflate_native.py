"""Own C++ DEFLATE codec (csrc/deflate.cpp) vs CPython zlib as oracle.

Reference parity: algos/zlib/deflate.c level ladder, inflate.c, the
Z_SYNC_FLUSH chunk semantics of the RAP path (compress.c:211-340).
"""

import random
import zlib

import pytest

from aocl_compression_tpu.runtime import native


def _payloads():
    random.seed(5)
    base = open("/root/reference/algos/zlib/trees.c", "rb").read()
    return {
        "text": base,
        "empty": b"",
        "one": b"Q",
        "rle": b"r" * 70000,
        "rand": bytes(random.randrange(256) for _ in range(50000)),
        "period": b"xyz" * 30000,
        "mixed": base[:15000] + bytes(random.randrange(256)
                                      for _ in range(20000)) + base,
    }


@pytest.mark.parametrize("level", [1, 2, 4, 6, 9])
def test_own_deflate_stock_inflate(level):
    for name, p in _payloads().items():
        c = native.deflate(p, level)
        assert zlib.decompress(c) == p, (level, name)


@pytest.mark.parametrize("level", [1, 6, 9])
def test_stock_deflate_own_inflate(level):
    for name, p in _payloads().items():
        c = zlib.compress(p, level)
        assert native.inflate(c, len(p)) == p, (level, name)
        assert native.inflate(c) == p, (level, name)  # unknown size


def test_sync_chunks_concatenate():
    base = _payloads()["text"]
    blocks = [base[i:i + 30000] for i in range(0, len(base), 30000)]
    chunks = [native.deflate(b, 6, native.DEFLATE_SYNC_CHUNK)
              for b in blocks]
    joined = b"".join(chunks) + b"\x03\x00"
    assert zlib.decompressobj(-15).decompress(joined) == base
    assert native.inflate(joined, len(base) + 8, raw=True) == base
    # each chunk independently decodable
    for c, b in zip(chunks, blocks):
        assert native.inflate(c, len(b), raw=True) == b


def test_adler32_checked():
    p = b"payload " * 2000
    c = bytearray(native.deflate(p, 6))
    c[-1] ^= 0xFF
    with pytest.raises(ValueError, match="adler32"):
        native.inflate(bytes(c), len(p))


def test_ratio_competitive_with_stock():
    base = _payloads()["text"]
    for level in (1, 6, 9):
        own = len(native.deflate(base, level))
        stock = len(zlib.compress(base, level))
        assert own < stock * 1.06, (level, own, stock)


def test_corrupt_streams_raise_not_crash():
    p = _payloads()["text"][:40000]
    c = bytearray(zlib.compress(p, 6))
    random.seed(13)
    for _ in range(300):
        bad = bytearray(c)
        bad[random.randrange(len(bad))] ^= 1 << random.randrange(8)
        try:
            out = native.inflate(bytes(bad), len(p))
            assert len(out) <= len(p)
        except ValueError:
            pass
    for cut in range(1, 40):
        try:
            native.inflate(bytes(c[:-cut]), len(p))
        except ValueError:
            pass


def test_own_adler32_matches_zlib():
    p = b"adler vector " * 999
    assert native.adler32(p) == zlib.adler32(p)


def test_overrunning_length_repeat_rejected():
    """A dynamic header whose 17/18 zero-repeat overruns hlit+hdist is
    "invalid bit length repeat" in stock zlib — ours must reject it too,
    not silently truncate the run (ADVICE r2)."""
    class _BW:
        def __init__(self):
            self.bits = []

        def put(self, v, n):
            for i in range(n):
                self.bits.append((v >> i) & 1)

        def bytes(self):
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                b = 0
                for j, bit in enumerate(self.bits[i:i + 8]):
                    b |= bit << j
                out.append(b)
            return bytes(out)

    cl_order = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
                14, 1, 15]
    bw = _BW()
    bw.put(1, 1)    # BFINAL
    bw.put(2, 2)    # BTYPE = dynamic
    bw.put(0, 5)    # HLIT -> 257 codes
    bw.put(0, 5)    # HDIST -> 1 code
    bw.put(15, 4)   # HCLEN -> all 19 CL codes present
    lens = {18: 1, 0: 1}
    for s in cl_order:
        bw.put(lens.get(s, 0), 3)
    for _ in range(2):        # two repeat-zero-138 runs: 276 > 258 total
        bw.put(1, 1)          # CL symbol 18 (code '1')
        bw.put(127, 7)        # run length 11+127 = 138
    raw = bw.bytes()
    with pytest.raises(zlib.error):
        zlib.decompress(raw, wbits=-15)
    with pytest.raises(ValueError):
        native.inflate(raw, 258, raw=True)


def test_single_shot_3mb_skew_text_valid_streams():
    """Regression: build_lengths under-repaired deeply skewed Huffman
    trees (it counted only LEAF overflow where zlib's gen_bitlen counts
    clamped internal nodes too), emitting an over-subscribed
    literal/length code on a 3 MB single-shot L6/L9 stream — stock zlib
    rejected it with "invalid literal/lengths set". The same class was
    fixed in bz_build_lengths (bzip2.cpp) and HufEnc (zstd_encode.cpp)."""
    import sys
    import zlib as stock

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from conftest import _text_like

    base = _text_like(1 << 20, seed=7)
    data = (base * 4)[:3 << 20]
    for level in (1, 4, 6, 9):
        c = native.deflate(data, level, native.DEFLATE_ZLIB)
        assert stock.decompress(c) == data, f"level {level}"
        assert native.inflate(c, len(data)) == data, f"level {level}"
