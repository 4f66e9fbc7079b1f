"""Unified API tests — parity with the reference's api gtest coverage
(/root/reference/gtest/api/api_gtest.cpp): setup/compress/decompress/destroy/
version across all codecs, stats, error mapping, excluded methods."""

import pytest

import aocl_compression_tpu as actpu
from tests.conftest import ALL_CODECS


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_roundtrip_all_codecs(codec, corpus):
    h = actpu.setup(codec, measure_stats=True)
    try:
        for name, data in corpus.items():
            c = actpu.compress(h, data)
            d = actpu.decompress(h, c, expected_size=len(data))
            assert d == data, f"{codec} roundtrip mismatch on {name}"
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_compression_actually_compresses(codec, corpus):
    h = actpu.setup(codec)
    c = actpu.compress(h, corpus["text_300k"])
    assert len(c) < len(corpus["text_300k"]) * 0.8
    actpu.destroy(h)


def test_setup_by_enum_and_int():
    h1 = actpu.setup(actpu.Method.LZ4)
    h2 = actpu.setup(0)
    assert h1.codec == h2.codec == "lz4"


def test_unsupported_method():
    with pytest.raises(actpu.CompressionError) as e:
        actpu.setup("nosuchcodec")
    assert e.value.code == actpu.ErrorCode.UNSUPPORTED_METHOD


def test_excluded_method():
    actpu.set_config(enabled_codecs=("lz4",))
    try:
        with pytest.raises(actpu.CompressionError) as e:
            actpu.setup("zstd")
        assert e.value.code == actpu.ErrorCode.EXCLUDED_METHOD
    finally:
        actpu.set_config(enabled_codecs=("lz4", "lz4hc", "snappy", "zlib",
                                         "zstd", "bzip2", "lzma"))


def test_compress_without_setup():
    with pytest.raises(actpu.CompressionError):
        actpu.compress(actpu.Handle(codec="lz4"), b"data")


def test_stats_populated(corpus):
    h = actpu.setup("lz4", measure_stats=True)
    data = corpus["text_300k"]
    c = actpu.compress(h, data)
    actpu.decompress(h, c, expected_size=len(data))
    s = h.stats
    assert s.c_size == len(c) and s.c_time_ns > 0 and s.c_speed_mbps > 0
    assert s.d_size == len(data) and s.d_time_ns > 0 and s.d_speed_mbps > 0
    actpu.destroy(h)


def test_version():
    assert "AOCL-COMPRESSION-TPU" in actpu.version()


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_compress_bound_holds(codec, corpus):
    h = actpu.setup(codec, level=1)
    for data in corpus.values():
        c = actpu.compress(h, data)
        assert len(c) <= actpu.compress_bound(codec, len(data))
    actpu.destroy(h)


def test_levels_affect_ratio(corpus):
    data = corpus["text_300k"]
    sizes = {}
    for level in (1, 9):
        h = actpu.setup("zlib", level=level)
        sizes[level] = len(actpu.compress(h, data))
        actpu.destroy(h)
    assert sizes[9] <= sizes[1]


def test_corrupt_stream_detected(corpus):
    # zlib streams carry an adler32: truncation must raise
    h = actpu.setup("zlib")
    c = actpu.compress(h, corpus["text_64k"])
    with pytest.raises(actpu.CompressionError):
        actpu.decompress(h, c[: len(c) // 2])
    actpu.destroy(h)
    # lz4 has no checksum, but a truncated RAP stream must be rejected and a
    # truncated serial stream must never silently return the original
    h = actpu.setup("lz4", block_size=1 << 14)
    data = corpus["text_300k"]
    c = actpu.compress(h, data)
    with pytest.raises((actpu.CompressionError, ValueError)):
        actpu.decompress(h, c[: len(c) // 2])
    actpu.destroy(h)
