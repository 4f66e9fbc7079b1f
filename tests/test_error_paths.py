"""Error-path breadth across every codec — the reference's per-function
gtest fixtures exercise NULL args, zero/exact/overflow sizes, corrupt
streams, and level bounds for each public entry (gtest/*/\\*_gtest.cpp);
this file is the unified-API sweep of the same classes.
"""

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.api.errors import CompressionError, ErrorCode
from tests.conftest import ALL_CODECS


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_empty_input_roundtrip(codec):
    h = actpu.setup(codec)
    try:
        c = actpu.compress(h, b"")
        assert actpu.decompress(h, c, expected_size=0) == b""
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_one_byte_roundtrip(codec):
    h = actpu.setup(codec)
    try:
        c = actpu.compress(h, b"x")
        assert actpu.decompress(h, c, expected_size=1) == b"x"
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_garbage_decompress_never_succeeds_silently(codec):
    """Random bytes must raise or return something != a phantom payload —
    never crash the process (the C decoders parse untrusted input)."""
    garbage = bytes(range(256)) * 16
    h = actpu.setup(codec)
    try:
        try:
            out = actpu.decompress(h, garbage, expected_size=4096)
            # snappy/lz4 block formats have no checksum: a parse may
            # "succeed"; it must at least be a bytes object, not a crash
            assert isinstance(out, bytes)
        except (CompressionError, ValueError):
            pass
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_level_clamping(codec):
    """Out-of-range levels clamp instead of failing (reference adapters
    clamp to each codec's min/max)."""
    h = actpu.setup(codec, level=99)
    h2 = actpu.setup(codec, level=-5)
    data = b"the quick brown fox " * 200
    try:
        for hh in (h, h2):
            c = actpu.compress(hh, data)
            assert actpu.decompress(hh, c, expected_size=len(data)) == data
    finally:
        actpu.destroy(h)
        actpu.destroy(h2)


@pytest.mark.parametrize("codec", ["zlib", "bzip2", "lzma", "zstd"])
def test_bitflip_in_entropy_stream_detected(codec, corpus):
    """Checksummed formats must detect a mid-stream bit flip."""
    data = corpus["text_64k"]
    h = actpu.setup(codec)
    try:
        c = bytearray(actpu.compress(h, data))
        c[len(c) // 2] ^= 0x40
        try:
            out = actpu.decompress(h, bytes(c), expected_size=len(data))
            assert out != data  # either raise or produce different bytes
        except (CompressionError, ValueError):
            pass
    finally:
        actpu.destroy(h)


def test_mesh_shards_beyond_devices_falls_back():
    """num_shards greater than available devices must still work (the
    reference clamps thread count to cores, threads.c:66-97)."""
    data = b"mesh fallback payload " * 3000
    h = actpu.setup("lz4", num_shards=512, opt_var=2, block_size=1 << 14)
    try:
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
    finally:
        actpu.destroy(h)


def test_destroyed_handle_rejected():
    h = actpu.setup("lz4")
    actpu.destroy(h)
    with pytest.raises(CompressionError) as e:
        actpu.compress(h, b"data")
    assert e.value.code == ErrorCode.INVALID_INPUT


def test_expected_size_mismatch_detected():
    """Wrong expected_size must not silently return wrong-length data."""
    data = b"payload " * 1000
    h = actpu.setup("zlib")
    try:
        c = actpu.compress(h, data)
        try:
            out = actpu.decompress(h, c, expected_size=17)
            assert out == data  # codecs with self-terminating streams
        except (CompressionError, ValueError):
            pass
    finally:
        actpu.destroy(h)
