"""Corpus matrix — the reference's CTest registration recreated
(test/CMakeLists.txt:77-105): every corpus payload x codec x
{default, optOff, native-API} must round-trip-verify, and optOff streams
must be interchangeable with optimized streams in both directions."""

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu import native_api
from aocl_compression_tpu.utils import dispatch
from tests.conftest import ALL_CODECS

PAYLOADS = ["tiny", "runs", "text_64k", "binary_200k", "random_100k",
            "mixed"]


def _native_roundtrip(codec, data):
    n = len(data)
    if codec == "lz4":
        return native_api.LZ4_decompress_safe(
            native_api.LZ4_compress_default(data), n)
    if codec == "lz4hc":
        return native_api.LZ4_decompress_safe(
            native_api.LZ4_compress_HC(data), n)
    if codec == "snappy":
        return native_api.snappy_uncompress(native_api.snappy_compress(data))
    if codec == "zlib":
        return native_api.uncompress(native_api.compress2(data), n)
    if codec == "bzip2":
        return native_api.BZ2_bzBuffToBuffDecompress(
            native_api.BZ2_bzBuffToBuffCompress(data), n)
    if codec == "lzma":
        return native_api.LzmaDecode(native_api.LzmaEncode(data), n)
    if codec == "zstd":
        return native_api.ZSTD_decompress(native_api.ZSTD_compress(data), n)
    raise ValueError(codec)


@pytest.mark.parametrize("codec", ALL_CODECS)
@pytest.mark.parametrize("payload", PAYLOADS)
def test_default_mode(codec, payload, corpus):
    data = corpus[payload]
    h = actpu.setup(codec)
    try:
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("codec", ALL_CODECS)
@pytest.mark.parametrize("payload", ["text_64k", "mixed"])
def test_optoff_mode(codec, payload, corpus):
    data = corpus[payload]
    dispatch.enable_audit(True)
    try:
        h = actpu.setup(codec, opt_off=True)
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
        assert dispatch.validate_tier_access(0)
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)


@pytest.mark.parametrize("codec", ALL_CODECS)
@pytest.mark.parametrize("payload", ["text_64k", "mixed"])
def test_native_mode(codec, payload, corpus):
    data = corpus[payload]
    assert _native_roundtrip(codec, data) == data


@pytest.mark.parametrize("codec", ALL_CODECS)
def test_optimized_and_optoff_streams_interchange(codec, corpus):
    """Cross-implementation oracle (SURVEY §4): streams from either path
    must decode on the other."""
    data = corpus["text_64k"]
    h_opt = actpu.setup(codec)
    h_off = actpu.setup(codec, opt_off=True)
    try:
        c_opt = actpu.compress(h_opt, data)
        c_off = actpu.compress(h_off, data)
        assert actpu.decompress(h_off, c_opt,
                                expected_size=len(data)) == data
        assert actpu.decompress(h_opt, c_off,
                                expected_size=len(data)) == data
    finally:
        actpu.destroy(h_opt)
        actpu.destroy(h_off)


# --- device-tier matrix (r3): the non-HOST rungs get the same corpus
# sweep the host tier gets, via the unified API with the tier forced by
# env (the audit blind spot VERDICT r2 flagged: device tiers were only
# exercised by dedicated files) -------------------------------------------

DEVICE_PAYLOADS = ["runs", "text_64k", "mixed"]


@pytest.mark.parametrize("tier", ["XLA", "MESH"])
@pytest.mark.parametrize("payload", DEVICE_PAYLOADS)
@pytest.mark.parametrize("codec", ALL_CODECS)
def test_device_tier_matrix(codec, payload, tier, corpus, monkeypatch):
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", tier)
    monkeypatch.setenv("AOCL_DEVICE_DECODE", "1")
    data = corpus[payload]
    kw = {"block_size": 8192, "opt_var": 2}
    if tier == "MESH":
        kw["num_shards"] = 2
    h = actpu.setup(codec, **kw)
    try:
        c = actpu.compress(h, data)
        out = actpu.decompress(h, c, expected_size=len(data))
    finally:
        actpu.destroy(h)
    assert out == data
