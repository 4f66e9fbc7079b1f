"""Streaming API: chunked writes must produce streams that stock decoders
and this framework's decompressors accept, and DecompressStream must
reproduce the input (zstd incrementally, zlib/bzip2 at finish)."""

import bz2 as stock_bz2
import zlib as stock_zlib

import numpy as np
import pytest

from aocl_compression_tpu import streaming
from aocl_compression_tpu.runtime import native


def _payload(n=400000, seed=2):
    rng = np.random.default_rng(seed)
    words = [b"stream ", b"of ", b"compressed ", b"chunks "]
    parts = []
    tot = 0
    while tot < n:
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w)
        tot += len(w)
    return b"".join(parts)[:n]


def _feed(cs, data, sizes):
    out = bytearray()
    pos = 0
    i = 0
    while pos < len(data):
        k = sizes[i % len(sizes)]
        out += cs.write(data[pos:pos + k])
        pos += k
        i += 1
    out += cs.finish()
    return bytes(out)


@pytest.mark.parametrize("codec", ["zlib", "zstd", "bzip2"])
def test_stream_compress_stock_decode(codec):
    data = _payload()
    c = _feed(streaming.CompressStream(codec, block_size=1 << 16), data,
              [1, 7000, 333, 65536, 100000])
    if codec == "zlib":
        assert stock_zlib.decompress(c) == data
    elif codec == "bzip2":
        assert stock_bz2.decompress(c) == data
    else:
        import zstandard
        out, buf = b"", c
        while buf:
            dobj = zstandard.ZstdDecompressor().decompressobj()
            out += dobj.decompress(buf)
            buf = dobj.unused_data
        assert out == data


@pytest.mark.parametrize("codec", ["zlib", "zstd", "bzip2"])
def test_stream_roundtrip_own(codec):
    data = _payload(seed=5)
    c = _feed(streaming.CompressStream(codec, block_size=1 << 16), data,
              [40000])
    ds = streaming.DecompressStream(codec)
    out = bytearray()
    for i in range(0, len(c), 999):
        out += ds.write(c[i:i + 999])
    out += ds.finish()
    assert bytes(out) == data


def test_zstd_stream_decode_is_incremental():
    """zstd must emit decoded bytes BEFORE finish (per complete frame)."""
    data = _payload(300000, seed=9)
    c = _feed(streaming.CompressStream("zstd", block_size=1 << 16), data,
              [1 << 16])
    ds = streaming.DecompressStream("zstd")
    early = ds.write(c[: len(c) // 2 + 20000])
    assert len(early) > 0  # at least one frame decoded pre-finish
    rest = ds.write(c[len(c) // 2 + 20000:])
    tail = ds.finish()
    assert early + rest + tail == data


def test_stream_empty_and_tiny():
    for codec in ("zlib", "zstd", "bzip2"):
        cs = streaming.CompressStream(codec)
        c = cs.finish()
        ds = streaming.DecompressStream(codec)
        assert ds.write(c) + ds.finish() == b""
        cs = streaming.CompressStream(codec)
        c = cs.write(b"x") + cs.finish()
        ds = streaming.DecompressStream(codec)
        assert ds.write(c) + ds.finish() == b"x"


def test_stream_matches_oneshot_decode_path():
    """The streamed zlib layout equals the codec's skip-RAP serial layout,
    so the framework's own one-shot decompress accepts it."""
    data = _payload(150000, seed=11)
    c = _feed(streaming.CompressStream("zlib", level=6,
                                       block_size=1 << 16), data, [50000])
    assert native.inflate(c) == data


def test_stream_misuse_raises():
    cs = streaming.CompressStream("zstd")
    cs.finish()
    with pytest.raises(ValueError):
        cs.write(b"more")
    with pytest.raises(ValueError):
        streaming.CompressStream("lz4")
