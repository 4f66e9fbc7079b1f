"""Streaming API: chunked writes must produce streams that stock decoders
and this framework's decompressors accept, and DecompressStream must
reproduce the input incrementally with bounded memory for all codecs."""

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
        streaming.CompressStream("snappy")


@pytest.mark.parametrize("codec", ["zlib", "bzip2"])
def test_stream_decode_is_incremental_and_bounded(codec):
    """zlib/bzip2 decode must emit output BEFORE finish() and keep the
    buffered compressed input bounded (O(window) / O(block)), never the
    whole stream (reference capability: algos/zlib/inflate.c resumable
    state machine, algos/bzip2 BZ2_bzDecompress incremental calls)."""
    data = _payload(3 << 20, seed=13)
    if codec == "zlib":
        c = stock_zlib.compress(data, 6)
        bound = 1 << 16          # inflate trims consumed bytes every run
    else:
        c = stock_bz2.compress(data, 1)  # 100k blocks
        bound = 400000           # one block's compressed bytes + slack
    ds = streaming.DecompressStream(codec)
    out = bytearray()
    early_bytes = 0
    max_pending = 0
    step = 8192
    for i in range(0, len(c), step):
        got = ds.write(c[i:i + step])
        out += got
        if i < len(c) - step:
            early_bytes += len(got)
        max_pending = max(max_pending, ds.pending_input())
    out += ds.finish()
    assert bytes(out) == data
    assert early_bytes > len(data) // 2, "decode did not stream"
    assert max_pending < bound, f"pending {max_pending} >= {bound}"


@pytest.mark.parametrize("codec", ["zlib", "bzip2"])
def test_stream_decode_truncated_raises(codec):
    data = _payload(200000, seed=17)
    c = (stock_zlib.compress(data) if codec == "zlib"
         else stock_bz2.compress(data))
    ds = streaming.DecompressStream(codec)
    ds.write(c[:len(c) - 40])
    with pytest.raises(ValueError):
        ds.finish()


def test_stream_decode_multistream_bzip2():
    """Concatenated .bz2 streams (the format's multi-stream rule) decode
    across the boundary, matching stock bz2.decompress semantics."""
    a, b = _payload(120000, seed=19), _payload(90000, seed=23)
    c = stock_bz2.compress(a, 9) + stock_bz2.compress(b, 9)
    ds = streaming.DecompressStream("bzip2")
    out = bytearray()
    for i in range(0, len(c), 5000):
        out += ds.write(c[i:i + 5000])
    out += ds.finish()
    assert bytes(out) == a + b


def test_stream_decode_corrupt_checksum_raises():
    data = _payload(100000, seed=29)
    bad = bytearray(stock_zlib.compress(data))
    bad[-2] ^= 0xFF  # adler byte
    ds = streaming.DecompressStream("zlib")
    with pytest.raises(ValueError):
        ds.write(bytes(bad))
        ds.finish()


# --- gzip member streaming (round-3 continuation) ---------------------------

def test_gzip_compress_stream_stock_decodable(corpus):
    import gzip as _gz
    from aocl_compression_tpu.streaming import CompressStream
    data = corpus["text_300k"]
    cs = CompressStream("gzip")
    enc = cs.write(data[:99999]) + cs.write(data[99999:]) + cs.finish()
    assert _gz.decompress(enc) == data


def test_gzip_decompress_stream_stock_members(corpus):
    import gzip as _gz
    import io
    import random
    from aocl_compression_tpu.streaming import DecompressStream
    data = corpus["text_300k"]
    buf = io.BytesIO()
    with _gz.GzipFile(fileobj=buf, mode="wb", filename="name.bin") as f:
        f.write(data)
    stream = buf.getvalue() + _gz.compress(data[:7777])  # two members
    ds = DecompressStream("gzip")
    out = b""
    rng = random.Random(2)
    i = 0
    while i < len(stream):
        step = rng.randrange(1, 5000)
        out += ds.write(stream[i:i + step])
        i += step
    out += ds.finish()
    assert out == data + data[:7777]


def test_gzip_stream_roundtrip_empty_and_truncation():
    import gzip as _gz
    import pytest
    from aocl_compression_tpu.streaming import (CompressStream,
                                                DecompressStream)
    e = CompressStream("gzip").finish()
    assert _gz.decompress(e) == b""
    ds = DecompressStream("gzip")
    assert ds.write(e) + ds.finish() == b""
    g = _gz.compress(b"payload" * 1000)
    ds = DecompressStream("gzip")
    ds.write(g[:len(g) // 2])
    with pytest.raises(ValueError):
        ds.finish()


def test_gzip_stream_crc_mismatch_detected():
    import gzip as _gz
    import pytest
    from aocl_compression_tpu.streaming import DecompressStream
    g = bytearray(_gz.compress(b"hello world" * 500))
    g[-6] ^= 0xFF  # corrupt CRC32 field
    ds = DecompressStream("gzip")
    with pytest.raises(ValueError):
        ds.write(bytes(g))
        ds.finish()


def test_lz4_stream_linked_roundtrip():
    """CompressStream('lz4') emits a linked-block LZ4F frame that both the
    one-shot frame decoder and the streaming decoder reproduce, and the
    frame is smaller than the independent-block one-shot at equal block
    size (linked blocks see the previous 64K; lz4frame.c
    LZ4F_compressUpdate parity)."""
    from aocl_compression_tpu.codecs import lz4_frame
    from aocl_compression_tpu.streaming import CompressStream
    from aocl_compression_tpu.streaming import DecompressStream
    data = _payload(900000, seed=5)
    cs = CompressStream("lz4", block_size=1 << 16)
    frame = _feed(cs, data, [1, 7, 65536, 100000, 3, 999999])
    assert lz4_frame.decompress_frame(frame) == data
    ds = DecompressStream("lz4")
    got = bytearray()
    for i in range(0, len(frame), 37777):
        got += ds.write(frame[i : i + 37777])
    assert bytes(got) == data
    indep = lz4_frame.compress_frame(data, block_size_id=4,
                                     store_content_size=False)
    assert len(frame) < len(indep)


def test_lz4_stream_decoder_takes_independent_and_skippable():
    from aocl_compression_tpu.codecs import lz4_frame
    from aocl_compression_tpu.streaming import DecompressStream
    data = _payload(150000, seed=6)
    f = lz4_frame.compress_frame(data, block_checksum=True)
    skippable = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(
        4, "little") + b"extra"
    ds = DecompressStream("lz4")
    assert ds.write(skippable + f + skippable + f) == data + data


def test_lz4_stream_checksum_mismatch_detected():
    from aocl_compression_tpu.streaming import CompressStream
    from aocl_compression_tpu.streaming import DecompressStream
    data = _payload(100000, seed=7)
    cs = CompressStream("lz4")
    frame = bytearray(cs.write(data) + cs.finish())
    frame[-1] ^= 0xFF  # corrupt the content checksum
    ds = DecompressStream("lz4")
    with pytest.raises(ValueError):
        ds.write(bytes(frame))


def test_xxh32_stream_matches_oneshot():
    data = _payload(100001, seed=8)
    xs = native.XXH32Stream()
    for i in range(0, len(data), 997):
        xs.update(data[i : i + 997])
    assert xs.digest() == native.xxh32(data)
    for n in [0, 1, 15, 16, 17, 31]:
        xs = native.XXH32Stream()
        xs.update(data[:n])
        assert xs.digest() == native.xxh32(data[:n])
