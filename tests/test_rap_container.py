"""RAP container tests — the reference's threads/api gtest analog
(/root/reference/gtest/threads/threads_gtest.cpp, gtest/api/api_gtest.cpp:553-1052):
byte layout, skip-frame legacy decode, partition edge cases, and — crucially —
interop with stock format decoders (zstd skippable-frame path)."""

import struct

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.parallel import container
from aocl_compression_tpu.runtime import native

RAP_MAGIC = 0x434C4C5F4C434F41  # "AOCL_LLC"


def test_rap_byte_layout():
    frame = native.rap_write(2, [40, 100], [60, 70], [500, 600])
    magic, flen, nmain, nchild = struct.unpack_from("<QIHH", frame)
    assert magic == RAP_MAGIC
    assert flen == len(frame) == 16 + 2 * 12
    assert nmain == 2 and nchild == 0
    o0, l0, d0, o1, l1, d1 = struct.unpack_from("<6I", frame, 16)
    assert (o0, l0, d0) == (40, 60, 500)
    assert (o1, l1, d1) == (100, 70, 600)


def test_rap_parse_legacy_stream():
    assert native.rap_parse(b"not a rap stream at all") is None
    assert native.rap_skip(b"short") == 0


def test_rap_parse_malformed():
    frame = bytearray(native.rap_write(2, [40, 100], [60, 70], [500, 600]))
    struct.pack_into("<I", frame, 8, 9999)  # corrupt frame length
    with pytest.raises(ValueError):
        native.rap_parse(bytes(frame))


def test_lz4_rap_stream_and_legacy_decode(corpus):
    """MT stream must be decodable by (a) the parallel RAP path and (b) a
    legacy serial decoder after skipping the frame — the reference's
    MT->ST conversion example (docs/EXAMPLE_README.md)."""
    data = corpus["text_300k"]
    h = actpu.setup("lz4", block_size=1 << 16)
    c = actpu.compress(h, data)
    # it IS a RAP stream
    parsed = native.rap_parse(c)
    assert parsed is not None
    offsets, lens, dlens = parsed
    assert int(dlens.sum()) == len(data)
    # (a) parallel decode
    assert actpu.decompress(h, c) == data
    # (b) legacy serial decode after skip
    legacy = container.skip_rap_frame(c)
    assert native.lz4_decompress(legacy, len(data)) == data
    actpu.destroy(h)


def test_snappy_rap_stream_and_legacy_decode(corpus):
    data = corpus["text_300k"]
    h = actpu.setup("snappy", block_size=1 << 16)
    c = actpu.compress(h, data)
    assert native.rap_parse(c) is not None
    assert actpu.decompress(h, c) == data
    # legacy decode: skip RAP -> single preamble + concatenated elements
    legacy = container.skip_rap_frame(c)
    assert native.snappy_uncompress(legacy) == data
    # uncompressed-length helper reads through the RAP frame
    codec = actpu.get_codec("snappy")
    assert codec.uncompressed_length(c) == len(data)
    actpu.destroy(h)


def test_zstd_rap_stream_stock_decoder_interop(corpus):
    """The zstd MT stream embeds RAP in a standard skippable frame; a STOCK
    zstd decoder must decode the whole stream (reference property:
    zstd_compress.c:5324-5387)."""
    import zstandard
    data = corpus["text_300k"]
    h = actpu.setup("zstd", block_size=1 << 16, level=3)
    c = actpu.compress(h, data)
    magic, size = struct.unpack_from("<II", c)
    assert (magic & 0xFFFFFFF0) == 0x184D2A50  # skippable frame
    # our parallel decode
    assert actpu.decompress(h, c) == data
    # stock streaming decoder over the full stream, skippable frame included
    dctx = zstandard.ZstdDecompressor()
    out, buf = [], c
    while buf:
        dobj = dctx.decompressobj()
        out.append(dobj.decompress(buf))
        nxt = dobj.unused_data
        if not nxt or nxt == buf:
            break
        buf = nxt
    assert b"".join(out) == data
    actpu.destroy(h)


def test_zlib_small_input_single_shot(corpus):
    """Below 2 blocks the container is skipped (reference single-thread
    fallback, threads.c:66-71)."""
    h = actpu.setup("lz4", block_size=1 << 16)
    c = actpu.compress(h, corpus["text_64k"])  # exactly 1 block
    assert native.rap_parse(c) is None
    assert actpu.decompress(h, c, expected_size=len(corpus["text_64k"])) \
        == corpus["text_64k"]
    actpu.destroy(h)


def test_rap_disabled_handle(corpus):
    h = actpu.setup("lz4", enable_rap=False)
    c = actpu.compress(h, corpus["text_300k"])
    assert native.rap_parse(c) is None
    assert actpu.decompress(h, c, expected_size=len(corpus["text_300k"])) \
        == corpus["text_300k"]
    actpu.destroy(h)


def test_partition_edge_cases(corpus):
    """Window-factor edge cases from threads_gtest: leftover bytes smaller
    than / equal to a block, block_size 1 byte larger than half the input."""
    data = corpus["text_300k"]
    for bs in (1 << 12, 1 << 16, len(data) // 2 + 1, len(data) - 1):
        h = actpu.setup("lz4", block_size=bs)
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, expected_size=len(data)) == data
        actpu.destroy(h)
