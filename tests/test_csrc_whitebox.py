"""White-box tests of individual native entry points — the per-function
gtest style of the reference (gtest/<module>/<module>_gtest.cpp): exact
bounds, known-answer checksum vectors, header/size probes, error codes.
"""

import numpy as np
import pytest

from aocl_compression_tpu.runtime import native


# --- checksums: known-answer vectors ------------------------------------------

def test_xxh32_vectors():
    # reference vectors from the xxHash spec (seed 0 / seed prime)
    assert native.xxh32(b"") == 0x02CC5D05
    assert native.xxh32(b"Nobody inspects the spammish repetition") == \
        0xE2293B2F


def test_xxh64_vectors():
    lib = native.get_lib()
    src = np.frombuffer(b"xxhash", dtype=np.uint8).copy()
    v = lib.atpu_xxh64(src.ctypes.data_as(native._u8p), 6, 0)
    assert v == 0x32DD38952C4BC720  # xxh64("xxhash", seed 0)


def test_adler32_matches_zlib():
    import zlib
    for payload in (b"", b"a", b"hello world" * 100, bytes(range(256))):
        lib = native.get_lib()
        src = np.frombuffer(payload or b"\x00", dtype=np.uint8).copy()
        v = lib.atpu_adler32(src.ctypes.data_as(native._u8p), len(payload),
                             1)
        assert v == zlib.adler32(payload), payload[:16]


# --- size probes --------------------------------------------------------------

def test_lz4_compress_bound_is_exact_format_bound():
    # LZ4_COMPRESSBOUND(n) = n + n/255 + 16
    for n in (0, 1, 255, 256, 65536, 1 << 20):
        assert native.get_lib().atpu_lz4_compress_bound(n) >= n + n // 255


def test_lz4_decompressed_size_structural():
    data = b"structural size scan " * 300
    c = native.lz4_compress(data, 1)
    assert native.lz4_decompressed_size(c) == len(data)
    # malformed: offset 0
    assert native.lz4_decompressed_size(b"\x10A\x00\x00") < 0
    # truncated literal run
    assert native.lz4_decompressed_size(b"\xf0") < 0


def test_snappy_uncompressed_length_probe():
    data = b"snappy length probe " * 200
    c = native.snappy_compress(data)
    assert native.snappy_uncompressed_length(c) == len(data)


def test_zstd_frame_content_size_probe():
    data = b"frame content size " * 100
    c = native.zstd_compress(data, 3)
    assert native.zstd_frame_content_size(c) == len(data)
    assert native.zstd_frame_content_size(b"\x00\x01\x02\x03") is None


# --- exact dst-bound behavior -------------------------------------------------

def test_lz4_compress_exact_dst():
    data = b"exact destination bound " * 100
    c = native.lz4_compress(data, 1)
    lib = native.get_lib()
    src = np.frombuffer(data, dtype=np.uint8).copy()
    dst = np.zeros(len(c), dtype=np.uint8)
    # exactly-sized dst must succeed...
    n = lib.atpu_lz4_compress(src.ctypes.data_as(native._u8p), len(data),
                              dst.ctypes.data_as(native._u8p), len(c), 1)
    assert n == len(c)
    # ...one byte less must fail cleanly
    n = lib.atpu_lz4_compress(src.ctypes.data_as(native._u8p), len(data),
                              dst.ctypes.data_as(native._u8p), len(c) - 1,
                              1)
    assert n < 0


def test_decompress_exact_and_short_dst():
    data = b"short destination check " * 120
    c = native.lz4_compress(data, 1)
    assert native.lz4_decompress(c, len(data)) == data
    with pytest.raises(ValueError):
        native.lz4_decompress(c, len(data) - 1)


# --- RAP frame edge cases -----------------------------------------------------

def test_rap_roundtrip_and_magic():
    frame = native.rap_write(2, [20, 50], [30, 40], [100, 200])
    assert frame[:8] == b"AOCL_LLC"
    offs, lens, dlens = native.rap_parse(frame)
    assert list(offs) == [20, 50]
    assert list(lens) == [30, 40]
    assert list(dlens) == [100, 200]
    assert native.rap_skip(frame) == len(frame)


def test_rap_parse_rejects_corrupt_magic():
    frame = bytearray(native.rap_write(1, [16], [10], [20]))
    frame[0] ^= 0xFF
    assert native.rap_parse(bytes(frame)) is None


def test_rap_single_and_max_reasonable_entries():
    n = 1000
    offs = list(range(0, 4 * n, 4))
    frame = native.rap_write(n, offs, [4] * n, [8] * n)
    offs2, lens2, dlens2 = native.rap_parse(frame)
    assert len(offs2) == n and lens2[-1] == 4 and dlens2[0] == 8


# --- lzma props / bzip2 stream markers ----------------------------------------

def test_lzma_alone_header_layout():
    data = b"lzma header layout " * 50
    c = native.lzma_compress(data, 6)
    # FORMAT_ALONE: 1 props byte, 4B dictSize, 8B uncompressed size
    assert len(c) > 13
    props = c[0]
    assert props < 9 * 5 * 5  # lc/lp/pb packed
    assert int.from_bytes(c[5:13], "little") == len(data)
    lib = native.get_lib()
    src = np.frombuffer(c, dtype=np.uint8).copy()
    assert lib.atpu_lzma_unpacked_size(
        src.ctypes.data_as(native._u8p), len(c)) == len(data)


def test_bzip2_stream_markers():
    data = b"bzip2 marker check " * 64
    c = native.bz2_compress(data, 9)
    assert c[:3] == b"BZh"
    assert c[3:4] in b"123456789"
    assert native.bz2_decompress(c, len(data)) == data
    # cross-oracle: CPython bz2 decodes our stream
    import bz2 as stdlib_bz2
    assert stdlib_bz2.decompress(c) == data


def test_deflate_stored_block_path():
    # incompressible input must take the stored-block path and stay small
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    c = native.deflate(data, 6, native.DEFLATE_ZLIB)
    assert len(c) < len(data) + 64  # stored blocks: ~5B overhead per 64K
    import zlib
    assert zlib.decompress(c) == data


# --- gzip format (RFC 1952) over own deflate/crc32 ---------------------------

def test_crc32_check_value():
    assert native.crc32(b"123456789") == 0xCBF43926
    import zlib
    for payload in (b"", b"abc", bytes(range(256)) * 10):
        assert native.crc32(payload) == zlib.crc32(payload)


def test_gzip_interop_both_directions():
    import gzip
    data = b"the gzip member format over own deflate " * 500
    c = native.gzip_compress(data, 6)
    assert gzip.decompress(c) == data
    assert native.gzip_decompress(c) == data
    assert native.gzip_decompress(gzip.compress(data)) == data


def test_gzip_multi_member_and_corruption():
    import pytest as _pytest
    a = native.gzip_compress(b"first", 1)
    b_ = native.gzip_compress(b"second", 9)
    assert native.gzip_decompress(a + b_) == b"firstsecond"
    bad = bytearray(a)
    bad[len(bad) // 2] ^= 0xFF
    with _pytest.raises(ValueError):
        native.gzip_decompress(bytes(bad))


def test_gzip_stock_header_variants():
    """Stock gzip may emit FNAME etc. — our reader must skip them."""
    import gzip, io, time
    data = b"named member " * 100
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", filename="x.txt",
                       mtime=1234) as f:
        f.write(data)
    assert native.gzip_decompress(buf.getvalue()) == data
