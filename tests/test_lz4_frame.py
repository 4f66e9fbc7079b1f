"""LZ4 Frame format + xxHash32 + zstd dictionary tests."""

import struct

import pytest

from aocl_compression_tpu import native_api
from aocl_compression_tpu.codecs import lz4_frame
from aocl_compression_tpu.runtime import native


def test_xxh32_vectors():
    # public xxHash test vectors
    assert native.xxh32(b"", 0) == 0x02CC5D05
    assert native.xxh32(b"", 1) == 0x0B2CB792
    assert native.xxh32(b"a", 0) == 0x550D7456
    assert native.xxh32(b"abc", 0) == 0x32D153FF
    assert native.xxh32(b"Nobody inspects the spammish repetition",
                        0) == 0xE2293B2F


@pytest.mark.parametrize("name", ["tiny", "runs", "text_64k", "random_100k",
                                  "text_300k", "mixed"])
def test_frame_roundtrip(corpus, name):
    data = corpus[name]
    frame = lz4_frame.compress_frame(data)
    assert struct.unpack_from("<I", frame)[0] == lz4_frame.MAGIC
    assert lz4_frame.decompress_frame(frame) == data


def test_frame_options(corpus):
    data = corpus["text_64k"]
    for bsid in (4, 5):
        for bchk in (False, True):
            for cchk in (False, True):
                f = lz4_frame.compress_frame(data, block_size_id=bsid,
                                             block_checksum=bchk,
                                             content_checksum=cchk)
                assert lz4_frame.decompress_frame(f) == data


def test_frame_corruption_detected(corpus):
    data = corpus["text_64k"]
    f = bytearray(lz4_frame.compress_frame(data, block_checksum=True))
    f[20] ^= 0xFF  # flip a payload byte
    with pytest.raises(ValueError):
        lz4_frame.decompress_frame(bytes(f))
    g = bytearray(lz4_frame.compress_frame(data))
    g[5] ^= 0x08  # corrupt FLG -> descriptor checksum must trip
    with pytest.raises(ValueError):
        lz4_frame.decompress_frame(bytes(g))


def test_frame_incompressible_stored(corpus):
    data = corpus["random_100k"]
    f = lz4_frame.compress_frame(data)
    # stored blocks keep the frame near input size, never much larger
    assert len(f) < len(data) + 64 + 4 * (len(data) // 65536 + 1)
    assert lz4_frame.decompress_frame(f) == data


def test_linked_block_decode():
    """Hand-built linked frame: block 2 references block 1's history."""
    blk1 = b"abcdefgh" * 8            # 64 bytes
    # block 2: one final literal-less... use raw stored first block and a
    # compressed second block whose match offset reaches into history.
    # sequence: token lit=0 ml=8 offset=64 (start of blk1), then 5+ literals
    seq = bytes([0x04 | 0x00])        # lit 0, mlen 4+4=8
    seq = bytes([(0 << 4) | 4]) + struct.pack("<H", 64) + \
        bytes([(5 << 4)]) + b"WORLD"  # final literal-only sequence
    desc = bytes([(1 << 6) | (1 << 3), 4 << 4]) + struct.pack("<Q", 77)
    frame = struct.pack("<I", lz4_frame.MAGIC) + desc + \
        bytes([lz4_frame._hc(desc)])
    frame += struct.pack("<I", len(blk1) | 0x80000000) + blk1
    frame += struct.pack("<I", len(seq)) + seq
    frame += struct.pack("<I", 0)
    out = lz4_frame.decompress_frame(frame)
    assert out == blk1 + blk1[:8] + b"WORLD"
    assert len(out) == 77


def test_native_api_frame_and_dict(corpus):
    data = corpus["text_64k"]
    f = native_api.LZ4F_compressFrame(data)
    assert native_api.LZ4F_decompressFrame(f) == data
    assert native_api.XXH32(b"abc") == 0x32D153FF

    samples = [corpus["text_64k"][i:i + 1024] for i in range(0, 40960, 1024)]
    d = native_api.ZDICT_trainFromBuffer(samples, 4096)
    assert len(d) > 0
    c = native_api.ZSTD_compress_usingDict(samples[3], d)
    assert native_api.ZSTD_decompress_usingDict(
        c, d, len(samples[3])) == samples[3]
    # dict streams must NOT decode without the dict
    with pytest.raises(Exception):
        native_api.ZSTD_decompress(c, len(samples[3]))


def test_unified_api_zstd_dictionary(corpus):
    import aocl_compression_tpu as actpu
    from aocl_compression_tpu.codecs.zstd import train_dictionary
    samples = [corpus["text_300k"][i:i + 2048] for i in range(0, 100000,
                                                              2048)]
    d = train_dictionary(samples, 8192)
    h = actpu.setup("zstd", dictionary=d, block_size=16384)
    data = corpus["text_300k"]
    c = actpu.compress(h, data)
    assert actpu.decompress(h, c) == data
    h2 = actpu.setup("zstd", block_size=16384)
    c2 = actpu.compress(h2, data)
    assert actpu.decompress(h2, c2) == data


def test_frame_default_path_obeys_measured_policy(corpus):
    # compress_frame without an explicit max_tier must ride the calibrated
    # (measured-speed) policy like the main API default — i.e. the host
    # tier while it is the fastest measured — so frame encode works even
    # when no JAX backend can initialize (axon relay down).
    from aocl_compression_tpu.utils import dispatch
    dispatch.enable_audit(True)
    try:
        f = lz4_frame.compress_frame(corpus["text_64k"])
        assert lz4_frame.decompress_frame(f) == corpus["text_64k"]
        assert dispatch.validate_tier_access(0)
    finally:
        dispatch.enable_audit(False)
