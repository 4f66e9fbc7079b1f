"""Margin/edge regression tests for the round-3 decode/encode fast paths.

The hot loops in csrc now use margin-gated fixed-size wildcopies (lz4,
snappy, inflate, zstd decode) and exact checked tails; these tests pin
the boundary behavior the fuzzer only hits probabilistically:
  - outputs that end exactly at the wild-write margins,
  - tiny buffers that must skip the fast loops entirely,
  - small periodic offsets (the gap-expansion copy),
  - dstCap == exact output (no physical slack at all),
  - the stored-block accumulator handoff in inflate (the manual p
    advance that invalidates the branch-free refill borrow).
"""

import bz2
import random
import zlib

import pytest

from aocl_compression_tpu.runtime import native


def _periodic(n, period):
    pat = bytes(range(1, period + 1))
    return (pat * (n // period + 1))[:n]


# ---------------------------------------------------------------------------
# lz4
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 5, 12, 13, 20, 31, 32, 33, 63, 64, 65,
                               100, 4096])
def test_lz4_tiny_and_margin_sizes(n):
    rng = random.Random(n)
    data = bytes(rng.randrange(4) for _ in range(n))  # compressible
    c = native.lz4_compress(data)
    assert native.lz4_decompress(c, n) == data


@pytest.mark.parametrize("period", [1, 2, 3, 4, 5, 6, 7, 8, 15, 16, 17])
def test_lz4_small_periodic_offsets(period):
    # small-distance matches drive the periodic-expansion copy path
    data = _periodic(7000, period) + b"tail-literals-xyz"
    c = native.lz4_compress(data)
    assert native.lz4_decompress(c, len(data)) == data


def test_lz4_long_literal_run_into_tight_dst():
    # a >15-literal run whose exact-copy branch lands near the dst end
    rng = random.Random(7)
    rnd = bytes(rng.randrange(256) for _ in range(300))
    data = _periodic(600, 4) + rnd  # match region then incompressible tail
    c = native.lz4_compress(data)
    assert native.lz4_decompress(c, len(data)) == data


def test_lz4_output_ends_on_match():
    # craft data where the last bytes come from a match (plus the 5-byte
    # literal tail the format mandates) — exercises the fast loop's
    # out-margin disengage on the final sequences
    data = b"abcdefgh" * 1000
    c = native.lz4_compress(data)
    assert native.lz4_decompress(c, len(data)) == data


# ---------------------------------------------------------------------------
# snappy — dstCap is EXACT (wrapper allocates uncompressed_length), so the
# wild-write margins must hold against the physical capacity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 14, 15, 16, 17, 59, 60, 61, 63, 64, 65,
                               79, 80, 81, 100, 5000])
def test_snappy_exact_capacity_sizes(n):
    rng = random.Random(n)
    data = bytes(rng.randrange(5) for _ in range(n))
    c = native.snappy_compress(data)
    assert native.snappy_uncompress(c) == data


@pytest.mark.parametrize("period", [1, 2, 3, 4, 7, 8, 9, 15, 16, 17])
def test_snappy_small_periodic_offsets(period):
    data = _periodic(9000, period) + b"ending" * 3
    c = native.snappy_compress(data)
    assert native.snappy_uncompress(c) == data


def test_snappy_tag_max_literal_blocks():
    # 60-byte-class literals ride the 64-byte fixed copy; place them so
    # the last one ends exactly at the output end
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(60 * 7))
    c = native.snappy_compress(data)
    assert native.snappy_uncompress(c) == data


# ---------------------------------------------------------------------------
# inflate
# ---------------------------------------------------------------------------

def test_inflate_stored_then_huffman_blocks():
    # stored blocks force the manual p advance; the following compressed
    # block decodes only if the refill borrow was dropped correctly
    rng = random.Random(11)
    rnd = bytes(rng.randrange(256) for _ in range(70000))  # stored
    text = b"the quick brown fox " * 3000                  # huffman
    data = rnd + text + rnd[:40000]
    c = zlib.compress(data, 1)
    assert native.inflate(c, len(data)) == data
    assert native.inflate(c) == data


@pytest.mark.parametrize("n", [1, 6, 7, 8, 9, 30, 100])
def test_inflate_tiny_streams(n):
    data = b"a" * n
    c = zlib.compress(data, 9)
    assert native.inflate(c, n) == data


@pytest.mark.parametrize("period", [1, 2, 3, 4, 5, 6, 7, 8])
def test_inflate_small_distance_matches(period):
    data = _periodic(50000, period)
    c = zlib.compress(data, 6)
    assert native.inflate(c, len(data)) == data


def test_inflate_dynamic_long_codes():
    # skewed distribution drives >10-bit codes into the FTable subtables
    rng = random.Random(5)
    weights = [400] + [1] * 255
    pool = rng.choices(range(256), weights=weights, k=120000)
    data = bytes(pool)
    c = zlib.compress(data, 9)
    assert native.inflate(c, len(data)) == data


def test_inflate_exact_dst_capacity():
    data = _periodic(33000, 3)
    c = zlib.compress(data, 6)
    out = native.inflate(c, expected_size=len(data))
    assert out == data


# ---------------------------------------------------------------------------
# zstd decode
# ---------------------------------------------------------------------------

def test_zstd_rle_literal_block_small():
    # small RLE literal runs are materialized into litBuf once
    data = b"\x00" * 60000 + b"trailer" + b"\xff" * 50
    c = native.zstd_compress(data, level=3)
    assert native.zstd_decompress(c, expected_size=len(data)) == data


@pytest.mark.parametrize("period", [1, 2, 3, 4, 5, 6, 7, 8])
def test_zstd_small_offsets(period):
    data = _periodic(120000, period) + b"end!"
    c = native.zstd_compress(data, level=1)
    assert native.zstd_decompress(c, expected_size=len(data)) == data


def test_zstd_exact_capacity_end_on_match():
    data = (b"block-of-text-" * 2000) + _periodic(500, 9)
    c = native.zstd_compress(data, level=6)
    out = native.zstd_decompress(c, expected_size=len(data))
    assert out == data


def test_zstd_long_literals_and_long_matches():
    rng = random.Random(13)
    rnd = bytes(rng.randrange(256) for _ in range(4000))
    data = rnd + b"Z" * 5000 + rnd + rnd[:100]
    c = native.zstd_compress(data, level=3)
    assert native.zstd_decompress(c, expected_size=len(data)) == data


# ---------------------------------------------------------------------------
# cross-check: corrupt streams must still be rejected, not wild-copied
# ---------------------------------------------------------------------------

def test_truncated_streams_rejected():
    data = _periodic(50000, 6)
    for enc, dec in [
        (lambda d: native.lz4_compress(d),
         lambda c: native.lz4_decompress(c, len(data))),
        (lambda d: native.snappy_compress(d),
         lambda c: native.snappy_uncompress(c)),
        (lambda d: zlib.compress(d, 6),
         lambda c: native.inflate(c, len(data))),
        (lambda d: native.zstd_compress(d, level=3),
         lambda c: native.zstd_decompress(c, expected_size=len(data))),
        (lambda d: bz2.compress(d, 9),
         lambda c: native.bz2_decompress(c, len(data))),
    ]:
        c = enc(data)
        for cut in (len(c) // 3, len(c) - 7, len(c) - 1):
            with pytest.raises(ValueError):
                out = dec(c[:cut])
                # a prefix-decodable cut may legally return fewer bytes
                # for formats with self-delimiting members; only a FULL
                # reconstruction would be a safety bug
                if out == data:
                    return
                raise ValueError("short decode")


def test_bz2_u8_alphabet_remap_paths():
    # blocks with a free byte value ride the u8-alphabet SA-IS (order-
    # preserving remap into the hole); full-alphabet blocks keep u16
    rng = random.Random(99)
    with_hole = bytes(rng.choice(range(1, 256)) for _ in range(200000))
    full = bytes(rng.randrange(256) for _ in range(200000)) + bytes(range(256))
    hole_mid = bytes(rng.choice([v for v in range(256) if v != 117])
                     for _ in range(150000))
    for payload in (with_hole, full, hole_mid):
        c = native.bz2_compress(payload, 9)
        assert bz2.decompress(c) == payload
        assert native.bz2_decompress(c, len(payload)) == payload
