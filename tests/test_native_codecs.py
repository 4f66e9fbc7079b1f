"""Host-tier codec tests — the reference's per-codec gtest analog
(/root/reference/gtest/lz4/lz4_gtest.cpp style: roundtrips, edge sizes,
corrupt-stream safety, bounds)."""

import pytest

from aocl_compression_tpu.runtime import native


@pytest.mark.parametrize("name", ["empty", "one", "tiny", "runs", "period2",
                                  "text_64k", "binary_200k", "random_100k",
                                  "mixed"])
def test_lz4_roundtrip(name, corpus):
    d = corpus[name]
    c = native.lz4_compress(d)
    assert native.lz4_decompress(c, len(d)) == d
    assert len(c) <= native.lz4_compress_bound(len(d))


@pytest.mark.parametrize("level", [1, 4, 9, 12])
def test_lz4hc_levels(level, corpus):
    d = corpus["text_300k"]
    c = native.lz4hc_compress(d, level)
    assert native.lz4_decompress(c, len(d)) == d


def test_lz4hc_beats_or_matches_fast(corpus):
    d = corpus["text_300k"]
    assert len(native.lz4hc_compress(d, 9)) <= len(native.lz4_compress(d))


def test_lz4hc_ratio_improves_with_level(corpus):
    d = corpus["text_300k"]
    s1 = len(native.lz4hc_compress(d, 1))
    s12 = len(native.lz4hc_compress(d, 12))
    assert s12 <= s1


@pytest.mark.parametrize("level", [10, 11, 12])
def test_lz4hc_optimal_tier_beats_chain_tier(level, corpus):
    """L10-12 switch to the price-DP optimal parse (reference strategy
    switch: lz4hc.c:1629 LZ4HC_compress_optimal, clTable :1655) — on
    text it must strictly beat the L9 chain tier, not merely match it."""
    d = corpus["text_300k"]
    s9 = len(native.lz4hc_compress(d, 9))
    sL = len(native.lz4hc_compress(d, level))
    assert sL < s9


@pytest.mark.parametrize("name", ["empty", "one", "tiny", "runs", "period2",
                                  "text_64k", "binary_200k", "random_100k",
                                  "mixed"])
def test_lz4hc_optimal_tier_roundtrip(name, corpus):
    d = corpus[name]
    for level in (10, 12):
        c = native.lz4hc_compress(d, level)
        assert native.lz4_decompress(c, len(d)) == d


def test_lz4hc_optimal_chunk_boundary_runs():
    """Literal runs crossing the DP's 16 KiB chunk boundary must carry
    their extension-byte state (runs of 15/270/525... pay +1)."""
    import random
    rng = random.Random(11)
    # incompressible span (one long literal run) followed by matchable text
    d = bytes(rng.randrange(256) for _ in range(40000)) \
        + b"the quick brown fox jumps over the lazy dog " * 500
    for level in (10, 11, 12):
        c = native.lz4hc_compress(d, level)
        assert native.lz4_decompress(c, len(d)) == d


@pytest.mark.parametrize("name", ["empty", "one", "tiny", "runs", "period2",
                                  "text_64k", "binary_200k", "random_100k"])
def test_snappy_roundtrip(name, corpus):
    d = corpus[name]
    c = native.snappy_compress(d)
    assert native.snappy_uncompress(c) == d
    assert native.snappy_uncompressed_length(c) == len(d)
    assert len(c) <= native.snappy_max_compressed_length(len(d))


def test_lz4_accel_tradeoff(corpus):
    d = corpus["text_300k"]
    s1 = len(native.lz4_compress(d, 1))
    s8 = len(native.lz4_compress(d, 8))
    assert s1 <= s8  # higher acceleration = weaker ratio
    assert native.lz4_decompress(native.lz4_compress(d, 8), len(d)) == d


def test_lz4_decompress_corrupt_is_safe(corpus):
    c = bytearray(native.lz4_compress(corpus["text_64k"]))
    for cut in (1, len(c) // 3, len(c) - 1):
        # a truncated stream is either rejected or decodes to a strict
        # prefix-like shorter output — never the full original, never a crash
        try:
            out = native.lz4_decompress(bytes(c[:cut]),
                                        len(corpus["text_64k"]))
            assert out != corpus["text_64k"]
        except ValueError:
            pass
    # flip offset bytes to point before the buffer
    bad = bytearray(c)
    if len(bad) > 10:
        bad[5] = 0xFF
        bad[6] = 0xFF
        try:
            native.lz4_decompress(bytes(bad), len(corpus["text_64k"]))
        except ValueError:
            pass  # either rejected or (rarely) still valid — must not crash


def test_snappy_decompress_corrupt_is_safe(corpus):
    c = native.snappy_compress(corpus["text_64k"])
    with pytest.raises(ValueError):
        native.snappy_uncompress(c[: len(c) // 2])


def test_lz4_stitched_concatenation_decodes(corpus):
    """Stitched fragments concatenate into one valid serial stream — the
    invariant the RAP container relies on (reference boundary surgery,
    lz4.c:2736+). Raw concatenation would be ambiguous; the stitcher merges
    each fragment's trailing literals into the next fragment."""
    from aocl_compression_tpu.codecs import lz4_stitch
    blocks = [corpus["text_64k"], corpus["binary_200k"], corpus["runs"]]
    frags = [native.lz4_compress_tail(b) for b in blocks]
    chunks, dlens = lz4_stitch.stitch(frags, blocks)
    total = b"".join(blocks)
    assert sum(dlens) == len(total)
    # serial decode of the concatenation
    assert native.lz4_decompress(b"".join(chunks), len(total)) == total
    # independent decode of each region reproduces its dlen slice
    pos = 0
    for ch, d in zip(chunks, dlens):
        if d:
            assert native.lz4_decompress(ch, d) == total[pos:pos + d]
        pos += d
