"""Device zstd encoder tests — stock zstd (zstandard) is the format oracle.

Covers: Huffman-literal + predefined-FSE frames, raw fallbacks, grid and
exact parses, the scalar format writer, and the unified-API level-1 tier."""

import random

import pytest
import zstandard

from aocl_compression_tpu.codecs import zstd_format as ZF
from aocl_compression_tpu.ops import zstd_device as ZD

D = zstandard.ZstdDecompressor()


def _payload(kind: str, n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    if kind == "text":
        words = [b"hash ", b"match ", b"the ", b"block ", b"stream "]
        out = bytearray()
        while len(out) < n:
            out += rng.choice(words)
        return bytes(out[:n])
    if kind == "rle":
        return b"a" * n
    if kind == "periodic":
        return (b"abcxyz" * (n // 6 + 1))[:n]
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "high":
        return bytes(128 + rng.randrange(128) for _ in range(n))
    if kind == "mixed":
        return (_payload("text", n // 2, seed)
                + _payload("random", n - n // 2, seed + 1))
    raise ValueError(kind)


KINDS = ["text", "rle", "periodic", "random", "high", "mixed"]


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("level", [1, 3])
def test_stock_zstd_decodes_device_frames(kind, level):
    blocks = [_payload(kind, 2048, s) for s in range(2)] + \
             [_payload(kind, 777, 9)]
    frames, dlens = ZD.encode_blocks(blocks, level)
    assert dlens == [len(b) for b in blocks]
    for f, b in zip(frames, blocks):
        assert D.decompress(f, max_output_size=len(b) + 64) == b


def test_concatenated_frames_are_valid_stream():
    blocks = [_payload("text", 1024, s) for s in range(3)]
    frames, _ = ZD.encode_blocks(blocks, 1)
    buf = memoryview(b"".join(frames))
    out = []
    while len(buf):
        o = D.decompressobj()
        out.append(o.decompress(bytes(buf)))
        if not o.unused_data:
            break
        buf = memoryview(o.unused_data)
    assert b"".join(out) == b"".join(blocks)


def test_scalar_format_writer_oracle():
    data = _payload("text", 4096, 3)
    # toy parse: no sequences (raw-block fallback must kick in)
    frame = ZF.encode_frame(data, [], data)
    assert D.decompress(frame, max_output_size=len(data)) == data
    # one real sequence
    data2 = b"abcdefgh_" * 20
    frame2 = ZF.encode_frame(data2, [(9, len(data2) - 9 - 5, 9)],
                             data2[:9] + data2[-5:])
    assert D.decompress(frame2, max_output_size=len(data2)) == data2


def test_ll_ml_code_tables_match_scalar():
    import numpy as np
    import jax.numpy as jnp
    lls = list(range(0, 300)) + [1000, 65535]
    got = jnp.searchsorted(ZD.LLBASE, jnp.asarray(lls),
                           side="right") - 1
    want = [ZF.ll_code_of(x) for x in lls]
    assert [int(g) for g in got] == want
    mls = list(range(3, 300)) + [1000, 65535]
    got = jnp.searchsorted(ZD.MLBASE, jnp.asarray(mls), side="right") - 1
    want = [ZF.ml_code_of(x) for x in mls]
    assert [int(g) for g in got] == want


def test_unified_api_zstd_device_level1():
    import aocl_compression_tpu as actpu
    data = _payload("text", 50000, 7)
    h = actpu.setup("zstd", level=1, block_size=8192, max_tier=1)
    c = actpu.compress(h, data)
    assert actpu.decompress(h, c) == data
    # the RAP skippable stream still decodes with stock zstd tooling
    buf = memoryview(c)
    out = []
    while len(buf):
        o = D.decompressobj()
        out.append(o.decompress(bytes(buf)))
        if not o.unused_data:
            break
        buf = memoryview(o.unused_data)
    assert b"".join(out) == data
