"""Snappy device pipeline tests (CPU backend, virtual devices, small blocks).

Cross-checks the parallel encoder/decoder (ops/snappy_device.py) against the
C++ host oracle (csrc/snappy_host.cpp) — the reference's
optimized-vs-reference-path oracle strategy (SURVEY.md §4)."""

import random

import pytest

from aocl_compression_tpu.ops import snappy_device as dev
from aocl_compression_tpu.runtime import native

B = 1024


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
    if kind == "mixed":
        return (_payload("text", n // 2, seed)
                + _payload("random", n - n // 2, seed + 1))
    raise ValueError(kind)


KINDS = ["text", "rle", "periodic", "random", "mixed"]


def _varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


@pytest.mark.parametrize("kind", KINDS)
def test_device_encode_oracle_decodes(kind):
    """The C++ snappy oracle must decode device-encoded fragments."""
    blocks = [_payload(kind, B, s) for s in range(3)] + \
             [_payload(kind, 333, 9)]
    frags, dlens = dev.encode_blocks(blocks)
    assert dlens == [len(b) for b in blocks]
    for frag, blk in zip(frags, blocks):
        assert native.snappy_uncompress(_varint(len(blk)) + frag) == blk
    # concatenation is one valid element stream (container invariant)
    total = b"".join(blocks)
    stream = _varint(len(total)) + b"".join(frags)
    assert native.snappy_uncompress(stream) == total


@pytest.mark.parametrize("kind", KINDS)
def test_device_decode_roundtrip(kind):
    blocks = [_payload(kind, B, s) for s in range(3)]
    frags, dlens = dev.encode_blocks(blocks)
    out = dev.decode_blocks(frags, dlens, B)
    assert out == blocks


@pytest.mark.parametrize("kind", KINDS)
def test_device_decodes_host_streams(kind):
    """Device decoder must handle oracle-encoded streams (incl. the copy-1
    short form the host encoder prefers)."""
    blocks = [_payload(kind, B, s) for s in range(3)]
    frags = []
    for b in blocks:
        c = native.snappy_compress(b)
        # strip varint preamble
        i = 0
        while c[i] & 0x80:
            i += 1
        frags.append(c[i + 1:])
    out = dev.decode_blocks(frags, [len(b) for b in blocks], B)
    assert out == blocks


@pytest.mark.parametrize("accel", [2, 3])
def test_device_grid_mode(accel):
    blocks = [_payload("text", 4096, s) for s in range(2)]
    frags, dlens = dev.encode_blocks(blocks, accel)
    for frag, blk in zip(frags, blocks):
        assert native.snappy_uncompress(_varint(len(blk)) + frag) == blk


def test_long_matches_split_like_reference():
    """Runs force the EmitCopy splitting path (64/60/final)."""
    for n in (64, 65, 67, 68, 131, 132, 200, 1000):
        blk = b"x" * n + b"tail of literals"
        frags, dlens = dev.encode_blocks([blk])
        assert native.snappy_uncompress(_varint(len(blk)) + frags[0]) == blk
        assert dev.decode_blocks(frags, [len(blk)], 1024) == [blk]


def test_flagged_block_host_fallback():
    """A >256-byte literal run followed by a minimum-length match needs
    more element-header bytes than the match has spares — the sort-emit
    cannot serialize it in place, so the encoder must FLAG the block and
    encode_blocks must fall back to the host oracle (same contract as
    lz4_device._emit_sorted). Construction found by sweep: 256 distinct
    bytes + filler, then a tile-aligned 4-byte match pair."""
    import numpy as np
    import jax.numpy as jnp

    rng = random.Random(7)
    nprng = __import__("numpy").random.default_rng(0)
    pre = bytes(nprng.permutation(np.arange(256, dtype=np.uint8))) + bytes(
        rng.randrange(256) for _ in range(50))
    blk = bytearray(pre)
    while (len(blk) + 4) % 1:
        blk.append(rng.randrange(256))
    blk += b"wxyz" + b"\x00"
    blk += b"wxyz" + b"\xff"
    blk += bytes(rng.randrange(256) for _ in range(32))
    blk = bytes(blk)

    BB = dev._bucket(len(blk))
    enc = dev.make_encoder(BB, 4)
    arr = np.zeros((1, BB), np.uint8)
    arr[0, : len(blk)] = np.frombuffer(blk, np.uint8)
    _, _, _, flags = enc(jnp.asarray(arr),
                         jnp.asarray([len(blk)], dtype=np.int32))
    assert bool(np.asarray(flags)[0]), "expected the flag path to fire"

    # the public batch API must round-trip it regardless (host fallback)
    frags, dlens = dev.encode_blocks([blk], accel=2)
    got = native.snappy_uncompress(_varint(len(blk)) + frags[0])
    assert got == blk
