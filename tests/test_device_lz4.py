"""Device LZ4 pipeline tests (CPU backend, virtual devices, small blocks).

Cross-checks the fully parallel encoder/decoder (ops/lz4_device.py) against
the C++ host oracle (csrc/lz4_host.cpp) — the reference's
optimized-vs-reference-path oracle strategy (SURVEY.md §4)."""

import os
import random

import numpy as np
import pytest

from aocl_compression_tpu.codecs import lz4_stitch
from aocl_compression_tpu.ops import lz4_device as dev
from aocl_compression_tpu.runtime import native

B = 1024  # small blocks keep CPU-backend compiles fast


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


@pytest.mark.parametrize("kind", KINDS)
def test_device_encode_oracle_decodes(kind):
    blocks = [_payload(kind, B, s) for s in range(3)] + \
             [_payload(kind, 333, 9)]
    bodies, tails = dev.encode_blocks(blocks)
    chunks, dlens = lz4_stitch.stitch_bodies(bodies, tails, blocks)
    total = b"".join(blocks)
    assert sum(dlens) == len(total)
    # serial C++ oracle must decode the stitched concatenation
    assert native.lz4_decompress(b"".join(chunks), len(total)) == total


@pytest.mark.parametrize("kind", KINDS)
def test_device_decode_roundtrip(kind):
    blocks = [_payload(kind, B, s) for s in range(3)]
    bodies, tails = dev.encode_blocks(blocks)
    chunks, dlens = lz4_stitch.stitch_bodies(bodies, tails, blocks)
    total = b"".join(blocks)
    outs = dev.decode_blocks(chunks, dlens, B)
    assert b"".join(outs) == total


def test_device_decodes_host_streams():
    """Device decoder on host-compressed chunks (cross-implementation)."""
    blocks = [_payload("text", B, s) for s in range(4)]
    frags = [native.lz4_compress_tail(b) for b in blocks]
    chunks, dlens = lz4_stitch.stitch(frags, blocks)
    outs = dev.decode_blocks(chunks, dlens, B)
    assert b"".join(outs) == b"".join(blocks)


def test_host_decodes_device_streams():
    """Host decoder on device-compressed chunks (the reverse)."""
    blocks = [_payload("mixed", B, s) for s in range(4)]
    bodies, tails = dev.encode_blocks(blocks)
    chunks, dlens = lz4_stitch.stitch_bodies(bodies, tails, blocks)
    pos = 0
    total = b"".join(blocks)
    for ch, d in zip(chunks, dlens):
        if d:
            assert native.lz4_decompress(ch, d) == total[pos:pos + d]
        pos += d


def test_device_tier_through_unified_api():
    import aocl_compression_tpu as actpu
    os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "XLA"
    try:
        data = _payload("text", 4 * B, 1)
        h = actpu.setup("lz4", block_size=B)
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c) == data
        # and the host tier can decode the same stream
        os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "HOST"
        assert actpu.decompress(h, c) == data
    finally:
        os.environ["AOCL_ENABLE_INSTRUCTIONS"] = "HOST"


def test_dryrun_multichip_8():
    """The driver's multi-chip validation path on the 8-device CPU mesh."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    assert out[0].dtype == np.uint8


def test_lz4hc_device_tier_unified_api():
    """HC device tier (depth-K matcher) through the unified API."""
    import aocl_compression_tpu as actpu
    data = (_payload("text", 30000, 5) + _payload("periodic", 10000)
            + _payload("random", 8000, 6))
    h = actpu.setup("lz4hc", level=9, opt_var=2, block_size=4096, max_tier=1)
    c = actpu.compress(h, data)
    assert actpu.decompress(h, c, expected_size=len(data)) == data
    # serial interop after RAP skip
    from aocl_compression_tpu.parallel import container
    assert native.lz4_decompress(container.skip_rap_frame(c),
                                 len(data)) == data


@pytest.mark.parametrize("kind", KINDS)
def test_extension_ladder_oracle_decodes(kind):
    """The saturated-match extension ladder (r5 primary config: matches
    chain past the 4+4*nw hash cap by pointer doubling) must emit streams
    the serial C++ oracle decodes, and never worse than the unextended
    parse."""
    blocks = [_payload(kind, B, s) for s in range(2)]
    # a long far match that only the ladder can express: 400-byte repeat
    # at offset ~500 (past SMALL_OFFSETS, far past the 24-byte hash cap)
    rng = random.Random(7)
    seg = bytes(rng.randrange(256) for _ in range(400))
    blocks.append((seg + _payload("text", 120, 3) + seg + seg)[:B])
    enc = dev.make_encoder(B, 8, 5, 5, subm=64, lazy=1, ext_passes=5)
    enc0 = dev.make_encoder(B, 8, 5, 5, subm=64, lazy=1)
    import jax.numpy as jnp
    arr = np.zeros((len(blocks), B), dtype=np.uint8)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    lens = np.full(len(blocks), B, dtype=np.int32)
    from aocl_compression_tpu.ops import compact
    for e, tag in ((enc, "ext"), (enc0, "base")):
        out, sizes, tails, flags = e(jnp.asarray(arr), jnp.asarray(lens))
        assert not np.asarray(flags).any()
        bodies = compact.fetch_chunks(out, sizes)
        tls = [int(t) for t in np.asarray(tails)]
        chunks, dlens = lz4_stitch.stitch_bodies(bodies, tls, blocks)
        total = b"".join(blocks)
        assert native.lz4_decompress(b"".join(chunks), len(total)) == total
        if tag == "ext":
            ext_size = sum(int(s) for s in np.asarray(sizes))
        else:
            assert ext_size <= sum(int(s) for s in np.asarray(sizes))
