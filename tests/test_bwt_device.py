"""Device BWT (forward prefix-doubling suffix ranks, inverse LF-walk
doubling) vs a naive rotation-sort oracle — the block-sort capability of
reference bzip2 (blocksort.c) as a TPU op."""

import random

import pytest

from aocl_compression_tpu.ops import bwt_device


def _naive_bwt(s: bytes):
    n = len(s)
    rots = sorted(range(n), key=lambda i: (s[i:] + s[:i]))
    L = bytes(s[(i - 1) % n] for i in rots)
    return L, rots.index(0)


CASES = [
    b"banana", b"abracadabra", b"abab", b"aaaa", b"x",
    (b"the quick brown fox " * 13)[:256],
]


@pytest.mark.parametrize("s", CASES, ids=range(len(CASES)))
def test_forward_matches_naive(s):
    assert bwt_device.bwt(s) == _naive_bwt(s)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_random(seed):
    rng = random.Random(seed)
    s = bytes(rng.randrange(256) for _ in range(512))
    L, I = bwt_device.bwt(s)
    assert bwt_device.ibwt(L, I) == s


def test_roundtrip_structured():
    s = (b"compression " * 100)[:1024]
    L, I = bwt_device.bwt(s)
    # BWT of repetitive text clusters symbols (the whole point)
    runs = sum(1 for a, b in zip(L, L[1:]) if a == b)
    assert runs > len(L) // 3
    assert bwt_device.ibwt(L, I) == s


def test_batched():
    import numpy as np
    import jax.numpy as jnp
    blocks = [bytes([i % 7 + 97]) * 64 for i in range(4)]
    blocks = [b"roundtrip me " * 5 + bytes([i]) * 15 for i in range(4)]
    n = len(blocks[0])
    fwd, inv = bwt_device.make_bwt(n)
    arr = jnp.asarray(np.stack(
        [np.frombuffer(b, np.uint8) for b in blocks]))
    L, I = fwd(arr)
    out = inv(L, I)
    assert [bytes(np.asarray(r)) for r in out] == blocks
