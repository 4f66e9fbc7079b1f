"""Randomized property sweep: random payload shapes x random handle knobs
must always round-trip through the unified API. Complements the directed
tests — interaction bugs (block size x level x tier x RAP) show up here.
Seeded: failures are reproducible.
"""

import numpy as np
import pytest

import aocl_compression_tpu as actpu
from tests.conftest import ALL_CODECS


def _payload(rng):
    kind = rng.integers(0, 5)
    n = int(rng.integers(1, 200000))
    if kind == 0:      # random
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 1:      # runs
        parts = []
        tot = 0
        while tot < n:
            b = bytes([int(rng.integers(0, 4))]) * int(rng.integers(1, 500))
            parts.append(b)
            tot += len(b)
        return b"".join(parts)[:n]
    if kind == 2:      # periodic
        period = rng.integers(0, 256, int(rng.integers(1, 100)),
                              dtype=np.uint8).tobytes()
        return (period * (n // len(period) + 1))[:n]
    if kind == 3:      # text-like
        words = [b"alpha ", b"beta ", b"gamma1 ", b"\xc3\xa9t\xc3\xa9 "]
        parts = []
        tot = 0
        while tot < n:
            w = words[int(rng.integers(0, len(words)))]
            parts.append(w)
            tot += len(w)
        return b"".join(parts)[:n]
    # mixed
    half = n // 2
    return (_payload_fixed(rng, 0, half) + _payload_fixed(rng, 2, n - half))


def _payload_fixed(rng, kind, n):
    if n <= 0:
        return b""
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    period = rng.integers(0, 256, 37, dtype=np.uint8).tobytes()
    return (period * (n // 37 + 1))[:n]


def _knobs(rng, codec):
    kw = {}
    if rng.random() < 0.5:
        kw["level"] = int(rng.integers(-1, 15))
    if rng.random() < 0.4:
        kw["block_size"] = int(rng.integers(1, 5)) * 16384
    if rng.random() < 0.3:
        kw["opt_var"] = int(rng.integers(0, 4))
    if rng.random() < 0.2:
        kw["enable_rap"] = bool(rng.integers(0, 2))
    if rng.random() < 0.2:
        kw["opt_off"] = True
    if rng.random() < 0.15:
        kw["num_shards"] = int(rng.integers(1, 5))
    return kw


@pytest.mark.parametrize("seed", range(6))
def test_property_roundtrips(seed):
    rng = np.random.default_rng(1000 + seed)
    for trial in range(10):
        data = _payload(rng)
        codec = ALL_CODECS[int(rng.integers(0, len(ALL_CODECS)))]
        kw = _knobs(rng, codec)
        h = actpu.setup(codec, **kw)
        try:
            c = actpu.compress(h, data)
            out = actpu.decompress(h, c, expected_size=len(data))
            assert out == data, (
                f"seed={seed} trial={trial} codec={codec} kw={kw} "
                f"len={len(data)}")
        finally:
            actpu.destroy(h)
