"""Unit tests for the device stream compactor (ops/compact.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from aocl_compression_tpu.ops import compact


def _mk(N, OUTCAP, seed=0):
    rng = np.random.default_rng(seed)
    bodies = rng.integers(0, 256, (N, OUTCAP), dtype=np.uint8)
    sizes = rng.integers(0, OUTCAP + 1, N).astype(np.int32)
    return bodies, sizes


@pytest.mark.parametrize("N,OUTCAP", [(4, 512), (8, 1024), (3, 2048)])
def test_fetch_chunks_exact(N, OUTCAP):
    bodies, sizes = _mk(N, OUTCAP)
    chunks = compact.fetch_chunks(jnp.asarray(bodies), jnp.asarray(sizes))
    assert len(chunks) == N
    for i in range(N):
        assert chunks[i] == bodies[i, :sizes[i]].tobytes()


def test_zero_and_full_sizes():
    bodies, _ = _mk(4, 512, seed=1)
    sizes = np.array([0, 512, 0, 77], np.int32)
    chunks = compact.fetch_chunks(jnp.asarray(bodies), jnp.asarray(sizes))
    assert chunks[0] == b"" and chunks[2] == b""
    assert chunks[1] == bodies[1].tobytes()
    assert chunks[3] == bodies[3, :77].tobytes()


def test_round_capacity():
    assert compact.round_capacity(1) == 512
    assert compact.round_capacity(512) == 512
    assert compact.round_capacity(513) == 1024


def test_unaligned_capacity_rejected():
    bodies = jnp.zeros((2, 500), jnp.uint8)
    with pytest.raises(AssertionError):
        compact.fetch_chunks(bodies, jnp.asarray(np.array([1, 2], np.int32)))
