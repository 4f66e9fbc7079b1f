"""White-box tests for the device-side per-block FSE table builder
(ops/zstd_device): normalization invariants and exact equivalence of the
vectorized spread/table construction with the scalar reference
implementation (codecs/zstd_format.fse_build_encode), which is itself
validated against stock zstd in test_device_zstd.py.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from aocl_compression_tpu.codecs import zstd_format as ZF
from aocl_compression_tpu.ops import zstd_device as Z


def _rand_counts(rng, nsym, total):
    w = rng.dirichlet(np.ones(nsym) * rng.uniform(0.05, 2.0))
    c = np.floor(w * total).astype(np.int64)
    c[rng.integers(0, nsym)] += total - c.sum()
    return np.maximum(c, 0)


@pytest.mark.parametrize("L", [6, 8, 9])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_normalize_invariants(L, seed):
    rng = np.random.default_rng(seed)
    counts = np.zeros(Z._NSYM_PAD, np.int64)
    nsym = int(rng.integers(2, 54))
    counts[:nsym] = _rand_counts(rng, nsym, int(rng.integers(64, 9000)))
    norm, ok = Z._normalize_counts(jnp.asarray(counts, jnp.int32), L)
    norm = np.asarray(norm)
    assert bool(ok) == (
        norm.sum() == (1 << L)
        and (counts > 0).sum() >= 2
        and all(norm[i] >= 1 for i in range(Z._NSYM_PAD) if counts[i] > 0))
    if bool(ok):
        assert norm.sum() == 1 << L
        assert all(norm[i] == 0 for i in range(Z._NSYM_PAD)
                   if counts[i] == 0)


@pytest.mark.parametrize("L", [6, 8, 9])
@pytest.mark.parametrize("seed", [10, 11, 12])
def test_tables_match_scalar_reference(L, seed):
    """The vectorized static-visit-order construction must equal
    fse_build_encode for distributions with no lowprob (-1) entries."""
    rng = np.random.default_rng(seed)
    counts = np.zeros(Z._NSYM_PAD, np.int64)
    nsym = int(rng.integers(2, 40))
    counts[:nsym] = _rand_counts(rng, nsym, 4000)
    norm, ok = Z._normalize_counts(jnp.asarray(counts, jnp.int32), L)
    if not bool(ok):
        pytest.skip("degenerate distribution")
    norm_np = np.asarray(norm)
    maxs = max(i for i in range(Z._NSYM_PAD) if norm_np[i] > 0)
    ref_nxt, ref_tt = ZF.fse_build_encode(
        [int(v) for v in norm_np[:maxs + 1]], L)
    nxt, dnb, dfs = Z._fse_encode_tables(norm, L)
    nxt, dnb, dfs = np.asarray(nxt), np.asarray(dnb), np.asarray(dfs)
    size = 1 << L
    assert nxt[:size].tolist() == list(ref_nxt)
    for s, (rnb, rfs) in enumerate(ref_tt):
        if norm_np[s] == 0:
            continue
        assert dnb[s] == rnb, f"dnb mismatch at symbol {s}"
        assert dfs[s] == rfs, f"dfs mismatch at symbol {s}"


def test_ncount_roundtrip_via_stock():
    """A normalized distribution written with write_ncount must rebuild to
    the same table inside stock zstd — covered end-to-end by
    test_device_zstd (stock decode of device frames); here just check the
    writer accepts our normalizations."""
    rng = np.random.default_rng(5)
    counts = np.zeros(Z._NSYM_PAD, np.int64)
    counts[:20] = _rand_counts(rng, 20, 3000)
    norm, ok = Z._normalize_counts(jnp.asarray(counts, jnp.int32), 9)
    assert bool(ok)
    norm_np = np.asarray(norm)
    maxs = max(i for i in range(Z._NSYM_PAD) if norm_np[i] > 0)
    blob = ZF.write_ncount([int(v) for v in norm_np[:maxs + 1]], 9)
    assert len(blob) > 0
