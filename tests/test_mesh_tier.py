"""Mesh tier behind the unified API (VERDICT round-2 item 4).

The reference routes MT through the same public entry points
(algos/lz4/lz4.c:2655, threads/threads.c:46); here setup(num_shards=N)
routes compress through the shard_map mesh encoder, audited, and the
AOCL_ENABLE_INSTRUCTIONS cap can block the mesh tier.
"""

import numpy as np
import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.utils import dispatch
from aocl_compression_tpu.utils.config import TIER_XLA


def _payload(n, seed=3):
    rng = np.random.default_rng(seed)
    words = [b"the mesh ", b"shard ", b"of blocks ", b"compression "]
    parts, m = [], 0
    while m < n:
        w = words[rng.integers(0, len(words))]
        parts.append(w)
        m += len(w)
    return b"".join(parts)[:n]


def test_num_shards_routes_to_mesh(monkeypatch):
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "MESH")
    data = _payload(64 * 1024)
    h = actpu.setup("lz4", num_shards=4, opt_var=2, block_size=4096)
    try:
        dispatch.enable_audit(True)
        c = actpu.compress(h, data)
        hits = dispatch.audit_hits()
        assert "lz4_compress_blocks_mesh" in hits, hits
        assert actpu.decompress(h, c, len(data)) == data
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)


def test_mesh_stream_equals_xla_stream(monkeypatch):
    """Mesh sharding must not change the bytes (same encoder config)."""
    data = _payload(64 * 1024, seed=9)
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "MESH")
    h1 = actpu.setup("lz4", num_shards=4, opt_var=2, block_size=4096)
    c_mesh = actpu.compress(h1, data)
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    h2 = actpu.setup("lz4", opt_var=2, block_size=4096)
    c_xla = actpu.compress(h2, data)
    assert c_mesh == c_xla


def test_env_cap_blocks_mesh_tier(monkeypatch):
    """AOCL_ENABLE_INSTRUCTIONS=XLA must keep the mesh tier from running —
    the audit would catch a violation (reference F10 semantics)."""
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    data = _payload(32 * 1024)
    h = actpu.setup("lz4", num_shards=4, opt_var=2, block_size=4096)
    try:
        dispatch.enable_audit(True)
        c = actpu.compress(h, data)
        hits = dispatch.audit_hits()
        assert "lz4_compress_blocks_mesh" not in hits
        assert dispatch.validate_tier_access(TIER_XLA)
        assert actpu.decompress(h, c, len(data)) == data
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)


def test_mem_limit_batches_dispatches(monkeypatch):
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    data = _payload(96 * 1024)
    h = actpu.setup("lz4", opt_var=2, block_size=8192, mem_limit=32 * 1024)
    try:
        c = actpu.compress(h, data)
        assert actpu.decompress(h, c, len(data)) == data
        h2 = actpu.setup("lz4", opt_var=2, block_size=8192)
        assert c == actpu.compress(h2, data)  # batching must not change bytes
    finally:
        actpu.destroy(h)


def test_pallas_tier_cap_on_fetch(monkeypatch):
    """The chunk compactor is a real PALLAS-tier entry: capping at XLA must
    route fetch through the pure-XLA compactor."""
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    from aocl_compression_tpu.ops import lz4_device
    dispatch.enable_audit(True)
    try:
        bodies, tails = lz4_device.encode_blocks([_payload(8192)], accel=2)
        hits = dispatch.audit_hits()
        assert "fetch_chunks_xla" in hits
        assert "fetch_chunks_pallas" not in hits
    finally:
        dispatch.enable_audit(False)


@pytest.mark.parametrize("codec,kw,variant", [
    ("snappy", dict(num_shards=4, block_size=1 << 14),
     "snappy_compress_blocks_mesh"),
    ("zlib", dict(num_shards=4, level=1, block_size=1 << 14),
     "zlib_compress_blocks_mesh"),
    ("zstd", dict(num_shards=4, level=1, block_size=1 << 14),
     "zstd_compress_blocks_mesh"),
])
def test_mesh_tier_other_codecs(codec, kw, variant, monkeypatch):
    """Reference parity: MT compress behind the same public entry points
    for zlib/zstd/snappy too (compress2, ZSTD_compress_advanced,
    RawCompress MT paths). num_shards must visibly route to the mesh
    variant and the stream must round-trip."""
    monkeypatch.delenv("AOCL_ENABLE_INSTRUCTIONS", raising=False)
    data = _payload(96 * 1024)
    h = actpu.setup(codec, **kw)
    dispatch.enable_audit(True)
    try:
        c = actpu.compress(h, data)
        hits = dispatch.audit_hits()
    finally:
        dispatch.enable_audit(False)
    try:
        assert actpu.decompress(h, c, len(data)) == data
        assert variant in hits, hits
    finally:
        actpu.destroy(h)


@pytest.mark.parametrize("codec,kw", [
    ("snappy", dict(num_shards=4, opt_var=2, block_size=1 << 14)),
    ("zstd", dict(num_shards=4, level=1, block_size=1 << 14)),
])
def test_mesh_tier_streams_match_xla(codec, kw, monkeypatch):
    """Sharding must not change the bytes: mesh output == XLA-tier output
    (same kernels, same block split)."""
    monkeypatch.delenv("AOCL_ENABLE_INSTRUCTIONS", raising=False)
    data = _payload(96 * 1024, seed=7)
    h1 = actpu.setup(codec, **kw)
    kw2 = {k: v for k, v in kw.items() if k != "num_shards"}
    kw2["opt_var"] = 2
    h2 = actpu.setup(codec, **kw2)
    try:
        assert actpu.compress(h1, data) == actpu.compress(h2, data)
    finally:
        actpu.destroy(h1)
        actpu.destroy(h2)
