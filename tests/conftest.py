"""Test configuration.

Device tests run on a virtual 8-device CPU mesh (the real environment has a
single TPU chip; multi-chip sharding is validated exactly the way the driver
does it — xla_force_host_platform_device_count). Must be set before jax
imports anywhere.
"""

import os
import random

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the (tunneled) TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's TPU relay force-registers itself ahead of JAX_PLATFORMS;
# pin the config explicitly so tests really run on the virtual CPU mesh.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass
# The general suite pins the host tier so codec tests stay fast; device-tier
# tests opt in explicitly with small block sizes (test_device_lz4.py).
os.environ.setdefault("AOCL_ENABLE_INSTRUCTIONS", "HOST")

import pytest  # noqa: E402


def _text_like(n: int, seed: int = 0) -> bytes:
    """English-ish compressible data (Silesia stand-in; no corpus download
    in this environment)."""
    rng = random.Random(seed)
    words = [b"the", b"compression", b"of", b"data", b"streams", b"requires",
             b"finding", b"repeated", b"patterns", b"within", b"a", b"window",
             b"hash", b"match", b"literal", b"entropy", b"block", b"frame"]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words) + b" "
        if rng.random() < 0.05:
            out += b"\n"
    return bytes(out[:n])


def _binary_like(n: int, seed: int = 1) -> bytes:
    """Struct-ish binary: repetitive records with noisy fields."""
    rng = random.Random(seed)
    rec = bytearray(rng.randrange(256) for _ in range(64))
    out = bytearray()
    i = 0
    while len(out) < n:
        r = bytearray(rec)
        r[i % 64] = rng.randrange(256)
        out += r
        i += 1
    return bytes(out[:n])


@pytest.fixture(scope="session")
def corpus_text():
    """Factory for big text-like payloads (MT fan-out tests need >=1 MiB)."""
    cache = {}

    def make(n: int) -> bytes:
        if n not in cache:
            base = _text_like(min(n, 1 << 20), seed=7)
            cache[n] = (base * (n // len(base) + 1))[:n]
        return cache[n]

    return make


@pytest.fixture(scope="session")
def corpus():
    """Dict of named test payloads covering the reference's corpus axes."""
    rng = random.Random(42)
    return {
        "empty": b"",
        "one": b"x",
        "tiny": b"hello world",
        "runs": b"a" * 10000,
        "period2": b"ab" * 50000,
        "text_64k": _text_like(1 << 16),
        "text_300k": _text_like(300 * 1000, seed=3),
        "binary_200k": _binary_like(200 * 1000),
        "random_100k": bytes(rng.randrange(256) for _ in range(100 * 1000)),
        "mixed": (_text_like(70000) + bytes(rng.randrange(256)
                  for _ in range(30000)) + b"z" * 50000),
    }


ALL_CODECS = ["lz4", "lz4hc", "snappy", "zlib", "zstd", "bzip2", "lzma"]
