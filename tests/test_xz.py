"""The .xz container (codecs/xz.py) — the reference's experimental
xz-utils shim, own implementation: interop with CPython lzma FORMAT_XZ
in both directions, corruption detection, edge shapes."""

import lzma as stock

import numpy as np
import pytest

from aocl_compression_tpu import native_api
from aocl_compression_tpu.codecs import xz


PAYLOADS = [
    b"",
    b"q",
    b"the xz container " * 2000,
    bytes(range(256)) * 300,
    np.random.default_rng(3).integers(0, 256, 130000,
                                      dtype=np.uint8).tobytes(),
]


@pytest.mark.parametrize("i", range(len(PAYLOADS)))
def test_own_encode_stock_decode(i):
    data = PAYLOADS[i]
    c = xz.xz_compress(data, 6)
    assert stock.decompress(c, format=stock.FORMAT_XZ) == data


@pytest.mark.parametrize("i", range(len(PAYLOADS)))
def test_stock_encode_own_decode(i):
    data = PAYLOADS[i]
    c = stock.compress(data, format=stock.FORMAT_XZ, preset=3)
    assert xz.xz_decompress(c) == data


@pytest.mark.parametrize("i", range(len(PAYLOADS)))
def test_own_roundtrip(i):
    data = PAYLOADS[i]
    assert xz.xz_decompress(xz.xz_compress(data, 1)) == data


def test_native_api_names():
    data = b"shim names " * 500
    c = native_api.lzma_easy_buffer_encode(data, 6)
    assert native_api.lzma_stream_buffer_decode(c) == data
    assert stock.decompress(c) == data


def test_corruption_detected():
    data = b"corrupt me " * 1000
    c = bytearray(xz.xz_compress(data, 6))
    c[40] ^= 0x55  # inside the LZMA2 payload
    with pytest.raises(ValueError):
        xz.xz_decompress(bytes(c))
    c2 = bytearray(xz.xz_compress(data, 6))
    c2[7] ^= 1  # stream flags
    with pytest.raises(ValueError):
        xz.xz_decompress(bytes(c2))


def test_check_none_stream_accepted():
    data = b"no check " * 400
    c = stock.compress(data, format=stock.FORMAT_XZ, check=stock.CHECK_NONE)
    assert xz.xz_decompress(c) == data


def test_mutation_never_crashes():
    """Mutated .xz streams must raise ValueError (or decode to different
    bytes) — never crash the process."""
    rng = np.random.default_rng(8)
    base = xz.xz_compress(b"mutation target " * 500, 6)
    for _ in range(200):
        m = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        try:
            xz.xz_decompress(bytes(m))
        except (ValueError, IndexError, struct.error):
            pass


import struct  # noqa: E402  (used by the mutation test)


def test_stock_multichunk_dependent_dictionary():
    """Stock xz of > 2 MiB input produces LZMA2 continuation chunks with
    dependent dictionary + carried probability state — the stateful C
    context must decode them."""
    rng = np.random.default_rng(21)
    words = [b"dependent ", b"dictionary ", b"chunks ", b"stream "]
    parts = []
    tot = 0
    while tot < (5 << 20):
        w = words[int(rng.integers(0, len(words)))]
        parts.append(w)
        tot += len(w)
    data = b"".join(parts)[: 5 << 20]
    c = stock.compress(data, format=stock.FORMAT_XZ, preset=1)
    assert xz.xz_decompress(c) == data


def test_multiblock_random_access():
    """block_size splits into independent xz blocks (the `xz -T` layout):
    stock decodes the whole stream; the index gives RAP-style random
    access to any single block."""
    rng = np.random.default_rng(33)
    data = (b"block parallel xz " * 40000)[: 600000]
    c = xz.xz_compress(data, 3, block_size=200000)
    assert stock.decompress(c, format=stock.FORMAT_XZ) == data
    assert xz.xz_decompress(c) == data
    idx = xz.xz_index(c)
    assert len(idx) == 3
    assert [u for _, _, u in idx] == [200000, 200000, 200000]
    for k, (off, _, usize) in enumerate(idx):
        assert xz.xz_decompress_block(c, off) == \
            data[k * 200000:(k + 1) * 200000]


def test_index_on_stock_stream():
    data = b"stock index " * 5000
    c = stock.compress(data, format=stock.FORMAT_XZ, preset=2)
    idx = xz.xz_index(c)
    assert sum(u for _, _, u in idx) == len(data)
