"""Device INFLATE tests (ops/inflate_device.py).

Stock zlib and the own C++ deflate are the stream sources; the device
tier must decode static- and dynamic-Huffman single-block streams
bit-exactly, stop at the first EOB (so sync-flush trailers and
multi-block continuations fall back via the dlen-mismatch gate), and
reject stored-first/corrupt chunks to the host planner-side. The RAP
container entry (AOCL_DEVICE_DECODE=1) must be transparent."""

import random
import zlib

import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.ops import inflate_device as INF
from aocl_compression_tpu.runtime import native


def _payload(kind: str, n: int, seed: int = 0) -> bytes:
    rng = random.Random(seed)
    if kind == "text":
        words = [b"decode ", b"stream ", b"the ", b"block ", b"huffman "]
        out = bytearray()
        while len(out) < n:
            out += rng.choice(words)
        return bytes(out[:n])
    if kind == "rle":
        return b"z" * n
    if kind == "periodic":
        return (b"abcxyz" * (n // 6 + 1))[:n]
    if kind == "random":
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == "mixed":
        return (_payload("text", n // 2, seed)
                + _payload("random", n - n // 2, seed + 1))
    raise ValueError(kind)


KINDS = ["text", "rle", "periodic", "mixed"]


def _raw(data: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("level", [1, 6, 9])
def test_decodes_stock_streams(kind, level):
    data = _payload(kind, 30000, seed=level)
    out = INF.decode_chunks([_raw(data, level)], [len(data)])
    assert out[0] == data


def test_decodes_own_deflate_chunks():
    # the exact chunks the zlib codec's RAP path produces (sync-flushed)
    from aocl_compression_tpu.codecs.zlib_bzip2_lzma import (
        _zlib_compress_blocks_host)
    blocks = [_payload(k, 20000, seed=3) for k in KINDS]
    frags, dlens = _zlib_compress_blocks_host(blocks, 6)
    out = INF.decode_chunks(list(frags), dlens)
    assert out == blocks


def test_decodes_device_encoded_chunks():
    # device static (L1) and dynamic (L2) encoder output round-trips
    from aocl_compression_tpu.ops import deflate_device
    blocks = [_payload("text", 16000, seed=9),
              _payload("mixed", 16000, seed=10)]
    for enc in (deflate_device.encode_blocks,
                deflate_device.encode_blocks_dyn):
        frags, dlens = enc(blocks, accel=2)
        out = INF.decode_chunks(list(frags), dlens)
        assert out == blocks


def test_sync_flush_trailer_ignored():
    data = _payload("text", 20000, seed=4)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = co.compress(data) + co.flush(zlib.Z_SYNC_FLUSH)
    out = INF.decode_chunks([raw], [len(data)])
    assert out[0] == data


def test_multiblock_falls_back_to_host():
    # force multi-block: two full-flush halves in one chunk region —
    # the device decodes only the first block, dlen mismatches, and the
    # host re-decode must kick in
    a = _payload("text", 9000, seed=5)
    b = _payload("mixed", 9000, seed=6)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    raw = (co.compress(a) + co.flush(zlib.Z_FULL_FLUSH)
           + co.compress(b) + co.flush())
    calls = []

    def spy(c, d):
        calls.append(d)
        return native.inflate(c, d, raw=True)

    out = INF.decode_chunks([raw], [len(a) + len(b)], _host_one=spy)
    assert out[0] == a + b
    assert calls, "expected the multi-block chunk to fall back"


def test_stored_first_goes_to_host():
    data = _payload("random", 5000, seed=7)
    raw = _raw(data, 6)  # incompressible: stored block
    calls = []

    def spy(c, d):
        calls.append(d)
        return native.inflate(c, d, raw=True)

    out = INF.decode_chunks([raw], [len(data)], _host_one=spy)
    assert out[0] == data


def test_planner_rejects_garbage():
    import ctypes
    import numpy as np
    lib = native.get_lib()
    ll = np.zeros(288, np.uint8)
    dl = np.zeros(32, np.uint8)
    boff = ctypes.c_int64()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for bad in (b"\x07\xff\xff\xff\xff", b"\x06", b""):
        src = np.frombuffer(bad + b"\x00" * 8, np.uint8)
        r = lib.atpu_inflate_plan(
            src.ctypes.data_as(u8p), len(bad), ll.ctypes.data_as(u8p),
            dl.ctypes.data_as(u8p), ctypes.byref(boff))
        assert r <= 0


def test_mutated_streams_never_crash():
    # corrupt single-block streams: device output is garbage, the gate
    # or the caller's checksum catches it — but nothing may raise except
    # via the host fallback's own error path
    rng = random.Random(11)
    data = _payload("text", 8000, seed=8)
    raw = bytearray(_raw(data, 9))
    for _ in range(12):
        m = bytes(raw)
        pos = rng.randrange(len(m))
        m = m[:pos] + bytes([m[pos] ^ (1 << rng.randrange(8))]) \
            + m[pos + 1:]
        try:
            INF.decode_chunks([m], [len(data)])
        except ValueError:
            pass  # host fallback rejecting the corrupt stream is fine


def test_unified_api_rap_device_decode(monkeypatch):
    # AOCL_DEVICE_DECODE opts decompress_blocks onto the XLA tier; the
    # stream must still decode bit-exactly through the public API
    monkeypatch.setenv("AOCL_DEVICE_DECODE", "1")
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "MESH")
    from aocl_compression_tpu.utils import dispatch
    data = _payload("mixed", 150000, seed=12)
    h = actpu.setup("zlib", level=6, block_size=1 << 16)
    c = actpu.compress(h, data)
    dispatch.enable_audit(True)
    try:
        assert actpu.decompress(h, c, expected_size=len(data)) == data
        hits = dispatch.audit_hits()
        assert any("zlib_decompress_blocks_xla" in h for h in hits), hits
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)


def test_large_block_gate():
    with pytest.raises(ValueError):
        INF.decode_chunks([b"x"], [1 << 20])
