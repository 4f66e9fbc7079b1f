"""Regression tests for the round-1 advisor findings (ADVICE.md).

- Device pipelines pack positions/offsets into 16 bits; blocks > 64 KiB must
  round-trip correctly via host fallback, never corrupt silently.
- Device decode is opt-in (honest tiering); RAP decode routes to host.
- lz4 frame decoder rejects dictionary-linked frames and reserved bits.
- zlib RAP decompress verifies the adler32 trailer.
"""

import struct
import zlib

import numpy as np
import pytest

import aocl_compression_tpu as actpu
from aocl_compression_tpu.ops import lz4_device
from aocl_compression_tpu.utils.config import TIER_XLA


def _payload(n, seed=7):
    rng = np.random.default_rng(seed)
    words = [b"match ", b"the data ", b"block entropy ", b"stream "]
    parts, m = [], 0
    while m < n:
        w = words[rng.integers(0, len(words))]
        parts.append(w)
        m += len(w)
    return b"".join(parts)[:n]


@pytest.mark.parametrize("codec", ["lz4", "lz4hc", "snappy", "zlib", "zstd"])
def test_large_block_roundtrip_65537(codec):
    """ADVICE high: block_size just past the 64 KiB device limit must not
    corrupt — the XLA-tier wrappers fall back to the host implementation."""
    data = _payload(3 * 65537)
    h = actpu.setup(codec, block_size=131072, opt_var=2)
    try:
        comp = actpu.compress(h, data)
        out = actpu.decompress(h, comp, len(data))
    finally:
        actpu.destroy(h)
    assert out == data


def test_encode_blocks_raises_above_64k():
    with pytest.raises(ValueError, match="64 KiB"):
        lz4_device.encode_blocks([b"x" * 70000])


def test_decode_blocks_raises_above_64k():
    with pytest.raises(ValueError, match="64 KiB"):
        lz4_device.decode_blocks([b"\x00" * 10], [70000], 131072)


def test_device_decode_gated_by_default(monkeypatch):
    """RAP decode must hit the host decoder unless AOCL_DEVICE_DECODE is
    set: the device resolve path is audited."""
    from aocl_compression_tpu.utils import dispatch
    monkeypatch.delenv("AOCL_DEVICE_DECODE", raising=False)
    data = _payload(200_000)
    h = actpu.setup("lz4", opt_var=2)
    try:
        comp = actpu.compress(h, data)
        dispatch.enable_audit(True)
        out = actpu.decompress(h, comp, len(data))
        hits = dispatch.audit_hits()
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)
    assert out == data
    assert "lz4_decompress_blocks_host" in hits
    assert "lz4_decompress_blocks_xla" not in hits


def test_device_decode_env_opt_in(monkeypatch):
    monkeypatch.setenv("AOCL_DEVICE_DECODE", "1")
    monkeypatch.setenv("AOCL_ENABLE_INSTRUCTIONS", "XLA")
    from aocl_compression_tpu.utils import dispatch
    data = _payload(150_000)
    h = actpu.setup("lz4", opt_var=2)
    try:
        comp = actpu.compress(h, data)
        dispatch.enable_audit(True)
        out = actpu.decompress(h, comp, len(data))
        hits = dispatch.audit_hits()
    finally:
        dispatch.enable_audit(False)
        actpu.destroy(h)
    assert out == data
    assert "lz4_decompress_blocks_xla" in hits


def test_lz4_frame_rejects_dictionary_flag():
    from aocl_compression_tpu.codecs import lz4_frame
    frame = bytearray(lz4_frame.compress_frame(b"hello world " * 10))
    frame[4] |= 1  # set the DictID FLG bit
    # fix the header checksum so only the dict bit is the difference
    desc = bytes(frame[4:6]) + b"\x00\x00\x00\x00"
    frame = frame[:4] + desc[:2] + b"\x00\x00\x00\x00" + \
        bytes([lz4_frame._hc(desc)]) + frame[7:]
    with pytest.raises(ValueError, match="dictionary"):
        lz4_frame.decompress_frame(bytes(frame))


def test_lz4_frame_rejects_reserved_bits():
    from aocl_compression_tpu.codecs import lz4_frame
    frame = bytearray(lz4_frame.compress_frame(b"hello world " * 10))
    frame[4] |= 2  # reserved FLG bit 1
    desc = bytes(frame[4:6])
    frame[6] = lz4_frame._hc(desc)
    with pytest.raises(ValueError, match="reserved"):
        lz4_frame.decompress_frame(bytes(frame))


def test_zlib_rap_adler32_detects_corruption():
    """ADVICE low: any single-byte corruption of a RAP-framed zlib stream
    must either raise or still decode to the exact original — silently
    wrong output is no longer possible now the adler32 trailer is checked."""
    data = _payload(300_000)
    h = actpu.setup("zlib", level=1, block_size=65536)
    try:
        comp = bytes(actpu.compress(h, data))
        # the trailer check itself: flipping an adler byte must raise
        bad = bytearray(comp)
        bad[-1] ^= 0xFF
        with pytest.raises(Exception, match="adler32|DECOMPRESSION"):
            actpu.decompress(h, bytes(bad), len(data))
        # sweep of mid-stream corruptions: never silently wrong
        step = max(1, len(comp) // 40)
        for probe in range(len(comp) // 4, len(comp) - 8, step):
            trial = bytearray(comp)
            trial[probe] ^= 0x01
            try:
                out = actpu.decompress(h, bytes(trial), len(data))
            except Exception:
                continue  # detected: good
            assert out == data, f"undetected corruption at byte {probe}"
    finally:
        actpu.destroy(h)
