"""LZ4HC codec — hash-chain deep-search compressor, levels 1-12.

Capability parity: SURVEY.md §2.2 A2 (reference: /root/reference/algos/lz4/
lz4hc.c — LZ4_compress_HC :2032; decompress shared with LZ4, api/codec.h:168).

Tiers: HOST = own C++ hash-chain encoder (csrc/lz4_host.cpp
atpu_lz4hc_compress); device tier shares LZ4's decode pipeline and adds a
deeper (multi-probe) device match finder.
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..api.handle import Handle
from ..parallel import container
from ..runtime import native
from ..utils import dispatch
from ..utils.config import TIER_HOST, TIER_XLA, get_config
from . import lz4_stitch
from .base import Codec
from .lz4 import _oneshot_decompress


class Lz4hcCodec(Codec):
    name = "lz4hc"
    version = "1.9.3-tpu"
    min_level, max_level, default_level = 1, 12, 9

    def compress_bound(self, n: int) -> int:
        cfg = get_config()
        return (native.lz4_compress_bound(n)
                + native.rap_frame_bound(n, cfg.default_block_size))

    def _block_size(self, handle: Handle) -> int:
        return handle.block_size or get_config().default_block_size

    def _adapter(self, handle: Handle) -> container.BlockCodecAdapter:
        # device tier = throughput mode, engaged via opt_var (like lz4);
        # the default keeps the host hash-chain encoder's ratio semantics
        cap = handle.max_tier if handle.opt_var >= 2 else TIER_HOST
        cb, ctier = dispatch.resolve_with_tier(
            self.name, "compress_blocks", cap, handle.opt_off)
        if ctier == TIER_HOST:
            _cbh = cb
            cb = lambda blocks, lvl: _cbh(blocks, lvl,
                                          workers=handle.num_shards or None)
        # decode is LZ4's, same as the reference's shared decompressor
        from ..utils.config import device_decode_enabled
        dcap = handle.max_tier if device_decode_enabled() else TIER_HOST
        db, dtier = dispatch.resolve_with_tier(
            "lz4", "decompress_blocks", dcap, handle.opt_off)
        level = self.clamp_level(handle.level or self.default_level)
        bs = self._block_size(handle)
        if dtier == TIER_HOST:
            decompress = lambda chunks, dlens: db(
                chunks, dlens, bs, workers=handle.num_shards or None)
        else:
            decompress = lambda chunks, dlens: db(chunks, dlens, bs)
        return container.BlockCodecAdapter(
            compress_blocks=lambda blocks: cb(blocks, level),
            decompress_blocks=decompress)

    def compress(self, handle: Handle, data: bytes) -> bytes:
        rap = (handle.enable_rap if handle.enable_rap is not None
               else get_config().enable_rap and not container.st_fallback(
                   handle, handle.opt_var >= 2))
        if rap:
            out = container.compress_rapped(data, self._block_size(handle),
                                            self._adapter(handle))
            if out is not None:
                return out
        fn = dispatch.resolve(self.name, "compress", handle.max_tier,
                              handle.opt_off)
        return fn(data, self.clamp_level(handle.level or self.default_level))

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        out = container.decompress_rapped(data, self._adapter(handle))
        if out is not None:
            return out
        return _oneshot_decompress(data, expected_size)


@dispatch.register("lz4hc", "compress", TIER_HOST, "lz4hc_compress_host")
def _compress_host(data: bytes, level: int) -> bytes:
    return native.lz4hc_compress(data, level)


@dispatch.register("lz4hc", "compress_blocks", TIER_HOST,
                   "lz4hc_compress_blocks_host")
def _compress_blocks_host(blocks: Sequence[bytes], level: int, workers=None):
    from ..parallel import host_pool
    frags = host_pool.parallel_map(
        lambda b: native.lz4hc_compress_tail(b, level), blocks,
        workers=workers, total_bytes=sum(len(b) for b in blocks))
    return lz4_stitch.stitch(frags, blocks)


# --- device tier: deep-candidate matcher (ops/lz4_device.py) -----------------

@dispatch.register("lz4hc", "compress_blocks", TIER_XLA,
                   "lz4hc_compress_blocks_xla")
def _compress_blocks_xla(blocks: Sequence[bytes], level: int):
    """HC-grade device encode: the sorted-order matcher examines the
    level-scaled number of previous same-hash candidates (the hash-chain
    walk of lz4hc.c as shifted compares), exact greedy parse."""
    from ..ops import lz4_device
    if max(len(b) for b in blocks) > lz4_device.MAX_DEVICE_BLOCK:
        return _compress_blocks_host(blocks, level)  # 16-bit packing limit
    depth = min(16, max(4, level + 2))
    # high levels buy ratio: double the match-length cap (nw=32 -> 132B)
    # and one lazy-demotion step (chip-measured +0.15 ratio at L9+)
    nw = 32 if level >= 9 else 16
    lazy = 1 if level >= 4 else 0
    bodies, tails = lz4_device.encode_blocks(blocks, accel=1, depth=depth,
                                             nw=nw, lazy=lazy)
    return lz4_stitch.stitch_bodies(bodies, tails, blocks)
