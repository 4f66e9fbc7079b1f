"""ZSTD codec — the flagship entropy-coded format.

Capability parity: SURVEY.md §2.2 A7 (reference: /root/reference/algos/zstd —
level table zstd_compress.c:7311-7405, RAP-in-skippable-frame embedding
:5324-5387, MT decode zstd_decompress.c:1252-1330).

Tiers:
  HOST — own C++ encoder/decoder (csrc/zstd_encode.cpp, zstd_decode.cpp):
         levels 1-22, per-block Huffman literals + FSE sequence tables,
         dictionary support. The zstandard pip package appears only in
         tests as a cross-check oracle.
  XLA  — the device pipeline (ops/zstd_device.py) for level-1 encode.

MT/RAP layout mirrors the reference exactly: the RAP frame rides inside a
standard zstd *skippable frame* (magic 0x184D2A50, variant 0) so stock zstd
tools still decode the stream; per-chunk RAP offsets are relative to the RAP
frame start (AOCL_write_skippable_rap_frame, zstd_compress.c:5360).
Each chunk is an independent zstd frame; concatenated zstd frames are a valid
zstd stream by spec.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence

from ..api.handle import Handle
from ..parallel import container
from ..runtime import native
from ..utils import dispatch
from ..utils.config import TIER_HOST, TIER_MESH, TIER_XLA, get_config
from .base import Codec

_SKIPPABLE_MAGIC = 0x184D2A50
_SKIPPABLE_HEADER_SIZE = 8


class ZstdCodec(Codec):
    name = "zstd"
    version = "1.5.5-tpu"
    min_level, max_level, default_level = 1, 22, 3

    def compress_bound(self, n: int) -> int:
        # standard zstd bound + room for the skippable RAP frame
        bound = n + (n >> 8) + 64
        cfg = get_config()
        return (bound + _SKIPPABLE_HEADER_SIZE
                + native.rap_frame_bound(n, cfg.default_block_size))

    def _block_size(self, handle: Handle) -> int:
        # reference derives the chunk from 1<<windowLog * factor
        # (zstd_compress.c:5417-5420); our device blocks set the default.
        return handle.block_size or get_config().default_block_size

    @staticmethod
    def _device_opt_in(handle: Handle) -> bool:
        """Explicit device request (see zlib_bzip2_lzma._device_opt_in);
        without one, dispatch routes by measured speed."""
        from ..utils.config import forced_tier_from_env
        return (handle.opt_var >= 2 or handle.num_shards > 1
                or (forced_tier_from_env() or 0) > 0)

    def _tier_cap(self, handle: Handle, level: int):
        # the device pipeline is the level-1 fast strategy with per-block
        # entropy tables (deflate_quick spirit); quality levels and
        # dictionary compression keep the host ratio semantics.
        # num_shards > 1 requests the mesh tier (reference: zstd MT inside
        # ZSTD_compress_advanced, zstd_compress.c:5417).
        if level > 1 or handle.dictionary is not None:
            return TIER_HOST
        return handle.max_tier

    def _resolve_cb(self, handle: Handle, level: int):
        cap = self._tier_cap(handle, level)
        if handle.num_shards > 1 and level <= 1 \
                and handle.dictionary is None:
            cap = handle.max_tier
        cb, tier = dispatch.resolve_with_tier(
            self.name, "compress_blocks", cap, handle.opt_off,
            calibrated=not self._device_opt_in(handle))
        if tier == TIER_MESH:
            shards = handle.num_shards * max(1, handle.num_hosts)
            _cb = cb
            return lambda blocks, lvl, d: _cb(blocks, lvl, d,
                                              num_shards=shards or None)
        if tier == TIER_HOST:
            _cbh = cb
            return lambda blocks, lvl, d: _cbh(
                blocks, lvl, d, workers=handle.num_shards or None)
        return cb

    def compress(self, handle: Handle, data: bytes) -> bytes:
        level = self.clamp_level(handle.level or self.default_level)
        rap = (handle.enable_rap if handle.enable_rap is not None
               else get_config().enable_rap and not container.st_fallback(
                   handle, self._device_opt_in(handle)))
        bs = self._block_size(handle)
        if rap and len(data) >= 2 * bs:
            return self._compress_rapped(handle, data, level, bs)
        fn = dispatch.resolve(self.name, "compress",
                              self._tier_cap(handle, level), handle.opt_off,
                              calibrated=not self._device_opt_in(handle))
        return fn(data, level, handle.dictionary)

    def _compress_rapped(self, handle: Handle, data: bytes, level: int,
                         bs: int) -> bytes:
        blocks = container.split_blocks(data, bs)
        cb = self._resolve_cb(handle, level)
        chunks, dlens = cb(blocks, level, handle.dictionary)
        n = len(blocks)
        frame_len = native.rap_frame_len(n)
        offsets, lens = [], []
        pos = frame_len  # relative to RAP frame start, matching the reference
        for ch in chunks:
            offsets.append(pos)
            lens.append(len(ch))
            pos += len(ch)
        rap = native.rap_write(n, offsets, lens, dlens)
        skip_hdr = struct.pack("<II", _SKIPPABLE_MAGIC, len(rap))
        return skip_hdr + rap + b"".join(chunks)

    def decompress(self, handle: Handle, data: bytes,
                   expected_size: Optional[int] = None) -> bytes:
        # device decode rides the XLA tier only when opted in
        # (AOCL_DEVICE_DECODE / set_config(device_decode=True)) — decode
        # correctness must never depend on tier availability
        from ..utils.config import device_decode_enabled
        dcap = handle.max_tier if device_decode_enabled() else TIER_HOST
        if len(data) >= _SKIPPABLE_HEADER_SIZE:
            magic, size = struct.unpack_from("<II", data)
            if (magic & 0xFFFFFFF0) == _SKIPPABLE_MAGIC:
                body = data[_SKIPPABLE_HEADER_SIZE:]
                parsed = native.rap_parse(body)
                if parsed is not None:
                    offsets, lens, dlens = parsed
                    chunks = [bytes(body[o:o + l])
                              for o, l in zip(offsets, lens)]
                    db, dtier = dispatch.resolve_with_tier(
                        self.name, "decompress_blocks", dcap,
                        handle.opt_off)
                    kw = ({"workers": handle.num_shards or None}
                          if dtier == TIER_HOST else {})
                    return b"".join(db(chunks, [int(d) for d in dlens],
                                       handle.dictionary, **kw))
                # unknown skippable frame: stock zstd skips it; so do we
                data = data[_SKIPPABLE_HEADER_SIZE + size:]
        fn = dispatch.resolve(self.name, "decompress", dcap,
                              handle.opt_off)
        return fn(data, expected_size, handle.dictionary)


def train_dictionary(samples: Sequence[bytes], dict_size: int = 16384,
                     level: int = 3, entropy: bool = True) -> bytes:
    """Train a zstd dictionary from sample buffers — own implementation.

    Capability parity with the reference's dictBuilder (algos/zstd/lib/
    dictBuilder/ ZDICT_trainFromBuffer; COVER family): greedy selection of
    high-coverage fragments by k-gram frequency. With entropy=True
    (default) the result is the magic-headed ZDICT format — dictID,
    pre-trained literal Huffman table, FSE tables, repcodes, content —
    which both this codec and stock zstd load with full table reuse
    (Treeless_Literals / Repeat_Mode: no per-frame table headers, where
    the small-payload win lives; reference: zdict.c ZDICT_analyzeEntropy).
    entropy=False yields the bare RAW-CONTENT dictionary. The most
    frequent fragments are placed at the dictionary tail where
    back-reference offsets are shortest.
    """
    import numpy as np
    blob = b"".join(samples)
    if entropy:
        content_size = max(256, dict_size - 256)
        content = (blob if len(blob) <= content_size else
                   train_dictionary(samples, content_size, level,
                                    entropy=False))
        # stats pass: compress a sample slice against the content-only
        # dictionary and histogram the literals / sequence codes the
        # emitted streams actually used — the distributions the
        # pre-trained tables should model (zdict.c ZDICT_analyzeEntropy
        # does the same with its own compressor)
        with native.ZstdStatsCapture() as st:
            for s in samples[:256]:
                if s:
                    native.zstd_compress(s, level, content)
        import zlib as _z
        dict_id = (_z.crc32(content) | 0x80000000) & 0xFFFFFFFF
        header = native.zstd_build_dict_header(
            list(st.lit), dict_id, list(st.ll), list(st.of), list(st.ml))
        return header + content
    if len(blob) <= dict_size:
        return blob
    # fastCover-class selection (the reference's default trainer family,
    # zdict.c / fastCover.c — own vectorized expression): score k-byte
    # SEGMENTS by the global frequency of their 8-byte dmers, pick the
    # best segment per data epoch, and ZERO the chosen segment's dmer
    # frequencies so later epochs reward NEW coverage instead of
    # re-picking the same popular content. Long contiguous segments (not
    # the old 64-byte shreds) preserve the match continuity that makes a
    # dictionary actually cover small payloads — measured against the
    # stock trainer on the same samples: 64-byte shreds were +65% output
    # size; epoch segments land within a few % (MEASURED.md round-5
    # "ZDICT bar").
    a = np.frombuffer(blob, dtype=np.uint8)
    D, HB, K = 8, 20, 512
    h = np.zeros(len(a) - D + 1, dtype=np.uint64)
    for k in range(D):
        h = h * np.uint64(1099511628211) + a[k:len(a) - D + 1 + k]
    hb = (h >> np.uint64(64 - HB)).astype(np.int64)
    freq = np.bincount(hb, minlength=1 << HB).astype(np.float64)
    npos = len(hb)
    nseg_budget = max(1, dict_size // K)
    epoch = max(K, npos // nseg_budget)
    chosen = []  # (score, start)
    for e0 in range(0, max(1, npos - K + 1), epoch):
        e1 = min(npos, e0 + epoch + K - 1)
        f = freq[hb[e0:e1]]
        if len(f) < K:
            continue
        cs = np.concatenate([[0.0], np.cumsum(f)])
        w = cs[K:] - cs[:-K]
        i = int(np.argmax(w))
        start = e0 + i
        chosen.append((float(w[i]), start))
        freq[hb[start:start + K]] = 0.0
    # ascending by score: the most valuable segments land at the
    # dictionary tail where back-reference offsets are shortest
    chosen.sort()
    parts = [blob[s:s + K] for _, s in chosen]
    return b"".join(parts)[-dict_size:]


@dispatch.register("zstd", "compress", TIER_HOST, "zstd_compress_host")
def _compress_host(data: bytes, level: int, dictionary=None) -> bytes:
    # own C++ encoder (csrc/zstd_encode.cpp); the zstandard pip package
    # is no longer on any production path
    return native.zstd_compress(data, level, dictionary)


@dispatch.register("zstd", "compress_blocks", TIER_HOST,
                   "zstd_compress_blocks_host")
def _compress_blocks_host(blocks: Sequence[bytes], level: int,
                          dictionary=None, workers=None):
    # host-pool fan-out (reference MT ZSTD_compress_advanced,
    # zstd_compress.c:5417-5460)
    from ..parallel import host_pool
    frames = host_pool.parallel_map(
        lambda b: native.zstd_compress(b, level, dictionary), blocks,
        workers=workers, total_bytes=sum(len(b) for b in blocks))
    return frames, [len(b) for b in blocks]


@dispatch.register("zstd", "decompress", TIER_HOST, "zstd_decompress_host")
def _decompress_host(data: bytes, expected_size=None,
                     dictionary=None) -> bytes:
    # own C++ frame decoder (csrc/zstd_decode.cpp) — handles concatenated
    # and skippable frames, checksums, and structured/raw dictionaries
    return native.zstd_decompress(data, expected_size, dictionary)


@dispatch.register("zstd", "decompress_blocks", TIER_HOST,
                   "zstd_decompress_blocks_host")
def _decompress_blocks_host(chunks: Sequence[bytes], dlens: Sequence[int],
                            dictionary=None, workers=None) -> List[bytes]:
    # parallel per-frame fan-out — the reference's MT decode crown
    # (zstd_decompress.c:1252-1330: skippable-header fan-out to DCtxs)
    from ..parallel import host_pool
    return host_pool.parallel_map(
        lambda cd: native.zstd_decompress(cd[0], cd[1], dictionary),
        list(zip(chunks, dlens)), workers=workers,
        total_bytes=int(sum(dlens)))


# --- device tier (ops/zstd_device.py): level-1 fixed-table pipeline ----------

@dispatch.register("zstd", "compress_blocks", TIER_XLA,
                   "zstd_compress_blocks_xla")
def _compress_blocks_xla(blocks: Sequence[bytes], level: int,
                         dictionary=None):
    from ..ops import zstd_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    if max(len(b) for b in blocks) > MAX_DEVICE_BLOCK:
        return _compress_blocks_host(blocks, level, dictionary)
    return zstd_device.encode_blocks(blocks, level)


@dispatch.register("zstd", "compress", TIER_XLA, "zstd_compress_xla")
def _compress_xla(data: bytes, level: int, dictionary=None) -> bytes:
    from ..ops import zstd_device
    if len(data) < 1024:
        return _compress_host(data, level, dictionary)
    bs = get_config().default_block_size
    frames, _ = zstd_device.encode_blocks(
        container.split_blocks(data, bs), level)
    return b"".join(frames)  # concatenated frames are a valid zstd stream


@dispatch.register("zstd", "decompress_blocks", TIER_XLA,
                   "zstd_decompress_blocks_xla")
def _decompress_blocks_xla(chunks: Sequence[bytes], dlens: Sequence[int],
                           dictionary=None) -> List[bytes]:
    # device decode tier (ops/zstd_decode_device.py): host cracks headers,
    # device runs the Huffman/FSE scans + LZ77 resolution. Dictionary
    # windows need host history — route those to the host fan-out.
    if dictionary is not None:
        return _decompress_blocks_host(chunks, dlens, dictionary)
    from ..ops import zstd_decode_device
    return zstd_decode_device.decode_chunks(list(chunks),
                                            [int(d) for d in dlens])


@dispatch.register("zstd", "decompress", TIER_XLA, "zstd_decompress_xla")
def _decompress_xla(data: bytes, expected_size=None,
                    dictionary=None) -> bytes:
    if dictionary is not None:
        return _decompress_host(data, expected_size, dictionary)
    from ..ops import zstd_decode_device
    return zstd_decode_device.decode_frames(data, expected_size)


@dispatch.register("zstd", "compress_blocks", TIER_MESH,
                   "zstd_compress_blocks_mesh")
def _compress_blocks_mesh(blocks: Sequence[bytes], level: int,
                          dictionary=None, num_shards=None):
    """Mesh-tier zstd encode: the device pipeline sharded over the block
    axis (reference analog: the OpenMP fan-out of ZSTD_compress_advanced,
    zstd_compress.c:5417-5460)."""
    from ..ops import zstd_device
    from ..ops.lz4_device import MAX_DEVICE_BLOCK
    from ..parallel import sharded
    if (max(len(b) for b in blocks) > MAX_DEVICE_BLOCK
            or dictionary is not None):
        return _compress_blocks_host(blocks, level, dictionary)
    frames = sharded.sharded_block_call(
        blocks,
        lambda padded, sh: zstd_device.encode_blocks(
            padded, level, shardings=sh)[0],
        num_shards)
    return frames, [len(b) for b in blocks]
