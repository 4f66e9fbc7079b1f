"""RAP container assembly/disassembly — codec-agnostic block parallelism.

This is the TPU-native equivalent of the reference's SMP threads runtime
(/root/reference/threads/threads.c): instead of OpenMP threads writing
per-thread dst traps that get stitched serially (lz4.c:2655-2930), blocks are
compressed as a *batch* (on device via shard_map/vmap, or on host) and
assembled around a byte-compatible RAP frame (csrc/rap.cpp).

Stream layout:  [RAP frame][stream preamble?][chunk 0][chunk 1]...[chunk N-1]

Chunk regions are format-valid fragments whose concatenation is itself a
valid single-shot stream (back-references never cross chunk boundaries since
each block is compressed with fresh history — the reference's "shard at >=
window length" invariant, threads.c:57; LZ4-family boundary literals are
merged by the codec's stitcher, see codecs/lz4_stitch.py). A legacy decoder
can skip the RAP frame and decode serially; a parallel decoder fans out
per-entry using the recorded {offset, length, decoded length} triplets.
"""

from __future__ import annotations

import os

# core count cannot change within a process; a per-call os.cpu_count()
# syscall cost ~4 us on every compress (visible on sub-100 KiB inputs)
_HOST_CORES = os.cpu_count() or 1

from typing import Callable, List, Optional, Sequence, Tuple

from ..runtime import native


class BlockCodecAdapter:
    """Batch block compress/decompress hooks a codec plugs into the container.

    compress_blocks: list of raw input blocks ->
        (chunk regions, decoded length per region). Regions are format-valid,
        concatenatable, carry NO stream preamble, and sum(dlens) must equal
        the total input length.
    decompress_blocks: (chunk regions, decoded lengths) -> decoded blocks.
    """

    def __init__(self,
                 compress_blocks: Callable[[Sequence[bytes]],
                                           Tuple[List[bytes], List[int]]],
                 decompress_blocks: Callable[[Sequence[bytes], Sequence[int]],
                                             List[bytes]],
                 preamble: Optional[Callable[[int], bytes]] = None):
        self.compress_blocks = compress_blocks
        self.decompress_blocks = decompress_blocks
        # Optional whole-stream preamble (snappy: varint of total length).
        self.preamble = preamble


def split_blocks(data: bytes, block_size: int) -> List[bytes]:
    return [data[i:i + block_size] for i in range(0, len(data), block_size)]


def st_fallback(handle, device_opted: bool) -> bool:
    """The reference's single-thread fallback (threads/threads.c:66-97;
    lz4.c:2673-2676): when exactly one worker would run the serial host
    path, the RAP container only adds per-block overhead (fresh match
    state per chunk) without any parallel win — compress single-shot
    instead. Device tiers keep the container (batch-parallel regardless
    of core count), as does an explicit num_shards request; an explicit
    handle.enable_rap is honored by the callers before consulting this."""
    if device_opted or (handle.num_shards or 0) > 1:
        return False
    if handle.block_size:  # an explicit chunking request = container use
        return False
    return _HOST_CORES == 1


def compress_rapped(data: bytes, block_size: int,
                    adapter: BlockCodecAdapter) -> Optional[bytes]:
    """Compress into a RAP-framed block-parallel stream.

    Returns None when the input is too small to benefit (< 2 blocks), which
    mirrors the reference's single-thread fallback for small streams
    (threads.c:66-71). Callers then use their single-shot path.
    """
    blocks = split_blocks(data, block_size)
    n = len(blocks)
    if n < 2:
        return None
    chunks, dlens = adapter.compress_blocks(blocks)
    if sum(dlens) != len(data):
        raise ValueError("block codec dlens do not cover the input")
    pre = adapter.preamble(len(data)) if adapter.preamble else b""
    frame_len = native.rap_frame_len(n)
    offsets, lens = [], []
    pos = frame_len + len(pre)
    for ch in chunks:
        offsets.append(pos)
        lens.append(len(ch))
        pos += len(ch)
    frame = native.rap_write(n, offsets, lens, dlens)
    return frame + pre + b"".join(chunks)


def decompress_rapped(data: bytes,
                      adapter: BlockCodecAdapter) -> Optional[bytes]:
    """Decompress a RAP-framed stream; None when no RAP frame is present
    (legacy single-shot stream — caller handles it)."""
    parsed = native.rap_parse(data)
    if parsed is None:
        return None
    offsets, lens, dlens = parsed
    end = int(offsets[-1]) + int(lens[-1])
    if end > len(data):
        raise ValueError("RAP entries exceed stream bounds (truncated?)")
    chunks = [bytes(data[o:o + l]) for o, l in zip(offsets, lens)]
    blocks = adapter.decompress_blocks(chunks, [int(d) for d in dlens])
    out = b"".join(blocks)
    if len(out) != int(dlens.sum()):
        raise ValueError("RAP decode length mismatch")
    return out


def skip_rap_frame(data: bytes) -> bytes:
    """Strip a RAP frame for legacy serial decode — aocl_skip_rap_frame_mt
    parity (api/aocl_threads.h:133)."""
    return data[native.rap_skip(data):]


def rap_entries(data: bytes) -> Optional[Tuple]:
    return native.rap_parse(data)
