"""TPU match-finder assist for LZMA (SURVEY §7 step 6; VERDICT r2 item 6).

The LZMA range coder is irreducibly serial, but ~all of the encoder's
time goes into match FINDING (reference: algos/lzma/LzFind.c hash chains,
algos/common/aoclHashChain.h CEHC). This tier moves that search onto the
TPU: the shared sort-based matcher + tile election from the LZ4 pipeline
(ops/lz4_device._find_matches / _grid_parse) elects non-overlapping
(pos, len, dist) sequences per 64 KiB block — ONE jit call for the whole
batch — and ships only the elected sequences (~12 B each, ~0.5-1 B per
input byte at LZMA-class ratios, NOT the 8 B/byte per-position arrays the
round-2 estimate priced). The host then range-codes candidate-driven
(csrc/lzma.cpp lzma_encode_cand): rep probes in the gaps, zero hash-chain
work, every candidate revalidated so a device quirk can only shorten a
match, never corrupt the stream.

Trade-offs vs the host L6 path (documented for the measured comparison):
matches cannot cross 64 KiB block boundaries and are capped at the
tile-parse match cap, so the ratio trails the host's 4 MiB-window depth-48
search; the win claimed is throughput, measured end-to-end.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import native
from . import lz4_device as lz

BLOCK = lz.MAX_DEVICE_BLOCK  # 64 KiB: the device matcher's offset domain


@functools.lru_cache(maxsize=4)
def _make_matcher(B: int, G: int, depth: int, match_cap: int):
    MAXSEQ = B // 4 + 2

    @jax.jit
    def run(blocks, lens):
        def one(du8, nn):
            mlen, moff, valid = lz._find_matches(du8, nn, B, depth=depth)
            return lz._grid_parse(mlen, moff, valid, B, G, MAXSEQ,
                                  match_cap=match_cap)

        return jax.vmap(one)(blocks, lens)

    return run


def elect_sequences(data: bytes, G: int = 4, depth: int = 8,
                    match_cap: int = 68) -> Tuple[np.ndarray, np.ndarray,
                                                  np.ndarray]:
    """Run the device matcher over data in 64 KiB blocks; returns
    absolute-position (pos i64, len i32, dist i32) arrays, sorted."""
    n = len(data)
    nb = (n + BLOCK - 1) // BLOCK
    arr = np.zeros((nb, BLOCK), dtype=np.uint8)
    lens = np.zeros(nb, dtype=np.int32)
    flat = np.frombuffer(data, dtype=np.uint8)
    for i in range(nb):
        blk = flat[i * BLOCK:(i + 1) * BLOCK]
        arr[i, :len(blk)] = blk
        lens[i] = len(blk)
    run = _make_matcher(BLOCK, G, depth, match_cap)
    pos, ml, off, nseq = jax.block_until_ready(
        run(jnp.asarray(arr), jnp.asarray(lens)))
    pos = np.asarray(pos)
    ml = np.asarray(ml)
    off = np.asarray(off)
    nseq = np.asarray(nseq)
    cp, cl, cd = [], [], []
    for i in range(nb):
        k = int(nseq[i])
        if not k:
            continue
        cp.append(pos[i, :k].astype(np.int64) + i * BLOCK)
        cl.append(ml[i, :k].astype(np.int32))
        cd.append(off[i, :k].astype(np.int32))
    if not cp:
        z = np.zeros(0, np.int64)
        return z, np.zeros(0, np.int32), np.zeros(0, np.int32)
    return (np.concatenate(cp), np.concatenate(cl), np.concatenate(cd))


def compress(data: bytes, level: int = 6) -> bytes:
    """Device-assisted LZMA encode: device match election + host
    candidate-driven range coding. Output is standard FORMAT_ALONE.
    G=1/depth=16 is the CPU-measured ratio sweet spot (4.17 vs 3.79 at
    G=4/depth=8 on mixed C source; see MEASURED.md)."""
    if len(data) < 4096:
        return native.lzma_compress(data, level)
    cp, cl, cd = elect_sequences(data, G=1, depth=16)
    return native.lzma_compress_cand(data, level, cp, cl, cd)
