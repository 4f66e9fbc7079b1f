"""TPU raw-deflate decoder — the device inflate tier (closes the last A6
gap: "device inflate absent", PARITY.md).

Deflate is the parallel-decode-hostile format of the family: one serial
LSB-first bitstream, interleaved literal/length/distance codes, no size
fields (this is exactly what zstd's 4-stream literals and framed sizes
were invented to fix). The TPU-native split therefore mirrors the zstd
device decoder (ops/zstd_decode_device.py) with the block loop collapsed:

  host (C++)   — FIRST-block header cracking only (csrc/deflate.cpp
                 atpu_inflate_plan: BTYPE + the dynamic code-length
                 section; tiny serial work). No symbol pre-scan: block
                 boundaries stay unknown.
  device (XLA) — everything else, vmapped over chunk lanes:
                   1. one lax.scan decodes the interleaved symbol stream
                      with canonical-code ARITHMETIC (a 15-deep unrolled
                      first-code/limit ladder per code — no decode-table
                      build, no big per-step gather; only a rank lookup
                      into the 288-entry symbol permutation);
                   2. two variadic sorts compact the scan's (kind, val,
                      dist) slots into the literal buffer and the
                      (ll, ml, off) sequence list;
                   3. the shared LZ77 executor resolves back-references
                      (zstd_decode_device._execute — fills + gather
                      fixpoint, same machinery as the LZ4 decoder).

Multi-block chunks need no host boundary scan: the device scan STOPS at
the first block's end-of-block symbol, so a multi-block chunk simply
produces fewer bytes than the container's recorded dlen — the caller
compares and re-decodes those chunks on the host tier. Sync-flush
trailers (the RAP chunk layout, codecs/zlib_bzip2_lzma.py) are ignored
the same way. Corrupt streams produce garbage rather than errors on this
tier; the stream adler32 / expected_size catches it, mirroring the
reference's fast-loop-defers-validation strategy (inffast_chunk.c).

Reference parity anchors: algos/zlib/inflate.c (header states, symbol
loop semantics), inffast_chunk.c (the fast decode loop being re-cast).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import native
from .lz4_device import MAX_DEVICE_BLOCK, _bucket
from .zstd_decode_device import _bytes_to_words, _execute, _lane_take

# scan unroll: lower than zstd's 8 — the inflate step body decodes TWO
# canonical codes plus three extra-bit reads per symbol, and compile cost
# scales with unroll x body size
_UNROLL = 4

# RFC 1951 §3.2.5 length/distance code tables (format constants)
_LEN_BASE = jnp.asarray(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51,
     59, 67, 83, 99, 115, 131, 163, 195, 227, 258], jnp.int32)
_LEN_XBITS = jnp.asarray(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
     4, 5, 5, 5, 5, 0], jnp.int32)
_DIST_BASE = jnp.asarray(
    [1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385,
     513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385,
     24577, 1, 1], jnp.int32)
_DIST_XBITS = jnp.asarray(
    [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
     10, 11, 11, 12, 12, 13, 13, 0, 0], jnp.int32)


def _read_fwd(words, pos, nbits):
    """Forward LSB-first bitstream read: bits [pos, pos+nbits) per lane.
    nbits may be a per-lane array (extra-bit fields); max 16 bits."""
    wi = pos >> 5
    sh = (pos & 31).astype(jnp.uint32)
    W = words.shape[1]
    w0 = _lane_take(words, jnp.minimum(wi, W - 1))
    w1 = _lane_take(words, jnp.minimum(wi + 1, W - 1))
    v = jax.lax.shift_right_logical(w0, sh) | jnp.where(
        sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh))
    mask = (jnp.int32(1) << nbits) - 1
    return (v.astype(jnp.int32) & mask), pos + nbits


_LS = jnp.arange(1, 16, dtype=jnp.int32)


def _bitrev15(v):
    """Reverse the low 15 bits (swizzle-mask reverse of 16, then >> 1)."""
    v = ((v & 0x5555) << 1) | (jax.lax.shift_right_logical(v, 1) & 0x5555)
    v = ((v & 0x3333) << 2) | (jax.lax.shift_right_logical(v, 2) & 0x3333)
    v = ((v & 0x0F0F) << 4) | (jax.lax.shift_right_logical(v, 4) & 0x0F0F)
    v = ((v & 0x00FF) << 8) | (jax.lax.shift_right_logical(v, 8) & 0x00FF)
    return jax.lax.shift_right_logical(v, 1)


def _huff_step(peek, fc, lim, rkb, perm_flat, perm_base, perm_cap):
    """Decode one canonical code from the 15-bit peek window. Deflate
    packs code bits MSB-first into the LSB-first stream, so the l-bit
    code prefix is bitrev(peek) >> (15-l); one (lanes, 15) broadcast
    compare against the canonical first-code/limit pair finds the code
    length (kept vectorized — a sequential 15-stage ladder made the jit
    graph explode at UNROLL x2 codes per symbol).
    Returns (sym, nbits); nbits == 0 marks an invalid code (corrupt)."""
    rev = _bitrev15(peek)
    code = jax.lax.shift_right_logical(rev[:, None], 15 - _LS[None, :])
    ok = (code >= fc[:, 1:]) & (code < lim[:, 1:])
    li = jnp.argmax(ok, axis=1)  # first (shortest-length) hit
    ln = jnp.where(jnp.any(ok, axis=1), 1 + li, 0)
    rank = jnp.take_along_axis(rkb[:, 1:] + code - fc[:, 1:],
                               li[:, None], axis=1)[:, 0]
    sym = jnp.take(perm_flat,
                   perm_base + jnp.clip(rank, 0, perm_cap - 1),
                   mode="clip")
    return sym, ln


def _symbol_scan(words, bitoff, fcL, limL, rkbL, permL, fcD, limD, rkbD,
                 permD, MAXS):
    """The interleaved literal/length/distance scan, all lanes at once.
    Returns (kind, val, dist) each (N, MAXS): kind 0 = nothing (done or
    corrupt), 1 = literal (val = byte), 2 = match (val = len, dist)."""
    N = words.shape[0]
    permL_flat = permL.reshape(-1)
    permD_flat = permD.reshape(-1)
    baseL = jnp.arange(N, dtype=jnp.int32) * permL.shape[1]
    baseD = jnp.arange(N, dtype=jnp.int32) * permD.shape[1]

    def one(carry):
        pos, done = carry
        peek, _ = _read_fwd(words, pos, 15)
        sym, ln = _huff_step(peek, fcL, limL, rkbL, permL_flat, baseL,
                             permL.shape[1])
        bad = ln == 0
        pos_l = pos + ln
        is_eob = sym == 256
        is_lit = sym < 256
        # length extra bits (decoded unconditionally; pos only advances
        # down the branch actually taken)
        c = jnp.clip(sym - 257, 0, 28)
        xv, pos_x = _read_fwd(words, pos_l, jnp.take(_LEN_XBITS, c))
        mlen = jnp.take(_LEN_BASE, c) + xv
        # distance code + extra bits
        dpeek, _ = _read_fwd(words, pos_x, 15)
        dsym, dln = _huff_step(dpeek, fcD, limD, rkbD, permD_flat, baseD,
                               permD.shape[1])
        bad = bad | ((sym > 256) & ((dln == 0) | (dsym >= 30)))
        dc = jnp.clip(dsym, 0, 29)
        dxv, pos_d = _read_fwd(words, pos_x + dln, jnp.take(_DIST_XBITS, dc))
        dist = jnp.take(_DIST_BASE, dc) + dxv

        live = ~done & ~bad
        kind = jnp.where(live & is_lit, 1,
                         jnp.where(live & (sym > 256), 2, 0))
        val = jnp.where(kind == 1, sym, jnp.where(kind == 2, mlen, 0))
        d = jnp.where(kind == 2, dist, 1)
        npos = jnp.where(live,
                         jnp.where(is_lit | is_eob, pos_l,
                                   jnp.where(bad, pos, pos_d)), pos)
        ndone = done | bad | (~done & is_eob)
        return (npos, ndone), (kind, val, d)

    def step(carry, _):
        outs = []
        for _u in range(_UNROLL):
            carry, o = one(carry)
            outs.append(o)
        return carry, jax.tree_util.tree_map(lambda *x: jnp.stack(x), *outs)

    steps = (MAXS + _UNROLL - 1) // _UNROLL
    carry0 = (bitoff, jnp.zeros(N, bool))
    _, (kind, val, dist) = jax.lax.scan(step, carry0, None, length=steps)

    def fwd(x):
        return x.reshape(steps * _UNROLL, N).T[:, :MAXS]

    return fwd(kind), fwd(val), fwd(dist)


def _compact(kind, val, dist, B, MAXSEQ):
    """Per-lane compaction of scan slots into _execute's inputs: the
    literal buffer (in-order literal bytes) and the (ll, ml, off)
    sequence list. Two variadic sorts — no gathers."""
    MAXS = kind.shape[0]
    slot = jnp.arange(MAXS, dtype=jnp.int32)
    BIG = jnp.int32(MAXS + 1)

    # literals: sort (is_lit ? slot : BIG) carrying the byte
    lkey = jnp.where(kind == 1, slot, BIG)
    _, lit_sorted = jax.lax.sort([lkey, val], num_keys=1)
    litbuf = jnp.zeros(B, jnp.uint8).at[:min(MAXS, B)].set(
        lit_sorted[:min(MAXS, B)].astype(jnp.uint8))

    # sequences: sort matches by slot, carrying (len, dist, lits-before)
    nlit_excl = jnp.cumsum((kind == 1).astype(jnp.int32)) - (kind == 1)
    mkey = jnp.where(kind == 2, slot, BIG)
    _, ml_s, off_s, lb_s = jax.lax.sort(
        [mkey, val, dist, nlit_excl], num_keys=1)
    nbseq = jnp.sum((kind == 2).astype(jnp.int32))
    ml_c = ml_s[:MAXSEQ]
    off_c = off_s[:MAXSEQ]
    lb_c = lb_s[:MAXSEQ]
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    prev_lb = jnp.concatenate([jnp.zeros(1, jnp.int32), lb_c[:-1]])
    ll_c = jnp.where(sid < nbseq, lb_c - prev_lb, 0)
    ml_c = jnp.where(sid < nbseq, ml_c, 0)
    off_c = jnp.where(sid < nbseq, jnp.clip(off_c, 1, B), 1)
    litregen = jnp.sum((kind == 1).astype(jnp.int32))
    return litbuf, ll_c, ml_c, off_c, nbseq, litregen


@functools.lru_cache(maxsize=8)
def make_decoder(B: int, C: int):
    """Jitted batched raw-deflate decoder over planned chunks.

    Inputs (N = batch):
      cbytes u8 (N, C)   chunk bytes (word-padded)
      bitoff i32 (N,)    symbol-section bit offset (from the planner)
      fc/lim/rkb i32 (N, 16) + perm i32 (N, 288|32) canonical-code params
      for the litlen and distance alphabets.
    Returns (out u8 (N, B), dlen i32 (N,)) — dlen is what the first
    deflate block regenerated; callers compare against the expected
    chunk dlen and fall back to host on mismatch (multi-block chunk).
    """
    MAXS = B + _UNROLL  # worst case: every output byte its own literal
    MAXSEQ = B // 3 + 2

    @jax.jit
    def decode(cbytes, bitoff, fcL, limL, rkbL, permL, fcD, limD, rkbD,
               permD):
        words = _bytes_to_words(cbytes)
        kind, val, dist = _symbol_scan(words, bitoff, fcL, limL, rkbL,
                                       permL, fcD, limD, rkbD, permD, MAXS)
        litbuf, ll, ml, off, nbseq, litregen = jax.vmap(
            lambda k, v, d: _compact(k, v, d, B, MAXSEQ))(kind, val, dist)
        out, dlen = jax.vmap(
            lambda lb, l, m, o, ns, lr: _execute(lb, l, m, o, ns, lr, B)
        )(litbuf, ll, ml, off, nbseq, litregen)
        return out, dlen

    return decode


# --- host orchestration -----------------------------------------------------

def _canon_params(lens: np.ndarray, nsym: int):
    """Canonical-code arithmetic parameters from code lengths (numpy):
    first_code/limit per length, rank base, and the (len, sym)-ordered
    symbol permutation."""
    bl = np.bincount(lens, minlength=16)[:16]
    bl[0] = 0
    fc = np.zeros(16, np.int32)
    lim = np.zeros(16, np.int32)
    rkb = np.zeros(16, np.int32)
    code = 0
    rank = 0
    for b in range(1, 16):
        code = (code + int(bl[b - 1])) << 1
        fc[b] = code
        lim[b] = code + int(bl[b])
        rkb[b] = rank
        rank += int(bl[b])
    perm = np.zeros(nsym, np.int32)
    k = 0
    for b in range(1, 16):
        syms = np.nonzero(lens == b)[0]
        perm[k:k + len(syms)] = syms
        k += len(syms)
    return fc, lim, rkb, perm


def plan_chunks(chunks: Sequence[bytes]):
    """Run the C++ planner over chunks. Returns (ok mask, bitoffs, and
    the stacked canonical params) — not-ok chunks must go to the host."""
    lib = native.get_lib()
    import ctypes
    N = len(chunks)
    ok = np.zeros(N, bool)
    bitoffs = np.zeros(N, np.int32)
    fcL = np.zeros((N, 16), np.int32)
    limL = np.zeros((N, 16), np.int32)
    rkbL = np.zeros((N, 16), np.int32)
    permL = np.zeros((N, 288), np.int32)
    fcD = np.zeros((N, 16), np.int32)
    limD = np.zeros((N, 16), np.int32)
    rkbD = np.zeros((N, 16), np.int32)
    permD = np.zeros((N, 32), np.int32)
    ll = np.zeros(288, np.uint8)
    dl = np.zeros(32, np.uint8)
    boff = ctypes.c_int64()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for i, c in enumerate(chunks):
        src = np.frombuffer(c, np.uint8)
        r = lib.atpu_inflate_plan(
            src.ctypes.data_as(u8p), len(c), ll.ctypes.data_as(u8p),
            dl.ctypes.data_as(u8p), ctypes.byref(boff))
        if r <= 0:
            continue  # stored-first or corrupt: host tier
        ok[i] = True
        bitoffs[i] = boff.value
        fcL[i], limL[i], rkbL[i], permL[i] = _canon_params(ll, 288)
        if dl.any():
            fcD[i], limD[i], rkbD[i], permD[i] = _canon_params(dl, 32)
    return ok, bitoffs, (fcL, limL, rkbL, permL, fcD, limD, rkbD, permD)


def decode_chunks(chunks: List[bytes], dlens: List[int],
                  _host_one=None) -> Optional[List[bytes]]:
    """Decode raw-deflate chunk regions on device. Chunks the planner
    rejects — and chunks whose first block regenerated fewer bytes than
    the container recorded (multi-block) — are re-decoded on the host
    (native.inflate raw). Always returns correct output or raises."""
    if not chunks:
        return []
    if max(dlens) > MAX_DEVICE_BLOCK:
        raise ValueError(
            "device inflate: block exceeds the 64 KiB device limit "
            "(16-bit offset packing); use the host tier")
    host_one = _host_one or (
        lambda c, d: native.inflate(c, d, raw=True))
    ok, bitoffs, params = plan_chunks(chunks)
    out: List[Optional[bytes]] = [None] * len(chunks)
    idx = np.nonzero(ok)[0]
    if len(idx):
        C = _bucket(max(len(chunks[i]) for i in idx))
        B = _bucket(max(max(dlens[i] for i in idx), 256))
        # bound the scan-slot footprint per dispatch
        max_n = max(1, (24 << 20) // (B * 12))
        dec = make_decoder(B, C)
        for lo in range(0, len(idx), max_n):
            sel = idx[lo:lo + max_n]
            arr = np.zeros((len(sel), C), np.uint8)
            for k, i in enumerate(sel):
                arr[k, :len(chunks[i])] = np.frombuffer(chunks[i], np.uint8)
            res, dlen = dec(jnp.asarray(arr), jnp.asarray(bitoffs[sel]),
                            *[jnp.asarray(p[sel]) for p in params])
            res = np.asarray(res)
            dlen = np.asarray(dlen)
            for k, i in enumerate(sel):
                if int(dlen[k]) == dlens[i]:
                    out[i] = res[k, :dlens[i]].tobytes()
    for i, o in enumerate(out):
        if o is None:  # planner reject / multi-block / corrupt-short
            out[i] = host_one(chunks[i], dlens[i])
    return out
