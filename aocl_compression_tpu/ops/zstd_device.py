"""zstd encoder as a parallel TPU device pipeline (tier XLA).

Format-exact zstd frames (decodable by stock zstd) built on device:
  - shared sort-centric matcher + tile-anchor/exact parse (ops/lz4_device),
  - literal stream compaction via one variadic sort,
  - PER-BLOCK Huffman literal tables built on device: histogram ->
    log2-share code lengths -> Kraft deficit absorbed by a 256-step scan
    over frequency-sorted symbols -> canonical codes matching
    HUF_readDTableX1's rebuild (huffLog = longest code used, which makes
    the decoder's >=2-longest-codes check hold by Kraft parity); the tree
    description FSE-compresses the 255-weight sequence with a STATIC
    weight table so only the bitstream varies per block,
  - 4-stream Huffman literals: per-stream backward bit layout from one
    reverse cumsum; bits scatter-added into per-stream regions,
  - sequences: predefined-FSE states evolved by a lax.scan over the
    sequence axis in reverse (sequences pre-aligned so the scan runs a
    fixed trip count with masked no-op steps), emitting (value, nbits)
    pieces; one cumsum over the flattened pieces gives every bit offset,
  - host assembles sections into blocks/frames (headers, raw fallbacks).

Reference behavior: /root/reference/algos/zstd/lib/compress/
zstd_compress_sequences.c (FSE sequence emission), huf_compress.c (literal
streams), recast as scans + scatter-adds; the fixed-table choice mirrors the
spirit of deflate_quick's static strategy (a per-block optimal Huffman/FSE
table builder is a later milestone).
"""

from __future__ import annotations

import functools
import struct
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..codecs import zstd_format as ZF
from . import lz4_device as lz
from .bitpack import pack_bits_ladder
from .lz4_device import MIN_MATCH, _bucket

# bit-pack strategy A/B (VERDICT r2 item 4): "ladder" = sort + bounded
# lookback (ops/bitpack.py), default = word-granular scatter-adds. Read
# at TRACE time — call make_encoder.cache_clear() after flipping the env.
import os as _os


def _pack_ladder_enabled() -> bool:
    return _os.environ.get("AOCL_ZSTD_PACK", "").lower() == "ladder"

# --- constant tables (trace-time) ----------------------------------------------
_LL_NXT, _LL_TT = ZF.fse_build_encode(ZF.LL_DEFAULT, ZF.LL_LOG)
_ML_NXT, _ML_TT = ZF.fse_build_encode(ZF.ML_DEFAULT, ZF.ML_LOG)
_OF_NXT, _OF_TT = ZF.fse_build_encode(ZF.OF_DEFAULT, ZF.OF_LOG)


def _tt_arrays(tt):
    dnb = jnp.asarray([x[0] for x in tt], jnp.int32)
    dfs = jnp.asarray([x[1] for x in tt], jnp.int32)
    return dnb, dfs


LLN = jnp.asarray(_LL_NXT, jnp.int32)
MLN = jnp.asarray(_ML_NXT, jnp.int32)
OFN = jnp.asarray(_OF_NXT, jnp.int32)
LLDNB, LLDFS = _tt_arrays(_LL_TT)
MLDNB, MLDFS = _tt_arrays(_ML_TT)
OFDNB, OFDFS = _tt_arrays(_OF_TT)
LLBASE = jnp.asarray(ZF.LL_BASE, jnp.int32)
LLBITS = jnp.asarray(ZF.LL_BITS, jnp.int32)
MLBASE = jnp.asarray(ZF.ML_BASE, jnp.int32)
MLBITS = jnp.asarray(ZF.ML_BITS, jnp.int32)


# static weight-FSE table (per-block Huffman tree descriptions)
_W_NXT, _W_TT = ZF.fse_build_encode(ZF.WEIGHT_DIST, ZF.WEIGHT_LOG)
WN = jnp.asarray(_W_NXT, jnp.int32)
WDNB, WDFS = _tt_arrays(_W_TT)
WCAP = 512


def _block_huffman(lits32, nlits, B: int):
    """Per-block length-limited Huffman table (huffLog=11, Kraft exact).

    Returns (code[256], nb[256], weights[255], ok). Lengths start at
    ceil(-log2 p) and the Kraft deficit is absorbed greedily by shortening
    the most frequent symbols (one 256-step scan). Symbol 255 is always
    made present so the weight list is a fixed 255 entries and the
    decoder's implicit-last-weight completion lands on it.
    """
    j = jnp.arange(B, dtype=jnp.int32)
    hist = jnp.zeros(256, jnp.int32).at[jnp.clip(lits32, 0, 255)].add(
        (j < nlits).astype(jnp.int32))
    hist = hist.at[255].max(1)  # force the implicit-last symbol present
    present = hist > 0
    npres = jnp.sum(present.astype(jnp.int32))
    share = (hist * 2048) // jnp.maximum(nlits, 1)
    f = _floor_log2(jnp.maximum(share, 1), 12)
    nb = jnp.where(present, jnp.clip(11 - f, 1, 11), 0)
    contrib = jnp.where(present, 1 << (11 - jnp.maximum(nb, 1)), 0)
    D0 = jnp.int32(2048) - jnp.sum(contrib)

    sym = jnp.arange(256, dtype=jnp.int32)
    _, syms, nbs = jax.lax.sort([-hist, sym, nb], num_keys=2)

    def absorb(D, s_nb):
        c = jnp.where(s_nb > 0, 1 << (11 - jnp.maximum(s_nb, 1)), 0)
        q = jnp.where(c > 0, D // jnp.maximum(c, 1) + 1, 1)
        k = jnp.minimum(_floor_log2(jnp.maximum(q, 1), 12),
                        jnp.maximum(s_nb - 1, 0))
        used = c * ((1 << k) - 1)
        return D - used, s_nb - k

    D, nbs2 = jax.lax.scan(absorb, D0, nbs)
    _, nb_final = jax.lax.sort([syms, nbs2], num_keys=1)
    ok = (D == 0) & (npres >= 2)

    # huffLog = the longest code actually used: the decoder requires >= 2
    # weight-1 (longest) symbols, which Kraft-exactness guarantees at this
    # scale (their count is even and >= 1); weights = huffLog + 1 - nb
    maxnb = jnp.max(nb_final)
    weights = jnp.where(nb_final > 0, maxnb + 1 - nb_final, 0)

    per_rank = jnp.zeros(13, jnp.int32).at[jnp.clip(nb_final, 0, 12)].add(
        present.astype(jnp.int32))
    vpr = jnp.zeros(13, jnp.int32)
    mn = jnp.int32(0)
    for r in range(11, 0, -1):
        vpr = vpr.at[r].set(mn)
        mn = (mn + per_rank[r]) >> 1
    rw = jnp.zeros(256, jnp.int32)
    for r in range(1, 12):
        m = (nb_final == r).astype(jnp.int32)
        rw = rw + jnp.where(nb_final == r, jnp.cumsum(m) - m, 0)
    code = vpr[jnp.clip(nb_final, 0, 12)] + rw
    return code, nb_final, weights[:255], ok


def _encode_weights(weights):
    """Device two-state FSE encode of the 255-entry weight sequence
    (static table, fixed structure — mirrors ZF.encode_weight_stream)."""
    def enc(state, c):
        nbits = (state + WDNB[c]) >> 16
        val = state & ((1 << nbits) - 1)
        return WN[(state >> nbits) + WDFS[c]], val, nbits

    def init(c):
        dnb = WDNB[c]
        nbout = (dnb + (1 << 15)) >> 16
        return WN[(((nbout << 16) - dnb) >> nbout) + WDFS[c]]

    st1 = init(weights[254])
    st2 = init(weights[253])
    st1, v0, n0 = enc(st1, weights[252])

    # pairs (e2 then e1) over indices 251..0
    pairs = weights[:252][::-1].reshape(126, 2)  # [i-1, i-2] per step

    def step(carry, pw):
        s1, s2 = carry
        s2, va, na = enc(s2, pw[0])
        s1, vb, nbb = enc(s1, pw[1])
        return (s1, s2), (jnp.stack([va, vb]), jnp.stack([na, nbb]))

    (st1, st2), (pv, pn) = jax.lax.scan(step, (st1, st2), pairs)
    L = jnp.int32(ZF.WEIGHT_LOG)
    allv = jnp.concatenate([
        jnp.stack([v0]), pv.reshape(-1),
        jnp.stack([st2 - (1 << ZF.WEIGHT_LOG), st1 - (1 << ZF.WEIGHT_LOG)])])
    alln = jnp.concatenate([
        jnp.stack([n0]), pn.reshape(-1), jnp.stack([L, L])])
    bpos = jnp.cumsum(alln) - alln
    total = jnp.sum(alln)
    buf = jnp.zeros(WCAP, jnp.int32)
    vals = (allv & ((1 << alln) - 1)) << (bpos & 7)
    qb = jnp.where(alln > 0, bpos >> 3, WCAP)
    buf = buf.at[qb].add(vals & 0xFF, mode="drop")
    buf = buf.at[jnp.minimum(qb + 1, WCAP)].add((vals >> 8) & 0xFF,
                                                mode="drop")
    buf = buf.at[total >> 3].add(1 << (total & 7), mode="drop")
    return buf.astype(jnp.uint8), (total + 1 + 7) >> 3


def stream_cap(block_size: int) -> int:
    n = ((block_size + 3) // 4) * 11 // 8 + 16   # codes are <= 11 bits
    return -(-n // 512) * 512  # compaction row quantum (ops/compact.py)


def seq_cap(maxseq: int) -> int:
    # worst case per sequence: states 9+8+9 (custom logs) + extras
    # llx<=16, mlx<=16, ofx<=16 bits = 74 bits -> 10 bytes covers it
    n = maxseq * 10 + 16
    return -(-n // 512) * 512


def _floor_log2(m, top: int):
    e = jnp.zeros_like(m)
    for k in range(1, top):
        e = e + (m >= (1 << k)).astype(jnp.int32)
    return e


# --- per-block FSE sequence tables (VERDICT item: ratio vs predefined) ---------
#
# Built fully on device. The trick making the spread vectorizable: with no
# low-probability (-1) entries, FSE_spread's visit order is INDEPENDENT of
# the data — pos_k = k*step mod size — so `table[V[k]] = symbol_of_rank(k)`
# is one searchsorted + one scatter, and the encoder's next-state table is
# one small sort (reference construction: FSE_buildCTable,
# lib/common/fse.h; normalization: FSE_normalizeCount).

_NSYM_PAD = 64  # padded symbol axis (LL 36, ML 53, OF 32 all fit)


@functools.lru_cache(maxsize=8)
def _visit_order(tablelog: int):
    size = 1 << tablelog
    step = (size >> 1) + (size >> 3) + 3
    return tuple(int(x) for x in (np.arange(size) * step) % size)


def _pad_nxt(nxt, width: int):
    a = np.zeros(width, np.int32)
    a[:len(nxt)] = nxt
    return jnp.asarray(a)


def _pad_tt(tt):
    dnb = np.zeros(_NSYM_PAD, np.int32)
    dfs = np.zeros(_NSYM_PAD, np.int32)
    for s, (a, b) in enumerate(tt):
        dnb[s], dfs[s] = a, b
    return jnp.asarray(dnb), jnp.asarray(dfs)


def _cost_table(dist, tablelog):
    """bits/occurrence per symbol under a static FSE distribution (f32)."""
    c = np.full(_NSYM_PAD, 0.0, np.float32)
    for s, p in enumerate(dist):
        c[s] = tablelog - np.log2(max(abs(p), 0.5))
    return jnp.asarray(c)


_CUSTOM_LOG = {"ll": 9, "of": 8, "ml": 9}
LLN_P = _pad_nxt(_LL_NXT, 512)
MLN_P = _pad_nxt(_ML_NXT, 512)
OFN_P = _pad_nxt(_OF_NXT, 512)
LLDNB_P, LLDFS_P = _pad_tt(_LL_TT)
MLDNB_P, MLDFS_P = _pad_tt(_ML_TT)
OFDNB_P, OFDFS_P = _pad_tt(_OF_TT)
LL_COST = _cost_table(ZF.LL_DEFAULT, ZF.LL_LOG)
ML_COST = _cost_table(ZF.ML_DEFAULT, ZF.ML_LOG)
OF_COST = _cost_table(ZF.OF_DEFAULT, ZF.OF_LOG)


def _normalize_counts(counts, L: int):
    """counts i32[_NSYM_PAD] -> (norm, ok). Norm sums to 2^L, every present
    symbol >= 1, no -1 lowprob entries (keeps the spread order static)."""
    size = 1 << L
    total = jnp.maximum(counts.sum(), 1)
    base = counts * size // total
    norm0 = jnp.where(counts > 0, jnp.maximum(base, 1), 0)
    delta = size - norm0.sum()
    # delta > 0: +1 to the `delta` symbols with the largest remainders
    rem = counts * size - base * total
    key = jnp.where(counts > 0, -rem, jnp.int32(1 << 30))
    order = jnp.argsort(key)
    rank = jnp.zeros(_NSYM_PAD, jnp.int32).at[order].set(
        jnp.arange(_NSYM_PAD, dtype=jnp.int32))
    norm1 = jnp.where(delta > 0,
                      norm0 + ((rank < delta) & (counts > 0)), norm0)
    # remaining negative delta: steal from the largest symbol
    d2 = size - norm1.sum()
    am = jnp.argmax(norm1)
    norm = jnp.where(d2 != 0, norm1.at[am].add(d2), norm1)
    present = counts > 0
    ok = ((norm.sum() == size)
          & (present.sum() >= 2)
          & jnp.all(jnp.where(present, norm >= 1, norm == 0)))
    return norm, ok


def _fse_encode_tables(norm, L: int):
    """norm i32[_NSYM_PAD] summing to 2^L -> (nxt i32[512], dnb, dfs)."""
    size = 1 << L
    cumul = jnp.cumsum(norm) - norm            # exclusive
    inc = jnp.cumsum(norm)
    k = jnp.arange(size, dtype=jnp.int32)
    sym = jnp.searchsorted(inc, k, side="right").astype(jnp.int32)
    V = jnp.asarray(_visit_order(L), jnp.int32)
    table = jnp.zeros(size, jnp.int32).at[V].set(sym)
    # nxt[cumul[s] + rank_of(st within s)] = size + st  ==  sort by
    # (symbol, st): key values are unique and already in target order
    skey = jnp.sort(table * size + k)
    nxt = size + (skey & (size - 1))
    if size < 512:
        nxt = jnp.concatenate([nxt, jnp.zeros(512 - size, jnp.int32)])
    f = norm
    mbo = L - _floor_log2(jnp.maximum(f - 1, 1), L + 1)
    dnb = jnp.where(f == 1, (L << 16) - (1 << L),
                    jnp.where(f > 1, (mbo << 16) - (f << mbo), 0))
    dfs = jnp.where(f == 1, cumul - 1, jnp.where(f > 1, cumul - f, 0))
    return nxt, dnb, dfs


def _choose_seq_table(codes, real, nseq, L: int, cost_predef, nsym: int):
    """Histogram + normalize + cost comparison for one field.

    Returns (use_custom, norm, nxt, dnb, dfs) — nxt/dnb/dfs only valid
    when use_custom (caller selects against the predefined arrays)."""
    counts = jnp.zeros(_NSYM_PAD, jnp.int32).at[
        jnp.where(real, codes, _NSYM_PAD)].add(1, mode="drop")
    norm, ok = _normalize_counts(counts, L)
    nxt, dnb, dfs = _fse_encode_tables(norm, L)
    cf = counts.astype(jnp.float32)
    bits_custom = jnp.sum(
        cf * (L - jnp.log2(jnp.maximum(norm.astype(jnp.float32), 0.5))))
    maxs = jnp.max(jnp.where(counts > 0, jnp.arange(_NSYM_PAD), 0))
    hdr_bits = 16.0 + 6.0 * (maxs.astype(jnp.float32) + 1.0)
    bits_predef = jnp.sum(cf * cost_predef)
    # predefined tables only cover nsym symbols; codes beyond FORCE custom
    overflow = jnp.any(counts[nsym:] > 0)
    use = ok & ((nseq >= 32) & (bits_custom + hdr_bits < bits_predef)
                | overflow)
    return use, norm, nxt, dnb, dfs


def _encode_block(data_u8, n, B, MAXSEQ, G, SCAP, QCAP):
    _PACK_LADDER = _pack_ladder_enabled()
    # depth-8 chain walk: zstd spends its budget on ratio (chip-measured
    # text ratio 6.39 vs 5.57 at depth 2; each extra depth is one more
    # shifted compare — fused elementwise work, no extra sorts)
    mlen, moff, valid = lz._find_matches(data_u8, n, B, depth=8)
    if G:
        pos, ml, off, nseq = lz._grid_parse(mlen, moff, valid, B, G,
                                            MAXSEQ, match_cap=68)
    else:
        mark = lz._greedy_parse(mlen, valid, B)
        pos, ml, off, nseq = lz._select_sequences(mark, valid, mlen, moff,
                                                  B, MAXSEQ)

    idx = jnp.arange(B, dtype=jnp.int32)
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq
    ends = pos + ml

    # --- literal stream (compacted via one sort) ----------------------------
    cover = jnp.cumsum(
        jnp.zeros(B, jnp.int32)
        .at[jnp.where(real, pos, B)].add(1, mode="drop")
        .at[jnp.where(real, ends, B)].add(-1, mode="drop"))
    is_lit = (cover == 0) & (idx < n)
    nlits = jnp.sum(is_lit.astype(jnp.int32))
    litkey = jnp.where(is_lit, idx, idx + B)
    _, lits32 = jax.lax.sort([litkey, data_u8.astype(jnp.int32)], num_keys=1)

    # per-seq literal lengths (prefix counts of literal bytes)
    litpsum = jnp.cumsum(is_lit.astype(jnp.int32))

    def pref(p):  # literals strictly before position p
        pc = jnp.clip(p - 1, 0, B - 1)
        return jnp.where(p > 0, litpsum[pc], 0)

    prev_end = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    ll = jnp.where(real, pref(pos) - pref(prev_end), 0)

    # --- per-block Huffman table + 4-stream literals -------------------------
    j = jnp.arange(B, dtype=jnp.int32)
    ctab, ntab, wts, tab_ok = _block_huffman(lits32, nlits, B)
    wbuf, wsize = _encode_weights(wts)
    packed = (ctab | (ntab << 16))[jnp.clip(lits32, 0, 255)]
    code = packed & 0xFFFF
    nb = jax.lax.shift_right_logical(packed, 16)
    nb = jnp.where(j < nlits, nb, 0)
    s1 = (nlits + 3) >> 2
    t = jnp.minimum(jnp.where(s1 > 0, j // jnp.maximum(s1, 1), 0), 3)
    # suffix sums of nb: S[j] = sum_{k >= j} nb[k] (reverse scan, no flips)
    S = jnp.concatenate([
        jax.lax.cumsum(nb, axis=0, reverse=True) if hasattr(jax.lax, "cumsum")
        else jnp.cumsum(nb[::-1])[::-1],
        jnp.zeros(1, jnp.int32)])
    bounds = jnp.stack([jnp.minimum(s1, nlits), jnp.minimum(2 * s1, nlits),
                        jnp.minimum(3 * s1, nlits), nlits])
    S_at_bound = S[jnp.clip(bounds, 0, B)]
    # per-byte end-of-own-stream suffix sum, via selects (no gather)
    Sb = jnp.where(t == 0, S_at_bound[0],
                   jnp.where(t == 1, S_at_bound[1],
                             jnp.where(t == 2, S_at_bound[2],
                                       S_at_bound[3])))
    bitpos = S[jnp.minimum(j + 1, B)] - Sb
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), bounds[:3]])
    Lbits = S[jnp.clip(starts, 0, B)] - S_at_bound

    if _PACK_LADDER:
        # sort + bounded-lookback ladder pack (ops/bitpack.py): the
        # scatter-free recast of this stage, chip-raced via AOCL_ZSTD_PACK
        tm = jnp.arange(4, dtype=jnp.int32)
        f_val = jnp.concatenate([code, jnp.ones(4, jnp.int32)])
        f_nb = jnp.concatenate([jnp.where(j < nlits, nb, 0),
                                jnp.ones(4, jnp.int32)])
        f_bp = jnp.concatenate([bitpos, Lbits])
        f_sid = jnp.concatenate([t, tm])
        litbuf = pack_bits_ladder(f_val, f_nb, f_bp, f_sid, 4, SCAP,
                                  11).astype(jnp.int32)
    else:
        # WORD-granular packing: an 11-bit code shifted by <32 spans at
        # most two 32-bit words, so TWO scatter-adds replace the three
        # byte-domain ones; the byte view is reconstructed with cheap
        # elementwise shifts.
        SW = SCAP >> 2
        litw = jnp.zeros(4 * SW, jnp.uint32)
        code_u = code.astype(jnp.uint32)
        shw = (bitpos & 31).astype(jnp.uint32)
        lo = code_u << shw
        hi = jnp.where(shw == 0, jnp.uint32(0),
                       jax.lax.shift_right_logical(code_u,
                                                   jnp.uint32(32) - shw))
        wb = jnp.where(j < nlits, t * SW + (bitpos >> 5), 4 * SW)
        litw = litw.at[wb].add(lo, mode="drop")
        litw = litw.at[jnp.where(j < nlits, wb + 1, 4 * SW)].add(hi,
                                                                 mode="drop")
        # end-of-stream markers
        tm = jnp.arange(4, dtype=jnp.int32)
        mw = tm * SW + (Lbits >> 5)
        litw = litw.at[mw].add(
            jnp.uint32(1) << (Lbits & 31).astype(jnp.uint32), mode="drop")
        litbuf = jnp.stack(
            [litw & 0xFF, (litw >> 8) & 0xFF, (litw >> 16) & 0xFF,
             (litw >> 24) & 0xFF], axis=1).reshape(-1).astype(jnp.int32)
    lit_sizes = (Lbits + 1 + 7) >> 3

    # --- sequence codes ------------------------------------------------------
    llc = jnp.searchsorted(LLBASE, ll, side="right").astype(jnp.int32) - 1
    llx = ll - LLBASE[llc]
    llb = LLBITS[llc]
    mlv = jnp.clip(ml, 3, None)
    mlc = jnp.searchsorted(MLBASE, mlv, side="right").astype(jnp.int32) - 1
    mlx = mlv - MLBASE[mlc]
    mlb = MLBITS[mlc]
    # repeat-offset 1: a sequence whose offset equals the previous
    # sequence's actual offset (or the initial rep[0] = 1 for the first)
    # codes as Offset_Value 1 -> offset code 0, ZERO extra bits — huge on
    # RLE/periodic runs (reference: ZSTD_storeSeq rep handling,
    # zstd_compress_internal.h; valid only when litLength > 0, else the
    # rep indices shift per RFC 8878 §3.1.1.5)
    prev_off = jnp.concatenate([jnp.ones(1, jnp.int32), off[:-1]])
    use_rep1 = (ll > 0) & (off == prev_off)
    ov = jnp.where(use_rep1, 1, off + 3)
    ofc = _floor_log2(jnp.maximum(ov, 1), 18)
    ofx = ov - (1 << ofc)

    # --- per-block FSE tables (fall back to predefined when not cheaper) ----
    sreal = sid < nseq
    use_ll, norm_ll, lln_c, lldnb_c, lldfs_c = _choose_seq_table(
        llc, sreal, nseq, _CUSTOM_LOG["ll"], LL_COST, 36)
    use_ml, norm_ml, mln_c, mldnb_c, mldfs_c = _choose_seq_table(
        mlc, sreal, nseq, _CUSTOM_LOG["ml"], ML_COST, 53)
    use_of, norm_of, ofn_c, ofdnb_c, ofdfs_c = _choose_seq_table(
        ofc, sreal, nseq, _CUSTOM_LOG["of"], OF_COST, 29)
    lln_u = jnp.where(use_ll, lln_c, LLN_P)
    lldnb_u = jnp.where(use_ll, lldnb_c, LLDNB_P)
    lldfs_u = jnp.where(use_ll, lldfs_c, LLDFS_P)
    mln_u = jnp.where(use_ml, mln_c, MLN_P)
    mldnb_u = jnp.where(use_ml, mldnb_c, MLDNB_P)
    mldfs_u = jnp.where(use_ml, mldfs_c, MLDFS_P)
    ofn_u = jnp.where(use_of, ofn_c, OFN_P)
    ofdnb_u = jnp.where(use_of, ofdnb_c, OFDNB_P)
    ofdfs_u = jnp.where(use_of, ofdfs_c, OFDFS_P)
    log_ll = jnp.where(use_ll, _CUSTOM_LOG["ll"], ZF.LL_LOG)
    log_ml = jnp.where(use_ml, _CUSTOM_LOG["ml"], ZF.ML_LOG)
    log_of = jnp.where(use_of, _CUSTOM_LOG["of"], ZF.OF_LOG)

    # --- align sequences so the LAST real one sits at row MAXSEQ-1 ----------
    shift = MAXSEQ - nseq

    def align(x, fill):
        rolled = jnp.roll(x, shift)
        return jnp.where(sid >= shift, rolled, fill)

    allc = align(llc, 0)
    allx = align(llx, 0)
    allb = align(llb, 0)
    amlc = align(mlc, 0)
    amlx = align(mlx, 0)
    amlb = align(mlb, 0)
    aofc = align(ofc, 0)
    aofx = align(ofx, 0)
    areal = sid >= shift

    # --- FSE scan (reverse order; 3 states; masked no-op steps). Each scan
    # step handles UNROLL sequences to amortize per-step loop overhead
    # (chip-measured: 32 is NOT faster than 8 — the stage cost is the
    # scatter traffic, not scan-step overhead — so 8 keeps compiles small)
    UNROLL = 8

    def _one(carry, xs1):
        stll, stml, stof = carry
        (c_ll, x_ll, b_ll, c_ml, x_ml, b_ml, c_of, x_of, is_real,
         is_init) = xs1

        def enc(state, nxt_tab, dnb_tab, dfs_tab, c):
            nbits = (state + dnb_tab[c]) >> 16
            val = state & ((1 << nbits) - 1)
            newstate = nxt_tab[(state >> nbits) + dfs_tab[c]]
            return newstate, val, nbits

        def init(nxt_tab, dnb_tab, dfs_tab, c):
            dnb = dnb_tab[c]
            nbout = (dnb + (1 << 15)) >> 16
            return nxt_tab[(((nbout << 16) - dnb) >> nbout) + dfs_tab[c]]

        # encode path (not init): order of_state, ml_state, ll_state
        st_of2, v_of, n_of = enc(stof, ofn_u, ofdnb_u, ofdfs_u, c_of)
        st_ml2, v_ml, n_ml = enc(stml, mln_u, mldnb_u, mldfs_u, c_ml)
        st_ll2, v_ll, n_ll = enc(stll, lln_u, lldnb_u, lldfs_u, c_ll)
        # init path
        st_of0 = init(ofn_u, ofdnb_u, ofdfs_u, c_of)
        st_ml0 = init(mln_u, mldnb_u, mldfs_u, c_ml)
        st_ll0 = init(lln_u, lldnb_u, lldfs_u, c_ll)

        use_init = is_init & is_real
        use_enc = is_real & ~is_init
        stll = jnp.where(use_init, st_ll0, jnp.where(use_enc, st_ll2, stll))
        stml = jnp.where(use_init, st_ml0, jnp.where(use_enc, st_ml2, stml))
        stof = jnp.where(use_init, st_of0, jnp.where(use_enc, st_of2, stof))
        z = jnp.int32(0)
        pieces_v = jnp.stack([
            jnp.where(use_enc, v_of, z), jnp.where(use_enc, v_ml, z),
            jnp.where(use_enc, v_ll, z), x_ll, x_ml, x_of])
        pieces_n = jnp.stack([
            jnp.where(use_enc, n_of, z), jnp.where(use_enc, n_ml, z),
            jnp.where(use_enc, n_ll, z),
            jnp.where(is_real, b_ll, z), jnp.where(is_real, b_ml, z),
            jnp.where(is_real, c_of, z)])
        return (stll, stml, stof), (pieces_v, pieces_n)

    def step(carry, xs_u):
        vs, ns = [], []
        for u in range(UNROLL):
            carry, (pv1, pn1) = _one(
                carry, jax.tree_util.tree_map(lambda a: a[u], xs_u))
            vs.append(pv1)
            ns.append(pn1)
        return carry, (jnp.stack(vs), jnp.stack(ns))

    is_init_row = sid == (MAXSEQ - 1)
    xs = (allc, allx, allb, amlc, amlx, amlb, aofc, aofx, areal, is_init_row)
    PAD = (-MAXSEQ) % UNROLL
    xs_rev = jax.tree_util.tree_map(
        lambda a: jnp.concatenate(
            [a[::-1], jnp.zeros(PAD, a.dtype)]).reshape(-1, UNROLL), xs)
    carry0 = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    (fll, fml, fof), (pv, pn) = jax.lax.scan(step, carry0, xs_rev)
    pv = pv.reshape(-1, 6)[:MAXSEQ]
    pn = pn.reshape(-1, 6)[:MAXSEQ]
    # pv/pn: (MAXSEQ, 6) in processing order (last seq first)

    flush_v = jnp.stack([fml - (1 << log_ml), fof - (1 << log_of),
                         fll - (1 << log_ll)])
    flush_n = jnp.where(nseq > 0, jnp.stack([log_ml, log_of, log_ll]), 0)

    allv = jnp.concatenate([pv.reshape(-1), flush_v])
    alln = jnp.concatenate([pn.reshape(-1), flush_n])
    bpos = jnp.cumsum(alln) - alln
    total_bits = jnp.sum(alln)

    if _PACK_LADDER:
        v_m = (allv & ((1 << alln) - 1))
        f_val = jnp.concatenate([v_m, jnp.ones(1, jnp.int32)])
        f_nb = jnp.concatenate([
            alln, jnp.where(nseq > 0, 1, 0)[None]])
        f_bp = jnp.concatenate([bpos, total_bits[None]])
        f_sid = jnp.zeros(f_val.shape[0], jnp.int32)
        seqbuf = pack_bits_ladder(f_val, f_nb, f_bp, f_sid, 1, QCAP,
                                  16).astype(jnp.int32)
    else:
        # word-granular sequence bitstream (2 scatters; see literals)
        QW = QCAP >> 2
        seqw = jnp.zeros(QW, jnp.uint32)
        v_u = (allv & ((1 << alln) - 1)).astype(jnp.uint32)
        shq = (bpos & 31).astype(jnp.uint32)
        lo_q = v_u << shq
        hi_q = jnp.where(shq == 0, jnp.uint32(0),
                         jax.lax.shift_right_logical(
                             v_u, jnp.uint32(32) - shq))
        qw = jnp.where(alln > 0, bpos >> 5, QW)
        seqw = seqw.at[qw].add(lo_q, mode="drop")
        seqw = seqw.at[jnp.where(alln > 0, qw + 1, QW)].add(hi_q,
                                                            mode="drop")
        seqw = seqw.at[jnp.where(nseq > 0, total_bits >> 5, QW)].add(
            jnp.uint32(1) << (total_bits & 31).astype(jnp.uint32),
            mode="drop")
        seqbuf = jnp.stack(
            [seqw & 0xFF, (seqw >> 8) & 0xFF, (seqw >> 16) & 0xFF,
             (seqw >> 24) & 0xFF], axis=1).reshape(-1).astype(jnp.int32)
    seq_size = jnp.where(nseq > 0, (total_bits + 1 + 7) >> 3, 0)

    return (litbuf.astype(jnp.uint8), lit_sizes, nlits,
            lits32.astype(jnp.uint8),
            seqbuf.astype(jnp.uint8), seq_size, nseq,
            wbuf, wsize, tab_ok,
            jnp.stack([use_ll, use_of, use_ml]),
            jnp.stack([norm_ll, norm_of, norm_ml]).astype(jnp.int32))


@functools.lru_cache(maxsize=16)
def make_encoder(block_size: int, G: int = 0):
    B = block_size
    # cap the sequence domain at B/8: typical blocks emit far fewer
    # sequences, the FSE scan trip count quarters, and overflow only drops
    # matches into literals (format stays exact)
    MAXSEQ = min(B // max(G, MIN_MATCH), max(B // 8, 512)) + 2
    SCAP = stream_cap(B)
    QCAP = seq_cap(MAXSEQ)

    @jax.jit
    def encode(blocks, lens):
        fn = functools.partial(_encode_block, B=B, MAXSEQ=MAXSEQ, G=G,
                               SCAP=SCAP, QCAP=QCAP)
        return jax.vmap(fn)(blocks, lens)

    return encode


# --- host assembly --------------------------------------------------------------

def _seq_table_headers(use_flags, norms) -> bytes:
    """Symbol_Compression_Modes byte + NCount headers for the custom
    (FSE_Compressed, mode 2) fields; predefined fields contribute no
    header (RFC 8878 §3.1.1.3.2.1; table order LL, OF, ML)."""
    use_ll, use_of, use_ml = (bool(x) for x in use_flags)
    modes = ((2 if use_ll else 0) << 6) | ((2 if use_of else 0) << 4) \
        | ((2 if use_ml else 0) << 2)
    out = bytearray([modes])
    for use, norm, log in ((use_ll, norms[0], _CUSTOM_LOG["ll"]),
                           (use_of, norms[1], _CUSTOM_LOG["of"]),
                           (use_ml, norms[2], _CUSTOM_LOG["ml"])):
        if not use:
            continue
        maxs = max(i for i, v in enumerate(norm) if v > 0)
        out += ZF.write_ncount([int(v) for v in norm[:maxs + 1]], log)
    return bytes(out)


def _assemble_frame(block: bytes, nlits: int, lits, streams, nseq: int,
                    seqsec_body: bytes, tree=None,
                    seq_headers: bytes = b"\x00") -> bytes:
    """Build one frame from device pieces; falls back to raw when bigger.
    `lits` is a zero-arg callable fetching the compacted literal bytes
    (only fallback blocks pay for it); `tree` is the per-block Huffman
    tree description (None -> raw literals)."""
    n = len(block)
    # literals section
    if nlits >= 6 and tree is not None:
        jump = struct.pack("<HHH", len(streams[0]), len(streams[1]),
                           len(streams[2]))
        body = tree + jump + b"".join(streams)
        C = len(body)
        if C < nlits and max(len(s) for s in streams[:3]) < 65536:
            h = 2 | (3 << 2) | (nlits << 4) | (C << 22)
            lit_sec = h.to_bytes(5, "little") + body
        else:
            lit_sec = None
    else:
        lit_sec = None
    if lit_sec is None:  # raw literals
        L = nlits
        raw = lits()
        if L < 32:
            lit_sec = bytes([(L << 3)]) + raw
        elif L < 4096:
            lit_sec = ((L << 4) | (1 << 2)).to_bytes(2, "little") + raw
        else:
            lit_sec = ((3 << 2) | (L << 4)).to_bytes(3, "little") + raw

    # sequences section header
    if nseq == 0:
        seq_sec = b"\x00"
    else:
        if nseq < 128:
            head = bytes([nseq])
        elif nseq < 0x7F00:
            head = bytes([(nseq >> 8) + 0x80, nseq & 0xFF])
        else:
            head = b"\xff" + struct.pack("<H", nseq - 0x7F00)
        seq_sec = head + seq_headers + seqsec_body

    blk = lit_sec + seq_sec
    out = bytearray(struct.pack("<I", ZF.MAGIC))
    if n < 256:
        out += bytes([0x20, n])
    elif n < 65536 + 256:
        out += bytes([0x60]) + struct.pack("<H", n - 256)
    else:
        out += bytes([0xA0]) + struct.pack("<I", n)
    if len(blk) < n:
        out += ((len(blk) << 3) | (2 << 1) | 1).to_bytes(3, "little") + blk
    else:
        out += ((n << 3) | 1).to_bytes(3, "little") + block
    return bytes(out)


def encode_blocks(blocks: Sequence[bytes], level: int = 1,
                  shardings=None):
    """Compress blocks into independent zstd frames on device.

    level <= 2 -> tile-anchor parse (G=8); level >= 3 -> exact parse.
    Returns (frames, dlens) for the RAP container."""
    from . import lz4_device
    lz4_device.check_block_sizes(blocks)
    B = _bucket(max(len(b) for b in blocks))
    N = len(blocks)
    arr = np.zeros((N, B), dtype=np.uint8)
    lens = np.zeros(N, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    G = 4 if level <= 2 else 0   # finer tiles: ratio 4.4 vs 4.0 at G=8
    if G and G * 4 > B:
        G = 0
    enc = make_encoder(B, G)
    ja, jl = jnp.asarray(arr), jnp.asarray(lens)
    if shardings is not None:
        ja = jax.device_put(ja, shardings[0])
        jl = jax.device_put(jl, shardings[1])
    (litbuf, lit_sizes, nlits, lits, seqbuf, seq_size, nseq,
     wbuf, wsize, tab_ok, fse_use, fse_norms) = jax.block_until_ready(
        enc(ja, jl))
    from . import compact
    SCAP = stream_cap(B)
    # fetch only the used bytes: streams and seq sections via the device
    # compactor; raw literals lazily (only fallback blocks need them)
    stream_chunks = compact.fetch_chunks(
        litbuf.reshape(N * 4, SCAP),
        ((lit_sizes.reshape(-1) + 7) // 8) * 8)
    seq_chunks = compact.fetch_chunks(seqbuf, ((seq_size + 7) // 8) * 8)
    lit_sizes = np.asarray(lit_sizes)
    nlits = np.asarray(nlits)
    seq_size = np.asarray(seq_size)
    nseq = np.asarray(nseq)
    wbuf_np = np.asarray(wbuf)
    wsize_np = np.asarray(wsize)
    tab_ok_np = np.asarray(tab_ok)
    fse_use_np = np.asarray(fse_use)
    fse_norms_np = np.asarray(fse_norms)

    def lazy_lits(i):
        return np.asarray(lits[i, :nlits[i]]).tobytes()

    frames = []
    for i, b in enumerate(blocks):
        streams = [stream_chunks[4 * i + k][:lit_sizes[i, k]]
                   for k in range(4)]
        tree = None
        if tab_ok_np[i]:
            blob = bytes(ZF.WEIGHT_DESC) + wbuf_np[i, :wsize_np[i]].tobytes()
            if 1 < len(blob) < 128:
                tree = bytes([len(blob)]) + blob
        hdrs = (_seq_table_headers(fse_use_np[i], fse_norms_np[i])
                if int(nseq[i]) > 0 else b"\x00")
        frames.append(_assemble_frame(
            b, int(nlits[i]), lambda i=i: lazy_lits(i), streams,
            int(nseq[i]), seq_chunks[i][:seq_size[i]], tree,
            seq_headers=hdrs))
    return frames, [len(b) for b in blocks]
