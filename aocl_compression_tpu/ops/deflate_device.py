"""DEFLATE (static-Huffman) encoder as a parallel TPU device pipeline.

TPU-native analog of the reference's level-1 "quick" deflate strategy
(/root/reference/algos/zlib/deflate_quick.c, gated ZLIB_DEFLATE_FAST_MODE,
CMakeLists.txt:353-357): one static-Huffman (BTYPE=01) block per chunk,
LZ77 over a 32K window, emitted bit-exactly so stock zlib/inflate decodes it.

Pipeline (per block, vmapped):
  1. match finding — the shared sort-centric matcher (ops/lz4_device.py)
     with offsets clamped to deflate's 32K window.
  2. parse — shared exact/tile-anchor parse.
  3. piece split — matches become <=258-byte (len,dist) pieces: all full
     pieces are 255 so the remainder stays in [3,258] (nfull=(L-4)//255).
  4. bit budget — ONE pass: every input byte gets a bit-width w[i]
     (literal: 8 or 9; piece-start byte: the piece's full symbol width;
     other match bytes: 0). bitpos = 3 + exclusive-cumsum(w). No fills or
     searchsorted — the serial bit-packing dependency becomes a scan.
  5. bit pack — static Huffman codes (bit-reversed, LSB-first stream) are
     scatter-added into the output byte array; Huffman code bits are
     disjoint so add == or. Header (BFINAL=0 BTYPE=01) is byte 0 += 2;
     EOB is the all-zero 7-bit code (advances the bit cursor, writes
     nothing). Each chunk ends with an empty stored block (sync flush) so
     chunks are byte-aligned and concatenatable; the codec closes the
     stream with the standard empty final static block 0x03 0x00.

Decode stays on the host tier (stock inflate); dispatch is per-op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import lz4_device as lz
from .lz4_device import MIN_MATCH, _bucket, grid_for_accel

MAX_DIST = 32768
MAX_MATCH = 258
SYNC_FLUSH = b"\x00\x00\xff\xff"          # empty stored block after 3+pad bits
FINAL_BLOCK = b"\x03\x00"                 # BFINAL=1 BTYPE=01 + EOB
ZLIB_HEADER = b"\x78\x01"                 # CMF/FLG, level-1 class


def out_capacity(block_size: int) -> int:
    # worst case: all 9-bit literals + headers + flush slack; row-aligned
    n = block_size + block_size // 8 + 64
    return -(-n // 512) * 512


def _floor_log2(m, top: int):
    """floor(log2(m)) for 1 <= m < 2**top, exact (integer compares)."""
    e = jnp.zeros_like(m)
    for k in range(1, top):
        e = e + (m >= (1 << k)).astype(jnp.int32)
    return e


def _rev_bits(v, n, width: int = 9):
    """Reverse the n low bits of v (n may be traced; n <= width)."""
    r = jnp.zeros_like(v)
    for k in range(width):
        bit = (v >> k) & 1
        sh = jnp.clip(n - 1 - k, 0, width)
        r = r | jnp.where(k < n, bit << sh, 0)
    return r


def _lit_code(b):
    """Static litlen code for a literal byte: (reversed code, nbits)."""
    nb = jnp.where(b < 144, 8, 9)
    val = jnp.where(b < 144, 0x30 + b, 0x190 + (b - 144))
    return _rev_bits(val, nb), nb


def _len_sym(l):
    """Length l in [3,258] -> (reversed code bits, code nbits, extra value,
    extra nbits)."""
    m = l - 3
    e = _floor_log2(jnp.maximum(m, 1), 8)
    eb = jnp.where(m < 8, 0, jnp.maximum(e - 2, 0))
    code = jnp.where(m < 8, 257 + m, 257 + 4 * eb + (m >> eb))
    code = jnp.where(m == 255, 285, code)
    eb = jnp.where(m == 255, 0, eb)
    extra = m & ((1 << eb) - 1)
    cb = jnp.where(code <= 279, 7, 8)
    val = jnp.where(code <= 279, code - 256, 0xC0 + (code - 280))
    return _rev_bits(val, cb), cb, extra, eb


def _dist_sym(d):
    """Distance d in [1,32768] -> (reversed 5-bit code, extra, extra bits)."""
    m = d - 1
    e = _floor_log2(jnp.maximum(m, 1), 15)
    code = jnp.where(m < 4, m, 2 * e + (m >> jnp.maximum(e - 1, 0)) - 2)
    eb = jnp.where(m < 4, 0, jnp.maximum(e - 1, 0))
    extra = m & ((1 << eb) - 1)
    return _rev_bits(code, jnp.full_like(d, 5), 5), extra, eb


def _emit_deflate(data_u8, pos, ml, off, nseq, n, B: int, OUTCAP: int,
                  MAXSEQ: int, MAXPIECE: int):
    """Serialize sequences + trailing literals into one static block's body.

    Returns (out bytes u8[OUTCAP], chunk_size_bytes) where the chunk is
    header + symbols + EOB + empty stored block (caller appends the stored
    block's FFFF via SYNC_FLUSH — the zero pad is already in the buffer).
    """
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq
    d32 = data_u8.astype(jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)

    ml = jnp.where(real, ml, 0)
    ends = pos + ml

    # --- piece split: all fulls 255, remainder in [3,258] -------------------
    nfull = jnp.where(real, jnp.maximum(ml - 4, 0) // 255, 0)
    lastlen = ml - 255 * nfull
    npiece = jnp.where(real, nfull + 1, 0)
    p_excl = jnp.cumsum(npiece) - npiece
    ntot = jnp.sum(npiece)

    # piece -> owning sequence via monotone fill on the piece domain
    pid = jnp.arange(MAXPIECE, dtype=jnp.int32)
    preal = pid < ntot
    pstarts = jnp.where(real & (npiece > 0), p_excl, jnp.int32(MAXPIECE))
    f_sid = jax.lax.cummax(jnp.full(MAXPIECE, 0, jnp.int32).at[pstarts].max(
        sid, mode="drop"))
    ps = f_sid                       # sequence index per piece
    j_in = pid - p_excl[ps]
    p_len = jnp.where(j_in < nfull[ps], 255, lastlen[ps])
    p_len = jnp.where(preal, jnp.clip(p_len, 3, MAX_MATCH), 3)
    p_dist = jnp.clip(off[ps], 1, MAX_DIST)
    p_byte = jnp.where(preal, pos[ps] + 255 * j_in, 0)

    lrev, lcb, lex, leb = _len_sym(p_len)
    drev, dex, deb = _dist_sym(p_dist)
    p_bits = lcb + leb + 5 + deb
    p_val_lo = lrev | (lex << lcb)                       # <= 13 bits
    p_val_hi = drev | (dex << 5)                         # <= 18 bits
    p_shift_hi = lcb + leb                               # where hi part goes

    # --- literal mask + per-byte bit widths ---------------------------------
    cover = jnp.cumsum(
        jnp.zeros(B, jnp.int32)
        .at[jnp.where(real, pos, B)].add(1, mode="drop")
        .at[jnp.where(real, ends, B)].add(-1, mode="drop"))
    is_lit = (cover == 0) & (idx < n)

    lit_rev, lit_nb = _lit_code(d32)
    w = jnp.where(is_lit, lit_nb, 0)
    w = w.at[jnp.where(preal, p_byte, B)].add(p_bits, mode="drop")
    bitpos = 3 + jnp.cumsum(w) - w
    total_bits = 3 + jnp.cumsum(w)[B - 1] + 7            # header + EOB

    # --- scatter-add the bit stream into bytes ------------------------------
    out = jnp.zeros(OUTCAP, jnp.int32).at[0].add(2)      # BTYPE=01 header
    lb = jnp.where(is_lit, bitpos >> 3, OUTCAP)
    lv = lit_rev << (bitpos & 7)                         # <= 16 bits
    out = out.at[lb].add(lv & 0xFF, mode="drop")
    out = out.at[jnp.minimum(lb + 1, OUTCAP)].add((lv >> 8) & 0xFF,
                                                  mode="drop")

    pbit = bitpos[jnp.clip(p_byte, 0, B - 1)]
    pb = jnp.where(preal, pbit >> 3, OUTCAP)
    sh = pbit & 7
    vlo = p_val_lo << sh                                 # <= 20 bits
    out = out.at[pb].add(vlo & 0xFF, mode="drop")
    out = out.at[jnp.minimum(pb + 1, OUTCAP)].add((vlo >> 8) & 0xFF,
                                                  mode="drop")
    out = out.at[jnp.minimum(pb + 2, OUTCAP)].add((vlo >> 16) & 0xFF,
                                                  mode="drop")
    hi_bit = pbit + p_shift_hi
    hb = jnp.where(preal, hi_bit >> 3, OUTCAP)
    vhi = p_val_hi << (hi_bit & 7)                       # <= 25 bits
    out = out.at[hb].add(vhi & 0xFF, mode="drop")
    out = out.at[jnp.minimum(hb + 1, OUTCAP)].add((vhi >> 8) & 0xFF,
                                                  mode="drop")
    out = out.at[jnp.minimum(hb + 2, OUTCAP)].add((vhi >> 16) & 0xFF,
                                                  mode="drop")
    out = out.at[jnp.minimum(hb + 3, OUTCAP)].add((vhi >> 24) & 0xFF,
                                                  mode="drop")

    # stored-block sync flush: 3 zero bits + pad (already zero) + LEN/NLEN
    # (LEN=0x0000 is already zero; write NLEN=0xFFFF in place)
    data_end = (total_bits + 3 + 7) >> 3
    ff_idx = jnp.stack([data_end + 2, data_end + 3])
    out = out.at[jnp.minimum(ff_idx, OUTCAP - 1)].add(0xFF)
    return out.astype(jnp.uint8), data_end + 4


# =============================================================================
# Dynamic-Huffman blocks (BTYPE=10) — the device analog of the reference's
# deflate_medium dynamic strategy (algos/zlib/deflate_medium.c). Per-block
# optimal (Kraft-exact, length-limited) litlen/dist codes are built ON
# DEVICE; the variable-length header (HLIT/HDIST/HCLEN + RLE'd code
# lengths) is written on host from the fetched code-length arrays, and the
# device-packed body (emitted at bit offset 0) is bit-shifted into place
# behind it with one vectorized numpy pass.
# =============================================================================

_NLIT, _NDIST, _MAXLEN = 288, 32, 15


def _kraft_lengths(hist, NSYM: int, MAXLEN: int = _MAXLEN):
    """Length-limited, Kraft-exact code lengths (same absorption pattern
    as zstd_device._block_huffman, generalized)."""
    present = hist > 0
    total = jnp.maximum(jnp.sum(hist), 1)
    share = hist * (1 << MAXLEN) // total
    f = _floor_log2(jnp.maximum(share, 1), MAXLEN + 1)
    nb = jnp.where(present, jnp.clip(MAXLEN - f, 1, MAXLEN), 0)
    contrib = jnp.where(present, 1 << (MAXLEN - jnp.maximum(nb, 1)), 0)
    D0 = jnp.int32(1 << MAXLEN) - jnp.sum(contrib)
    sym = jnp.arange(NSYM, dtype=jnp.int32)
    _, syms, nbs = jax.lax.sort([-hist, sym, nb], num_keys=2)

    def absorb(D, s_nb):
        c = jnp.where(s_nb > 0, 1 << (MAXLEN - jnp.maximum(s_nb, 1)), 0)
        q = jnp.where(c > 0, D // jnp.maximum(c, 1) + 1, 1)
        k = jnp.minimum(_floor_log2(jnp.maximum(q, 1), MAXLEN + 1),
                        jnp.maximum(s_nb - 1, 0))
        used = c * ((1 << k) - 1)
        return D - used, s_nb - k

    D, nbs2 = jax.lax.scan(absorb, D0, nbs)
    _, nb_final = jax.lax.sort([syms, nbs2], num_keys=1)
    ok = (D == 0) & (jnp.sum(present.astype(jnp.int32)) >= 2)
    return nb_final, ok


def _canonical_codes(nb, NSYM: int, MAXLEN: int = _MAXLEN):
    """RFC 1951 canonical code assignment from code lengths, returned
    bit-reversed for LSB-first emission."""
    bl = jnp.zeros(MAXLEN + 1, jnp.int32).at[
        jnp.clip(nb, 0, MAXLEN)].add((nb > 0).astype(jnp.int32),
                                     mode="drop")
    nc = jnp.zeros(MAXLEN + 1, jnp.int32)
    c = jnp.int32(0)
    for l in range(1, MAXLEN + 1):
        c = (c + bl[l - 1] * (l > 1)) << 1
        nc = nc.at[l].set(c)
    rank = jnp.zeros(NSYM, jnp.int32)
    for l in range(1, MAXLEN + 1):
        m = (nb == l).astype(jnp.int32)
        rank = rank + jnp.where(nb == l, jnp.cumsum(m) - m, 0)
    code = nc[jnp.clip(nb, 0, MAXLEN)] + rank
    return _rev_bits(code, nb, MAXLEN)


def _len_code_idx(l):
    """Length l in [3,258] -> litlen symbol index 257..285 + extra."""
    m = l - 3
    e = _floor_log2(jnp.maximum(m, 1), 8)
    eb = jnp.where(m < 8, 0, jnp.maximum(e - 2, 0))
    codei = jnp.where(m < 8, 257 + m, 257 + 4 * eb + (m >> eb))
    codei = jnp.where(m == 255, 285, codei)
    eb = jnp.where(m == 255, 0, eb)
    extra = m & ((1 << eb) - 1)
    return codei, extra, eb


def _dist_code_idx(d):
    """Distance d in [1,32768] -> dist symbol index 0..29 + extra."""
    m = d - 1
    e = _floor_log2(jnp.maximum(m, 1), 15)
    codei = jnp.where(m < 4, m, 2 * e + (m >> jnp.maximum(e - 1, 0)) - 2)
    eb = jnp.where(m < 4, 0, jnp.maximum(e - 1, 0))
    extra = m & ((1 << eb) - 1)
    return codei, extra, eb


def _emit_deflate_dyn(data_u8, pos, ml, off, nseq, n, B: int, OUTCAP: int,
                      MAXSEQ: int, MAXPIECE: int):
    """Dynamic-block body at bit offset 0 + per-block code lengths.

    Returns (out u8[OUTCAP], body_bits, nb_lit i32[288], nb_dist i32[32],
    ok). The host writes the header and splices. On ~impossible Kraft
    failure (ok=False) the caller re-encodes the block statically.
    """
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq
    d32 = data_u8.astype(jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)

    ml = jnp.where(real, ml, 0)
    ends = pos + ml

    # piece split (same as the static emitter)
    nfull = jnp.where(real, jnp.maximum(ml - 4, 0) // 255, 0)
    lastlen = ml - 255 * nfull
    npiece = jnp.where(real, nfull + 1, 0)
    p_excl = jnp.cumsum(npiece) - npiece
    ntot = jnp.sum(npiece)
    pid = jnp.arange(MAXPIECE, dtype=jnp.int32)
    preal = pid < ntot
    pstarts = jnp.where(real & (npiece > 0), p_excl, jnp.int32(MAXPIECE))
    f_sid = jax.lax.cummax(jnp.full(MAXPIECE, 0, jnp.int32).at[pstarts].max(
        sid, mode="drop"))
    ps = f_sid
    j_in = pid - p_excl[ps]
    p_len = jnp.where(j_in < nfull[ps], 255, lastlen[ps])
    p_len = jnp.where(preal, jnp.clip(p_len, 3, MAX_MATCH), 3)
    p_dist = jnp.clip(off[ps], 1, MAX_DIST)
    p_byte = jnp.where(preal, pos[ps] + 255 * j_in, 0)

    lci, lex, leb = _len_code_idx(p_len)
    dci, dex, deb = _dist_code_idx(p_dist)

    # literal mask
    cover = jnp.cumsum(
        jnp.zeros(B, jnp.int32)
        .at[jnp.where(real, pos, B)].add(1, mode="drop")
        .at[jnp.where(real, ends, B)].add(-1, mode="drop"))
    is_lit = (cover == 0) & (idx < n)

    # --- histograms ---------------------------------------------------------
    hist_lit = jnp.zeros(_NLIT, jnp.int32).at[
        jnp.where(is_lit, d32, _NLIT)].add(1, mode="drop")
    hist_lit = hist_lit.at[jnp.where(preal, lci, _NLIT)].add(1, mode="drop")
    hist_lit = hist_lit.at[256].add(1)                     # EOB
    hist_dist = jnp.zeros(_NDIST, jnp.int32).at[
        jnp.where(preal, dci, _NDIST)].add(1, mode="drop")
    # a complete dist code needs >= 2 symbols; force 0/1 present (costs
    # only header bits — zlib does the same for degenerate blocks)
    hist_dist = hist_dist.at[0].max(1).at[1].max(1)

    nb_lit, ok1 = _kraft_lengths(hist_lit, _NLIT)
    nb_dist, ok2 = _kraft_lengths(hist_dist, _NDIST)
    code_lit = _canonical_codes(nb_lit, _NLIT)
    code_dist = _canonical_codes(nb_dist, _NDIST)
    ok = ok1 & ok2

    # --- per-byte bit widths -> bit offsets (body starts at bit 0) ----------
    lit_nb = nb_lit[jnp.clip(d32, 0, 255)]
    lit_rev = code_lit[jnp.clip(d32, 0, 255)]
    p_lnb = nb_lit[jnp.clip(lci, 0, _NLIT - 1)]
    p_lrev = code_lit[jnp.clip(lci, 0, _NLIT - 1)]
    p_dnb = nb_dist[dci]
    p_drev = code_dist[dci]
    p_bits = p_lnb + leb + p_dnb + deb
    w = jnp.where(is_lit, lit_nb, 0)
    w = w.at[jnp.where(preal, p_byte, B)].add(p_bits, mode="drop")
    bitpos = jnp.cumsum(w) - w
    body_bits = jnp.cumsum(w)[B - 1] + nb_lit[256]         # + EOB

    # --- scatter-add the bit stream -----------------------------------------
    out = jnp.zeros(OUTCAP, jnp.int32)
    lb = jnp.where(is_lit, bitpos >> 3, OUTCAP)
    lv = lit_rev << (bitpos & 7)                           # <= 15+7 bits
    for k in range(3):
        out = out.at[jnp.minimum(lb + k, OUTCAP)].add(
            (lv >> (8 * k)) & 0xFF, mode="drop")

    pbit = bitpos[jnp.clip(p_byte, 0, B - 1)]
    # length code + extra (<= 15 + 5 = 20 bits), then dist code + extra
    vlo = (p_lrev | (lex << p_lnb))
    vhi = (p_drev | (dex << p_dnb))
    pb = jnp.where(preal, pbit >> 3, OUTCAP)
    sh = pbit & 7
    vlo_s = vlo << sh                                      # <= 27 bits
    for k in range(4):
        out = out.at[jnp.minimum(pb + k, OUTCAP)].add(
            (vlo_s >> (8 * k)) & 0xFF, mode="drop")
    hi_bit = pbit + p_lnb + leb
    # vhi = dist code (<=15 bits) + extra (<=13) = up to 28 bits; shifted
    # by <=7 it can exceed int32 — emit in two 16-bit halves, each
    # shifted locally, so every scatter value stays well inside int32
    h0 = vhi & 0xFFFF
    h1 = jax.lax.shift_right_logical(vhi, 16)              # <= 12 bits
    hb = jnp.where(preal, hi_bit >> 3, OUTCAP)
    v0 = h0 << (hi_bit & 7)                                # <= 23 bits
    for k in range(3):
        out = out.at[jnp.minimum(hb + k, OUTCAP)].add(
            (v0 >> (8 * k)) & 0xFF, mode="drop")
    hb2 = jnp.where(preal, (hi_bit + 16) >> 3, OUTCAP)
    v1 = h1 << ((hi_bit + 16) & 7)                         # <= 19 bits
    for k in range(3):
        out = out.at[jnp.minimum(hb2 + k, OUTCAP)].add(
            (v1 >> (8 * k)) & 0xFF, mode="drop")

    # EOB at the end of the body
    ebit = body_bits - nb_lit[256]
    ev = code_lit[256] << (ebit & 7)
    eb_ = ebit >> 3
    for k in range(3):
        out = out.at[jnp.minimum(eb_ + k, OUTCAP)].add(
            (ev >> (8 * k)) & 0xFF, mode="drop")

    return (out.astype(jnp.uint8), body_bits, nb_lit, nb_dist, ok)


def _encode_block(data_u8, n, B, OUTCAP, MAXSEQ, MAXPIECE, G):
    mlen, moff, valid = lz._find_matches(data_u8, n, B, max_off=MAX_DIST)
    if G:
        pos, ml, off, nseq = lz._grid_parse(mlen, moff, valid, B, G,
                                            MAXSEQ, match_cap=68)
    else:
        mark = lz._greedy_parse(mlen, valid, B)
        pos, ml, off, nseq = lz._select_sequences(mark, valid, mlen, moff,
                                                  B, MAXSEQ)
    return _emit_deflate(data_u8, pos, ml, off, nseq, n, B, OUTCAP,
                         MAXSEQ, MAXPIECE)


@functools.lru_cache(maxsize=32)
def make_encoder(block_size: int, G: int = 0):
    B = block_size
    OUTCAP = out_capacity(B)
    MAXSEQ = (B // max(G, MIN_MATCH)) + 2
    MAXPIECE = MAXSEQ + B // 255 + 2

    @jax.jit
    def encode(blocks, lens):
        fn = functools.partial(_encode_block, B=B, OUTCAP=OUTCAP,
                               MAXSEQ=MAXSEQ, MAXPIECE=MAXPIECE, G=G)
        return jax.vmap(fn)(blocks, lens)

    return encode


def _encode_block_dyn(data_u8, n, B, OUTCAP, MAXSEQ, MAXPIECE, G):
    mlen, moff, valid = lz._find_matches(data_u8, n, B, max_off=MAX_DIST)
    if G:
        pos, ml, off, nseq = lz._grid_parse(mlen, moff, valid, B, G,
                                            MAXSEQ, match_cap=68)
    else:
        mark = lz._greedy_parse(mlen, valid, B)
        pos, ml, off, nseq = lz._select_sequences(mark, valid, mlen, moff,
                                                  B, MAXSEQ)
    return _emit_deflate_dyn(data_u8, pos, ml, off, nseq, n, B, OUTCAP,
                             MAXSEQ, MAXPIECE)


@functools.lru_cache(maxsize=16)
def make_encoder_dyn(block_size: int, G: int = 0):
    B = block_size
    OUTCAP = out_capacity(B)
    MAXSEQ = (B // max(G, MIN_MATCH)) + 2
    MAXPIECE = MAXSEQ + B // 255 + 2

    @jax.jit
    def encode(blocks, lens):
        fn = functools.partial(_encode_block_dyn, B=B, OUTCAP=OUTCAP,
                               MAXSEQ=MAXSEQ, MAXPIECE=MAXPIECE, G=G)
        return jax.vmap(fn)(blocks, lens)

    return encode


# --- host side of the dynamic path -------------------------------------------

_CL_ORDER = [16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1,
             15]


class _BitW:
    """LSB-first bit accumulator (deflate bit order)."""

    def __init__(self):
        self.acc = 0
        self.n = 0

    def put(self, v: int, nb: int):
        self.acc |= (v & ((1 << nb) - 1)) << self.n
        self.n += nb

    def bytes_bits(self):
        nbytes = (self.n + 7) // 8
        return self.acc.to_bytes(nbytes, "little"), self.n


def _limited_lengths(freq, maxlen: int):
    """Kraft-exact length-limited lengths (host mirror of _kraft_lengths,
    for the 19-symbol code-length code)."""
    total = sum(freq) or 1
    size = 1 << maxlen
    nb = [0] * len(freq)
    for s, f in enumerate(freq):
        if f:
            share = max(1, f * size // total)
            nb[s] = max(1, min(maxlen, maxlen - share.bit_length() + 1))
    D = size - sum(1 << (maxlen - l) for l in nb if l)
    order = sorted((s for s in range(len(freq)) if freq[s]),
                   key=lambda s: -freq[s])
    for s in order:  # shorten most frequent while deficit remains
        while D > 0 and nb[s] > 1:
            c = 1 << (maxlen - nb[s])
            if c > D:
                break
            D -= c
            nb[s] -= 1
    assert D == 0, "CL Kraft fixup failed"
    return nb


def _canon_host(nb, maxlen):
    bl = [0] * (maxlen + 1)
    for l in nb:
        if l:
            bl[l] += 1
    nc = [0] * (maxlen + 1)
    c = 0
    for l in range(1, maxlen + 1):
        c = (c + bl[l - 1]) << 1
        nc[l] = c
    bl[0] = 0
    codes = [0] * len(nb)
    for s, l in enumerate(nb):
        if l:
            codes[s] = nc[l]
            nc[l] += 1
    # bit-reverse for LSB-first emission
    return [int(format(codes[s], f"0{nb[s]}b")[::-1], 2) if nb[s] else 0
            for s in range(len(nb))]


def _rle_code_lengths(seq):
    """RFC 1951 RLE of the code-length sequence with symbols 16/17/18."""
    out = []
    i = 0
    n = len(seq)
    while i < n:
        v = seq[i]
        j = i
        while j < n and seq[j] == v:
            j += 1
        run = j - i
        if v == 0:
            while run >= 3:
                take = min(run, 138)
                if take < 11:
                    take = min(take, 10)
                    out.append((17, take - 3, 3))
                else:
                    out.append((18, take - 11, 7))
                run -= take
            out.extend([(0, 0, 0)] * run)
        else:
            out.append((v, 0, 0))
            run -= 1
            while run >= 3:
                take = min(run, 6)
                out.append((16, take - 3, 2))
                run -= take
            out.extend([(v, 0, 0)] * run)
        i = j
    return out


def _dyn_header(nb_lit, nb_dist):
    """Dynamic-block header bits (BFINAL=0, BTYPE=10, HLIT/HDIST/HCLEN +
    CL-coded code lengths). Returns (bytes, nbits)."""
    hlit = 257
    for s in range(285, -1, -1):
        if nb_lit[s]:
            hlit = max(257, s + 1)
            break
    hdist = 2
    for s in range(29, -1, -1):
        if nb_dist[s]:
            hdist = max(2, s + 1)
            break
    seq = [int(x) for x in nb_lit[:hlit]] + [int(x) for x in
                                             nb_dist[:hdist]]
    rle = _rle_code_lengths(seq)
    clfreq = [0] * 19
    for sym, _, _ in rle:
        clfreq[sym] += 1
    if sum(1 for f in clfreq if f) < 2:  # complete code needs 2 symbols
        clfreq[0 if rle and rle[0][0] != 0 else 8] += 1
    cl_nb = _limited_lengths(clfreq, 7)
    cl_code = _canon_host(cl_nb, 7)
    hclen = 4
    for k in range(18, -1, -1):
        if cl_nb[_CL_ORDER[k]]:
            hclen = max(4, k + 1)
            break
    bw = _BitW()
    bw.put(0, 1)          # BFINAL
    bw.put(2, 2)          # BTYPE = dynamic
    bw.put(hlit - 257, 5)
    bw.put(hdist - 1, 5)
    bw.put(hclen - 4, 4)
    for k in range(hclen):
        bw.put(cl_nb[_CL_ORDER[k]], 3)
    for sym, extra, ebits in rle:
        bw.put(cl_code[sym], cl_nb[sym])
        if ebits:
            bw.put(extra, ebits)
    return bw.bytes_bits()


def _splice_dyn(hdr: bytes, hbits: int, body: np.ndarray,
                body_bits: int) -> bytes:
    """Concatenate header bits + body bits (body emitted at offset 0) and
    close with the empty stored sync block — all-zero pad bits double as
    the stored block's BFINAL/BTYPE."""
    total_bits = hbits + int(body_bits)
    nb_total = (total_bits + 3 + 7) // 8   # + stored-block header bits
    s = hbits & 7
    hfull = hbits // 8
    nbody = (int(body_bits) + 7) // 8
    out = bytearray(nb_total)
    out[:hfull] = hdr[:hfull]
    if s == 0:
        out[hfull:hfull + nbody] = body[:nbody].tobytes()
    else:
        b = body[:nbody + 1].astype(np.uint16)
        lo = ((b << s) & 0xFF).astype(np.uint8)
        hi = (b >> (8 - s)).astype(np.uint8)
        first = (hdr[hfull] if hfull < len(hdr) else 0) | int(lo[0])
        out[hfull] = first
        span = min(nbody, nb_total - hfull - 1)
        merged = (lo[1:span + 1] | hi[:span]).tobytes()
        out[hfull + 1:hfull + 1 + span] = merged
    return bytes(out) + b"\x00\x00\xff\xff"


def encode_blocks_dyn(blocks, accel: int = 1, shardings=None):
    """Dynamic-Huffman device encode: per-block optimal litlen/dist codes
    (reference analog: deflate_medium's dynamic blocks). Chunks carry the
    same sync-flushed contract as the static path."""
    from . import lz4_device
    lz4_device.check_block_sizes(blocks)
    B = _bucket(max(len(b) for b in blocks))
    N = len(blocks)
    arr = np.zeros((N, B), dtype=np.uint8)
    lens = np.zeros(N, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    G = grid_for_accel(accel)
    if G and G * 4 > B:
        G = 0
    enc = make_encoder_dyn(B, G)
    ja, jl = jnp.asarray(arr), jnp.asarray(lens)
    if shardings is not None:
        ja = jax.device_put(ja, shardings[0])
        jl = jax.device_put(jl, shardings[1])
    out, body_bits, nb_lit, nb_dist, ok = jax.block_until_ready(
        enc(ja, jl))
    out_np = np.asarray(out)
    bits_np = np.asarray(body_bits)
    nbl = np.asarray(nb_lit)
    nbd = np.asarray(nb_dist)
    ok_np = np.asarray(ok)
    chunks = []
    for i, b in enumerate(blocks):
        if not ok_np[i]:
            # Kraft fixup failed (degenerate histogram): static fallback
            st, _ = encode_blocks([b], accel)
            chunks.append(st[0])
            continue
        hdr, hbits = _dyn_header(nbl[i], nbd[i])
        chunks.append(_splice_dyn(hdr, hbits, out_np[i], bits_np[i]))
    return chunks, [len(b) for b in blocks]


def encode_blocks(blocks, accel: int = 1, shardings=None):
    """Compress blocks on device into sync-flushed raw-deflate chunks.

    Each chunk is a complete static block + empty stored block, so chunks
    are byte-aligned and their concatenation (+ final block) is a valid
    deflate stream. Returns (chunks, dlens)."""
    from . import lz4_device
    lz4_device.check_block_sizes(blocks)
    B = _bucket(max(len(b) for b in blocks))
    N = len(blocks)
    arr = np.zeros((N, B), dtype=np.uint8)
    lens = np.zeros(N, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    G = grid_for_accel(accel)
    if G and G * 4 > B:
        G = 0
    enc = make_encoder(B, G)
    ja, jl = jnp.asarray(arr), jnp.asarray(lens)
    if shardings is not None:
        ja = jax.device_put(ja, shardings[0])
        jl = jax.device_put(jl, shardings[1])
    out, sizes = jax.block_until_ready(enc(ja, jl))
    from . import compact
    chunks = compact.fetch_chunks(out, sizes)
    return chunks, [len(b) for b in blocks]
