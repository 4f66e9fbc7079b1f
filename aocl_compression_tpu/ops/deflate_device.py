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


def _encode_block(data_u8, n, B, OUTCAP, MAXSEQ, MAXPIECE, G):
    mlen, moff, valid = lz._find_matches(data_u8, n, B, max_off=MAX_DIST)
    if G:
        pos, ml, off, nseq = lz._grid_parse(mlen, moff, valid, B, G, MAXSEQ)
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
