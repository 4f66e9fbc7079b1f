"""Snappy raw-format codec as a parallel TPU device pipeline (tier XLA).

Reference behavior: /root/reference/algos/snappy/snappy.cc —
AOCL_CompressFragment (:~1100, match-skip compressor), the element emitters
EmitLiteral/EmitCopy (:~700-800), and SnappyArrayWriter decode (:2282).
Nothing is translated: match finding / parse / emission reuse the
sort-centric machinery of ops/lz4_device.py (variadic-sort matcher,
tile-anchor or exact pointer-doubling parse, monotone scatter+cummax fills);
only the element serialization differs:

  literal elements: tag (len-1)<<2, +1/+2 extra length bytes above 60/256
  copy elements:    a match of length L splits exactly like the reference's
                    EmitCopy: 64-byte 2-byte-offset copies while L >= 68,
                    one 60-byte copy if 64 < L <= 67, then a final copy that
                    uses the 2-byte tag form (1-byte offset, len 4-11,
                    offset < 2048) when it qualifies.

Each block encodes to a self-contained headerless element stream (snappy
elements are self-delimiting), so container assembly is pure concatenation:
the codec adds the single stream-level varint length preamble.

Decode: parallel tag scan (every byte position speculatively parsed as an
element start) -> pointer-doubling chain marking -> monotone fills ->
while_loop back-reference resolution — same shape as the LZ4 decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import lz4_device as lz
from .lz4_device import (_fill, _NEG, MIN_MATCH, _bucket,
                         grid_for_accel)


def out_capacity(block_size: int) -> int:
    """snappy MaxCompressedLength bound (snappy.cc:218), row-aligned."""
    n = 32 + block_size + block_size // 6
    return -(-n // 512) * 512


# =============================================================================
# Encoder
# =============================================================================

def _lit_hdr(lit):
    """Literal element header size: 0 (no element), 1, 2 or 3 bytes."""
    return jnp.where(lit == 0, 0,
                     jnp.where(lit <= 60, 1, jnp.where(lit <= 256, 2, 3)))


def _copy_split(ml, off):
    """Reference EmitCopy splitting: (n64, has60, final_len, qualifies)."""
    n64 = jnp.maximum(0, (ml - MIN_MATCH) // 64)
    l2 = ml - 64 * n64
    has60 = (l2 > 64).astype(jnp.int32)
    l3 = l2 - 60 * has60
    qual = (l3 < 12) & (off < 2048) & (l3 >= 4)
    return n64, has60, l3, qual


def _emit_snappy(data_u8, pos, ml, off, nseq, n, B: int, OUTCAP: int,
                 MAXSEQ: int):
    """Serialize sequences into a headerless snappy element stream.

    Returns (out u8[OUTCAP], body_size, tail_literals); the tail literal
    element is appended host-side (codecs/snappy.py) like LZ4's stitcher.
    """
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq

    ends = pos + ml
    lit_start = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    lit_start = jnp.where(real, lit_start, 0)
    lit = jnp.where(real, pos - lit_start, 0)

    last = jnp.clip(nseq - 1, 0, MAXSEQ - 1)
    tail_start = jnp.where(nseq > 0, ends[last], 0)
    tail = n - tail_start

    hdr = _lit_hdr(lit)
    n64, has60, l3, qual = _copy_split(ml, off)
    ncopy = n64 + has60 + 1
    seq_sz = jnp.where(real,
                       hdr + lit + 3 * (ncopy - 1)
                       + jnp.where(qual, 2, 3), 0)
    incl = jnp.cumsum(seq_sz)
    body = jnp.where(nseq > 0, incl[last], 0)
    excl = incl - seq_sz

    starts = jnp.where(real, excl, jnp.int32(OUTCAP))
    f_excl = _fill(excl, starts, OUTCAP, 0)
    f_po = _fill(((pos << 16) | off) + _NEG, starts, OUTCAP, _NEG)
    f_lm = _fill(((lit_start << 16) | ml) + _NEG, starts, OUTCAP, _NEG)

    j = jnp.arange(OUTCAP, dtype=jnp.int32)
    delta = j - f_excl
    po = f_po - _NEG
    lm = f_lm - _NEG
    pos_b = jax.lax.shift_right_logical(po, 16)
    off_b = po & 0xFFFF
    start_b = jax.lax.shift_right_logical(lm, 16)
    ml_b = lm & 0xFFFF
    lit_b = pos_b - start_b
    hdr_b = _lit_hdr(lit_b)
    n64_b, has60_b, l3_b, qual_b = _copy_split(ml_b, off_b)
    ncopy_b = n64_b + has60_b + 1

    # --- literal element ----------------------------------------------------
    lit_tag = jnp.where(
        lit_b <= 60, (lit_b - 1) << 2,
        jnp.where(lit_b <= 256, 60 << 2, 61 << 2))
    lm1 = lit_b - 1
    lit_hdr_byte = jnp.where(delta == 0, lit_tag,
                             jnp.where(delta == 1, lm1 & 0xFF,
                                       (lm1 >> 8) & 0xFF))
    lit_byte_pos = jnp.clip(start_b + delta - hdr_b, 0, B - 1)
    lit_byte = data_u8[lit_byte_pos].astype(jnp.int32)

    # --- copy elements ------------------------------------------------------
    rel = delta - hdr_b - lit_b
    c = rel // 3                       # all non-final ops are 3 bytes
    r = rel - 3 * c
    is_final = c == (ncopy_b - 1)
    relf = rel - 3 * (ncopy_b - 1)     # offset within the final op
    # middle op length: 64 for c < n64, else 60 (the has60 op)
    mid_tag = jnp.where(c < n64_b, 0x02 | (63 << 2), 0x02 | (59 << 2))
    fin_tag = jnp.where(
        qual_b,
        0x01 | ((l3_b - 4) << 2) | ((off_b >> 8) << 5),
        0x02 | ((l3_b - 1) << 2))
    copy_byte = jnp.where(
        is_final,
        jnp.where(relf == 0, fin_tag,
                  jnp.where(relf == 1, off_b & 0xFF, off_b >> 8)),
        jnp.where(r == 0, mid_tag,
                  jnp.where(r == 1, off_b & 0xFF, off_b >> 8)))

    byte = jnp.where(delta < hdr_b, lit_hdr_byte,
                     jnp.where(delta < hdr_b + lit_b, lit_byte, copy_byte))
    out32 = jnp.where(j < body, byte, 0)

    # --- trailing literal element, written in place (no host append) --------
    ht = jnp.where(tail == 0, 0,
                   jnp.where(tail <= 60, 1, jnp.where(tail <= 256, 2, 3)))
    t1 = tail - 1
    tag_t = jnp.where(tail <= 60, t1 << 2,
                      jnp.where(tail <= 256, 60 << 2, 61 << 2))
    hdr_vals = jnp.stack([tag_t, t1 & 0xFF, (t1 >> 8) & 0xFF])
    hdr_idx = jnp.where(jnp.arange(3) < ht, body + jnp.arange(3),
                        jnp.int32(OUTCAP))
    out32 = out32.at[hdr_idx].add(hdr_vals, mode="drop")
    i = jnp.arange(B, dtype=jnp.int32)
    in_tail = (i >= tail_start) & (i < n) & (tail > 0)
    tpos = jnp.where(in_tail, body + ht + (i - tail_start),
                     jnp.int32(OUTCAP))
    out32 = out32.at[tpos].add(data_u8.astype(jnp.int32), mode="drop")

    size = body + jnp.where(tail > 0, ht + tail, 0)
    return out32.astype(jnp.uint8), size, tail



def _snappy_hdr(lit):
    """Literal-element header size for a literal run (0 when empty)."""
    return jnp.where(lit == 0, 0,
                     jnp.where(lit <= 60, 1, jnp.where(lit <= 256, 2, 3)))


def _snappy_copy_fields(ml, off):
    """(n64, has60, l3, qual, ncopy, fin, copy_bytes) per EmitCopy."""
    n64 = jax.lax.shift_right_logical(jnp.maximum(ml - MIN_MATCH, 0), 6)
    l2 = ml - 64 * n64
    has60 = (l2 > 64).astype(jnp.int32)
    l3 = l2 - 60 * has60
    qual = (l3 < 12) & (off < 2048) & (l3 >= 4)
    ncopy = n64 + has60 + 1
    fin = jnp.where(qual, 2, 3)
    return n64, has60, l3, qual, ncopy, fin, 3 * (ncopy - 1) + fin


def _seq_size_snappy(lit, ml, off):
    hdr = _snappy_hdr(lit)
    _, _, _, _, _, _, cb = _snappy_copy_fields(ml, off)
    return hdr + cb + lit, hdr + cb


def _emit_snappy_sorted(data_u8, n, sel, cpos, cml, coff, B: int, G: int):
    """Gather-free sort-emit serializer for the snappy element format —
    the port of ops/lz4_device._emit_sorted: literal bytes carry their
    own input byte, matched "spare" positions carry the element header
    and copy-op bytes, ONE variadic sort materializes the stream.

    Returns (out u8[B], body, tail_literals, flag); the caller appends
    the trailing literal element (it owns the raw block bytes) and
    re-encodes flagged blocks on the host oracle (a sequence whose
    headers need more bytes than its match has spares).
    """
    from .lz4_device import _NEG, _BIGPOS, _DUMMY_POS

    M = B // G
    end_t = jnp.where(sel, cpos + cml, 0)
    ce = jax.lax.cummax(end_t)
    pe = jnp.concatenate([jnp.zeros(1, jnp.int32), ce[:-1]])
    lit_t = jnp.where(sel, cpos - pe, 0)
    ml_t = jnp.where(sel, cml, 0)
    off_t = jnp.where(sel, coff, 1)
    seq_sz_t, hdr_cost_t = _seq_size_snappy(lit_t, ml_t, off_t)
    seq_sz = jnp.where(sel, seq_sz_t, 0)
    incl = jnp.cumsum(seq_sz)
    body = incl[-1]
    flag = jnp.any(sel & (hdr_cost_t > ml_t))
    tail = n - ce[-1]

    # monotone fills of the covering-sequence fields (identical packing
    # to the LZ4 emit: pos/off and end-1/lit are strictly increasing
    # over selected tiles)
    packF1 = ((cpos << 16) | off_t) + _NEG
    packF2 = (((cpos + cml - 1) << 16) | lit_t) + _NEG
    f1 = jax.lax.cummax(jnp.where(sel, packF1, _NEG))
    f2 = jax.lax.cummax(jnp.where(sel, packF2, _NEG))
    p1 = jax.lax.cummax(jnp.where(
        sel, jnp.concatenate([jnp.full(1, _NEG), f1[:-1]]), _NEG))
    p2 = jax.lax.cummax(jnp.where(
        sel, jnp.concatenate([jnp.full(1, _NEG), f2[:-1]]), _NEG))
    rn = jax.lax.cummin(jnp.where(sel, cpos, _BIGPOS), reverse=True)
    rnx = jnp.concatenate([rn[1:], jnp.full(1, _BIGPOS)])

    def bcast(x):
        return jnp.repeat(x, G, total_repeat_length=B)

    i = jnp.arange(B, dtype=jnp.int32)
    bf1, bf2, bp1, bp2 = bcast(f1), bcast(f2), bcast(p1), bcast(p2)
    b_incl, b_posN = bcast(incl), bcast(rnx)

    def unpack(f):
        u = f - _NEG
        return jax.lax.shift_right_logical(u, 16), u & 0xFFFF

    posF, offF = unpack(bf1)
    endF1, litF = unpack(bf2)
    endF = jnp.where(bf1 == _NEG, 0, endF1 + 1)
    posP, offP = unpack(bp1)
    endP1, litP = unpack(bp2)

    covered = (bf1 != _NEG) & (i < endF)
    useP = covered & (i < posF - litF)

    pos_x = jnp.where(useP, posP, posF)
    off_x = jnp.where(useP, offP, offF)
    lit_x = jnp.where(useP, litP, litF)
    end_x = jnp.where(useP, endP1 + 1, endF)
    ml_x = end_x - pos_x
    hdr_x = _snappy_hdr(lit_x)
    n64_x, _h60, l3_x, qual_x, ncopy_x, fin_x, cb_x = \
        _snappy_copy_fields(ml_x, off_x)
    sz_x = hdr_x + cb_x + lit_x
    szF, _ = _seq_size_snappy(litF, endF - posF, offF)
    excl_x = jnp.where(useP, b_incl - szF - sz_x, b_incl - sz_x)

    # N branch: literal bytes of the NEXT sequence (or tail -> dummy)
    litN = b_posN - endF
    hdrN = _snappy_hdr(litN)
    opN = b_incl + hdrN + (i - endF)

    # covered: role by spare index k
    k = i - pos_x
    is_lit = covered & (k < 0)
    opL = excl_x + hdr_x + (i - (pos_x - lit_x))

    lm1 = lit_x - 1
    lit_tag = jnp.where(lit_x <= 60, lm1 << 2,
                        jnp.where(lit_x <= 256, 60 << 2, 61 << 2))
    v_hdr = jnp.where(k == 0, lit_tag,
                      jnp.where(k == 1, lm1 & 0xFF, (lm1 >> 8) & 0xFF))

    k2 = k - hdr_x
    base_cp = excl_x + hdr_x + lit_x
    # divide-by-3 via magic multiply (clamped domain): signed integer
    # division by a non-power-of-2 lowers catastrophically on the VPU
    k2c = jnp.clip(k2, 0, 1023)
    jop = jax.lax.shift_right_logical(k2c * 43691, 17)
    r = k2c - 3 * jop
    in_mid = k2 < 3 * (ncopy_x - 1)
    mid_tag = jnp.where(jop < n64_x, 0x02 | (63 << 2), 0x02 | (59 << 2))
    relf = k2 - 3 * (ncopy_x - 1)
    fin_tag = jnp.where(
        qual_x,
        0x01 | ((l3_x - 4) << 2) | (jax.lax.shift_right_logical(off_x, 8)
                                    << 5),
        0x02 | ((l3_x - 1) << 2))
    v_cp = jnp.where(
        in_mid,
        jnp.where(r == 0, mid_tag,
                  jnp.where(r == 1, off_x & 0xFF,
                            jax.lax.shift_right_logical(off_x, 8))),
        jnp.where(relf == 0, fin_tag,
                  jnp.where(relf == 1, off_x & 0xFF,
                            jax.lax.shift_right_logical(off_x, 8))))
    sp_dead = k2 >= cb_x
    op_sp = jnp.where(k < hdr_x, excl_x + k, base_cp + k2)
    v_sp = jnp.where(k < hdr_x, v_hdr, v_cp)

    d = data_u8.astype(jnp.int32)
    op = jnp.where(covered,
                   jnp.where(is_lit, opL,
                             jnp.where(sp_dead, _DUMMY_POS, op_sp)),
                   jnp.where(b_posN >= _BIGPOS, _DUMMY_POS, opN))
    val = jnp.where(covered & ~is_lit, v_sp, d)
    op = jnp.where(i < n, op, _DUMMY_POS)

    key = jnp.where(op >= _DUMMY_POS, jnp.int32(1) << 26, (op << 8) | val)
    (skey,) = jax.lax.sort([key], num_keys=1, is_stable=False)
    out = (skey & 0xFF).astype(jnp.uint8)
    out = jnp.where(jnp.arange(B) < body, out, 0).astype(jnp.uint8)
    return out, body, tail, flag


def _encode_block(data_u8, n, B: int, OUTCAP: int, MAXSEQ: int, G: int = 0):
    mlen, moff, valid = lz._find_matches(data_u8, n, B)
    if G:
        pos, ml, off, nseq = lz._grid_parse(mlen, moff, valid, B, G,
                                            MAXSEQ, match_cap=68)
    else:
        mark = lz._greedy_parse(mlen, valid, B)
        pos, ml, off, nseq = lz._select_sequences(mark, valid, mlen, moff,
                                                  B, MAXSEQ)
    return _emit_snappy(data_u8, pos, ml, off, nseq, n, B, OUTCAP, MAXSEQ)


def _encode_block_v2(data_u8, n, B: int, G: int, depth: int = 4,
                     nw: int = 8, subm: int = 128):
    """Fast tile path on the LZ4 sort-emit skeleton (lz4_device
    _encode_block_v2): shared matcher -> tile election + MXU chain
    marking on the TILE domain (no MAXSEQ compaction, no OUTCAP-domain
    fills, no scatter) -> snappy-format sort-emit. match_cap = 4 + 4*nw
    (<= 64) keeps every copy single-op (ncopy == 1)."""
    mlen, moff, valid = lz._find_matches(data_u8, n, B, depth=depth, nw=nw)
    sel, cpos, cml, coff = lz._grid_select(mlen, moff, valid, B, G,
                                           subm=subm, match_cap=4 + 4 * nw)
    return _emit_snappy_sorted(data_u8, n, sel, cpos, cml, coff, B, G)


@functools.lru_cache(maxsize=32)
def make_encoder(block_size: int, G: int = 0):
    """Jitted batched encoder.

    Signature: (blocks u8[N, B], lens i32[N]) ->
               (bodies, body_sizes i32[N], tails i32[N], flags bool[N]).
    G >= 2 rides the LZ4 sort-emit skeleton: bodies are u8[N, B] element
    streams WITHOUT the trailing literal element (caller appends it —
    encode_blocks does) and flags mark blocks whose headers outgrew
    their match spares (caller re-encodes those on the host oracle).
    G == 0 is the exact path: bodies u8[N, OUTCAP] are complete streams
    (tail literal written in place), flags all-False.
    """
    B = block_size
    if G >= 2:
        fn = functools.partial(_encode_block_v2, B=B, G=G)

        @jax.jit
        def encode(blocks, lens):
            return jax.vmap(fn)(blocks, lens)

        return encode
    OUTCAP = out_capacity(B)
    MAXSEQ = (B // max(G, MIN_MATCH)) + 2

    def fn0(data_u8, n):
        out, size, tail = _encode_block(data_u8, n, B=B, OUTCAP=OUTCAP,
                                        MAXSEQ=MAXSEQ, G=G)
        return out, size, tail, jnp.zeros((), jnp.bool_)

    @jax.jit
    def encode(blocks, lens):
        return jax.vmap(fn0)(blocks, lens)

    return encode


def literal_element(lits: bytes) -> bytes:
    """Host-side literal element (the per-block tail)."""
    n = len(lits)
    if n == 0:
        return b""
    if n <= 60:
        return bytes([(n - 1) << 2]) + lits
    if n <= 256:
        return bytes([60 << 2, n - 1]) + lits
    return bytes([61 << 2, (n - 1) & 0xFF, (n - 1) >> 8]) + lits


def encode_blocks(blocks, accel: int = 1, shardings=None):
    """Compress blocks on device into self-contained headerless element
    streams; returns (fragments, dlens) ready for container assembly.
    shardings = optional (rows, lens) NamedSharding pair (mesh tier)."""
    lz.check_block_sizes(blocks)
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
    out, sizes, tails, flags = jax.block_until_ready(enc(ja, jl))
    from . import compact
    frags = compact.fetch_chunks(out, sizes)
    if G >= 2:
        # sort-emit bodies exclude the trailing literal element: append it
        # host-side from the raw block bytes (same contract as the LZ4
        # stitcher input), and re-encode flagged blocks on the host oracle
        tails = np.asarray(tails)
        flags = np.asarray(flags)
        for i, b in enumerate(blocks):
            if flags[i]:
                from ..runtime import native
                frags[i] = _strip_varint(native.snappy_compress(b))
            elif tails[i] > 0:
                frags[i] = frags[i] + literal_element(b[len(b) - tails[i]:])
    return frags, [len(b) for b in blocks]


def _strip_varint(stream: bytes) -> bytes:
    """Drop the stream-level varint length preamble -> raw element body."""
    i = 0
    while stream[i] & 0x80:
        i += 1
    return stream[i + 1:]


# =============================================================================
# Decoder
# =============================================================================

def _tag_scan(chunk_u8, clen, C: int):
    """Speculative element parse at every byte position: returns
    (next element pos, produced bytes, literal len, literal start, offset)."""
    d = chunk_u8.astype(jnp.int32)
    pad = jnp.concatenate([d, jnp.zeros(8, jnp.int32)])
    idx = jnp.arange(C, dtype=jnp.int32)

    tag = pad[idx]
    typ = tag & 3
    arg = tag >> 2

    # literal: length from tag or 1-2 extra bytes (62/63 four-byte forms do
    # not occur for <=64K blocks; clamp defensively)
    l_im = arg + 1
    l_1b = pad[idx + 1] + 1
    l_2b = (pad[idx + 1] | (pad[idx + 2] << 8)) + 1
    lit_len = jnp.where(arg < 60, l_im, jnp.where(arg == 60, l_1b, l_2b))
    lit_hdr = jnp.where(arg < 60, 1, jnp.where(arg == 60, 2, 3))

    # copy forms
    len1 = ((tag >> 2) & 7) + 4
    off1 = ((tag >> 5) << 8) | pad[idx + 1]
    len2 = arg + 1
    off2 = pad[idx + 1] | (pad[idx + 2] << 8)

    is_lit = typ == 0
    is_c1 = typ == 1
    is_c2 = typ == 2           # typ 3 (4-byte offset) treated as c2-like
    produced = jnp.where(is_lit, lit_len, jnp.where(is_c1, len1, len2))
    hdr = jnp.where(is_lit, lit_hdr,
                    jnp.where(is_c1, 2, jnp.where(is_c2, 3, 5)))
    nxt = jnp.where(is_lit, idx + lit_hdr + lit_len, idx + hdr)
    nxt = jnp.clip(nxt, 0, C)
    lit = jnp.where(is_lit, lit_len, 0)
    a = idx + lit_hdr          # literal source base
    offs = jnp.where(is_c1, off1, off2)
    return nxt, produced, lit, a, offs


def _decode_block(chunk_u8, clen, dlen, C: int, B: int):
    idx = jnp.arange(C, dtype=jnp.int32)
    nxt, produced, lit, a, offs = _tag_scan(chunk_u8, clen, C)
    mark = lz._chain_marks(nxt, clen, C)

    prod_m = jnp.where(mark, produced, 0)
    out_start = jnp.cumsum(prod_m) - prod_m
    emitting = mark & (produced > 0)
    tstart = jnp.where(emitting, out_start, jnp.int32(B))

    f_ts = _fill(out_start, tstart, B, 0)
    f_off = _fill(((out_start << 16) | (offs & 0xFFFF)) + _NEG, tstart,
                  B, _NEG) - _NEG
    f_mstart = _fill(out_start + lit, tstart, B, 0)
    f_a = _fill(a, tstart, B, 0)

    o = jnp.arange(B, dtype=jnp.int32)
    rel = o - f_ts
    is_lit = o < f_mstart
    # offset 0 only occurs in corrupt streams; clamp to 1 so the
    # resolve loop always makes progress (no self-loops -> no hang)
    # Periodic collapse (r5, see lz4_device._decode_block): overlapping
    # matches source from the first period — intra-match chains go away.
    offv = jnp.maximum(f_off & 0xFFFF, 1)
    src = jnp.where(is_lit, -(f_a + rel) - 1,
                    (f_mstart - offv) + jnp.remainder(o - f_mstart, offv))
    src = jnp.where(o < dlen, src, -1)

    def cond(state):
        return state[1]

    def step(state):
        src, _ = state
        gathered = src[jnp.clip(src, 0, B - 1)]
        nsrc = jnp.where(src >= 0, gathered, src)
        return nsrc, jnp.any(nsrc >= 0)

    src, _ = jax.lax.while_loop(cond, step, (src, jnp.any(src >= 0)))

    pad = jnp.concatenate([chunk_u8, jnp.zeros(1, jnp.uint8)])
    out = pad[jnp.clip(-src - 1, 0, C)]
    return jnp.where(o < dlen, out, 0).astype(jnp.uint8)


@functools.lru_cache(maxsize=16)
def make_decoder(chunk_cap: int, block_size: int):
    C, B = chunk_cap, block_size

    @jax.jit
    def decode(chunks, clens, dlens):
        fn = functools.partial(_decode_block, C=C, B=B)
        return jax.vmap(fn)(chunks, clens, dlens)

    return decode


def decode_blocks(chunks, dlens, block_size: int):
    """Decompress headerless element-stream regions on device."""
    if not chunks:
        return []
    if max(dlens) > lz.MAX_DEVICE_BLOCK:
        raise ValueError(
            "device decode: decompressed block exceeds the 64 KiB limit "
            "(16-bit offset packing; 4-byte-offset tags unsupported); "
            "use the host tier")
    C = _bucket(max((len(c) for c in chunks), default=1))
    # cap the reachability-matrix footprint (S matrices of 128^2 int8 per
    # chunk): split oversized batches
    max_n = max(1, (32 << 20) // C)
    if len(chunks) > max_n:
        out = []
        for i in range(0, len(chunks), max_n):
            out.extend(decode_blocks(chunks[i:i + max_n],
                                     dlens[i:i + max_n], block_size))
        return out
    B = _bucket(max(max(dlens), block_size))
    N = len(chunks)
    arr = np.zeros((N, C), dtype=np.uint8)
    clens = np.zeros(N, dtype=np.int32)
    for i, c in enumerate(chunks):
        arr[i, :len(c)] = np.frombuffer(c, dtype=np.uint8)
        clens[i] = len(c)
    dec = make_decoder(C, B)
    out = jax.block_until_ready(
        dec(jnp.asarray(arr), jnp.asarray(clens),
            jnp.asarray(np.asarray(dlens, dtype=np.int32))))
    if B % 512 == 0:
        from . import compact
        return compact.fetch_chunks(out, jnp.asarray(
            np.asarray(dlens, dtype=np.int32)))
    out_np = np.asarray(out)
    return [out_np[i, :dlens[i]].tobytes() for i in range(N)]
