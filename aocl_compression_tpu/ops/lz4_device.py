"""LZ4 block codec as a fully parallel TPU device pipeline (tier XLA).

A TPU-first re-design of the reference's serial greedy encoder/decoder
(/root/reference/algos/lz4/lz4.c:1447-1580 compress hot loop, :4898 decode).
Nothing here translates the C control flow — every stage is re-cast onto the
primitives this hardware is actually fast at. Measured on the target chip
(see BENCH notes): elementwise word ops and `lax.sort` (bitonic, carries
payloads for free) run 5-30x faster than random gather/scatter, so the
pipeline is built "sort-centric":

Encode (per block, vmapped over the batch):
  1. hashing        — vectorized u32 hash of every position's 4-byte window
                      (word domain: bytes are 12x slower than words here).
  2. match finding  — ONE variadic sort of key (hash<<16 | pos) carrying the
                      position's next NW words as payloads. In sorted order
                      the previous (and 2nd-previous) entry with the same
                      hash is the nearest candidate; match length comes from
                      comparing the carried word chains — zero gathers.
                      Small offsets (1..4, 8) get EXACT run lengths via
                      shifted compares + reverse cummin (covers RLE/periodic
                      data beyond the word-chain cap). One more variadic
                      sort restores position order.
  3. parse          — the greedy "jump by match length" chain is marked on
                      the MXU: 128-element sub-chains become int8
                      adjacency-plus-identity matrices and ~7 batched
                      matrix squarings compute reach-from-start exactly
                      (_chain_marks / _grid_parse); no scatter/gather
                      rounds. Two modes: accel<=1 runs the exact serial
                      greedy chain on the byte domain (full ratio);
                      accel>=2 elects one best candidate per G-byte tile
                      (G = 1<<accel) and chains tiles — ~3% ratio cost at
                      G=4 for a ~40% throughput gain.
  4. emission       — two modes. Tile parses (G>=2) use the round-2
                      SORT-EMIT (_emit_sorted): every output byte is
                      sourced from the input byte domain (literals carry
                      their own byte; matched "spare" positions carry the
                      sequence's header bytes), per-byte fields come from
                      monotone cummax/cummin fills on the tile domain, and
                      ONE lax.sort of (out_pos<<8 | byte) materializes the
                      stream — zero gathers, zero scatters. The exact
                      parse (G=0) keeps the original fill+gather emit.

Decode (per block, vmapped):
  1. token scan     — for EVERY byte position, compute "if a token started
                      here, where is the next token and how many bytes would
                      it produce" (255-run extension counts come from
                      next-non-255 reverse scans).
  2. chain marking  — the same two-level MXU reachability used by the
                      encoder parses: per-128-byte-segment int8 matrices,
                      segment exits threaded by a short scan.
  3. scatter map    — monotone scatter+cummax fills give each output byte
                      its covering token's fields (no searchsorted).
  4. resolution     — back-references resolved by src = src[src] pointer
                      jumping inside a while_loop that stops as soon as a
                      pass changes nothing (typical data: 2-3 passes, not
                      log B).

Blocks are independent (fresh history), so the whole batch runs as one
jit-compiled program over (N, B) arrays; the RAP container stitches the
resulting fragments (codecs/lz4_stitch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HASH_BITS = 15         # key packs (hash << 16) | pos into a positive int32
NW = 16                # extension words carried through the sort
MATCH_CAP = 4 + 4 * NW  # max hash-candidate match length (84)
SMALL_OFFSETS = (1, 2, 4)  # offsets with exact (uncapped) run lengths
MIN_MATCH = 4
MFLIMIT = 12           # no match may start within the last 12 bytes
LAST_LITERALS = 5
_NEG = jnp.int32(-(1 << 31))


def _i32(x):
    return jnp.asarray(x, jnp.int32)


def out_capacity(block_size: int) -> int:
    """Padded per-block output capacity (>= worst-case body size),
    rounded to the compaction row quantum (ops/compact.py)."""
    n = block_size + block_size // 255 + 64
    return -(-n // 512) * 512


def grid_for_accel(accel: int) -> int:
    """Map LZ4 acceleration to the parse mode: 0 = exact greedy chain,
    else the tile-anchor stride (reference analog: the dynamic match-skip
    step of AOCL_LZ4_compress_fast_extState, lz4.c:1447-1580).

    accel 2 -> G=4 (~3% ratio cost, the default throughput mode),
    3 -> 8, 4 -> 16, 5+ -> 32."""
    if accel <= 1:
        return 0
    return min(32, 1 << accel)


# =============================================================================
# Encoder
# =============================================================================

def _window_words(data_u8: jnp.ndarray, B: int, nw: int = NW):
    """w[k][i] = 4 bytes at position i + 4k, little-endian, as uint32."""
    d = data_u8.astype(jnp.uint32)
    pad = jnp.concatenate([d, jnp.zeros(4 * nw + 8, jnp.uint32)])

    def word_at(s):
        return (pad[s:s + B] | (pad[s + 1:s + B + 1] << 8)
                | (pad[s + 2:s + B + 2] << 16)
                | (pad[s + 3:s + B + 3] << 24))

    return [word_at(4 * k) for k in range(nw + 1)]


def _chain_match_len(cur, prev, ok0, nw: int = NW):
    """Match length (>= MIN_MATCH where ok0) from two carried word chains."""
    mlen = jnp.where(ok0, jnp.int32(MIN_MATCH), 0)
    alive = ok0
    for k in range(1, nw + 1):
        x = cur[k] ^ prev[k]
        eqw = x == 0
        b0 = (x & 0xFF) == 0
        b1 = (x & 0xFFFF) == 0
        b2 = (x & 0xFFFFFF) == 0
        partial = b0.astype(jnp.int32) + b1.astype(jnp.int32) \
            + b2.astype(jnp.int32)
        mlen = mlen + jnp.where(alive, jnp.where(eqw, 4, partial), 0)
        alive = alive & eqw
    return mlen


def _find_matches(data_u8: jnp.ndarray, n: jnp.ndarray, B: int,
                  max_off: int = 0, depth: int = 2, nw: int = NW,
                  small_offsets: tuple = SMALL_OFFSETS,
                  hash_bits: int = HASH_BITS, nw_deep: int = 0,
                  ext_passes: int = 0):
    """Per-position best (offset, matchlen) candidates — sort-centric.

    Returns (mlen, moff, valid) clamped to the format's end-of-block rules
    for a block of "actual length" n (the batch pads the last block).
    max_off > 0 restricts candidates to a sliding window (deflate: 32K).
    depth = how many previous same-hash occurrences to consider (the k-th
    is a shift by k in sorted order — the hash-chain walk of LZ4HC
    (lz4hc.c AOCL_LZ4HC_InsertAndGetWiderMatch) becomes k shifted
    compares, each fully fused elementwise work).
    hash_bits: bucket count (16 fits the (hash << 16) | pos key exactly —
    the i32 sort order is wrap-consistent, grouping is what matters).
    nw_deep > 0 trims the compare chains of the s >= 2 rungs to nw_deep
    words: the nearest candidate keeps the full match cap while deeper
    (rarer, farther) candidates pay less HBM — the depth x nw product is
    the measured wall of the whole encode pipeline.
    """
    idx = jnp.arange(B, dtype=jnp.int32)
    words = _window_words(data_u8, B, nw)
    w0 = words[0]
    h = (w0 * jnp.uint32(2654435761)) >> jnp.uint32(32 - hash_bits)
    key = ((h << 16) | idx.astype(jnp.uint32)).astype(jnp.int32)

    ops = jax.lax.sort([key] + [w.astype(jnp.int32) for w in words],
                       num_keys=1, is_stable=False)
    skey, swords = ops[0], ops[1:]
    spos = skey & 0xFFFF
    shash = jax.lax.shift_right_logical(skey, 16)

    def shifted(arr, s, fill):
        return jnp.concatenate(
            [jnp.full((s,), fill, arr.dtype), arr[:-s]])

    best_len = jnp.zeros(B, jnp.int32)
    best_off = jnp.ones(B, jnp.int32)
    for s in range(1, depth + 1):  # k-th previous same-hash position
        nw_s = nw if (s == 1 or not nw_deep) else min(nw, nw_deep)
        ph = shifted(shash, s, -1)
        pp = shifted(spos, s, 0)
        pw = [shifted(w, s, -1) for w in swords[:nw_s + 1]]
        ok0 = (ph == shash) & (pw[0] == swords[0])
        # all s intermediate entries share the hash iff the s-th does
        # (sorted order groups hashes), so no extra same-hash checks needed
        off = spos - pp
        if max_off:
            ok0 = ok0 & (off <= max_off)
        ml = _chain_match_len(swords, pw, ok0, nw_s)
        better = ml > best_len
        best_len = jnp.where(better, ml, best_len)
        best_off = jnp.where(better, off, best_off)

    # restore position order: one more variadic sort keyed by position
    _, mlen_h, off_h = jax.lax.sort([spos, best_len, best_off],
                                    num_keys=1, is_stable=False)

    # --- exact run lengths for small offsets (RLE / short periods) ---------
    # One batched reverse-cummin over all offsets (no flips: reverse=True).
    d = data_u8.astype(jnp.int32)
    best_len, best_off = mlen_h, off_h
    BIG = jnp.int32(2 * B)
    rows = []
    for o in small_offsets:
        agree = jnp.concatenate(
            [jnp.zeros(o, bool), d[o:] == d[:-o]]) & (idx >= o)
        rows.append(jnp.where(~agree, idx, BIG))
    nxt_all = jax.lax.cummin(jnp.stack(rows), axis=1, reverse=True)
    for i, o in enumerate(small_offsets):
        run = jnp.minimum(nxt_all[i], _i32(B)) - idx
        better = (run >= MIN_MATCH) & (run > best_len)
        best_len = jnp.where(better, run, best_len)
        best_off = jnp.where(better, jnp.int32(o), best_off)

    # --- saturated-match extension ladder (VERDICT r4 #7) -------------------
    # A chain candidate caps at CAPV = MIN_MATCH + 4*nw verified bytes. If
    # position i is saturated and the candidate at i+CAPV carries the SAME
    # offset, the two verified spans concatenate — so long matches resolve
    # by pointer doubling over the stride-CAPV functional graph: log passes
    # of STATIC shifts + selects (fused elementwise, no gathers). Reference
    # analog: the unbounded match-extension loop of LZ4_count (lz4.c), which
    # the sort-centric matcher otherwise cannot express.
    if ext_passes:
        CAPV = MIN_MATCH + 4 * nw

        def shl(arr, s, fill):
            return jnp.concatenate(
                [arr[s:], jnp.full(s, fill, arr.dtype)])

        link = (best_len >= CAPV) & (shl(best_off, CAPV, 0) == best_off)
        elen = best_len
        stride = CAPV
        for _ in range(ext_passes):
            if stride >= B:
                break
            elen = jnp.where(link, stride + shl(elen, stride, 0), elen)
            link = link & shl(link, stride, False)
            stride *= 2
        best_len = elen

    # --- end-of-block rules -------------------------------------------------
    best_len = jnp.minimum(best_len, n - LAST_LITERALS - idx)
    valid = (best_len >= MIN_MATCH) & (idx <= n - MFLIMIT - 1) & (idx < n)
    return jnp.where(valid, best_len, 1), jnp.maximum(best_off, 1), valid


def _greedy_parse(mlen: jnp.ndarray, valid: jnp.ndarray, B: int):
    """Exact serial-greedy selection: next[i] = i + (mlen if match else 1);
    chain-from-0 membership via the two-level MXU reachability marking
    (_chain_marks), exactly as the decoder marks token chains."""
    idx = jnp.arange(B, dtype=jnp.int32)
    step = jnp.where(valid, mlen, 1)
    nxt = jnp.minimum(idx + step, _i32(B))
    return _chain_marks(nxt, _i32(B), B)



def _floor_chain_nxt(cpos, cml, cvalid, aidx, shift, M, G, match_cap=0):
    """Next-tile function of the greedy tile chain: jump to the tile
    containing the match end (t0) when that tile's elected anchor starts
    at or after the end, else t0+1.

    With a match cap, the floor test cpos[t0] >= end is evaluated WITHOUT
    a gather: cpos[t0] >= end <=> r[t0] >= end & (G-1) with r = anchor
    offset within its tile, and hash-match jumps are bounded by
    cap//G + 2, so a K-deep shifted-select ladder covers them (the random
    gather was the measured ~12 ms/4 MB wall of the select stage).
    Longer jumps (uncapped small-offset runs) take t0+1, losing at most
    G-1 bytes of a >=cap-byte match — ~0.1% ratio.
    """
    end = cpos + cml
    t0 = jax.lax.shift_right_logical(end, shift)
    K = (match_cap // G) + 2 if match_cap else 0
    if 0 < K <= 24:
        r = cpos - (aidx << shift)
        ein = end & (G - 1)
        jump = t0 - aidx
        ge = jnp.zeros(M, jnp.bool_)
        for j in range(1, K + 1):
            r_j = jnp.concatenate([r[j:], jnp.zeros(j, jnp.int32)])
            ge = ge | ((jump == j) & (r_j >= ein))
        use_floor = cvalid & (t0 > aidx) & (t0 < M) & ge
    else:
        t0c = jnp.clip(t0, 0, M - 1)
        use_floor = cvalid & (t0 > aidx) & (t0 < M) & (cpos[t0c] >= end)
    return jnp.where(cvalid, jnp.where(use_floor, t0, t0 + 1), aidx + 1)


def _grid_parse(mlen, moff, valid, B: int, G: int, MAXSEQ: int,
                match_cap: int = 0):
    """Tile-anchor parse: one sequence may start per G-byte tile.

    Each tile elects its best candidate (max net coverage = matchlen minus
    in-tile offset) with a cheap reshape+argmax; the greedy chain then lives
    on the M = B//G tile domain, so each doubling round's gather/scatter is
    G-times smaller than the exact parse's. Bytes between a match end and
    the next elected candidate become ordinary literals of the next
    sequence — format-exact LZ4, slightly fewer matches than serial greedy.
    Returns the selected (pos, ml, off, nseq) compacted to MAXSEQ entries.
    """
    M = B // G
    shift = int(np.log2(G))
    aidx = jnp.arange(M, dtype=jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)

    # Tile election as a shifted-max tournament on the flat byte domain —
    # all fusable elementwise ops (a (M, G) reshape+argmax would relayout).
    # score = net coverage (matchlen minus in-tile offset).
    score = jnp.where(valid, mlen - (idx & (G - 1)), -1)
    sml, spos, soff = mlen, idx, moff
    for step in (1, 2, 4, 8, 16, 32)[:shift]:
        sc2 = jnp.concatenate([score[step:], jnp.full(step, -1, jnp.int32)])
        ml2 = jnp.concatenate([sml[step:], sml[:step]])
        po2 = jnp.concatenate([spos[step:], spos[:step]])
        of2 = jnp.concatenate([soff[step:], soff[:step]])
        take = sc2 > score
        score = jnp.maximum(score, sc2)
        sml = jnp.where(take, ml2, sml)
        spos = jnp.where(take, po2, spos)
        soff = jnp.where(take, of2, soff)
    cvalid = score[::G] >= 0
    cpos = spos[::G]
    cml = sml[::G]
    coff = soff[::G]

    # Independent 128-anchor sub-chains (one forced sequence boundary per
    # sub-segment, ~0.3% ratio cost) sized to the MXU: the chain-from-start
    # marking becomes boolean reachability via 7 batched (128,128) matrix
    # squarings — the parse runs entirely on the systolic array, with no
    # scatter/gather rounds at all.
    SUBM = min(M, 128)
    S = M // SUBM
    sub_end_pos = ((aidx // SUBM) + 1) * (SUBM * G)  # input-byte boundary
    cml = jnp.minimum(cml, sub_end_pos - cpos)       # no cross-sub matches
    cvalid = cvalid & (cml >= MIN_MATCH)

    # next tile: the one the match end lands in, if its elected candidate
    # starts at or after the end (and is a later tile); else the tile after
    nxt = _floor_chain_nxt(cpos, cml, cvalid, aidx, shift, M, G,
                            match_cap=match_cap)

    jloc = (nxt - (aidx // SUBM) * SUBM).reshape(S, SUBM)
    cols = jnp.arange(SUBM, dtype=jnp.int32)
    edge = (jloc[:, :, None] == cols[None, None, :])  # exits have no edge
    eye = jnp.eye(SUBM, dtype=jnp.bool_)[None]
    A = (edge | eye).astype(jnp.int8)

    def body(_, A):
        A2 = jnp.matmul(A, A, preferred_element_type=jnp.int32)
        return jnp.minimum(A2, 1).astype(jnp.int8)

    rounds = int(np.ceil(np.log2(max(SUBM, 2))))
    A = jax.lax.fori_loop(0, rounds, body, A)
    sel = (A[:, 0, :] > 0).reshape(M) & cvalid

    return _compact_selected(sel, aidx, cpos, cml, coff, M, MAXSEQ)


def _compact_selected(sel, order, pos, ml, off, DOM: int, MAXSEQ: int):
    """Squeeze the selected sequences to the front, in order — one variadic
    sort (far cheaper than nonzero+gathers on this chip).

    When more than MAXSEQ sequences are selected (callers may size MAXSEQ
    below the theoretical bound for cheaper downstream stages), the excess
    matches are dropped — their spans become ordinary literals of the
    following sequence, which stays format-exact."""
    selkey = jnp.where(sel, order, order + DOM)
    _, ppos, pml, poff = jax.lax.sort([selkey, pos, ml, off], num_keys=1)
    nseq = jnp.minimum(jnp.sum(sel.astype(jnp.int32)), MAXSEQ)
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq

    def take(x, fill):
        x = x[:min(DOM, MAXSEQ)]
        if MAXSEQ > DOM:
            x = jnp.concatenate([x, jnp.full(MAXSEQ - DOM, fill, jnp.int32)])
        return x

    return (jnp.where(real, take(ppos, 0), 0),
            jnp.where(real, take(pml, 0), 0),
            jnp.where(real, take(poff, 1), 1), nseq)


def _select_sequences(mark, valid, mlen, moff, B: int, MAXSEQ: int):
    """Compact the exact parse's selected byte positions to MAXSEQ entries."""
    sel = mark & valid
    idx = jnp.arange(B, dtype=jnp.int32)
    return _compact_selected(sel, idx, idx, mlen, moff, B, MAXSEQ)


def _fill(values, starts, OUTCAP: int, init):
    """Segmented broadcast: scatter `values` at `starts`, cummax-fill right.

    Valid iff `values` is strictly increasing over real entries (callers pack
    a strictly-monotone field into the high bits).
    """
    base = jnp.full(OUTCAP, init, jnp.int32)
    t = base.at[starts].max(values, mode="drop")
    return jax.lax.cummax(t)


def _emit(data_u8, pos, ml, off, nseq, n, B: int, OUTCAP: int, MAXSEQ: int):
    """Serialize the selected sequences into the LZ4 body (no final sequence).

    Returns (out bytes u8[OUTCAP], body_size, tail_literals). All per-byte
    sequence fields arrive via three monotone scatter+cummax fills; the only
    gather is the literal-byte fetch from the input.
    """
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq

    ends = pos + ml
    lit_start = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    lit_start = jnp.where(real, lit_start, 0)
    lit = jnp.where(real, pos - lit_start, 0)

    # trailing literals after the last match (the stitcher's tail)
    last = jnp.clip(nseq - 1, 0, MAXSEQ - 1)
    tail_start = jnp.where(nseq > 0, ends[last], 0)
    tail = n - tail_start

    nlx = jnp.where(lit < 15, 0, 1 + (lit - 15) // 255)
    nmx = jnp.where(ml - MIN_MATCH < 15, 0, 1 + (ml - 19) // 255)
    seq_sz = jnp.where(real, 3 + nlx + lit + nmx, 0)
    incl = jnp.cumsum(seq_sz)
    body = jnp.where(nseq > 0, incl[last], 0)
    excl = incl - seq_sz

    # --- monotone fills: every output byte learns its sequence's fields ----
    starts = jnp.where(real, excl, jnp.int32(OUTCAP))  # OUTCAP slots drop
    f_excl = _fill(excl, starts, OUTCAP, 0)
    # pos < 2^16 strictly increases; lit_start likewise (ends are strict)
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
    nlx_b = jnp.where(lit_b < 15, 0, 1 + (lit_b - 15) // 255)

    tok = (jnp.minimum(lit_b, 15) << 4) | jnp.minimum(ml_b - MIN_MATCH, 15)
    lit_ext = jnp.clip(jnp.minimum(lit_b - 15 - 255 * (delta - 1), 255),
                       0, 255)
    lit_byte_pos = jnp.clip(start_b + delta - 1 - nlx_b, 0, B - 1)
    lit_byte = data_u8[lit_byte_pos].astype(jnp.int32)
    ml_ext_t = delta - (3 + nlx_b + lit_b)
    ml_ext = jnp.clip(jnp.minimum(ml_b - 19 - 255 * ml_ext_t, 255), 0, 255)

    o_lo = 1 + nlx_b + lit_b
    byte = jnp.where(
        delta == 0, tok,
        jnp.where(delta <= nlx_b, lit_ext,
                  jnp.where(delta < o_lo, lit_byte,
                            jnp.where(delta == o_lo, off_b & 255,
                                      jnp.where(delta == o_lo + 1,
                                                off_b >> 8, ml_ext)))))
    out = jnp.where(j < body, byte, 0).astype(jnp.uint8)
    return out, body, tail


def _grid_select(mlen, moff, valid, B: int, G: int, subm: int = 128,
                 match_cap: int = 0):
    """Tile-anchor election + MXU chain marking, un-compacted: returns
    (sel, cpos, cml, coff) on the M = B//G tile domain. Factored out of
    _grid_parse so the sort-emit path can consume tile-domain fields
    directly (no MAXSEQ compaction). subm = chain-marking subblock width
    (matches clamp at subm*G byte boundaries; smaller = cheaper marking,
    slightly more sequence splits on long runs)."""
    M = B // G
    shift = int(np.log2(G))
    aidx = jnp.arange(M, dtype=jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)

    score = jnp.where(valid, mlen - (idx & (G - 1)), -1)
    sml, spos, soff = mlen, idx, moff
    for step in (1, 2, 4, 8, 16, 32)[:shift]:
        sc2 = jnp.concatenate([score[step:], jnp.full(step, -1, jnp.int32)])
        ml2 = jnp.concatenate([sml[step:], sml[:step]])
        po2 = jnp.concatenate([spos[step:], spos[:step]])
        of2 = jnp.concatenate([soff[step:], soff[:step]])
        take = sc2 > score
        score = jnp.maximum(score, sc2)
        sml = jnp.where(take, ml2, sml)
        spos = jnp.where(take, po2, spos)
        soff = jnp.where(take, of2, soff)
    cvalid = score[::G] >= 0
    cpos = spos[::G]
    cml = sml[::G]
    coff = soff[::G]

    SUBM = min(M, subm)
    S = M // SUBM
    sub_end_pos = ((aidx // SUBM) + 1) * (SUBM * G)
    cml = jnp.minimum(cml, sub_end_pos - cpos)
    cvalid = cvalid & (cml >= MIN_MATCH)

    nxt = _floor_chain_nxt(cpos, cml, cvalid, aidx, shift, M, G,
                            match_cap=match_cap)

    jloc = (nxt - (aidx // SUBM) * SUBM).reshape(S, SUBM)
    cols = jnp.arange(SUBM, dtype=jnp.int32)
    edge = (jloc[:, :, None] == cols[None, None, :])
    eye = jnp.eye(SUBM, dtype=jnp.bool_)[None]
    A = (edge | eye).astype(jnp.int8)

    def body(_, A):
        A2 = jnp.matmul(A, A, preferred_element_type=jnp.int32)
        return jnp.minimum(A2, 1).astype(jnp.int8)

    rounds = int(np.ceil(np.log2(max(SUBM, 2))))
    A = jax.lax.fori_loop(0, rounds, body, A)
    sel = (A[:, 0, :] > 0).reshape(M) & cvalid
    return sel, cpos, cml, coff


def _nlx_of(lit):
    return jnp.where(lit < 15, 0, 1 + (lit - 15) // 255)


def _nmx_of(ml):
    return jnp.where(ml - MIN_MATCH < 15, 0, 1 + (ml - 19) // 255)


_DUMMY_POS = jnp.int32(1 << 17)   # > any real out position (body <= B <= 64Ki)
_BIGPOS = jnp.int32(1 << 20)


def _emit_sorted(data_u8, n, sel, cpos, cml, coff, B: int, G: int):
    """Gather-free, scatter-free serializer (the round-2 emit).

    Every output byte is sourced from the INPUT byte domain:
      - literal bytes carry their own input byte;
      - the >= MIN_MATCH matched positions of each sequence ("spares") carry
        its header bytes: spare k=0 -> token, 1..nlx -> literal-extension
        bytes, nlx+1/nlx+2 -> offset, nlx+3.. -> match-extension bytes.
    Per-byte covering-sequence fields come from monotone cummax/cummin
    fills on the tile domain (values already live there — no scatter), and
    ONE variadic sort of (out_pos << 8 | byte) materializes the stream:
    coverage of [0, body) is exact by construction, so rank == position.

    A block is FLAGGED (host re-encode) iff some sequence's header needs
    more bytes than its match has spares (3 + nlx + nmx > ml) — only
    possible for a >=258-byte literal run followed by a tiny match; the
    caller routes flagged blocks to the C++ oracle. In unflagged blocks
    every header byte is paid for by a spare, so body <= n <= B.
    """
    M = B // G
    end_t = jnp.where(sel, cpos + cml, 0)
    # previous selected end (per-sequence literal run start)
    ce = jax.lax.cummax(end_t)
    pe = jnp.concatenate([jnp.zeros(1, jnp.int32), ce[:-1]])
    lit_t = jnp.where(sel, cpos - pe, 0)
    ml_t = jnp.where(sel, cml, 0)
    nlx_t = _nlx_of(lit_t)
    nmx_t = _nmx_of(ml_t)
    seq_sz = jnp.where(sel, 3 + nlx_t + lit_t + nmx_t, 0)
    incl = jnp.cumsum(seq_sz)
    body = incl[-1]
    flag = jnp.any(sel & (3 + nlx_t + nmx_t > ml_t))
    tail = n - ce[-1]

    # --- tile-domain monotone fills ----------------------------------------
    # F = fields of the last selected sequence at tile <= t; P = F's
    # predecessor; N = position of the next selected sequence at tile > t.
    # Packs are strictly increasing over selected tiles (pos/end increase),
    # so cummax-fill is a valid "last selected value" broadcast.
    packF1 = ((cpos << 16) | coff) + _NEG            # pos_F, off_F
    packF2 = (((cpos + cml - 1) << 16) | lit_t) + _NEG  # end_F-1, lit_F
    f1 = jax.lax.cummax(jnp.where(sel, packF1, _NEG))
    f2 = jax.lax.cummax(jnp.where(sel, packF2, _NEG))
    p1 = jax.lax.cummax(jnp.where(
        sel, jnp.concatenate([jnp.full(1, _NEG), f1[:-1]]), _NEG))
    p2 = jax.lax.cummax(jnp.where(
        sel, jnp.concatenate([jnp.full(1, _NEG), f2[:-1]]), _NEG))
    rn = jax.lax.cummin(jnp.where(sel, cpos, _BIGPOS), reverse=True)
    rnx = jnp.concatenate([rn[1:], jnp.full(1, _BIGPOS)])  # next sel > t

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
    useP = covered & (i < posF - litF)   # before F's literal run: P's spare

    pos_x = jnp.where(useP, posP, posF)
    off_x = jnp.where(useP, offP, offF)
    lit_x = jnp.where(useP, litP, litF)
    end_x = jnp.where(useP, endP1 + 1, endF)
    ml_x = end_x - pos_x
    nlx_x = _nlx_of(lit_x)
    nmx_x = _nmx_of(ml_x)
    sz_x = 3 + nlx_x + lit_x + nmx_x
    # exclusive output offset of the chosen sequence: incl[t] is the sum
    # through F; walk back one (F) or two (P) sequence sizes
    szF = 3 + _nlx_of(litF) + litF + _nmx_of(endF - posF)
    excl_x = jnp.where(useP, b_incl - szF - sz_x, b_incl - sz_x)

    # --- N branch (literal of the next sequence / tail) --------------------
    litN = b_posN - endF
    nlxN = _nlx_of(litN)
    opN = b_incl + 1 + nlxN + (i - endF)

    # --- covered branch: role by spare index k -----------------------------
    k = i - pos_x
    is_lit = covered & (k < 0)
    # literal of X: out = excl + 1 + nlx + (i - lit_start)
    opL = excl_x + 1 + nlx_x + (i - (pos_x - lit_x))
    # spares
    tok = (jnp.minimum(lit_x, 15) << 4) | jnp.minimum(ml_x - MIN_MATCH, 15)
    j_lx = k - 1
    v_lx = jnp.clip(lit_x - 15 - 255 * j_lx, 0, 255)
    j_mx = k - nlx_x - 3
    v_mx = jnp.clip(ml_x - 19 - 255 * j_mx, 0, 255)
    base_lit_end = excl_x + 1 + nlx_x + lit_x   # offset field position
    op_sp = jnp.where(
        k == 0, excl_x,
        jnp.where(k <= nlx_x, excl_x + k,
                  jnp.where(k == nlx_x + 1, base_lit_end,
                            jnp.where(k == nlx_x + 2, base_lit_end + 1,
                                      base_lit_end + 2 + j_mx))))
    v_sp = jnp.where(
        k == 0, tok,
        jnp.where(k <= nlx_x, v_lx,
                  jnp.where(k == nlx_x + 1, off_x & 255,
                            jnp.where(k == nlx_x + 2,
                                      jax.lax.shift_right_logical(off_x, 8),
                                      v_mx))))
    sp_dead = k >= 3 + nlx_x + nmx_x

    d = data_u8.astype(jnp.int32)
    op = jnp.where(covered,
                   jnp.where(is_lit, opL, jnp.where(sp_dead, _DUMMY_POS,
                                                    op_sp)),
                   jnp.where(b_posN >= _BIGPOS, _DUMMY_POS, opN))
    val = jnp.where(covered & ~is_lit, v_sp, d)
    op = jnp.where(i < n, op, _DUMMY_POS)

    key = jnp.where(op >= _DUMMY_POS, jnp.int32(1) << 26, (op << 8) | val)
    (skey,) = jax.lax.sort([key], num_keys=1, is_stable=False)
    out = (skey & 0xFF).astype(jnp.uint8)
    out = jnp.where(jnp.arange(B) < body, out, 0).astype(jnp.uint8)
    return out, body, tail, flag


def _encode_block_v2(data_u8, n, B: int, G: int, depth: int = 2,
                     nw: int = NW, small_offsets: tuple = SMALL_OFFSETS,
                     subm: int = 128, lazy: int = 0,
                     hash_bits: int = HASH_BITS, nw_deep: int = 0,
                     ext_passes: int = 0):
    mlen, moff, valid = _find_matches(data_u8, n, B, depth=depth, nw=nw,
                                      small_offsets=small_offsets,
                                      hash_bits=hash_bits, nw_deep=nw_deep,
                                      ext_passes=ext_passes)
    for _ in range(lazy):
        # one-step lazy demotion before tile election: drop a candidate
        # when the next byte position holds a strictly-longer one, so the
        # election sees the better start (lz4hc.c lazy analog)
        nx_len = jnp.concatenate([mlen[1:], jnp.zeros(1, jnp.int32)])
        nx_val = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
        valid = valid & ~(nx_val & (nx_len > mlen + 1))
    # extension can push matches past the hash cap up to the subblock
    # clamp; the floor-chain ladder stays bounded (K <= 24 measured knee) —
    # longer jumps take the documented t0+1 fallback.
    mcap = min(88, subm * G) if ext_passes else 4 + 4 * nw
    sel, cpos, cml, coff = _grid_select(mlen, moff, valid, B, G, subm=subm,
                                        match_cap=mcap)
    return _emit_sorted(data_u8, n, sel, cpos, cml, coff, B, G)


def _encode_block(data_u8, n, B: int, OUTCAP: int, MAXSEQ: int, G: int = 0,
                  depth: int = 2, nw: int = NW, lazy: int = 0):
    mlen, moff, valid = _find_matches(data_u8, n, B, depth=depth, nw=nw)
    for _ in range(lazy):
        # one-step lazy demotion (HC tier): drop a match when the next
        # position holds a strictly-longer one (reference analog: the
        # lazy evaluation of LZ4HC_compress_hashChain, lz4hc.c)
        nx_len = jnp.concatenate([mlen[1:], jnp.zeros(1, jnp.int32)])
        nx_val = jnp.concatenate([valid[1:], jnp.zeros(1, bool)])
        valid = valid & ~(nx_val & (nx_len > mlen + 1))
    if G:
        pos, ml, off, nseq = _grid_parse(mlen, moff, valid, B, G, MAXSEQ,
                                         match_cap=4 + 4 * nw)
    else:
        mark = _greedy_parse(mlen, valid, B)
        pos, ml, off, nseq = _select_sequences(mark, valid, mlen, moff,
                                               B, MAXSEQ)
    return _emit(data_u8, pos, ml, off, nseq, n, B, OUTCAP, MAXSEQ)


def encoder_block_fn(B: int, G: int, depth: int = 2, nw: int = NW,
                     small_offsets: tuple = SMALL_OFFSETS, lazy: int = 0,
                     hash_bits: int = HASH_BITS, nw_deep: int = 0,
                     subm: int = 128, ext_passes: int = 0):
    """Per-block encode fn + output row width, with the measured default
    config for the sort-emit path. Shared by make_encoder and the
    sharded/distributed wrappers so every tier produces identical streams.
    Returns (fn(data_u8, n) -> (out, body, tail, flag), out_width)."""
    if G >= 2:
        if depth == 2:
            depth, nw = 4, 8  # chip-measured sweet spot (see make_encoder)
        fn = functools.partial(_encode_block_v2, B=B, G=G, depth=depth,
                               nw=nw, small_offsets=small_offsets,
                               lazy=lazy, hash_bits=hash_bits,
                               nw_deep=nw_deep, subm=subm,
                               ext_passes=ext_passes)
        return fn, B
    OUTCAP = out_capacity(B)
    MAXSEQ = (B // max(G, MIN_MATCH)) + 2
    fn0 = functools.partial(_encode_block, B=B, OUTCAP=OUTCAP,
                            MAXSEQ=MAXSEQ, G=G, depth=depth, nw=nw,
                            lazy=lazy)

    def fn(data_u8, n):
        out, body, tail = fn0(data_u8, n)
        return out, body, tail, jnp.zeros((), jnp.bool_)

    return fn, OUTCAP


@functools.lru_cache(maxsize=32)
def make_encoder(block_size: int, G: int = 0, depth: int = 2,
                 nw: int = NW, small_offsets: tuple = SMALL_OFFSETS,
                 lazy: int = 0, hash_bits: int = HASH_BITS,
                 nw_deep: int = 0, subm: int = 128, ext_passes: int = 0):
    """Build the jitted batched encoder for a given block size / parse grid.

    Signature: (blocks u8[N, B], lens i32[N]) ->
               (bodies u8[N, OUTCAP], body_sizes i32[N], tails i32[N],
                flags bool[N])
    depth > 2 is the HC-grade matcher (see _find_matches). flags marks
    blocks the sort-emit could not serialize (see _emit_sorted) — callers
    re-encode those on the host tier; always all-False for the G==0 path.
    """
    fn, _ = encoder_block_fn(block_size, G, depth, nw, small_offsets, lazy,
                             hash_bits, nw_deep, subm, ext_passes)

    @jax.jit
    def encode(blocks, lens):
        return jax.vmap(fn)(blocks, lens)

    return encode


# =============================================================================
# Decoder
# =============================================================================

def _token_scan(chunk_u8, clen, C: int):
    """For every byte position p: if a token started at p, compute
    (next token position, produced output bytes, literal len, literal start,
    offset). 255-extension runs come from a reverse next-non-255 scan."""
    d = chunk_u8.astype(jnp.int32)
    pad = jnp.concatenate([d, jnp.zeros(8, jnp.int32)])
    idx = jnp.arange(C, dtype=jnp.int32)

    BIG = jnp.int32(2 * C)
    non255 = jnp.where(d != 255, idx, BIG)
    nxt_non255 = jnp.flip(jax.lax.cummin(jnp.flip(non255)))
    nxt_non255 = jnp.minimum(nxt_non255, _i32(C))  # clamp runs at the end

    def ext_at(x):
        """(count of 255 bytes, terminating byte value) for a run at x."""
        xc = jnp.clip(x, 0, C - 1)
        cnt = jnp.clip(nxt_non255[xc] - x, 0, C)
        term = pad[jnp.clip(x + cnt, 0, C + 7)]
        return cnt, term

    tok = pad[idx]
    lit0 = tok >> 4
    cnt_l, term_l = ext_at(idx + 1)
    lit = jnp.where(lit0 < 15, lit0, 15 + 255 * cnt_l + term_l)
    hdr = jnp.where(lit0 < 15, 1, 2 + cnt_l)
    a = idx + hdr            # literal bytes start
    b = a + lit              # offset field position
    is_final = b >= clen

    ml0 = tok & 15
    cnt_m, term_m = ext_at(b + 2)
    ml = jnp.where(ml0 < 15, ml0 + MIN_MATCH, 19 + 255 * cnt_m + term_m)
    nxt = jnp.where(is_final, _i32(C),
                    jnp.where(ml0 < 15, b + 2, b + 3 + cnt_m))
    nxt = jnp.clip(nxt, 0, C)
    produced = jnp.where(is_final, lit, lit + ml)
    offs = pad[jnp.clip(b, 0, C + 7)] | (pad[jnp.clip(b + 1, 0, C + 7)] << 8)
    return nxt, produced, lit, a, offs


def _chain_marks(nxt, clen, C: int):
    """Mark the positions visited by the token chain from 0.

    Two-level MXU scheme: 128-byte segments become (128,128) local
    reachability matrices (7 bf16 matrix squarings); the last in-segment
    reachable position's `nxt` is the segment's exit, a short lax.scan
    threads the chain through segment entries, and each visited segment's
    mark row is one row of its reachability matrix. No scatter/gather
    doubling rounds.
    """
    SEG = 128
    S = C // SEG
    idx = jnp.arange(C, dtype=jnp.int32)
    segbase = (idx // SEG) * SEG
    jloc = nxt - segbase
    inseg = jloc < SEG  # nxt > position, so jloc > local index when in-seg
    cols = jnp.arange(SEG, dtype=jnp.int32)
    edge = (jnp.where(inseg, jloc, -1).reshape(S, SEG)[:, :, None]
            == cols[None, None, :])
    eye = jnp.eye(SEG, dtype=jnp.bool_)[None]
    R = (edge | eye).astype(jnp.int8)

    def body(_, R):
        R2 = jnp.matmul(R, R, preferred_element_type=jnp.int32)
        return jnp.minimum(R2, 1).astype(jnp.int8)

    R = jax.lax.fori_loop(0, 7, body, R)

    # last in-segment reachable position per entry -> its nxt is the exit
    last = jnp.max(R.astype(jnp.int32) * cols[None, None, :],
                   axis=2)                             # (S, SEG)
    exit_ = nxt.reshape(S, SEG)[
        jnp.arange(S)[:, None],
        jnp.clip(last, 0, SEG - 1)]                    # (S, SEG)

    def step(pos, s):
        base = s * SEG
        here = (pos >= base) & (pos < base + SEG)
        entry = jnp.where(here, pos - base, -1)
        pos = jnp.where(here, exit_[s, jnp.clip(entry, 0, SEG - 1)], pos)
        return pos, entry

    start = jnp.where(clen > 0, 0, C)
    _, entries = jax.lax.scan(step, jnp.int32(start),
                              jnp.arange(S, dtype=jnp.int32))
    rows = jnp.take_along_axis(
        R, jnp.clip(entries, 0, SEG - 1)[:, None, None].astype(jnp.int32),
        axis=1)[:, 0, :]                               # (S, SEG)
    mark = (rows > 0) & (entries >= 0)[:, None]
    return mark.reshape(C) & (idx < clen)


def _decode_block(chunk_u8, clen, dlen, C: int, B: int, MAXTOK: int):
    idx = jnp.arange(C, dtype=jnp.int32)
    nxt, produced, lit, a, offs = _token_scan(chunk_u8, clen, C)
    mark = _chain_marks(nxt, clen, C)

    # --- output spans: monotone fills over the output domain ----------------
    prod_m = jnp.where(mark, produced, 0)
    out_start = jnp.cumsum(prod_m) - prod_m  # exclusive, per byte position
    emitting = mark & (produced > 0)
    tstart = jnp.where(emitting, out_start, jnp.int32(B))  # B slots drop

    f_ts = _fill(out_start, tstart, B, 0)            # token's output start
    # strictly monotone high bits: out_start (tokens emitting >0 bytes)
    f_off = _fill(((out_start << 16) | (offs & 0xFFFF)) + _NEG, tstart,
                  B, _NEG) - _NEG
    f_mstart = _fill(out_start + lit, tstart, B, 0)  # match part begins here
    f_a = _fill(a, tstart, B, 0)                     # literal source base

    o = jnp.arange(B, dtype=jnp.int32)
    rel = o - f_ts
    is_lit = o < f_mstart
    # offset 0 only occurs in corrupt streams; clamp to 1 so the
    # resolve loop always makes progress (no self-loops -> no hang)
    # Periodic collapse (r5): an overlapping match (off < ml) is a
    # periodic fill — source each byte from the FIRST period,
    # (o - mstart) mod off, instead of off bytes back. Identity when
    # off >= ml; removes the long intra-match chains (RLE) that were
    # the fixpoint's ~10-round tail.
    offv = jnp.maximum(f_off & 0xFFFF, 1)
    src = jnp.where(is_lit, -(f_a + rel) - 1,
                    (f_mstart - offv) + jnp.remainder(o - f_mstart, offv))
    src = jnp.where(o < dlen, src, -1)  # pad bytes: point at chunk[0]

    # --- resolve back-reference chains until a pass changes nothing --------
    def cond(state):
        src, changed = state
        return changed

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
    """Build the jitted batched decoder.

    Signature: (chunks u8[N, C], clens i32[N], dlens i32[N]) -> u8[N, B]
    """
    C, B = chunk_cap, block_size
    MAXTOK = C // 3 + 2

    @jax.jit
    def decode(chunks, clens, dlens):
        fn = functools.partial(_decode_block, C=C, B=B, MAXTOK=MAXTOK)
        return jax.vmap(fn)(chunks, clens, dlens)

    return decode


# =============================================================================
# Host-facing batch helpers (bytes in / bytes out)
# =============================================================================

def _bucket(n: int, lo: int = 256) -> int:
    """Round up to a power of two so jit specializations stay bounded."""
    b = lo
    while b < n:
        b <<= 1
    return b


MAX_DEVICE_BLOCK = 65536  # positions/offsets are packed into 16 bits


def check_block_sizes(blocks, what: str = "encode"):
    """The device pipelines pack positions and LZ offsets into 16 bits
    (key = (hash << 16) | pos and the (pos << 16) | off monotone fills), so
    any block beyond 64 KiB would silently corrupt. Callers above 64 KiB
    must split blocks or use the host tier (codec adapters do the latter)."""
    big = max((len(b) for b in blocks), default=0)
    if big > MAX_DEVICE_BLOCK:
        raise ValueError(
            f"device {what}: block of {big} bytes exceeds the 64 KiB "
            f"device-pipeline limit (16-bit position packing); use the "
            f"host tier or block_size <= {MAX_DEVICE_BLOCK}")


def encode_blocks(blocks, accel: int = 1, depth: int = 2, nw: int = NW,
                  lazy: int = 0):
    """Compress a list of blocks on device; returns (bodies, tails) where
    bodies exclude the final literal-only sequence (stitcher input).
    depth > 2 = HC-grade candidate search (lz4hc device tier); nw sets the
    match-length cap (4 + 4*nw) for the exact path."""
    check_block_sizes(blocks)
    B = _bucket(max(len(b) for b in blocks))
    N = len(blocks)
    arr = np.zeros((N, B), dtype=np.uint8)
    lens = np.zeros(N, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    G = grid_for_accel(accel)
    if G and G * 4 > B:  # tiny blocks: grid overhead isn't worth it
        G = 0
    # G>=2 + depth 2 resolves to the chip-measured sweet spot inside
    # encoder_block_fn: nw=8 payloads, depth-4 candidate search
    # (88 MB/s at ratio 2.843 vs 67 MB/s at 2.78 with (16, 2))
    enc = make_encoder(B, G, depth, nw, lazy=lazy)
    out, sizes, tails, flags = jax.block_until_ready(
        enc(jnp.asarray(arr), jnp.asarray(lens)))
    from . import compact
    bodies = compact.fetch_chunks(out, sizes)
    tails = [int(t) for t in np.asarray(tails)]
    flags = np.asarray(flags)
    if flags.any():
        # pathological blocks (giant literal run + tiny match: header
        # exceeds the match's spare capacity) — re-encode on the host
        # oracle; same stitcher contract (body excludes the final
        # literal-only sequence). Rare by construction.
        from ..codecs.lz4_stitch import final_sequence_len
        from ..runtime import native
        for i in np.nonzero(flags)[0]:
            stream, t = native.lz4_compress_tail(blocks[i], max(accel, 1))
            bodies[i] = stream[:len(stream) - final_sequence_len(t)]
            tails[i] = t
    return bodies, tails


def decode_blocks(chunks, dlens, block_size: int):
    """Decompress a list of chunk regions on device."""
    if not chunks:
        return []
    if max(dlens) > MAX_DEVICE_BLOCK:
        raise ValueError(
            "device decode: decompressed block exceeds the 64 KiB limit "
            "(16-bit offset packing); use the host tier")
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
