"""LZ4 block codec as a fully parallel TPU device pipeline (tier XLA).

A TPU-first re-design of the reference's serial greedy encoder/decoder
(/root/reference/algos/lz4/lz4.c:1447-1580 compress hot loop, :4898 decode):
nothing here translates the C control flow — every stage is a data-parallel
primitive XLA maps onto the VPU:

Encode (per block, vmapped over the batch):
  1. hashing        — vectorized u32 hash of every position's 4-byte window.
  2. match finding  — nearest previous occurrence of the same hash via one
                      stable argsort (the "hash table insert at every
                      position" semantic, batched); plus EXACT run lengths
                      for small offsets (1..8) via mismatch next-index scans,
                      which covers RLE/periodic data that a capped
                      comparison would truncate.
  3. match lengths  — unrolled vector byte-compares, capped at MATCH_CAP for
                      hash candidates (small-offset lengths are exact).
  4. greedy parse   — the sequential "jump by match length" chain from
                      position 0 is materialized in O(log B) rounds of
                      pointer doubling (gather + scatter-max), the classic
                      parallel-chase trick (cf. PAPERS.md massively-parallel
                      decompression literature).
  5. emission       — per-sequence byte sizes -> exclusive scan -> every
                      output byte computes its own value from (sequence id,
                      delta) via searchsorted + select chains. Variable-
                      length serialization becomes stream compaction.

Decode (per block, vmapped):
  1. token scan     — for EVERY byte position, compute "if a token started
                      here, where is the next token and how many bytes would
                      it produce" (255-run extension counts come from
                      next-non-255 reverse scans).
  2. chain marking  — pointer doubling from position 0 marks the real token
                      starts.
  3. scatter map    — exclusive scan of produced-lengths gives each token's
                      output span; each output byte finds its token via
                      searchsorted and becomes either a literal (chunk
                      gather) or a back-reference (o - offset).
  4. resolution     — back-references are resolved in O(log B) rounds of
                      src = src[src] pointer jumping (handles overlapping
                      RLE copies exactly).

Blocks are independent (fresh history), so the whole batch runs as one
jit-compiled program over (N, B) arrays; the RAP container stitches the
resulting fragments (codecs/lz4_stitch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HASH_BITS = 16
MATCH_CAP = 48         # max hash-candidate match length checked vectorized
SMALL_OFFSETS = 8      # offsets 1..8 get exact (uncapped) run lengths
MIN_MATCH = 4
MFLIMIT = 12           # no match may start within the last 12 bytes
LAST_LITERALS = 5


def _i32(x):
    return jnp.asarray(x, jnp.int32)


def out_capacity(block_size: int) -> int:
    """Padded per-block output capacity (>= worst-case body size)."""
    return block_size + block_size // 255 + 64


# =============================================================================
# Encoder
# =============================================================================

def _find_matches(data_u8: jnp.ndarray, n: jnp.ndarray, B: int):
    """Per-position best (offset, matchlen) candidates.

    Returns (mlen, moff, valid): best match length/offset at each position,
    already clamped to the format's end-of-block rules for a block of
    "actual length" n (the batch pads the last block).
    """
    d = data_u8.astype(jnp.uint32)
    pad = jnp.concatenate([d, jnp.zeros(MATCH_CAP + 8, jnp.uint32)])
    idx = jnp.arange(B, dtype=jnp.int32)

    # 4-byte little-endian window value at every position
    v = (pad[:B] | (pad[1:B + 1] << 8) | (pad[2:B + 2] << 16)
         | (pad[3:B + 3] << 24))
    h = ((v * jnp.uint32(2654435761)) >> jnp.uint32(32 - HASH_BITS))

    # --- nearest previous position with the same hash (one stable sort) ----
    order = jnp.argsort(h, stable=True).astype(jnp.int32)
    oh = h[order]
    prev_sorted = jnp.where(oh[1:] == oh[:-1], order[:-1], -1)
    prev_sorted = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                   prev_sorted])
    cand = jnp.zeros(B, jnp.int32).at[order].set(prev_sorted)

    cand_c = jnp.clip(cand, 0, B - 1)
    hash_valid = (cand >= 0) & (v[cand_c] == v)

    # --- capped match length for hash candidates ---------------------------
    # first 4 bytes are equal by construction (same u32 window)
    mlen_h = jnp.full(B, MIN_MATCH, jnp.int32)
    alive = hash_valid
    for k in range(MIN_MATCH, MATCH_CAP):
        eq = pad[idx + k] == pad[jnp.clip(cand_c + k, 0, B + MATCH_CAP)]
        alive = alive & eq
        mlen_h = mlen_h + alive.astype(jnp.int32)
    off_h = idx - cand
    mlen_h = jnp.where(hash_valid, mlen_h, 0)

    # --- exact run lengths for small offsets (RLE / short periods) ---------
    best_len = mlen_h
    best_off = jnp.where(hash_valid, off_h, 1)
    BIG = jnp.int32(2 * B)
    for o in range(1, SMALL_OFFSETS + 1):
        src = jnp.clip(idx - o, 0, B - 1)
        agree = (d[src] == d) & (idx >= o)
        # next disagreement at or after i (reverse running minimum)
        mm_idx = jnp.where(~agree, idx, BIG)
        nxt = jnp.flip(jax.lax.cummin(jnp.flip(mm_idx)))
        run = jnp.minimum(nxt, _i32(B)) - idx
        better = (run >= MIN_MATCH) & (run > best_len)
        best_len = jnp.where(better, run, best_len)
        best_off = jnp.where(better, jnp.int32(o), best_off)

    # --- end-of-block rules -------------------------------------------------
    best_len = jnp.minimum(best_len, n - LAST_LITERALS - idx)
    valid = (best_len >= MIN_MATCH) & (idx <= n - MFLIMIT - 1) & (idx < n)
    return jnp.where(valid, best_len, 1), best_off, valid


def _greedy_parse(mlen: jnp.ndarray, valid: jnp.ndarray, B: int):
    """Mark the positions the serial greedy parse would visit.

    next[i] = i + (mlen if match else 1); chain-from-0 membership is
    computed with log2(B) rounds of (scatter-or marks, square the jump map).
    """
    idx = jnp.arange(B, dtype=jnp.int32)
    step = jnp.where(valid, mlen, 1)
    nxt = jnp.minimum(idx + step, _i32(B))
    jump = jnp.concatenate([nxt, jnp.full((1,), B, jnp.int32)])

    # (jump[0] & 0) keeps the carry "varying" under shard_map's vma tracking
    mark = jnp.zeros(B + 1, jnp.int32).at[0].set(1 + (jump[0] & 0))

    def body(_, state):
        mark, jump = state
        hop = jnp.zeros(B + 1, jnp.int32).at[jump].max(mark)
        mark = jnp.maximum(mark, hop)
        jump = jump[jump]
        return mark, jump

    rounds = int(np.ceil(np.log2(max(B, 2)))) + 1
    mark, _ = jax.lax.fori_loop(0, rounds, body, (mark, jump))
    return mark[:B].astype(bool)


def _emit(data_u8, mark, valid, mlen, moff, n, B: int, OUTCAP: int,
          MAXSEQ: int):
    """Serialize selected sequences into the LZ4 body (no final sequence).

    Returns (out bytes u8[OUTCAP], body_size, tail_literals).
    """
    idx = jnp.arange(B, dtype=jnp.int32)
    sel = mark & valid
    nseq = jnp.sum(sel.astype(jnp.int32))

    pos = jnp.nonzero(sel, size=MAXSEQ, fill_value=B)[0].astype(jnp.int32)
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq
    posc = jnp.clip(pos, 0, B - 1)
    ml = jnp.where(real, mlen[posc], 0)
    off = jnp.where(real, moff[posc], 1)

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
    # fill entries sort after every real output byte position
    excl_sorted = jnp.where(real, excl, jnp.int32(OUTCAP + 1))

    j = jnp.arange(OUTCAP, dtype=jnp.int32)
    s = jnp.clip(jnp.searchsorted(excl_sorted, j, side="right").astype(
        jnp.int32) - 1, 0, MAXSEQ - 1)
    delta = j - excl[s]
    lit_s, ml_s, off_s = lit[s], ml[s], off[s]
    nlx_s, start_s = nlx[s], lit_start[s]

    tok = (jnp.minimum(lit_s, 15) << 4) | jnp.minimum(ml_s - MIN_MATCH, 15)
    lit_ext = jnp.clip(jnp.minimum(lit_s - 15 - 255 * (delta - 1), 255),
                       0, 255)
    lit_byte_pos = jnp.clip(start_s + delta - 1 - nlx_s, 0, B - 1)
    lit_byte = data_u8[lit_byte_pos].astype(jnp.int32)
    ml_ext_t = delta - (3 + nlx_s + lit_s)
    ml_ext = jnp.clip(jnp.minimum(ml_s - 19 - 255 * ml_ext_t, 255), 0, 255)

    o_lo = 1 + nlx_s + lit_s
    byte = jnp.where(
        delta == 0, tok,
        jnp.where(delta <= nlx_s, lit_ext,
                  jnp.where(delta < o_lo, lit_byte,
                            jnp.where(delta == o_lo, off_s & 255,
                                      jnp.where(delta == o_lo + 1,
                                                off_s >> 8, ml_ext)))))
    out = jnp.where(j < body, byte, 0).astype(jnp.uint8)
    return out, body, tail


def _encode_block(data_u8, n, B: int, OUTCAP: int, MAXSEQ: int):
    mlen, moff, valid = _find_matches(data_u8, n, B)
    mark = _greedy_parse(mlen, valid, B)
    return _emit(data_u8, mark, valid, mlen, moff, n, B, OUTCAP, MAXSEQ)


@functools.lru_cache(maxsize=16)
def make_encoder(block_size: int):
    """Build the jitted batched encoder for a given block size.

    Signature: (blocks u8[N, B], lens i32[N]) ->
               (bodies u8[N, OUTCAP], body_sizes i32[N], tails i32[N])
    """
    B = block_size
    OUTCAP = out_capacity(B)
    MAXSEQ = B // MIN_MATCH + 2

    @jax.jit
    def encode(blocks, lens):
        fn = functools.partial(_encode_block, B=B, OUTCAP=OUTCAP,
                               MAXSEQ=MAXSEQ)
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


def _decode_block(chunk_u8, clen, dlen, C: int, B: int, MAXTOK: int):
    idx = jnp.arange(C, dtype=jnp.int32)
    nxt, produced, lit, a, offs = _token_scan(chunk_u8, clen, C)

    # --- mark real token starts by chasing the chain from 0 ----------------
    jump = jnp.concatenate([nxt, jnp.full((1,), C, jnp.int32)])
    mark = jnp.zeros(C + 1, jnp.int32).at[0].set(
        (clen > 0).astype(jnp.int32))

    def body(_, state):
        mark, jump = state
        hop = jnp.zeros(C + 1, jnp.int32).at[jump].max(mark)
        return jnp.maximum(mark, hop), jump[jump]

    rounds = int(np.ceil(np.log2(max(C, 2)))) + 1
    mark, _ = jax.lax.fori_loop(0, rounds, body, (mark, jump))
    mark = mark[:C].astype(bool) & (idx < clen)

    # --- output spans --------------------------------------------------------
    prod_m = jnp.where(mark, produced, 0)
    out_start = jnp.cumsum(prod_m) - prod_m  # exclusive, per byte position

    ntok = jnp.sum(mark.astype(jnp.int32))
    tpos = jnp.nonzero(mark, size=MAXTOK, fill_value=C)[0].astype(jnp.int32)
    tid = jnp.arange(MAXTOK, dtype=jnp.int32)
    treal = tid < ntok
    tposc = jnp.clip(tpos, 0, C - 1)
    tstart = jnp.where(treal, out_start[tposc], jnp.int32(B + 1))

    # --- each output byte finds its token, becomes literal or backref ------
    o = jnp.arange(B, dtype=jnp.int32)
    s = jnp.clip(jnp.searchsorted(tstart, o, side="right").astype(
        jnp.int32) - 1, 0, MAXTOK - 1)
    rel = o - tstart[s]
    p = tposc[s]
    is_lit = rel < lit[p]
    src = jnp.where(is_lit, -(a[p] + rel) - 1, o - offs[p])
    src = jnp.where(o < dlen, src, -1)  # pad bytes: point at chunk[0]

    # --- resolve back-reference chains (log rounds) -------------------------
    def resolve(_, src):
        gathered = src[jnp.clip(src, 0, B - 1)]
        return jnp.where(src >= 0, gathered, src)

    rounds2 = int(np.ceil(np.log2(max(B, 2)))) + 1
    src = jax.lax.fori_loop(0, rounds2, resolve, src)

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


def encode_blocks(blocks, accel: int = 1):
    """Compress a list of blocks on device; returns (bodies, tails) where
    bodies exclude the final literal-only sequence (stitcher input)."""
    del accel  # the device pipeline has no skip heuristic (yet)
    B = _bucket(max(len(b) for b in blocks))
    N = len(blocks)
    arr = np.zeros((N, B), dtype=np.uint8)
    lens = np.zeros(N, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    enc = make_encoder(B)
    out, sizes, tails = jax.block_until_ready(
        enc(jnp.asarray(arr), jnp.asarray(lens)))
    out_np = np.asarray(out)
    sizes_np = np.asarray(sizes)
    tails_np = np.asarray(tails)
    bodies = [out_np[i, :sizes_np[i]].tobytes() for i in range(N)]
    return bodies, [int(t) for t in tails_np]


def decode_blocks(chunks, dlens, block_size: int):
    """Decompress a list of chunk regions on device."""
    if not chunks:
        return []
    C = _bucket(max((len(c) for c in chunks), default=1))
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
    out_np = np.asarray(out)
    return [out_np[i, :dlens[i]].tobytes() for i in range(N)]
