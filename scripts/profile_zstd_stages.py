"""Per-stage timing of the zstd device encoder (L1 G=4 config) on chip.
Deltas between pipeline prefixes locate the wall (the ~27 ms dispatch
floor cancels in deltas). Run: python scripts/profile_zstd_stages.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from aocl_compression_tpu.ops import zstd_device as Z, lz4_device as lz
from bench import _corpus

B, N, G = 65536, 64, 4
MAXSEQ = min(B // max(G, 4), max(B // 8, 512)) + 2


def timed(fn, args, iters=4, fetch=lambda r: r):
    out = fn(*args)
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main():
    data = _corpus(B * N)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)
    mb = B * N / 1e6

    def parse_only(du8, nn):
        mlen, moff, valid = lz._find_matches(du8, nn, B, depth=8)
        return lz._grid_parse(mlen, moff, valid, B, G, MAXSEQ, match_cap=68)

    @jax.jit
    def s1(d, n):
        return jax.vmap(parse_only)(d, n)

    # parse + literal compaction + block huffman + weights
    def to_lits(du8, nn):
        pos, ml, off, nseq = parse_only(du8, nn)
        idx = jnp.arange(B, dtype=jnp.int32)
        sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
        real = sid < nseq
        ends = pos + ml
        cover = jnp.cumsum(
            jnp.zeros(B, jnp.int32)
            .at[jnp.where(real, pos, B)].add(1, mode="drop")
            .at[jnp.where(real, ends, B)].add(-1, mode="drop"))
        is_lit = (cover == 0) & (idx < nn)
        nlits = jnp.sum(is_lit.astype(jnp.int32))
        litkey = jnp.where(is_lit, idx, idx + B)
        _, lits32 = jax.lax.sort([litkey, du8.astype(jnp.int32)],
                                 num_keys=1)
        ctab, ntab, wts, tab_ok = Z._block_huffman(lits32, nlits, B)
        wbuf, wsize = Z._encode_weights(wts)
        return lits32, nlits, ctab, ntab, wsize

    @jax.jit
    def s2(d, n):
        return jax.vmap(to_lits)(d, n)

    # + literal stream bit-pack (the 3x scatter-add)
    SCAP = Z.stream_cap(B)

    def to_streams(du8, nn):
        lits32, nlits, ctab, ntab, _ = to_lits(du8, nn)
        j = jnp.arange(B, dtype=jnp.int32)
        packed = (ctab | (ntab << 16))[jnp.clip(lits32, 0, 255)]
        code = packed & 0xFFFF
        nb = jax.lax.shift_right_logical(packed, 16)
        nb = jnp.where(j < nlits, nb, 0)
        s1_ = (nlits + 3) >> 2
        t = jnp.minimum(jnp.where(s1_ > 0, j // jnp.maximum(s1_, 1), 0), 3)
        S = jnp.concatenate([
            jax.lax.cumsum(nb, axis=0, reverse=True),
            jnp.zeros(1, jnp.int32)])
        bounds = jnp.stack([jnp.minimum(s1_, nlits),
                            jnp.minimum(2 * s1_, nlits),
                            jnp.minimum(3 * s1_, nlits), nlits])
        S_at_bound = S[jnp.clip(bounds, 0, B)]
        Sb = jnp.where(t == 0, S_at_bound[0],
                       jnp.where(t == 1, S_at_bound[1],
                                 jnp.where(t == 2, S_at_bound[2],
                                           S_at_bound[3])))
        bitpos = S[jnp.minimum(j + 1, B)] - Sb
        litbuf = jnp.zeros(4 * SCAP, jnp.int32)
        valb = code << (bitpos & 7)
        bb = jnp.where((j < nlits), t * SCAP + (bitpos >> 3), 4 * SCAP)
        litbuf = litbuf.at[bb].add(valb & 0xFF, mode="drop")
        litbuf = litbuf.at[jnp.minimum(bb + 1, 4 * SCAP)].add(
            (valb >> 8) & 0xFF, mode="drop")
        litbuf = litbuf.at[jnp.minimum(bb + 2, 4 * SCAP)].add(
            (valb >> 16) & 0xFF, mode="drop")
        return litbuf

    @jax.jit
    def s3(d, n):
        return jax.vmap(to_streams)(d, n)

    # full encoder
    enc = Z.make_encoder(B, G)

    t1 = timed(s1, (arr, lens), fetch=lambda r: r[3][:4])
    t2 = timed(s2, (arr, lens), fetch=lambda r: r[1][:4])
    t3 = timed(s3, (arr, lens), fetch=lambda r: r[:2, :4])
    t4 = timed(enc, (arr, lens), fetch=lambda r: r[5][:4])

    print(f"zstd stages per {mb:.1f} MB:")
    print(f"  matcher(d8)+parse      : {t1*1e3:7.1f} ms")
    print(f"  +lits+huffman+weights  : {t2*1e3:7.1f} ms (delta "
          f"{(t2-t1)*1e3:.1f})")
    print(f"  +literal bit-pack      : {t3*1e3:7.1f} ms (delta "
          f"{(t3-t2)*1e3:.1f})")
    print(f"  full (FSE scan + seq)  : {t4*1e3:7.1f} ms (delta "
          f"{(t4-t3)*1e3:.1f})  -> {mb/t4:5.1f} MB/s")


if __name__ == "__main__":
    main()
