"""Per-stage timing of the LZ4 device encoder on the real chip.

Times each pipeline stage as its own jit with the PRODUCTION throughput
config (G=4, depth=4, nw=8 — encoder_block_fn's sweet spot) to locate
the wall. Run from repo root:
    python scripts/profile_encode_stages.py [N_blocks]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from aocl_compression_tpu.ops import lz4_device as L
from bench import _corpus

G, DEPTH, NW = 4, 4, 8


def timed(fn, args, iters=5, fetch=lambda r: r[0]):
    out = fn(*args)
    _ = np.asarray(fetch(out))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main():
    B = 65536
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    data = _corpus(B * N)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, dtype=jnp.int32)
    mb = B * N / 1e6

    # stage 1: window words + hash + the fat sort
    @jax.jit
    def s1(d):
        def one(du8):
            idx = jnp.arange(B, dtype=jnp.int32)
            words = L._window_words(du8, B, NW)
            w0 = words[0]
            h = (w0 * jnp.uint32(2654435761)) >> jnp.uint32(32 - L.HASH_BITS)
            key = ((h << 16) | idx.astype(jnp.uint32)).astype(jnp.int32)
            ops = jax.lax.sort([key] + [w.astype(jnp.int32) for w in words],
                               num_keys=1, is_stable=False)
            return ops[0]
        return jax.vmap(one)(d)

    # stage 1b: + neighbor compares (no restore sort)
    @jax.jit
    def s1b(d):
        def one(du8):
            idx = jnp.arange(B, dtype=jnp.int32)
            words = L._window_words(du8, B, NW)
            w0 = words[0]
            h = (w0 * jnp.uint32(2654435761)) >> jnp.uint32(32 - L.HASH_BITS)
            key = ((h << 16) | idx.astype(jnp.uint32)).astype(jnp.int32)
            ops = jax.lax.sort([key] + [w.astype(jnp.int32) for w in words],
                               num_keys=1, is_stable=False)
            skey, swords = ops[0], ops[1:]
            spos = skey & 0xFFFF
            shash = jax.lax.shift_right_logical(skey, 16)

            def shifted(a, s, fill):
                return jnp.concatenate([jnp.full((s,), fill, a.dtype),
                                        a[:-s]])
            best_len = jnp.zeros(B, jnp.int32)
            best_off = jnp.ones(B, jnp.int32)
            for s in range(1, DEPTH + 1):
                ph = shifted(shash, s, -1)
                pp = shifted(spos, s, 0)
                pw = [shifted(w, s, -1) for w in swords]
                ok0 = (ph == shash) & (pw[0] == swords[0])
                off = spos - pp
                ml = L._chain_match_len(swords, pw, ok0, NW)
                better = ml > best_len
                best_len = jnp.where(better, ml, best_len)
                best_off = jnp.where(better, off, best_off)
            return spos, best_len, best_off
        return jax.vmap(one)(d)

    # full matcher (adds restore sort + small-offset runs)
    @jax.jit
    def s2(d, n):
        def one(du8, nn):
            return L._find_matches(du8, nn, B, depth=DEPTH, nw=NW)
        return jax.vmap(one)(d, n)

    # matcher + select
    @jax.jit
    def s3(d, n):
        def one(du8, nn):
            mlen, moff, valid = L._find_matches(du8, nn, B, depth=DEPTH,
                                                nw=NW)
            return L._grid_select(mlen, moff, valid, B, G)
        return jax.vmap(one)(d, n)

    # full encode
    @jax.jit
    def s4(d, n):
        def one(du8, nn):
            return L._encode_block_v2(du8, nn, B, G, depth=DEPTH, nw=NW)
        return jax.vmap(one)(d, n)

    t1 = timed(s1, (arr,), fetch=lambda r: r[:2, :4])
    t1b = timed(s1b, (arr,), fetch=lambda r: r[1][:2, :4])
    t2 = timed(s2, (arr, lens), fetch=lambda r: r[0][:2, :4])
    t3 = timed(s3, (arr, lens), fetch=lambda r: r[1][:2, :4])
    t4 = timed(s4, (arr, lens), fetch=lambda r: r[1][:2])

    print(f"N={N} blocks of {B}; {mb:.1f} MB per iter (G={G} depth={DEPTH} "
          f"nw={NW})")
    print(f"  fat sort only          : {t1*1e3:7.1f} ms  {mb/t1:7.1f} MB/s")
    print(f"  + neighbor compares    : {t1b*1e3:7.1f} ms  {mb/t1b:7.1f} MB/s")
    print(f"  full matcher           : {t2*1e3:7.1f} ms  {mb/t2:7.1f} MB/s")
    print(f"  matcher+grid_select    : {t3*1e3:7.1f} ms  {mb/t3:7.1f} MB/s")
    print(f"  full encode            : {t4*1e3:7.1f} ms  {mb/t4:7.1f} MB/s")
    print(f"  deltas: compares={(t1b-t1)*1e3:.1f}ms "
          f"restore+small={(t2-t1b)*1e3:.1f}ms "
          f"select={(t3-t2)*1e3:.1f}ms emit={(t4-t3)*1e3:.1f}ms")


if __name__ == "__main__":
    main()
