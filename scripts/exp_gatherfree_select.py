"""Measure the cost of _grid_select's cpos[t0] gather: exact (use_floor)
vs gather-free (nxt = t0+1 always). Run on chip."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from aocl_compression_tpu.ops import lz4_device as L
from bench import _corpus

B, N, G = 65536, 128, 4


def stream_rate(fn, args, iters=8, depth=3):
    out = fn(*args)
    _ = np.asarray(out[1][:4])
    t0 = time.perf_counter()
    pending = []
    for _ in range(iters):
        pending.append(fn(*args)[1])
        if len(pending) > depth:
            _ = np.asarray(pending.pop(0))
    for s in pending:
        _ = np.asarray(s)
    return (time.perf_counter() - t0) / iters


def grid_select_nofloor(mlen, moff, valid, B, G):
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
    SUBM = min(M, 128)
    sub_end_pos = ((aidx // SUBM) + 1) * (SUBM * G)
    cml = jnp.minimum(cml, sub_end_pos - cpos)
    cvalid = cvalid & (cml >= L.MIN_MATCH)
    end = cpos + cml
    t0 = jax.lax.shift_right_logical(end, shift)
    nxt = jnp.where(cvalid, jnp.minimum(t0 + 1, M), aidx + 1)  # no gather
    jloc = (nxt - (aidx // SUBM) * SUBM).reshape(M // SUBM, SUBM)
    cols = jnp.arange(SUBM, dtype=jnp.int32)
    edge = (jloc[:, :, None] == cols[None, None, :])
    eye = jnp.eye(SUBM, dtype=jnp.bool_)[None]
    A = (edge | eye).astype(jnp.int8)

    def body(_, A):
        A2 = jnp.matmul(A, A, preferred_element_type=jnp.int32)
        return jnp.minimum(A2, 1).astype(jnp.int8)

    A = jax.lax.fori_loop(0, int(np.ceil(np.log2(max(SUBM, 2)))), body, A)
    sel = (A[:, 0, :] > 0).reshape(M) & cvalid
    return sel, cpos, cml, coff


def main():
    data = _corpus(B * N)
    arr = jnp.asarray(np.frombuffer(data, dtype=np.uint8).reshape(N, B))
    lens = jnp.full(N, B, jnp.int32)
    mb = B * N / 1e6

    @jax.jit
    def enc_exact(d, n):
        def one(du8, nn):
            return L._encode_block_v2(du8, nn, B, G, depth=4, nw=8)
        return jax.vmap(one)(d, n)

    @jax.jit
    def enc_nf(d, n):
        def one(du8, nn):
            mlen, moff, valid = L._find_matches(du8, nn, B, depth=4, nw=8)
            sel, cpos, cml, coff = grid_select_nofloor(mlen, moff, valid,
                                                       B, G)
            return L._emit_sorted(du8, nn, sel, cpos, cml, coff, B, G)
        return jax.vmap(one)(d, n)

    for name, f in (("floor-exact", enc_exact), ("no-floor  ", enc_nf)):
        t = stream_rate(f, (arr, lens))
        out, sizes, tails, flags = f(arr, lens)
        tot = int(np.asarray(sizes).sum()) + 8 * N
        print(f"{name}: {t*1e3:7.1f} ms  {mb/t:6.1f} MB/s  "
              f"ratio {B*N/tot:.3f}", flush=True)


if __name__ == "__main__":
    main()
