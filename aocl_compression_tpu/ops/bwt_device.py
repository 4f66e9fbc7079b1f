"""Burrows-Wheeler transform as a TPU device op (forward + inverse).

TPU-native replacement capability for the reference bzip2's block-sort
engine (/root/reference/algos/bzip2/blocksort.c — AOCL_mainSimpleSort /
mainGtU quadrant tricks): instead of a comparison sort with pointer-chasing
tie-breaks, the suffix ranking is computed by **prefix doubling** — O(log n)
rounds of (radix re-key, variadic `lax.sort`) — the classic
Manber-Myers scheme, which maps onto this hardware's fast bitonic sorts
(the same primitive the LZ77 matcher uses; random gathers stay out of the
loop entirely: ranks at i+k are read with a shift in position space).

bzip2 semantics: the transform is over CYCLIC rotations of the block (not
suffixes with a sentinel), and the inverse reconstructs from (L, I) where
I is the row index of the original string — matching BZ2's primary index.

Inverse: counting ranks via sorts again (stable rank of each L-symbol),
then the permutation walk T^k(I) is materialized with pointer doubling —
log n rounds of permutation composition (gathers on the n-domain; the
device-friendly alternative to the strictly serial walk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _ceil_log2(n: int) -> int:
    return int(np.ceil(np.log2(max(n, 2))))


def _rank_from_sorted(sk1, sk2, order, n: int):
    """Dense ranks for (k1, k2) pairs already in sorted order."""
    new = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        ((sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])).astype(jnp.int32)])
    ranks_sorted = jnp.cumsum(new)
    # unsort: one more variadic sort keyed by position
    _, rank = jax.lax.sort([order, ranks_sorted], num_keys=1)
    return rank


def bwt_forward_block(data_u8: jnp.ndarray, n: int):
    """BWT of one block (cyclic rotations). Returns (L u8[n], I i32)."""
    d = data_u8.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    # round 0: rank = byte value
    rank = d
    k = 1
    while k < n:
        rank2 = jnp.roll(rank, -k)          # rank of the rotation at i+k
        ops = jax.lax.sort([rank, rank2, idx], num_keys=2)
        sk1, sk2, order = ops
        rank = _rank_from_sorted(sk1, sk2, order, n)
        k <<= 1

    # rank is now the sorted row index of rotation i (all distinct iff the
    # block has no full-cycle period; ties share ranks — break by position
    # for a deterministic, bzip2-equivalent order)
    row_of = rank
    # order rotations by final rank (position tiebreak keeps determinism)
    _, _, start = jax.lax.sort([row_of, idx, idx], num_keys=2)
    # L[r] = data[(start_r + n - 1) mod n]
    prev = jnp.where(start == 0, n - 1, start - 1)
    L = data_u8[prev]
    I = jnp.argmin(start)  # row whose rotation starts at position 0
    return L, I.astype(jnp.int32)


def bwt_inverse_block(L_u8: jnp.ndarray, I, n: int):
    """Invert (L, I) -> original block, via rank sorts + pointer doubling."""
    L = L_u8.astype(jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)

    # T[j] = position in L of the j-th smallest (L, idx) pair; LF is its
    # inverse permutation (the classic last-to-first map): LF[p] = stable
    # rank of (L[p], p) among all pairs. Two variadic sorts, no scatters.
    _, T = jax.lax.sort([L * jnp.int32(n) + idx, idx], num_keys=1)
    _, LF = jax.lax.sort([T, idx], num_keys=1)

    # s[n-1-k] = L[p_k] with p_0 = I, p_{k+1} = LF[p_k]. Materialize the
    # orbit with pointer doubling: seq[k] = LF^k(I) for k < filled; each
    # round appends P(seq[:filled]) where P = LF^filled, then squares P.
    seq = jnp.full(n, 0, jnp.int32).at[0].set(I)
    P = LF
    filled = 1
    rounds = _ceil_log2(n)
    for _ in range(rounds):
        if filled >= n:
            break
        ext = P[seq]
        shift_in = jnp.where(jnp.arange(n) >= filled,
                             jnp.roll(ext, filled), seq)
        seq = jnp.where(jnp.arange(n) < 2 * filled, shift_in, seq)
        P = P[P]
        filled *= 2
    return L_u8[seq][::-1]


@functools.lru_cache(maxsize=8)
def make_bwt(n: int):
    @jax.jit
    def fwd(blocks):
        return jax.vmap(lambda b: bwt_forward_block(b, n))(blocks)

    @jax.jit
    def inv(Ls, Is):
        return jax.vmap(lambda l, i: bwt_inverse_block(l, i, n))(Ls, Is)

    return fwd, inv


def bwt(data: bytes):
    """Host-facing forward BWT of one block: returns (L bytes, I)."""
    n = len(data)
    fwd, _ = make_bwt(n)
    arr = jnp.asarray(np.frombuffer(data, np.uint8))[None, :]
    L, I = jax.block_until_ready(fwd(arr))
    return np.asarray(L[0]).tobytes(), int(I[0])


def ibwt(L: bytes, I: int) -> bytes:
    n = len(L)
    _, inv = make_bwt(n)
    arr = jnp.asarray(np.frombuffer(L, np.uint8))[None, :]
    out = jax.block_until_ready(inv(arr, jnp.asarray([I], jnp.int32)))
    return np.asarray(out[0]).tobytes()
