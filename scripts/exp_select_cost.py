"""Chip experiments for the two encoder hot spots.

1. batched 128^3 matmul cost: int8 vs bf16 accumulation variants
2. lax.sort cost vs payload count and domain size
Run: python scripts/exp_select_cost.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def timed(fn, args, iters=5, fetch=lambda r: r):
    out = fn(*args)
    _ = np.asarray(fetch(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(fetch(out))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)

    # --- matmul reachability cost: 64 blocks x S subblocks ------------------
    for SUBM, S in ((128, 128), (64, 256), (256, 64)):
        BATCH = 64 * S
        A0 = (rng.integers(0, 2, (BATCH, SUBM, SUBM)) > 0)

        def mark(A, rounds):
            A = A.astype(jnp.int8)

            def body(_, A):
                A2 = jnp.matmul(A, A, preferred_element_type=jnp.int32)
                return jnp.minimum(A2, 1).astype(jnp.int8)
            A = jax.lax.fori_loop(0, rounds, body, A)
            return A[:, 0, :]

        rounds = int(np.ceil(np.log2(SUBM)))
        f = jax.jit(lambda A: mark(A, rounds))
        t = timed(f, (jnp.asarray(A0),), fetch=lambda r: r[:2, :4])
        macs = rounds * BATCH * SUBM**3
        print(f"int8 SUBM={SUBM:3d} S={S:3d} rounds={rounds}: {t*1e3:6.1f} ms"
              f"  ({macs*2/t/1e12:5.1f} TF/s)")

    # bf16 variant at the production shape
    SUBM, S = 128, 128
    BATCH = 64 * S
    A0 = (rng.integers(0, 2, (BATCH, SUBM, SUBM)) > 0)

    def mark_bf16(A):
        A = A.astype(jnp.bfloat16)

        def body(_, A):
            A2 = jnp.matmul(A, A, preferred_element_type=jnp.float32)
            return jnp.minimum(A2, 1).astype(jnp.bfloat16)
        A = jax.lax.fori_loop(0, 7, body, A)
        return A[:, 0, :]

    f = jax.jit(mark_bf16)
    t = timed(f, (jnp.asarray(A0),), fetch=lambda r: r[:2, :4])
    print(f"bf16 SUBM=128 S=128 rounds=7: {t*1e3:6.1f} ms"
          f"  ({7*BATCH*SUBM**3*2/t/1e12:5.1f} TF/s)")

    # --- sort cost vs payloads / domain ------------------------------------
    B = 65536
    N = 64
    key = rng.integers(0, 1 << 31, (N, B), dtype=np.int32)
    pay = rng.integers(0, 1 << 31, (N, B), dtype=np.int32)
    for npay in (0, 2, 5, 9, 17):
        def srt(k, p, npay=npay):
            def one(kk, pp):
                ops = jax.lax.sort([kk] + [pp] * npay, num_keys=1,
                                   is_stable=False)
                return ops[0]
            return jax.vmap(one)(k, p)
        f = jax.jit(srt)
        t = timed(f, (jnp.asarray(key), jnp.asarray(pay)),
                  fetch=lambda r: r[:2, :4])
        print(f"sort B=64Ki x{N} payloads={npay:2d}: {t*1e3:6.1f} ms")
    # half domain
    keyh = key[:, :B // 2]
    payh = pay[:, :B // 2]
    for npay in (9,):
        def srt(k, p, npay=npay):
            def one(kk, pp):
                ops = jax.lax.sort([kk] + [pp] * npay, num_keys=1,
                                   is_stable=False)
                return ops[0]
            return jax.vmap(one)(k, p)
        f = jax.jit(srt)
        t = timed(f, (jnp.asarray(keyh), jnp.asarray(payh)),
                  fetch=lambda r: r[:2, :4])
        print(f"sort B=32Ki x{N} payloads={npay:2d}: {t*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
