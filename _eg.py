import time, functools
import numpy as np, jax, jax.numpy as jnp
from aocl_compression_tpu.ops import lz4_device as L

B = 65536; N = 256; G = 8
rng = np.random.default_rng(42)
words = [b"the ", b"of ", b"compression ", b"data ", b"block "]
buf = bytearray()
tot = N*B
while len(buf) < tot: buf += words[rng.integers(0,5)]
arr = np.frombuffer(bytes(buf[:tot]), np.uint8).reshape(N, B)
ja, jl = jnp.asarray(arr), jnp.asarray(np.full(N, B, np.int32))
OUTCAP = L.out_capacity(B); MAXSEQ = B//G+2

def force(r): return np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); force(r)
    t0 = time.perf_counter(); r = f(*args); force(r)
    print(f"{name:24s} {(time.perf_counter()-t0)*1e3:8.0f} ms")
    return r

fm = jax.vmap(functools.partial(L._find_matches, B=B))
mlen, moff, valid = timeit("find_matches", fm, ja, jl)
gp = jax.vmap(functools.partial(L._grid_parse, B=B, G=G, MAXSEQ=MAXSEQ))
pos, ml, off, nseq = timeit("grid_parse (MXU)", gp, mlen, moff, valid)
em = jax.vmap(functools.partial(L._emit, B=B, OUTCAP=OUTCAP, MAXSEQ=MAXSEQ))
timeit("emit", em, ja, pos, ml, off, nseq, jl)

# emit with literal gather stubbed to a constant
import aocl_compression_tpu.ops.lz4_device as M
src = open(M.__file__).read()
def emit_nogather(data_u8, pos, ml, off, nseq, n, B, OUTCAP, MAXSEQ):
    import jax.numpy as jnp
    out, body, tail = None, None, None
    # replicate _emit but lit_byte = 0
    sid = jnp.arange(MAXSEQ, dtype=jnp.int32)
    real = sid < nseq
    ends = pos + ml
    lit_start = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    lit_start = jnp.where(real, lit_start, 0)
    lit = jnp.where(real, pos - lit_start, 0)
    last = jnp.clip(nseq - 1, 0, MAXSEQ - 1)
    tail_start = jnp.where(nseq > 0, ends[last], 0)
    tail = n - tail_start
    nlx = jnp.where(lit < 15, 0, 1 + (lit - 15) // 255)
    nmx = jnp.where(ml - 4 < 15, 0, 1 + (ml - 19) // 255)
    seq_sz = jnp.where(real, 3 + nlx + lit + nmx, 0)
    incl = jnp.cumsum(seq_sz)
    body = jnp.where(nseq > 0, incl[last], 0)
    excl = incl - seq_sz
    starts = jnp.where(real, excl, jnp.int32(OUTCAP))
    f_excl = L._fill(excl, starts, OUTCAP, 0)
    f_po = L._fill(((pos << 16) | off) + L._NEG, starts, OUTCAP, L._NEG)
    f_lm = L._fill(((lit_start << 16) | ml) + L._NEG, starts, OUTCAP, L._NEG)
    j = jnp.arange(OUTCAP, dtype=jnp.int32)
    delta = j - f_excl
    po = f_po - L._NEG
    lm = f_lm - L._NEG
    pos_b = jax.lax.shift_right_logical(po, 16)
    off_b = po & 0xFFFF
    start_b = jax.lax.shift_right_logical(lm, 16)
    ml_b = lm & 0xFFFF
    lit_b = pos_b - start_b
    nlx_b = jnp.where(lit_b < 15, 0, 1 + (lit_b - 15) // 255)
    tok = (jnp.minimum(lit_b, 15) << 4) | jnp.minimum(ml_b - 4, 15)
    lit_byte = jnp.zeros(OUTCAP, jnp.int32)  # <-- stubbed gather
    o_lo = 1 + nlx_b + lit_b
    byte = jnp.where(delta == 0, tok, jnp.where(delta < o_lo, lit_byte, off_b & 255))
    out = jnp.where(j < body, byte, 0).astype(jnp.uint8)
    return out, body, tail
em2 = jax.vmap(functools.partial(emit_nogather, B=B, OUTCAP=OUTCAP, MAXSEQ=MAXSEQ))
timeit("emit (no lit gather)", em2, ja, pos, ml, off, nseq, jl)
