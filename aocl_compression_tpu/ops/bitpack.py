"""Gather/scatter-free bitstream packing for device entropy coders.

The zstd device encoder's profiled wall is its scatter-add bit packs
(VERDICT r2 item 4). This module recasts packing as the CLAUDE.md-
playbook combination: ONE variadic sort merges (bit-field, output-byte)
records, and a bounded LOOKBACK LADDER of shifted selects assembles each
output byte from the <= K field records that can overlap it (a field of
w bits starting within 8 bits of the byte spans it; fields are >= 1 bit,
so at most w+8 fields plus a few interleaved byte markers sit between a
byte's contributors and its marker in merged order). A second sort
compacts the byte markers into the dense output. No scatter, no gather:
2 sorts + K cheap shifted selects, vs 2 scatter-adds in the word-granular
path (chip A/B via AOCL_ZSTD_PACK).

Semantics: little-endian bit order (bit i of stream s lands in byte
i >> 3, bit i & 7 — the zstd convention); field j occupies bits
[bitpos[j], bitpos[j] + nbits[j]) of stream sid[j].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SENT = 1 << 28  # plain int: safe to materialize inside any trace


def pack_bits_ladder(values, nbits, bitpos, sid, nstreams: int,
                     scap: int, max_width: int):
    """Pack bit fields into ``nstreams`` streams of ``scap`` bytes each.

    values/nbits/bitpos/sid: i32 arrays of equal length; entries with
    nbits == 0 are ignored. max_width bounds nbits (static: sets the
    ladder depth). Returns u8 array (nstreams * scap,): stream s's bytes
    at [s * scap, (s + 1) * scap).
    """
    nf = values.shape[0]
    nb_total = nstreams * scap
    K = max_width + 8 + 4  # fields + interleaved byte markers in window

    # merged sort keys: (stream, bit slot, marker-after-codes)
    live = nbits > 0
    code_key = jnp.where(
        live, (sid << 23) | (bitpos << 1), _SENT)
    k = jnp.arange(nb_total, dtype=jnp.int32)
    mk_s = k // scap
    mk_k = k - mk_s * scap
    marker_key = (mk_s << 23) | (((mk_k << 3) | 7) << 1) | 1

    keys = jnp.concatenate([code_key, marker_key])
    # payloads: p1 = value | nbits<<16 (codes) / -1 (markers);
    #           p2 = bitpos | sid<<20 (codes) / out slot (markers)
    p1 = jnp.concatenate([
        jnp.where(live, values | (nbits << 16), -1),
        jnp.full(nb_total, -1, jnp.int32)])
    p2 = jnp.concatenate([
        jnp.where(live, bitpos | (sid << 20), 0),
        k])
    is_marker = jnp.concatenate([
        jnp.zeros(nf, jnp.int32), jnp.ones(nb_total, jnp.int32)])
    _, sp1, sp2, sm = jax.lax.sort([keys, p1, p2, is_marker], num_keys=1)

    # lookback ladder: byte value of each marker slot from the <= K
    # preceding code records of the SAME stream
    mark_k = sp2 % scap          # marker out slot -> in-stream byte index
    mark_s = sp2 // scap
    mark_bit = mark_k << 3
    val = jnp.zeros_like(sp1)
    for d in range(1, K + 1):
        q1 = jnp.concatenate([jnp.full(d, -1, jnp.int32), sp1[:-d]])
        q2 = jnp.concatenate([jnp.zeros(d, jnp.int32), sp2[:-d]])
        qm = jnp.concatenate([jnp.ones(d, jnp.int32), sm[:-d]])
        is_code = (qm == 0) & (q1 >= 0)
        c_bp = q2 & ((1 << 20) - 1)
        c_sid = q2 >> 20
        c_val = q1 & 0xFFFF
        c_nb = q1 >> 16
        sh = c_bp - mark_bit          # in [-(max_width-1), 8)
        overlap = (is_code & (c_sid == mark_s)
                   & (c_bp + c_nb > mark_bit) & (sh < 8))
        pos_part = jnp.where(jnp.maximum(sh, 0) < 8,
                             c_val << jnp.clip(sh, 0, 7), 0)
        neg_part = jax.lax.shift_right_logical(
            c_val, jnp.clip(-sh, 0, 31))
        contrib = jnp.where(sh >= 0, pos_part, neg_part) & 0xFF
        val = val | jnp.where(overlap & (sm == 1), contrib, 0)

    # compact markers into dense (stream, slot) order
    out_key = jnp.where(sm == 1, sp2, _SENT)
    _, sval = jax.lax.sort([out_key, val], num_keys=1)
    return sval[:nb_total].astype(jnp.uint8)
