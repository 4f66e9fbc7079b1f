"""TPU zstd decoder — the device decode tier (VERDICT round-2 item 5).

The reference's decode story is its perf crown (algos/zstd README: 1660
MB/s class; the amd64.S Huffman decoder shows how much it invested in
exactly this axis). The TPU-native split puts each part where it wins:

  host (C++)   — header cracking + decode-table construction
                 (csrc/zstd_decode.cpp atpu_zstd_frame_plan: tiny, serial,
                 pointer-chasing work the VPU cannot help with)
  device (XLA) — the three bulk stages:
                   1. Huffman literal decode: one lax.scan over symbol
                      slots, vmapped across 4 streams x N blocks (the
                      4-stream layout exists in the FORMAT precisely to
                      expose this parallelism — RFC 8878 §3.1.1.2.4);
                   2. FSE sequence decode: the 3-state interleaved scan,
                      vmapped across blocks;
                   3. LZ77 execution: monotone fills map sequences onto
                      the output domain and a gather fixpoint resolves
                      back-reference chains (same machinery as the LZ4
                      device decoder, ops/lz4_device._decode_block).

Scope gate (callers fall back to the host tier otherwise): frames whose
content fits MAX_DEVICE_BLOCK (the 16-bit packing limit) and decompose
into single-block frames — which is exactly what this framework's RAP
container emits. Corrupt streams produce garbage rather than errors on
this tier; the container checksum (or expected_size mismatch) catches it,
mirroring how the reference's fast loops defer validation.

Reference parity anchors: zstd_decompress_block.c (sequence semantics,
rep-code resolution), huf_decompress.c (4-stream decode loop).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime import native
from .lz4_device import MAX_DEVICE_BLOCK, _NEG, _bucket, _fill

# --- plan layout (mirrors csrc/zstd_decode.cpp PM_* enum) -------------------
(PM_BTYPE, PM_BOFF, PM_BSIZE, PM_LITTYPE, PM_LITREGEN, PM_RLEBYTE,
 PM_NSTREAMS, PM_S0OFF, PM_S0LEN, PM_S1OFF, PM_S1LEN, PM_S2OFF, PM_S2LEN,
 PM_S3OFF, PM_S3LEN, PM_NBSEQ, PM_SEQOFF, PM_SEQLEN, PM_HUFLOG, PM_LLLOG,
 PM_OFLOG, PM_MLLOG, PLAN_STRIDE) = range(23)

HUF_SIZE = 1 << 11
FSE_SIZE = 1 << 9

# sequence code tables (RFC 8878 §3.1.1.3.2.1.1 — spec constants)
_LL_BASE = jnp.asarray(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20, 22,
     24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
     32768, 65536], jnp.int32)
_LL_BITS = jnp.asarray(
    [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14,
                15, 16], jnp.int32)
_ML_BASE = jnp.asarray(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
     22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37, 39, 41,
     43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051, 4099, 8195,
     16387, 32771, 65539], jnp.int32)
_ML_BITS = jnp.asarray(
    [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13,
                14, 15, 16], jnp.int32)

import os as _os
_UNROLL = int(_os.environ.get("AOCL_ZD_UNROLL", "8"))
_STAGES = int(_os.environ.get("AOCL_ZD_STAGES", "3"))  # prefix ablation


def _lane_take(arr2d, idx):
    """arr2d[(lane, idx[lane])] — per-lane dynamic fetch (tiny gather)."""
    return jnp.take_along_axis(arr2d, idx[:, None], axis=1)[:, 0]


def _read_back(words, pos, nbits):
    """Backward-bitstream read: bits [pos-nbits, pos) per lane, with the
    C BackReader's zero-fill-below-zero semantics (bits_range)."""
    bp = pos - nbits
    pre = jnp.minimum(jnp.maximum(-bp, 0), 31)
    bpc = jnp.maximum(bp, 0)
    wi = bpc >> 5
    sh = (bpc & 31).astype(jnp.uint32)
    w0 = _lane_take(words, wi)
    w1 = _lane_take(words, jnp.minimum(wi + 1, words.shape[1] - 1))
    w1 = jnp.where(wi + 1 < words.shape[1], w1, 0)
    v = jax.lax.shift_right_logical(w0, sh) | jnp.where(
        sh == 0, jnp.uint32(0), w1 << (jnp.uint32(32) - sh))
    v = (v << pre.astype(jnp.uint32)).astype(jnp.int32)
    mask = (jnp.int32(1) << nbits) - 1
    v = jnp.where(pre >= nbits, 0, v & mask)
    return jnp.where(nbits > 0, v, 0), bp


def _bytes_to_words(b_u8):
    """(..., 4k) u8 -> (..., k) u32 little-endian."""
    b = b_u8.astype(jnp.uint32).reshape(*b_u8.shape[:-1], -1, 4)
    return b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)


def _init_pos(sbytes, slen):
    """Backward-reader start: (len-1)*8 + highbit(last byte). len == 0 or a
    zero last byte is corrupt; clamp to 0 (lane decodes nothing useful)."""
    last = _lane_take(sbytes.astype(jnp.int32), jnp.maximum(slen - 1, 0))
    hb = 31 - jax.lax.clz(jnp.maximum(last, 1))
    return jnp.where(slen > 0, (slen - 1) * 8 + hb, 0)


def _literal_scan(sbytes, slens, counts, huftab, huflog, MAXL):
    """Decode Huffman literal symbols: lanes = 4N streams, MAXL slots.
    Returns (L, MAXL) symbols (garbage past counts[lane])."""
    L = sbytes.shape[0]
    words = _bytes_to_words(sbytes)
    pos0 = _init_pos(sbytes, slens)
    hflat = huftab.reshape(-1)
    blk = jnp.arange(L, dtype=jnp.int32) // 4

    def one(pos, _):
        v, _bp = _read_back(words, pos, huflog)
        entry = jnp.take(hflat, blk * HUF_SIZE + v, mode="clip")
        sym = entry >> 4
        nb = entry & 15
        return pos - nb, sym

    def step(pos, _):
        syms = []
        for _u in range(_UNROLL):
            pos, s = one(pos, None)
            syms.append(s)
        return pos, jnp.stack(syms)

    steps = (MAXL + _UNROLL - 1) // _UNROLL
    _, ys = jax.lax.scan(step, pos0, None, length=steps)
    # ys: (steps, UNROLL, L) -> (L, MAXL)
    return ys.reshape(steps * _UNROLL, L).T[:, :MAXL]


def _sequence_scan(qbytes, qlens, nbseq, fsetab, lllog, oflog, mllog,
                   MAXSEQ):
    """Decode the interleaved FSE sequence bitstream per block lane.
    Returns (ll, ml, offset) each (N, MAXSEQ) in forward order."""
    N = qbytes.shape[0]
    words = _bytes_to_words(qbytes)
    pos0 = _init_pos(qbytes, qlens)
    llflat = fsetab[:, 0].reshape(-1)
    offlat = fsetab[:, 1].reshape(-1)
    mlflat = fsetab[:, 2].reshape(-1)
    bid = jnp.arange(N, dtype=jnp.int32) * FSE_SIZE

    llS, pos0 = _read_back(words, pos0, lllog)
    ofS, pos0 = _read_back(words, pos0, oflog)
    mlS, pos0 = _read_back(words, pos0, mllog)
    pos0 = jnp.maximum(pos0, 0)

    def one(carry, s):
        llS, ofS, mlS, pos, r0, r1, r2 = carry
        active = s < nbseq
        le = jnp.take(llflat, bid + llS, mode="clip")
        oe = jnp.take(offlat, bid + ofS, mode="clip")
        me = jnp.take(mlflat, bid + mlS, mode="clip")
        ofc = jnp.minimum(oe & 0xFF, 16)  # 64 KiB gate: ofc <= 16
        mlc = jnp.minimum(me & 0xFF, 52)
        llc = jnp.minimum(le & 0xFF, 35)
        # bit-read order matches the host decoder: OF, ML, LL extras,
        # then LL, ML, OF state refills
        ofx, pos = _read_back(words, pos, ofc)
        mlx, pos = _read_back(words, pos, jnp.take(_ML_BITS, mlc))
        llx, pos = _read_back(words, pos, jnp.take(_LL_BITS, llc))
        ofv = (1 << ofc) + ofx
        mlv = jnp.take(_ML_BASE, mlc) + mlx
        llv = jnp.take(_LL_BASE, llc) + llx
        # rep-code resolution (zstd_decompress_block.c semantics)
        is_code = ofv > 3
        rep_idx = ofv - 1 + (llv == 0).astype(jnp.int32)
        off_rep = jnp.where(rep_idx == 0, r0,
                            jnp.where(rep_idx == 1, r1,
                                      jnp.where(rep_idx == 2, r2,
                                                jnp.maximum(r0 - 1, 1))))
        offset = jnp.where(is_code, ofv - 3, off_rep)
        upd = active & (is_code | (rep_idx >= 1))
        nr2 = jnp.where(active & (is_code | (rep_idx >= 2)), r1, r2)
        nr1 = jnp.where(upd, r0, r1)
        nr0 = jnp.where(upd, offset, r0)
        # state refills
        lnb, pos = _read_back(words, pos, (le >> 8) & 0xFF)
        llS2 = (le >> 16) + lnb
        mnb, pos = _read_back(words, pos, (me >> 8) & 0xFF)
        mlS2 = (me >> 16) + mnb
        onb, pos = _read_back(words, pos, (oe >> 8) & 0xFF)
        ofS2 = (oe >> 16) + onb
        pos = jnp.maximum(pos, 0)
        nc = (jnp.where(active, llS2, llS), jnp.where(active, ofS2, ofS),
              jnp.where(active, mlS2, mlS), pos, nr0, nr1, nr2)
        z = jnp.int32(0)
        return nc, (jnp.where(active, llv, z), jnp.where(active, mlv, z),
                    jnp.where(active, offset, 1))

    def step(carry, su):
        outs = []
        for u in range(_UNROLL):
            carry, o = one(carry, su * _UNROLL + u)
            outs.append(o)
        return carry, jax.tree_util.tree_map(lambda *x: jnp.stack(x), *outs)

    steps = (MAXSEQ + _UNROLL - 1) // _UNROLL
    ones = jnp.ones(N, jnp.int32)
    carry0 = (llS, ofS, mlS, pos0, ones, 4 * ones, 8 * ones)
    _, (ll, ml, off) = jax.lax.scan(
        step, carry0, jnp.arange(steps, dtype=jnp.int32))

    def fwd(x):
        return x.reshape(steps * _UNROLL, N).T[:, :MAXSEQ]

    return fwd(ll), fwd(ml), fwd(off)


def _execute(litbuf, ll, ml, off, nbseq, litregen, B):
    """LZ77 execution on the output domain (per block lane): monotone
    fills map each output byte to its covering sequence, a gather
    fixpoint resolves back-reference chains to literal roots."""
    MAXSEQ = ll.shape[0] if ll.ndim == 1 else ll.shape[-1]
    sid = jnp.arange(MAXSEQ + 1, dtype=jnp.int32)
    # phantom sequence AT slot nbseq carries the trailing literals
    lit_sum = jnp.sum(ll)
    llp = jnp.concatenate([ll, jnp.zeros(1, jnp.int32)])
    mlp = jnp.concatenate([ml, jnp.zeros(1, jnp.int32)])
    offx = jnp.concatenate([off, jnp.ones(1, jnp.int32)])
    real = sid <= nbseq
    llx = jnp.where(sid < nbseq, llp,
                    jnp.where(sid == nbseq, litregen - lit_sum, 0))
    mlx = jnp.where(sid < nbseq, mlp, 0)
    prod = llx + mlx
    outstart = jnp.cumsum(prod) - prod
    litbase = jnp.cumsum(llx) - llx
    dlen = outstart[-1] + prod[-1]

    emitting = real & (prod > 0)
    tstart = jnp.where(emitting, outstart, jnp.int32(B))
    f_os = _fill(outstart, tstart, B, 0)
    f_lb = _fill(litbase, tstart, B, 0)
    f_ms = _fill(outstart + llx, tstart, B, 0)
    # offsets are not monotone: ride outstart's strictly-increasing high
    # bits through the cummax fill (same packing as lz4's _decode_block)
    f_off = (_fill(((outstart << 16) | jnp.clip(offx, 1, 0xFFFF)) + _NEG,
                   tstart, B, _NEG) - _NEG) & 0xFFFF
    f_off = jnp.maximum(f_off, 1)

    o = jnp.arange(B, dtype=jnp.int32)
    is_lit = o < f_ms
    # Periodic collapse (r5, VERDICT r4 #6): an overlapping match
    # (off < ml) is a periodic fill, so every byte can source DIRECTLY
    # from the first period — (o - f_ms) mod off — instead of hopping
    # off bytes back per fixpoint round. For off >= ml the mod is the
    # identity. This removes the long intra-match chains (RLE runs were
    # the ~10-round tail of the gather fixpoint); what remains is
    # inter-match nesting depth (measured 2-3 rounds).
    src = jnp.where(is_lit, -(f_lb + (o - f_os)) - 1,
                    (f_ms - f_off) + jnp.remainder(o - f_ms, f_off))
    src = jnp.where(o < dlen, src, -1)
    # back-refs point strictly earlier, so the fixpoint terminates
    src = jnp.where(src >= o, -1, src)  # corrupt-stream self-loop guard

    def cond(state):
        return state[1]

    def step(state):
        s, _ = state
        g = s[jnp.clip(s, 0, B - 1)]
        ns = jnp.where(s >= 0, g, s)
        return ns, jnp.any(ns >= 0)

    src, _ = jax.lax.while_loop(cond, step, (src, jnp.any(src >= 0)))
    out = litbuf[jnp.clip(-src - 1, 0, B - 1)]
    return jnp.where(o < dlen, out, 0).astype(jnp.uint8), dlen


@functools.lru_cache(maxsize=8)
def make_decoder(B: int, SB: int, QB: int, MAXL: int = 0,
                 MAXSEQ: int = 0):
    """Jitted batched decoder over planned compressed blocks.

    MAXL / MAXSEQ: symbol-scan lengths, bucketed by the BATCH's actual
    maximum literal-stream count / sequence count (decode_frames sizes
    them) — the scans are the sequential axis of this decoder, and the
    worst-case bounds (B/4 literals, B/3 sequences) cost 4-6x the steps
    typical blocks need. 0 = worst case.

    Inputs (N = batch):
      meta    i32 (N, PLAN_STRIDE)
      huftab  i32 (N, HUF_SIZE)
      fsetab  i32 (N, 3, FSE_SIZE)
      sbytes  u8  (N, 4, SB)   literal stream bytes (left-justified)
      slens   i32 (N, 4)
      scounts i32 (N, 4)       symbols per stream
      qbytes  u8  (N, QB)      sequence bitstream bytes
      rawlit  u8  (N, B)       raw literals (btype-0/RLE handled here too)
    Returns (out u8 (N, B), dlen i32 (N,)).
    """
    if not MAXL:
        MAXL = max(B // 4 + _UNROLL, 1024)
    if not MAXSEQ:
        MAXSEQ = B // 3 + 2

    @jax.jit
    def decode(meta, huftab, fsetab, sbytes, slens, scounts, qbytes,
               rawlit):
        N = meta.shape[0]
        # ---- stage 1: literal Huffman scan over 4N lanes ----
        L = 4 * N
        sb = sbytes.reshape(L, SB)
        sl = slens.reshape(L)
        sc = scounts.reshape(L)
        hlog = jnp.repeat(meta[:, PM_HUFLOG], 4, total_repeat_length=L)
        syms = _literal_scan(sb, sl, sc, huftab, hlog, MAXL)  # (L, MAXL)

        # place stream symbols into the per-block literal buffer: stream j
        # of block b covers [j*q, j*q + count) with q = ceil(regen/4)
        # (single-stream blocks: stream 0 covers [0, regen))
        regen = meta[:, PM_LITREGEN]
        nstreams = meta[:, PM_NSTREAMS]
        q = jnp.where(nstreams == 4, (regen + 3) >> 2, regen)
        jlane = jnp.tile(jnp.arange(4, dtype=jnp.int32), N)
        qv = jnp.repeat(q, 4, total_repeat_length=L)
        base = jlane * qv
        k = jnp.arange(MAXL, dtype=jnp.int32)
        dest = (jnp.repeat(jnp.arange(N, dtype=jnp.int32), 4,
                           total_repeat_length=L)[:, None] * B
                + base[:, None] + k[None, :])
        live = k[None, :] < sc[:, None]
        flat_dest = jnp.where(live, dest, N * B)
        litflat = jnp.zeros(N * B, jnp.uint8).at[
            flat_dest.reshape(-1)].set(
                syms.astype(jnp.uint8).reshape(-1), mode="drop")
        litbuf = litflat.reshape(N, B)
        # non-Huffman literals: raw bytes (host-sliced) or the RLE byte
        littype = meta[:, PM_LITTYPE]
        litbuf = jnp.where(
            (littype == 2)[:, None], litbuf,
            jnp.where((littype == 1)[:, None],
                      meta[:, PM_RLEBYTE, None].astype(jnp.uint8), rawlit))

        # stage-prefix ablation for the chip roofline (AOCL_ZD_STAGES=1|2):
        # XLA dead-code-eliminates the stages a prefix does not touch, so
        # prefix deltas isolate per-stage cost (CLAUDE.md measuring rule)
        if _STAGES == 1:
            return litbuf, regen

        # ---- stage 2: FSE sequence scan ----
        qlens = meta[:, PM_SEQLEN]
        nbseq = meta[:, PM_NBSEQ]
        ll, ml, off = _sequence_scan(
            qbytes, qlens, nbseq, fsetab, meta[:, PM_LLLOG],
            meta[:, PM_OFLOG], meta[:, PM_MLLOG], MAXSEQ)
        if _STAGES == 2:
            return litbuf, nbseq + ll[:, 0] + ml[:, 0] + off[:, 0]

        # ---- stage 3: LZ77 execution ----
        out, dlen = jax.vmap(
            lambda lb, l, m, o, ns, lr: _execute(lb, l, m, o, ns, lr, B)
        )(litbuf, ll, ml, off, nbseq, regen)
        return out, dlen

    return decode


# --- host orchestration -----------------------------------------------------

class _FramePlan:
    __slots__ = ("start", "csize", "kind", "block", "content")

    def __init__(self, start, csize, kind, block=None, content=None):
        self.start = start
        self.csize = csize
        self.kind = kind        # "device" | "host" | "skippable"
        self.block = block      # device batch index
        self.content = content  # host-decoded bytes (host kind)


def _stream_caps(B: int) -> Tuple[int, int]:
    return B // 4 + 4096, B  # SB, QB


def decode_frames(data: bytes, expected_size: Optional[int] = None) -> bytes:
    """Decode a stream of concatenated zstd frames, device-batching every
    single-block frame that fits the device gate; anything else decodes
    through the host oracle (same result, measured-policy honesty)."""
    B = MAX_DEVICE_BLOCK
    SB, QB = _stream_caps(B)
    src = np.frombuffer(data, dtype=np.uint8)
    frames: List[_FramePlan] = []
    metas, hufs, fses = [], [], []
    off = 0
    n = len(data)
    while off < n:
        res = native.zstd_frame_plan(data, off)
        if res is None:
            raise ValueError("zstd: corrupt frame header")
        nb, meta, huf, fse, consumed = res
        if nb == 0:
            frames.append(_FramePlan(off, consumed, "skippable"))
            off += consumed
            continue
        m0 = meta[0]
        # content size: from the frame header when declared (our encoder
        # always writes it); unknown-size frames are post-gated on the
        # device-computed dlen instead
        fcs = native.zstd_frame_content_size(data[off:off + consumed])
        ok = (nb == 1 and m0[PM_BTYPE] == 2
              and (fcs is None or fcs <= B)
              and m0[PM_LITREGEN] <= B
              and all(m0[PM_S0LEN + 2 * i] <= SB for i in range(4))
              and m0[PM_SEQLEN] <= QB
              and m0[PM_NBSEQ] <= B // 3)
        if ok:
            frames.append(_FramePlan(off, consumed, "device",
                                     block=len(metas)))
            metas.append(meta[0])
            hufs.append(huf[0])
            fses.append(fse[0])
        else:
            chunk = data[off:off + consumed]
            frames.append(_FramePlan(
                off, consumed, "host",
                content=native.zstd_decompress(chunk)))
        off += consumed

    outs = {}
    if metas:
        N = len(metas)
        meta = np.stack(metas)
        sbytes = np.zeros((N, 4, SB), np.uint8)
        slens = np.zeros((N, 4), np.int32)
        scounts = np.zeros((N, 4), np.int32)
        qbytes = np.zeros((N, QB), np.uint8)
        rawlit = np.zeros((N, B), np.uint8)
        for i, m in enumerate(metas):
            if m[PM_LITTYPE] == 2:
                regen = int(m[PM_LITREGEN])
                ns = int(m[PM_NSTREAMS])
                qq = (regen + 3) // 4 if ns == 4 else regen
                for j in range(ns):
                    so, sl = int(m[PM_S0OFF + 2 * j]), int(m[PM_S0LEN + 2 * j])
                    sbytes[i, j, :sl] = src[so:so + sl]
                    slens[i, j] = sl
                    scounts[i, j] = (min(qq, regen - j * qq) if ns == 4
                                     else regen)
                if ns == 4:
                    scounts[i, 3] = regen - 3 * qq
            elif m[PM_LITTYPE] == 0:
                so, sl = int(m[PM_S0OFF]), int(m[PM_S0LEN])
                rawlit[i, :sl] = src[so:so + sl]
            sq, ql = int(m[PM_SEQOFF]), int(m[PM_SEQLEN])
            if ql:
                qbytes[i, :ql] = src[sq:sq + ql]
        # bucket the sequential scan lengths to this batch's content
        max_cnt = int(scounts.max()) if N else 0
        max_seq = max(int(m[PM_NBSEQ]) for m in metas)
        MAXL = min(_bucket(max(max_cnt, 1) + _UNROLL, 512),
                   max(B // 4 + _UNROLL, 1024))
        MAXSEQ = min(_bucket(max_seq + 2, 512), B // 3 + 2)
        if _os.environ.get("AOCL_ZD_WORSTCASE"):  # A/B: r3 behavior
            MAXL = max(B // 4 + _UNROLL, 1024)
            MAXSEQ = B // 3 + 2
        dec = make_decoder(B, SB, QB, MAXL, MAXSEQ)
        out, dlen = jax.block_until_ready(dec(
            jnp.asarray(meta), jnp.asarray(np.stack(hufs).astype(np.int32)),
            jnp.asarray(np.stack(fses).astype(np.int32)),
            jnp.asarray(sbytes), jnp.asarray(slens), jnp.asarray(scounts),
            jnp.asarray(qbytes), jnp.asarray(rawlit)))
        out_np = np.asarray(out)
        dlen_np = np.asarray(dlen)
        for i in range(N):
            outs[i] = out_np[i, :int(dlen_np[i])].tobytes()

    parts = []
    for f in frames:
        if f.kind == "device":
            if int(dlen_np[f.block]) > B:
                # unknown-content-size frame turned out bigger than the
                # device out domain: re-decode on the host oracle
                parts.append(native.zstd_decompress(
                    data[f.start:f.start + f.csize]))
            else:
                parts.append(outs[f.block])
        elif f.kind == "host":
            parts.append(f.content)
    res = b"".join(parts)
    if expected_size is not None and len(res) != expected_size:
        raise ValueError(
            f"zstd device decode: size mismatch ({len(res)} != "
            f"{expected_size}) — corrupt stream")
    return res


def decode_chunks(chunks: List[bytes], dlens: List[int]) -> List[bytes]:
    """RAP adapter entry. Chunk regions concatenate into a valid frame
    stream (the container contract), so ALL chunks decode in ONE device
    batch; the result re-splits at the known chunk output sizes."""
    blob = decode_frames(b"".join(chunks), expected_size=int(sum(dlens)))
    outs, pos = [], 0
    for dl in dlens:
        outs.append(blob[pos:pos + dl])
        pos += dl
    return outs
