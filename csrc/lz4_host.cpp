// Host-tier LZ4 block-format codec (own implementation, written to the
// public LZ4 block format spec). Serves as the bit-exact oracle and the
// small-input path of the TPU framework; the device pipeline
// (aocl_compression_tpu/ops/) is cross-checked against it.
//
// Capability parity targets (see SURVEY.md §2.2 A1/A2):
//   - greedy fast compressor with acceleration-controlled match skipping
//     (reference behavior: algos/lz4/lz4.c:1447-1580, re-designed here)
//   - safe decompressor (reference: algos/lz4/lz4.c:4898)
//   - HC hash-chain compressor, levels 1-12 (reference: algos/lz4/lz4hc.c)
//
// Format rules honored: minmatch 4, 16-bit offsets, last sequence is
// literals-only, last 5 bytes are literals, no match starts within the last
// 12 bytes (MFLIMIT).

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

constexpr int kHashBits = 16;
constexpr int kHashSize = 1 << kHashBits;
constexpr int64_t kMfLimit = 12;      // no match may start after iend-12
constexpr int64_t kLastLiterals = 5;  // final 5 bytes must be literals
constexpr int64_t kMinMatch = 4;
constexpr int64_t kMaxDistance = 65535;

inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

inline uint32_t hash4(uint32_t v) {
    return (v * 2654435761u) >> (32 - kHashBits);
}

inline uint64_t read64(const uint8_t* p) {
    uint64_t v;
    std::memcpy(&v, p, 8);
    return v;
}

// 5-byte hash for the fast compressor (upstream's byU32-mode idea,
// lz4.c LZ4_hash5): a 4-byte hash surfaces every minimum-length match,
// chopping compressible regions into 35-50% more, shorter sequences —
// which costs BOTH sides (per-sequence emit on encode, per-sequence
// token decode on decode; measured on the reference oracle, MEASURED.md
// round-5 "lz4 stream structure"). Hashing 5 bytes hides 4-byte-only
// matches, and the compact table keeps the hot loop L1-resident.
constexpr int kHash5Bits = 13;
inline uint32_t hash5(const uint8_t* p) {
    return (uint32_t)(((read64(p) << 24) * 0x9E3779B185EBCA87ull)
                      >> (64 - kHash5Bits));
}

// match length by 8-byte XOR + ctz (upstream's LZ4_count class idiom);
// limit applies to p (the input side)
inline int64_t count_match(const uint8_t* p, const uint8_t* m,
                           const uint8_t* limit) {
    const uint8_t* s = p;
    while (p + 8 <= limit) {
        uint64_t x, y;
        std::memcpy(&x, p, 8);
        std::memcpy(&y, m, 8);
        uint64_t d = x ^ y;
        if (d) return (p - s) + (__builtin_ctzll(d) >> 3);
        p += 8;
        m += 8;
    }
    while (p < limit && *p == *m) { p++; m++; }
    return p - s;
}

// Emit one sequence: [token][litlen ext][literals][offset][matchlen ext].
// matchLen < kMinMatch means "final literal-only sequence" (no offset field).
// exact output size of one sequence (token + lit ext + literals + offset
// + match ext) — lets the compressors honor TIGHT dst buffers like
// upstream LZ4's limitedOutput mode instead of demanding the full bound
inline int64_t seq_out_size(int64_t litLen, int64_t matchLen) {
    int64_t n = 1 + litLen;
    if (litLen >= 15) n += 1 + (litLen - 15) / 255;
    if (matchLen >= kMinMatch) {
        n += 2;
        int64_t ml = matchLen - kMinMatch;
        if (ml >= 15) n += 1 + (ml - 15) / 255;
    }
    return n;
}

inline uint8_t* emit_sequence(uint8_t* op, const uint8_t* lit, int64_t litLen,
                              int64_t offset, int64_t matchLen,
                              const uint8_t* oend = nullptr) {
    uint8_t* token = op++;
    if (litLen >= 15) {
        *token = 15 << 4;
        int64_t rest = litLen - 15;
        while (rest >= 255) { *op++ = 255; rest -= 255; }
        *op++ = (uint8_t)rest;
    } else {
        *token = (uint8_t)(litLen << 4);
    }
    // 16-byte wildcopy chunks when the caller passed slack room (the
    // common case: bound-sized buffers); exact copy near the end
    if (oend && op + litLen + 16 <= oend) {
        uint8_t* o = op;
        const uint8_t* q = lit;
        int64_t n = litLen;
        do {
            std::memcpy(o, q, 16);
            o += 16;
            q += 16;
            n -= 16;
        } while (n > 0);
    } else {
        std::memcpy(op, lit, (size_t)litLen);
    }
    op += litLen;
    if (matchLen >= kMinMatch) {
        *op++ = (uint8_t)(offset & 0xff);
        *op++ = (uint8_t)(offset >> 8);
        int64_t ml = matchLen - kMinMatch;
        if (ml >= 15) {
            *token |= 15;
            ml -= 15;
            while (ml >= 255) { *op++ = 255; ml -= 255; }
            *op++ = (uint8_t)ml;
        } else {
            *token |= (uint8_t)ml;
        }
    }
    return op;
}

}  // namespace

extern "C" {

int64_t atpu_lz4_compress_bound(int64_t n) {
    return n + n / 255 + 16;
}

// Greedy fast compressor. accel >= 1 widens the match-skip stride on
// incompressible regions (the reference's dynamic-step idea,
// algos/lz4/lz4.c:1447-1580, expressed as the classic searchMatchNb>>skip).
// tail_lits (optional out): number of input bytes in the final literal-only
// sequence — the MT stitcher needs it to merge fragment boundaries the way
// the reference's serial stitch does (lz4.c:2736+, last_anchor_ptr).
int64_t atpu_lz4_compress_tail(const uint8_t* src, int64_t srcLen,
                               uint8_t* dst, int64_t dstCap, int accel,
                               int64_t* tail_lits) {
    if (srcLen < 0 || dstCap < 0) return -1;
    if (accel < 1) accel = 1;
    uint8_t* op = dst;
    const uint8_t* oend = dst + dstCap;
    const uint8_t* anchor = src;
    const uint8_t* iend = src + srcLen;

    if (srcLen > kMfLimit) {
        uint32_t* table = (uint32_t*)std::calloc(1 << kHash5Bits,
                                                 sizeof(uint32_t));
        if (!table) return -1;
        const uint8_t* ip = src;
        const uint8_t* mflimit = iend - kMfLimit;
        constexpr int kSkipTrigger = 6;

        table[hash5(ip)] = 0;
        ip++;
        uint32_t fwdH = hash5(ip);

        for (;;) {
            const uint8_t* match;
            const uint8_t* fwdIp = ip;
            int64_t step = 1;
            int64_t searchMatchNb = (int64_t)accel << kSkipTrigger;
            // --- find a 4-byte match within the 64KB window ---
            do {
                uint32_t h = fwdH;
                ip = fwdIp;
                fwdIp = ip + step;
                step = searchMatchNb++ >> kSkipTrigger;
                if (fwdIp > mflimit) goto last_literals;
                match = src + table[h];
                fwdH = hash5(fwdIp);
                table[h] = (uint32_t)(ip - src);
            } while (read32(match) != read32(ip) || match + kMaxDistance < ip
                     || match >= ip);
            // --- extend backwards ---
            while (ip > anchor && match > src && ip[-1] == match[-1]) {
                ip--;
                match--;
            }
            // --- extend forwards (stop before the last-5-literals zone) ---
            {
                const uint8_t* mlimit = iend - kLastLiterals;
                int64_t mlen = kMinMatch
                    + count_match(ip + kMinMatch, match + kMinMatch, mlimit);
                if (op + seq_out_size(ip - anchor, mlen) > oend) {
                    std::free(table);
                    return -1;
                }
                op = emit_sequence(op, anchor, ip - anchor, ip - match, mlen,
                                   oend);
                ip += mlen;
                anchor = ip;
            }
            if (ip > mflimit) break;
            // refresh the table near the match end, then continue
            table[hash5(ip - 2)] = (uint32_t)(ip - 2 - src);
            fwdH = hash5(ip);
        }
    last_literals:
        std::free(table);
    }
    // final literal-only sequence (may be the only one for tiny inputs)
    if (tail_lits) *tail_lits = iend - anchor;
    if (op + seq_out_size(iend - anchor, 0) > oend) return -1;
    op = emit_sequence(op, anchor, iend - anchor, 0, 0);
    return op - dst;
}

int64_t atpu_lz4_compress(const uint8_t* src, int64_t srcLen,
                          uint8_t* dst, int64_t dstCap, int accel) {
    return atpu_lz4_compress_tail(src, srcLen, dst, dstCap, accel, nullptr);
}

// Linked-block (streaming) compress: bytes [src - prefixLen, src) are the
// caller's history window — matches may start inside it, so consecutive
// LZ4F linked blocks reference each other exactly like the reference's
// LZ4F_compressUpdate path (algos/lz4/lz4frame.c LZ4F_compressBlock with
// a carried LZ4_stream_t). Capability analog, own code: the history is a
// contiguous prefix (the Python streamer keeps the previous 64 KiB
// adjacent), so one table over base = src - prefixLen covers both.
int64_t atpu_lz4_compress_continue(const uint8_t* src, int64_t srcLen,
                                   uint8_t* dst, int64_t dstCap, int accel,
                                   int64_t prefixLen) {
    if (srcLen < 0 || dstCap < 0 || prefixLen < 0) return -1;
    if (prefixLen == 0)
        return atpu_lz4_compress_tail(src, srcLen, dst, dstCap, accel,
                                      nullptr);
    if (accel < 1) accel = 1;
    if (prefixLen > (int64_t)kMaxDistance) {
        src -= 0;  // only the last 64K of history is reachable anyway
        // (the caller passes at most 64K; larger is clamped here)
        prefixLen = kMaxDistance;
    }
    const uint8_t* base = src - prefixLen;
    uint8_t* op = dst;
    const uint8_t* oend = dst + dstCap;
    const uint8_t* anchor = src;
    const uint8_t* iend = src + srcLen;

    if (srcLen > kMfLimit) {
        uint32_t* table = (uint32_t*)std::calloc(1 << kHash5Bits,
                                                 sizeof(uint32_t));
        if (!table) return -1;
        // seed the table with the history window (8-byte hash reads need
        // i + 8 <= prefixLen + srcLen, true while i < prefixLen: the
        // current block supplies the slack, srcLen > kMfLimit here)
        for (int64_t i = 0; i < prefixLen; i++)
            table[hash5(base + i)] = (uint32_t)i;
        const uint8_t* ip = src;
        const uint8_t* mflimit = iend - kMfLimit;
        constexpr int kSkipTrigger = 6;

        table[hash5(ip)] = (uint32_t)(ip - base);
        ip++;
        uint32_t fwdH = hash5(ip);

        for (;;) {
            const uint8_t* match;
            const uint8_t* fwdIp = ip;
            int64_t step = 1;
            int64_t searchMatchNb = (int64_t)accel << kSkipTrigger;
            do {
                uint32_t h = fwdH;
                ip = fwdIp;
                fwdIp = ip + step;
                step = searchMatchNb++ >> kSkipTrigger;
                if (fwdIp > mflimit) goto last_literals;
                match = base + table[h];
                fwdH = hash5(fwdIp);
                table[h] = (uint32_t)(ip - base);
            } while (read32(match) != read32(ip) || match + kMaxDistance < ip
                     || match >= ip);
            while (ip > anchor && match > base && ip[-1] == match[-1]) {
                ip--;
                match--;
            }
            {
                const uint8_t* mlimit = iend - kLastLiterals;
                int64_t mlen = kMinMatch
                    + count_match(ip + kMinMatch, match + kMinMatch, mlimit);
                if (op + seq_out_size(ip - anchor, mlen) > oend) {
                    std::free(table);
                    return -1;
                }
                op = emit_sequence(op, anchor, ip - anchor, ip - match, mlen,
                                   oend);
                ip += mlen;
                anchor = ip;
            }
            if (ip > mflimit) break;
            table[hash5(ip - 2)] = (uint32_t)(ip - 2 - base);
            fwdH = hash5(ip);
        }
    last_literals:
        std::free(table);
    }
    if (op + seq_out_size(iend - anchor, 0) > oend) return -1;
    op = emit_sequence(op, anchor, iend - anchor, 0, 0);
    return op - dst;
}

// Safe decompressor: validates lengths/offsets against both buffers.
// Shape: a margin-gated fast loop (fixed-size 16-byte literal copies for
// the 93%-common litLen <= 14 token, fused 20-byte match copies for
// matchLen <= 18 at distance >= 8, single-compare offset validation),
// then the exact checked loop finishes the last <=32/64 bytes. The fixed
// copies may write past the logical sequence end; the margins keep every
// wild write inside dst and every wild read inside src.
int64_t atpu_lz4_decompress(const uint8_t* src, int64_t srcLen,
                            uint8_t* dst, int64_t dstCap) {
    const uint8_t* ip = src;
    const uint8_t* iend = src + srcLen;
    uint8_t* op = dst;
    uint8_t* oend = dst + dstCap;
    if (srcLen <= 0) return srcLen == 0 ? 0 : -1;

    const uint8_t* const inLimit = srcLen > 32 ? iend - 32 : src;
    uint8_t* const outLimit = dstCap > 64 ? oend - 64 : dst;
    while (ip < inLimit && op < outLimit) {
        uint32_t token = *ip++;
        int64_t litLen = token >> 4;
        if (litLen < 15) {
            // ip + 16 <= iend and op + 16 <= oend by the loop margins
            std::memcpy(op, ip, 16);
            op += litLen;
            ip += litLen;
        } else {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                litLen += b;
            } while (b == 255);
            if (litLen > iend - ip || litLen > oend - op) return -1;
            if (litLen + 32 <= iend - ip && litLen + 32 <= oend - op) {
                uint8_t* o = op;
                const uint8_t* q = ip;
                int64_t n = litLen;
                do {
                    // single 32-byte memcpy compiles to one ymm move at
                    // x86-64-v3 (two xmm pairs before): +10% decode
                    std::memcpy(o, q, 32);
                    o += 32;
                    q += 32;
                    n -= 32;
                } while (n > 0);
            } else {
                std::memcpy(op, ip, (size_t)litLen);
            }
            op += litLen;
            ip += litLen;
            if (ip >= iend) return op - dst;  // literal-only final sequence
            if (iend - ip < 2) return -1;
        }
        int64_t offset = (int64_t)ip[0] | ((int64_t)ip[1] << 8);
        ip += 2;
        // offset != 0 && offset <= op - dst, in one unsigned compare
        if ((uint64_t)(offset - 1) >= (uint64_t)(op - dst)) return -1;
        int64_t mlen = (int64_t)(token & 15);
        const uint8_t* m = op - offset;
        if ((mlen != 15) & (offset >= 8)) {
            // mlen + 4 <= 18: three ordered fixed copies cover 20 bytes and
            // are overlap-correct at distance >= 8 (each chunk is shorter
            // than the distance); op + 20 is inside the 64-byte margin
            // (op < outLimit = oend - 64), so no extra slack check.
            std::memcpy(op, m, 8);
            std::memcpy(op + 8, m + 8, 8);
            std::memcpy(op + 16, m + 16, 4);
            op += mlen + kMinMatch;
            continue;
        }
        if (mlen == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        mlen += kMinMatch;
        if (mlen > oend - op) return -1;
        if (offset >= 32 && oend - op >= mlen + 32) {
            // non-overlapping at distance >= 32: true 32-byte ymm steps
            uint8_t* o = op;
            int64_t n = mlen;
            do {
                std::memcpy(o, m, 32);
                o += 32;
                m += 32;
                n -= 32;
            } while (n > 0);
        } else if (offset >= 16 && oend - op >= mlen + 32) {
            uint8_t* o = op;
            int64_t n = mlen;
            do {
                std::memcpy(o, m, 16);
                std::memcpy(o + 16, m + 16, 16);
                o += 32;
                m += 32;
                n -= 32;
            } while (n > 0);
        } else if (offset >= 8 && oend - op >= mlen + 8) {
            uint8_t* o = op;
            const uint8_t* e = op + mlen;
            do {
                std::memcpy(o, m, 8);
                o += 8;
                m += 8;
            } while (o < e);
        } else if (offset < 8 && oend - op >= mlen + 16 && mlen >= 8) {
            // periodic expansion: materialize >=8 bytes of the pattern
            // bytewise, then 8-byte steps from the smallest multiple of the
            // offset >= 8 back — that window repeats and no longer overlaps
            uint8_t* o = op;
            for (int i = 0; i < 8; i++) o[i] = m[i];
            int64_t gap = ((8 + offset - 1) / offset) * offset;
            const uint8_t* q = op + 8 - gap;
            o += 8;
            uint8_t* e = op + mlen;
            do {
                std::memcpy(o, q, 8);
                o += 8;
                q += 8;
            } while (o < e);
        } else {
            for (int64_t i = 0; i < mlen; i++) op[i] = m[i];
        }
        op += mlen;
    }

    // exact checked tail (also the whole loop for tiny inputs)
    while (ip < iend) {
        uint32_t token = *ip++;
        int64_t litLen = token >> 4;
        if (litLen == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                litLen += b;
            } while (b == 255);
        }
        if (litLen > iend - ip || litLen > oend - op) return -1;
        std::memcpy(op, ip, (size_t)litLen);
        ip += litLen;
        op += litLen;
        if (ip >= iend) break;  // literal-only final sequence
        if (iend - ip < 2) return -1;
        int64_t offset = (int64_t)ip[0] | ((int64_t)ip[1] << 8);
        ip += 2;
        if (offset == 0 || offset > op - dst) return -1;
        int64_t mlen = (int64_t)(token & 15) + kMinMatch;
        if ((token & 15) == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        if (mlen > oend - op) return -1;
        const uint8_t* m = op - offset;
        // wildcopy (reference: AOCL_LZ4_wildCopy64_AVX, lz4.c:510): 8-byte
        // chunks when distance and tail slack allow; byte loop is the
        // overlap-correct fallback for short distances
        if (offset >= 8 && oend - op >= mlen + 8) {
            uint8_t* o = op;
            const uint8_t* e = op + mlen;
            do {
                std::memcpy(o, m, 8);
                o += 8;
                m += 8;
            } while (o < e);
        } else {
            for (int64_t i = 0; i < mlen; i++) op[i] = m[i];
        }
        op += mlen;
    }
    return op - dst;
}

// Structural size scan: walk tokens/lengths without copying bytes and
// return the exact decompressed size (or -1 on malformed structure).
// Lets unknown-size one-shot decode allocate exactly instead of retrying
// with geometric growth (two passes, zero restarts). Offsets are checked
// against the running output position like the real decoder.
int64_t atpu_lz4_decompressed_size(const uint8_t* src, int64_t srcLen) {
    const uint8_t* ip = src;
    const uint8_t* iend = src + srcLen;
    int64_t out = 0;
    if (srcLen <= 0) return srcLen == 0 ? 0 : -1;
    while (ip < iend) {
        uint32_t token = *ip++;
        int64_t litLen = token >> 4;
        if (litLen == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                litLen += b;
            } while (b == 255);
        }
        if (litLen > iend - ip) return -1;
        ip += litLen;
        out += litLen;
        if (ip >= iend) break;  // literal-only final sequence
        if (iend - ip < 2) return -1;
        int64_t offset = (int64_t)ip[0] | ((int64_t)ip[1] << 8);
        ip += 2;
        if (offset == 0 || offset > out) return -1;
        int64_t mlen = (int64_t)(token & 15) + kMinMatch;
        if ((token & 15) == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        out += mlen;
    }
    return out;
}

// ---------------------------------------------------------------------------
// HC compressor: hash-chain match finder with level-controlled search depth
// (reference capability: algos/lz4/lz4hc.c levels 1-12; own design).
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Optimal-parse tier (levels 10-12). The reference switches strategy at
// L10 to a price-driven parse (algos/lz4/lz4hc.c:1629 LZ4HC_compress_optimal,
// clTable :1655-1668); this is an own design on the recipe proven by
// csrc/lzma.cpp lzma_run_optimal and the zstd L16+ DP: a chunked forward
// shortest-path where the price is the EXACT output byte count (token +
// literal-extension bytes + literals + 2 offset bytes + match-extension
// bytes), nodes carry the pending literal-run length (its extension-byte
// boundaries at 15, 270, 525, ... are the only history the price needs),
// and long matches take a nice-length early-out so RLE spans don't
// quadratically relax every sub-length.
// ---------------------------------------------------------------------------

namespace {

struct L4OptNode {
    uint32_t price;
    int32_t from;
    int32_t len;     // bytes of the entering op (1 = literal)
    uint32_t dist;   // 0 = literal
    uint32_t run;    // pending literal-run length at this node
};

struct L4Pair { int len; uint32_t dist; };

// +1 output byte when the literal run grows ONTO an extension boundary
// (run 15 adds the first extension byte; 270, 525, ... each add another)
static inline uint32_t l4_lit_inc(uint32_t run_after) {
    return (run_after >= 15 && (run_after - 15) % 255 == 0) ? 2u : 1u;
}
static inline uint32_t l4_mlext(int64_t L) {
    return (L - 4 < 15) ? 0u : (uint32_t)(1 + (L - 19) / 255);
}

}  // namespace

static int64_t lz4hc_optimal_tail(const uint8_t* src, int64_t srcLen,
                                  uint8_t* dst, int64_t dstCap, int level,
                                  int64_t* tail_lits);

int64_t atpu_lz4hc_compress_tail(const uint8_t* src, int64_t srcLen,
                                 uint8_t* dst, int64_t dstCap, int level,
                                 int64_t* tail_lits) {
    if (srcLen < 0 || dstCap < 0) return -1;
    if (level < 1) level = 9;
    if (level > 12) level = 12;
    if (level >= 10)
        return lz4hc_optimal_tail(src, srcLen, dst, dstCap, level,
                                  tail_lits);
    // search depth doubles per level: 1<<level, capped — the
    // chain-continuation walk converts attempts into reach cheaply
    // enough that a 2x budget still leaves every level faster than the
    // reference's own build (MEASURED.md round-5 lz4hc)
    int64_t maxAttempts = (int64_t)1 << level;
    if (maxAttempts > 4096) maxAttempts = 4096;

    uint8_t* op = dst;
    const uint8_t* oend = dst + dstCap;
    const uint8_t* anchor = src;
    const uint8_t* iend = src + srcLen;

    if (srcLen > kMfLimit) {
        const int64_t window = kMaxDistance + 1;  // 65536 chain slots
        int32_t* head = (int32_t*)std::malloc(kHashSize * sizeof(int32_t));
        int32_t* prev = (int32_t*)std::malloc(window * sizeof(int32_t));
        if (!head || !prev) { std::free(head); std::free(prev); return -1; }
        for (int i = 0; i < kHashSize; i++) head[i] = -1;
        const uint8_t* ip = src;
        const uint8_t* mflimit = iend - kMfLimit;
        const uint8_t* mlimit = iend - kLastLiterals;
        int64_t nextInsert = 0;  // next position to insert into chains

        auto insert_upto = [&](int64_t pos) {
            while (nextInsert < pos) {
                uint32_t h = hash4(read32(src + nextInsert));
                prev[nextInsert & kMaxDistance] = head[h];
                head[h] = (int32_t)nextInsert;
                nextInsert++;
            }
        };

        // Chain search for the WIDEST match covering src+pos (candidates
        // must already be inserted up to pos+1). Two mechanics:
        // - chain-continuation walk (same scheme as csrc/deflate.cpp
        //   Matcher::find): once a best FORWARD length L is held, only a
        //   position containing p[L-3..L] at relative offset L-3 can
        //   extend further forward — jump to that 4-byte chain instead
        //   of grinding same-head candidates.
        // - span scoring (the reference's InsertAndGetWiderMatch
        //   behavior, lz4hc.c:299): each candidate is extended BACKWARD
        //   toward the anchor too, and selection maximizes back+forward
        //   span — the backward bytes come off the literal run for free.
        // Returns the span; *backOut says how far before pos it starts.
        auto chain_best = [&](int64_t pos, int64_t anchorPos,
                              int64_t* bestOffOut,
                              int64_t* backOut) -> int64_t {
            const uint8_t* p = src + pos;
            int64_t bestSpan = kMinMatch - 1;
            int64_t bestFwd = kMinMatch - 1;
            int64_t bestOff = 0;
            int64_t bestBack = 0;
            int64_t offset = 0;
            int32_t cand;
            {
                uint32_t h = hash4(read32(p));
                cand = head[h] == (int32_t)pos ? prev[pos & kMaxDistance]
                                               : head[h];
            }
            int64_t attempts = maxAttempts;
            const int64_t maxl = mlimit - p;
            const int64_t maxBack = pos - anchorPos;
            while (cand >= 0 && attempts--) {
                int64_t mstart = cand - offset;
                if (mstart >= pos || mstart < 0) {
                    int32_t nx = prev[cand & kMaxDistance];
                    if (nx >= cand) break;
                    cand = nx;
                    continue;
                }
                if (pos - mstart > kMaxDistance) break;
                const uint8_t* m = src + mstart;
                bool plausible = offset == 0
                    ? (m[bestFwd] == p[bestFwd] && read32(m) == read32(p))
                    : (read32(m) == read32(p));
                if (plausible) {
                    int64_t len = kMinMatch
                        + count_match(p + kMinMatch, m + kMinMatch, mlimit);
                    if (len + maxBack > bestSpan) {
                        int64_t back = 0;
                        while (back < maxBack && mstart - back > 0 &&
                               p[-back - 1] == m[-back - 1])
                            back++;
                        if (len + back > bestSpan) {
                            bestSpan = len + back;
                            bestOff = pos - mstart;
                            bestBack = back;
                        }
                    }
                    if (len > bestFwd) {
                        bestFwd = len;
                        if (len >= maxl) break;
                        offset = len - 3;
                        cand = head[hash4(read32(p + offset))];
                        continue;
                    }
                }
                int32_t nx = prev[cand & kMaxDistance];
                if (nx >= cand) break;  // wrapped slot pointing forward
                cand = nx;
            }
            *bestOffOut = bestOff;
            *backOut = bestBack;
            return bestSpan;
        };
        // lazy window doubles with level (upstream lz4hc's wider-match
        // stitching, LZ4HC_InsertAndGetWiderMatch lz4hc.c:299 —
        // expressed as plain 1..2-step deferral, own structure)
        const int lazySteps = level >= 8 ? 2 : (level >= 5 ? 1 : 0);
        while (ip <= mflimit) {
            int64_t pos = ip - src;
            insert_upto(pos + 1);
            int64_t bestOff = 0, bestBack = 0;
            int64_t bestLen = chain_best(pos, anchor - src, &bestOff,
                                         &bestBack);
            if (bestLen >= kMinMatch && bestLen < 48 && lazySteps) {
                // deferral: a strictly wider match one (or two) bytes
                // ahead covers more for the cost of literals that LZ4
                // tokens encode nearly free (spans compared, so a
                // deferred match that back-extends over this one's
                // bytes does not double count)
                for (int st = 0; st < lazySteps && ip + 1 <= mflimit;
                     st++) {
                    insert_upto(pos + 2);
                    int64_t off1 = 0, back1 = 0;
                    int64_t len1 = chain_best(pos + 1, anchor - src, &off1,
                                              &back1);
                    if (len1 > bestLen + (st ? 1 : 0)) {
                        ip++;
                        pos++;
                        bestLen = len1;
                        bestOff = off1;
                        bestBack = back1;
                    } else {
                        break;
                    }
                }
            }
            if (bestLen >= kMinMatch) {
                ip -= bestBack;  // candidate-specific backward extension
                if (op + seq_out_size(ip - anchor, bestLen) > oend) {
                    std::free(head);
                    std::free(prev);
                    return -1;
                }
                op = emit_sequence(op, anchor, ip - anchor, bestOff, bestLen,
                                   oend);
                ip += bestLen;
                anchor = ip;
                insert_upto(ip - src < (mflimit - src) ? ip - src
                                                       : mflimit - src);
            } else {
                ip++;
            }
        }
        std::free(head);
        std::free(prev);
    }
    if (tail_lits) *tail_lits = iend - anchor;
    if (op + seq_out_size(iend - anchor, 0) > oend) return -1;
    op = emit_sequence(op, anchor, iend - anchor, 0, 0);
    return op - dst;
}

int64_t atpu_lz4hc_compress(const uint8_t* src, int64_t srcLen,
                            uint8_t* dst, int64_t dstCap, int level) {
    return atpu_lz4hc_compress_tail(src, srcLen, dst, dstCap, level, nullptr);
}

// Optimal parse (see the block comment above atpu_lz4hc_compress_tail).
// Because an LZ4 offset always costs exactly 2 bytes, the price of a
// match depends only on its LENGTH — so per position the DP needs only
// the longest match (any shorter arrival is that match truncated), not
// the reference's full pair list.
static int64_t lz4hc_optimal_tail(const uint8_t* src, int64_t srcLen,
                                  uint8_t* dst, int64_t dstCap, int level,
                                  int64_t* tail_lits) {
    uint8_t* op = dst;
    const uint8_t* oend = dst + dstCap;
    const uint8_t* anchor = src;
    const uint8_t* iend = src + srcLen;

    if (srcLen > kMfLimit) {
        const int64_t window = kMaxDistance + 1;
        const int64_t CHUNK = 16384, SLACK = 4096;
        const int64_t NN = CHUNK + SLACK + 1;
        int32_t* head = (int32_t*)std::malloc(kHashSize * sizeof(int32_t));
        int32_t* prev = (int32_t*)std::malloc(window * sizeof(int32_t));
        L4OptNode* nd = (L4OptNode*)std::malloc(sizeof(L4OptNode)
                                                * (size_t)NN);
        int64_t* order = (int64_t*)std::malloc(sizeof(int64_t) * (size_t)NN);
        if (!head || !prev || !nd || !order) {
            std::free(head);
            std::free(prev);
            std::free(nd);
            std::free(order);
            return -1;
        }
        for (int i = 0; i < kHashSize; i++) head[i] = -1;
        int64_t nextInsert = 0;
        const int64_t mfl = srcLen - kMfLimit;       // last match start
        const int64_t mll = srcLen - kLastLiterals;  // last match end
        const uint8_t* mlimit = src + mll;
        auto insert_upto = [&](int64_t p) {
            if (p > mfl + 1) p = mfl + 1;
            while (nextInsert < p) {
                uint32_t h = hash4(read32(src + nextInsert));
                prev[nextInsert & kMaxDistance] = head[h];
                head[h] = (int32_t)nextInsert;
                nextInsert++;
            }
        };
        // search depth per level (reference clTable tier: 512-16384
        // searches at L10-12; these are chain steps per DP position)
        const int attempts0 = level >= 12 ? 1024 : (level == 11 ? 384 : 160);
        // long-match early-out, scaled like the reference's sufficient_len
        // ladder (lz4hc.c clTable): exhaustive sub-length relaxation buys
        // nothing once a match is this long, and on periodic data the
        // chain walk would otherwise scan every same-hash candidate at
        // every in-match position
        const int64_t NICE = level >= 12 ? 256 : (level == 11 ? 128 : 64);

        auto find_longest = [&](int64_t p, uint32_t* distOut) -> int64_t {
            const uint8_t* ip = src + p;
            uint32_t h = hash4(read32(ip));
            int32_t cand = head[h] == (int32_t)p ? prev[p & kMaxDistance]
                                                 : head[h];
            int64_t best = kMinMatch - 1;
            uint32_t bestd = 0;
            int attempts = attempts0;
            int64_t offset = 0;  // chain-continuation (see chain_best)
            const int64_t maxl = mlimit - ip;
            while (cand >= 0 && attempts-- > 0) {
                int64_t mstart = cand - offset;
                if (mstart >= p || mstart < 0) {
                    int32_t nx = prev[cand & kMaxDistance];
                    if (nx >= cand) break;
                    cand = nx;
                    continue;
                }
                if (p - mstart > kMaxDistance) break;
                const uint8_t* m = src + mstart;
                bool plausible = offset == 0
                    ? (m[best] == ip[best] && read32(m) == read32(ip))
                    : (read32(m) == read32(ip));
                if (plausible) {
                    int64_t len = kMinMatch + count_match(
                        ip + kMinMatch, m + kMinMatch, mlimit);
                    if (len > best) {
                        best = len;
                        bestd = (uint32_t)(p - mstart);
                        if (len >= NICE || len >= maxl) break;
                        offset = best - 3;
                        cand = head[hash4(read32(ip + offset))];
                        continue;
                    }
                }
                int32_t nx = prev[cand & kMaxDistance];
                if (nx >= cand) break;
                cand = nx;
            }
            *distOut = bestd;
            return bestd ? best : 0;
        };

        int64_t base = 0;
        uint32_t run0 = 0;  // pending literal run entering the chunk
        while (base < srcLen) {
            int64_t rem = srcLen - base;
            int64_t tgt = rem < CHUNK ? rem : CHUNK;
            int64_t maxo = rem < CHUNK + SLACK ? rem : CHUNK + SLACK;
            for (int64_t i = 0; i <= maxo; i++) {
                nd[i].price = 0xFFFFFFFFu;
                nd[i].from = -1;
            }
            nd[0].price = 0;
            nd[0].from = 0;
            nd[0].len = 0;
            nd[0].dist = 0;
            nd[0].run = run0;

            auto relax = [&](int64_t j, uint32_t p, int64_t i, int64_t len,
                             uint32_t dist, uint32_t run) {
                if (p >= nd[j].price) return;
                nd[j].price = p;
                nd[j].from = (int32_t)i;
                nd[j].len = (int32_t)len;
                nd[j].dist = dist;
                nd[j].run = run;
            };

            int64_t skipUntil = 0;
            for (int64_t i = 0; i < tgt; i++) {
                if (nd[i].from < 0) continue;
                const uint32_t basePrice = nd[i].price;
                const uint32_t run = nd[i].run;
                const int64_t abs = base + i;
                if (i + 1 <= maxo)
                    relax(i + 1, basePrice + l4_lit_inc(run + 1), i, 1, 0,
                          run + 1);
                if (i < skipUntil || abs > mfl) continue;
                insert_upto(abs + 1);
                uint32_t dist = 0;
                int64_t longest = find_longest(abs, &dist);
                if (longest < kMinMatch) continue;
                if (longest > maxo - i) longest = maxo - i;
                if (longest < kMinMatch) continue;
                if (longest >= NICE) {
                    relax(i + longest,
                          basePrice + 3 + l4_mlext(longest), i, longest,
                          dist, 0);
                    skipUntil = i + longest;
                } else {
                    for (int64_t L = kMinMatch; L <= longest; L++)
                        relax(i + L, basePrice + 3 + l4_mlext(L), i, L,
                              dist, 0);
                }
            }

            // chunk end: cheapest reachable node at or past the target,
            // comparing nodes at different positions fairly by charging
            // each the all-literal cost of the input it has NOT consumed
            // (an admissible estimate — without it the nearest node
            // always wins and matches spanning the boundary get cut)
            int64_t end = tgt;
            uint64_t bestP = 0xFFFFFFFFFFFFull;
            for (int64_t i = tgt; i <= maxo; i++) {
                if (nd[i].from < 0) continue;
                uint64_t p = (uint64_t)nd[i].price + (uint64_t)(maxo - i);
                if (p < bestP) {
                    bestP = p;
                    end = i;
                }
            }

            // backtrack the path (at most maxo <= NN edges), then emit
            // the match edges forward
            int64_t cur = end;
            int64_t nEdges = 0;
            while (cur > 0) {
                nEdges++;
                cur = nd[cur].from;
            }
            cur = end;
            for (int64_t k = nEdges - 1; k >= 0; k--) {
                order[k] = cur;
                cur = nd[cur].from;
            }
            int64_t at = 0;
            for (int64_t k = 0; k < nEdges; k++) {
                int64_t j = order[k];
                if (nd[j].dist) {
                    int64_t mstart = base + at;
                    int64_t lits = (src + mstart) - anchor;
                    if (op + seq_out_size(lits, nd[j].len) > oend) {
                        std::free(head);
                        std::free(prev);
                        std::free(nd);
                        std::free(order);
                        return -1;
                    }
                    op = emit_sequence(op, anchor, lits, nd[j].dist,
                                       nd[j].len, oend);
                    anchor = src + base + j;
                }
                at = j;
            }
            run0 = nd[end].run;
            base += end;
        }
        std::free(head);
        std::free(prev);
        std::free(nd);
        std::free(order);
    }
    if (tail_lits) *tail_lits = iend - anchor;
    if (op + seq_out_size(iend - anchor, 0) > oend) return -1;
    op = emit_sequence(op, anchor, iend - anchor, 0, 0);
    return op - dst;
}

}  // extern "C"

// Dict-aware decompressor: offsets may reach back into `hist` (the last
// <=64K of previously decoded output) — needed for LZ4-frame linked blocks.
extern "C" int64_t atpu_lz4_decompress_dict(const uint8_t* src, int64_t srcLen,
                                 uint8_t* dst, int64_t dstCap,
                                 const uint8_t* hist, int64_t histLen) {
    const uint8_t* ip = src;
    const uint8_t* iend = src + srcLen;
    uint8_t* op = dst;
    uint8_t* oend = dst + dstCap;
    if (srcLen <= 0) return srcLen == 0 ? 0 : -1;
    while (ip < iend) {
        uint32_t token = *ip++;
        int64_t litLen = token >> 4;
        if (litLen == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                litLen += b;
            } while (b == 255);
        }
        if (litLen > iend - ip || litLen > oend - op) return -1;
        std::memcpy(op, ip, (size_t)litLen);
        ip += litLen;
        op += litLen;
        if (ip >= iend) break;
        if (iend - ip < 2) return -1;
        int64_t offset = (int64_t)ip[0] | ((int64_t)ip[1] << 8);
        ip += 2;
        int64_t produced = op - dst;
        if (offset == 0 || offset > produced + histLen) return -1;
        int64_t mlen = (int64_t)(token & 15) + kMinMatch;
        if ((token & 15) == 15) {
            uint8_t b;
            do {
                if (ip >= iend) return -1;
                b = *ip++;
                mlen += b;
            } while (b == 255);
        }
        if (mlen > oend - op) return -1;
        if (offset <= produced) {
            // match entirely within dst: same copy ladder as the plain
            // decoder (8/16-byte chunks when distance and slack allow)
            const uint8_t* m = op - offset;
            if (offset >= 16 && oend - op >= mlen + 32) {
                uint8_t* o = op;
                int64_t n = mlen;
                do {
                    std::memcpy(o, m, 16);
                    std::memcpy(o + 16, m + 16, 16);
                    o += 32;
                    m += 32;
                    n -= 32;
                } while (n > 0);
            } else if (offset >= 8 && oend - op >= mlen + 8) {
                uint8_t* o = op;
                const uint8_t* e = op + mlen;
                do {
                    std::memcpy(o, m, 8);
                    o += 8;
                    m += 8;
                } while (o < e);
            } else {
                for (int64_t i = 0; i < mlen; i++) op[i] = m[i];
            }
        } else {
            // dict-reaching match: head from hist (disjoint buffers), then
            // the remainder continues from the start of dst
            int64_t fromDict = offset - produced;
            int64_t n = fromDict < mlen ? fromDict : mlen;
            std::memcpy(op, hist + histLen - fromDict, (size_t)n);
            for (int64_t i = n; i < mlen; i++) op[i] = dst[produced + i - offset];
        }
        op += mlen;
    }
    return op - dst;
}
