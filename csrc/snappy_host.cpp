// Host-tier Snappy raw-format codec (own implementation, written to the
// public Snappy format description). Oracle + small-input path; the device
// pipeline in aocl_compression_tpu/ops/ is cross-checked against it.
//
// Capability parity target: SURVEY.md §2.2 A5 (reference:
// /root/reference/algos/snappy/snappy.cc — CompressFragment / RawUncompress).
//
// Format: varint32 uncompressed length, then elements:
//   tag & 3 == 0: literal, len-1 in tag>>2 (<=59), 60..63 => 1..4 extra
//                 little-endian length bytes
//   tag & 3 == 1: copy, 1-byte offset: len = ((tag>>2)&7)+4 (4..11),
//                 offset = ((tag>>5)<<8 | next byte)  (<=2047)
//   tag & 3 == 2: copy, 2-byte LE offset: len = (tag>>2)+1 (1..64)
//   tag & 3 == 3: copy, 4-byte LE offset (not emitted; decoded for parity)

#include <cstdint>
#include <cstring>
#include <cstdlib>

namespace {

constexpr int kHashBits = 14;
constexpr int kHashSize = 1 << kHashBits;

inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

inline uint32_t shash(uint32_t v) {
    return (v * 0x1e35a7bd) >> (32 - kHashBits);
}

inline uint8_t* put_varint32(uint8_t* op, uint32_t v) {
    while (v >= 0x80) {
        *op++ = (uint8_t)(v | 0x80);
        v >>= 7;
    }
    *op++ = (uint8_t)v;
    return op;
}

inline const uint8_t* get_varint32(const uint8_t* ip, const uint8_t* iend,
                                   uint32_t* out) {
    uint32_t v = 0;
    int shift = 0;
    while (ip < iend && shift <= 28) {
        uint8_t b = *ip++;
        v |= (uint32_t)(b & 0x7f) << shift;
        if (!(b & 0x80)) {
            *out = v;
            return ip;
        }
        shift += 7;
    }
    return nullptr;
}

// match length by 8-byte XOR + ctz (the upstream FindMatchLength idiom)
inline int64_t count_match4(const uint8_t* p, const uint8_t* m,
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

inline uint8_t* emit_literal(uint8_t* op, const uint8_t* lit, int64_t len,
                             const uint8_t* wildEnd = nullptr) {
    while (len > 0) {
        int64_t n = len;  // snappy literals can be arbitrarily long
        int64_t l = n - 1;
        if (l < 60) {
            *op++ = (uint8_t)(l << 2);
        } else if (l < (1 << 8)) {
            *op++ = 60 << 2;
            *op++ = (uint8_t)l;
        } else if (l < (1 << 16)) {
            *op++ = 61 << 2;
            *op++ = (uint8_t)l;
            *op++ = (uint8_t)(l >> 8);
        } else if (l < (1 << 24)) {
            *op++ = 62 << 2;
            *op++ = (uint8_t)l;
            *op++ = (uint8_t)(l >> 8);
            *op++ = (uint8_t)(l >> 16);
        } else {
            *op++ = 63 << 2;
            *op++ = (uint8_t)l;
            *op++ = (uint8_t)(l >> 8);
            *op++ = (uint8_t)(l >> 16);
            *op++ = (uint8_t)(l >> 24);
        }
        if (wildEnd && op + n + 32 <= wildEnd) {
            // 32-byte wildcopy chunks — one ymm move each at x86-64-v3
            // (dstCap >= max_compressed_length is enforced at entry, so
            // slack almost always exists)
            uint8_t* o = op;
            const uint8_t* q = lit;
            int64_t r = n;
            do {
                std::memcpy(o, q, 32);
                o += 32;
                q += 32;
                r -= 32;
            } while (r > 0);
        } else {
            std::memcpy(op, lit, (size_t)n);
        }
        op += n;
        lit += n;
        len -= n;
    }
    return op;
}

// Emit a copy of total length len at offset; splits into <=64-byte elements.
inline uint8_t* emit_copy(uint8_t* op, int64_t offset, int64_t len) {
    // long matches: emit 64-byte copies while more than 68 remain so the
    // tail can always be expressed (>=4)
    while (len >= 68) {
        *op++ = (uint8_t)(2 | ((64 - 1) << 2));
        *op++ = (uint8_t)offset;
        *op++ = (uint8_t)(offset >> 8);
        len -= 64;
    }
    if (len > 64) {
        *op++ = (uint8_t)(2 | ((60 - 1) << 2));
        *op++ = (uint8_t)offset;
        *op++ = (uint8_t)(offset >> 8);
        len -= 60;
    }
    if (len >= 4 && len < 12 && offset < 2048) {
        *op++ = (uint8_t)(1 | ((len - 4) << 2) | ((offset >> 8) << 5));
        *op++ = (uint8_t)offset;
    } else {
        *op++ = (uint8_t)(2 | ((len - 1) << 2));
        *op++ = (uint8_t)offset;
        *op++ = (uint8_t)(offset >> 8);
    }
    return op;
}

}  // namespace

extern "C" {

int64_t atpu_snappy_max_compressed_length(int64_t n) {
    return 32 + n + n / 6;
}

int64_t atpu_snappy_compress(const uint8_t* src, int64_t srcLen,
                             uint8_t* dst, int64_t dstCap) {
    if (srcLen < 0 || dstCap < atpu_snappy_max_compressed_length(srcLen))
        return -1;
    uint8_t* op = put_varint32(dst, (uint32_t)srcLen);
    const uint8_t* ip = src;
    const uint8_t* anchor = src;
    const uint8_t* iend = src + srcLen;
    const uint8_t* const oend = dst + dstCap;

    if (srcLen >= 15) {
        uint16_t* table = (uint16_t*)std::calloc(kHashSize, sizeof(uint16_t));
        if (!table) return -1;
        // table stores pos+1 within the current 64KB base window; rebase to
        // keep entries 16-bit like classic snappy fragments
        const uint8_t* base = src;
        const uint8_t* mflimit = iend - 15;
        int64_t skip = 32;
        ip++;
        while (ip < mflimit) {
            // rebase the window if we've moved 64KB past base
            if (ip - base >= 65536) {
                base = ip;
                std::memset(table, 0, kHashSize * sizeof(uint16_t));
            }
            uint32_t h = shash(read32(ip));
            const uint8_t* match = base + table[h];
            table[h] = (uint16_t)(ip - base);
            if (match < ip && read32(match) == read32(ip)) {
                int64_t mlen = 4 + count_match4(ip + 4, match + 4, iend);
                op = emit_literal(op, anchor, ip - anchor, oend);
                op = emit_copy(op, ip - match, mlen);
                ip += mlen;
                anchor = ip;
                skip = 32;
                if (ip < mflimit)
                    table[shash(read32(ip - 1))] = (uint16_t)(ip - 1 - base);
            } else {
                // miss-stride through incompressible spans (the upstream
                // bytes_between_hash_lookups heuristic)
                ip += (skip++) >> 5;
            }
        }
        std::free(table);
    }
    op = emit_literal(op, anchor, iend - anchor);
    return op - dst;
}

int64_t atpu_snappy_uncompressed_length(const uint8_t* src, int64_t srcLen) {
    uint32_t n;
    const uint8_t* p = get_varint32(src, src + srcLen, &n);
    return p ? (int64_t)n : -1;
}


// Per-tag decode metadata (the upstream char_table idea, own layout):
// one lookup replaces the 4-way element-type branch and the per-type
// length/offset extraction branches. Entry (u32):
//   [0:8)   element length (0 = long literal, length bytes follow)
//   [8:11)  extra input bytes after the tag (length bytes / offset bytes)
//   [11]    literal flag
//   [16:32) offset addend from the tag bits (1-byte-offset copies)
struct SnTagTable {
    uint32_t e[256];
    SnTagTable() {
        for (int t = 0; t < 256; t++) {
            int type = t & 3;
            if (type == 0) {
                int l = t >> 2;
                e[t] = l < 60 ? ((uint32_t)(l + 1) | (1u << 11))
                              : (((uint32_t)(l - 59) << 8) | (1u << 11));
            } else if (type == 1) {
                e[t] = (uint32_t)(((t >> 2) & 7) + 4) | (1u << 8)
                       | ((uint32_t)(t >> 5) << 16 << 8);
            } else if (type == 2) {
                e[t] = (uint32_t)((t >> 2) + 1) | (2u << 8);
            } else {
                e[t] = (uint32_t)((t >> 2) + 1) | (4u << 8);
            }
        }
    }
};
static const uint32_t SN_MASK[5] = {0, 0xFFu, 0xFFFFu, 0xFFFFFFu,
                                    0xFFFFFFFFu};

int64_t atpu_snappy_uncompress(const uint8_t* src, int64_t srcLen,
                               uint8_t* dst, int64_t dstCap) {
    const uint8_t* iend = src + srcLen;
    uint32_t expect;
    const uint8_t* ip = get_varint32(src, iend, &expect);
    if (!ip || (int64_t)expect > dstCap) return -1;
    uint8_t* op = dst;
    uint8_t* oend = dst + expect;

    // Margin-gated fast loop: fixed-size copies (16B for short literals
    // and 1-byte-offset copies, 64B in 16B chunks for tag-max literals and
    // 2-byte-offset copies) that may write past the logical element end.
    // Margins are held against the PHYSICAL capacity (dstCap — callers
    // often allocate exactly `expect`), worst-case 64B wild write + 68B
    // wild read; the exact checked loop below finishes the tail. A length
    // that overruns the logical `oend` just advances op past it — the
    // checked tail or the final op == oend test rejects the stream.
    const uint8_t* const inLimit = srcLen > 68 ? iend - 68 : src;
    uint8_t* const oendCap = dst + dstCap;
    uint8_t* const outLimit = dstCap > 80 ? oendCap - 80 : dst;
    static const SnTagTable SNT;
    // Branchless-merged element loop (reference analog: the
    // DecompressBranchless structure of algos/snappy/snappy.cc — own
    // derivation): literal and match share ONE unconditional 64-byte
    // copy whose source is selected by cmov; the only data-dependent
    // branch is the rare-case exit (long literal / invalid or
    // truly-overlapping offset). Ordered 16-byte chunks are
    // within-element safe for offset >= 16 at any len <= 64, and for
    // offset >= len at any offset (the needed bytes all lie below op;
    // wild tail bytes are rewritten before any later element can read
    // them) — so the slow condition for matches is offset < min(len, 16).
    while (ip < inLimit && op < outLimit) {
        uint32_t tag = *ip++;
        uint32_t e = SNT.e[tag];
        uint32_t w = read32(ip);  // wild 4-byte read, inside the margin
        uint32_t extra = (e >> 8) & 7;
        int64_t len = e & 0xFF;
        ip += extra;
        int64_t lit = (e >> 11) & 1;
        // mask selects instead of ternaries: gcc was branching on `lit`,
        // which is exactly the misprediction the merged loop exists to kill
        uint64_t lmask = (uint64_t)0 - (uint64_t)lit;
        int64_t offset = (int64_t)(e >> 16) + (int64_t)(w & SN_MASK[extra]);
        const uint8_t* m = op - offset;
        const uint8_t* s = (const uint8_t*)(((uintptr_t)ip & lmask) |
                                            ((uintptr_t)m & ~lmask));
        uint64_t cap32 = (uint64_t)(len < 32 ? len : 32);
        uint64_t bad = (uint64_t)((uint64_t)(offset - 1) >=
                                  (uint64_t)(op - dst)) |
                       (uint64_t)((uint64_t)offset < cap32);
        uint64_t slow = (bad & ~lmask) | ((uint64_t)(len == 0) & lmask);
        if (__builtin_expect(slow != 0, 0)) {
            if (lit) {  // long literal: length bytes were in w
                len = (int64_t)(w & SN_MASK[extra]) + 1;
                if (len > iend - ip || len > oend - op) return -1;
                std::memcpy(op, ip, (size_t)len);
                ip += len;
                op += len;
                continue;
            }
            if ((uint64_t)(offset - 1) >= (uint64_t)(op - dst)) return -1;
            if (offset >= 8) {
                uint8_t* o = op;
                const uint8_t* q = m;
                uint8_t* const e2 = op + len;
                do {
                    std::memcpy(o, q, 8);
                    o += 8;
                    q += 8;
                } while (o < e2);
                op += len;
                continue;
            }
            // small periodic offset: materialize 8 pattern bytes, then
            // 8-byte steps from the first aligned repeat >= 8 back
            uint8_t* o = op;
            for (int i = 0; i < 8 && i < len; i++) o[i] = m[i];
            if (len > 8) {
                int64_t gap = ((8 + offset - 1) / offset) * offset;
                const uint8_t* q = op + 8 - gap;
                o = op + 8;
                uint8_t* const e = op + len;
                do {
                    std::memcpy(o, q, 8);
                    o += 8;
                    q += 8;
                } while (o < e);
            }
            op += len;
            continue;
        }
        // fast path: one unconditional 64B copy, source cmov-selected
        std::memcpy(op, s, 32);
        std::memcpy(op + 32, s + 32, 32);
        ip += (int64_t)((uint64_t)len & lmask);
        op += len;
    }

    while (ip < iend) {
        uint32_t tag = *ip++;
        uint32_t type = tag & 3;
        if (type == 0) {
            int64_t len = (tag >> 2) + 1;
            if (len > 60) {
                int nb = (int)len - 60;
                if (ip + nb > iend) return -1;
                len = 0;
                for (int i = 0; i < nb; i++) len |= (int64_t)ip[i] << (8 * i);
                len += 1;
                ip += nb;
            }
            if (len > iend - ip || len > oend - op) return -1;
            std::memcpy(op, ip, (size_t)len);
            ip += len;
            op += len;
        } else {
            int64_t len, offset;
            if (type == 1) {
                if (ip >= iend) return -1;
                len = ((tag >> 2) & 7) + 4;
                offset = ((int64_t)(tag >> 5) << 8) | *ip++;
            } else if (type == 2) {
                if (ip + 2 > iend) return -1;
                len = (tag >> 2) + 1;
                offset = (int64_t)ip[0] | ((int64_t)ip[1] << 8);
                ip += 2;
            } else {
                if (ip + 4 > iend) return -1;
                len = (tag >> 2) + 1;
                offset = (int64_t)read32(ip);
                ip += 4;
            }
            if (offset == 0 || offset > op - dst || len > oend - op) return -1;
            const uint8_t* m = op - offset;
            // wildcopy (reference: AOCL_SnappyArrayWriter_AVX class):
            // 8-byte chunks when distance and tail slack allow
            if (offset >= 8 && oend - op >= len + 8) {
                uint8_t* o = op;
                const uint8_t* e = op + len;
                do {
                    std::memcpy(o, m, 8);
                    o += 8;
                    m += 8;
                } while (o < e);
            } else {
                for (int64_t i = 0; i < len; i++) op[i] = m[i];
            }
            op += len;
        }
    }
    return (op == oend) ? op - dst : -1;
}

}  // extern "C"
