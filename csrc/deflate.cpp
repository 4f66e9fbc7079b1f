// Own DEFLATE (RFC 1951) encoder + decoder, zlib (RFC 1950) wrapper.
//
// Replaces the round-1 CPython-zlib delegates for compress levels 1-9 and
// all of inflate (VERDICT item 8). Capability parity targets:
// /root/reference/algos/zlib/deflate.c (+ deflate_medium.c, deflate_quick.c
// strategy ladder), inflate.c / inffast_chunk.c, compress.c:153 compress2,
// uncompr.c. Independent implementation — hash-chain lazy matching with a
// level-parameter ladder mirroring the reference's semantics (chain depth /
// lazy threshold / nice length), dynamic-vs-static-vs-stored block choice.
//
// Modes (both directions):
//   0 = zlib stream (2-byte header ... adler32)
//   1 = raw deflate, complete (ends with a final block)
//   2 = raw deflate, sync-flushed chunk: non-final blocks + an empty stored
//       block, byte-aligned — the RAP container chunk format (chunks
//       concatenate into one valid stream; parity with Z_SYNC_FLUSH).

#include <cstdint>
#include <cstring>
#include <cstdlib>

#include "btmf.h"

#define ATPU_EXPORT extern "C" __attribute__((visibility("default")))

namespace {

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;
typedef long long i64;

enum { ERR_CORRUPT = -1, ERR_DST_SMALL = -2, ERR_CHECKSUM = -4 };

static const int MIN_MATCH = 3, MAX_MATCH = 258, WSIZE = 32768;

// ---------------------------------------------------------------------------
// adler32
// ---------------------------------------------------------------------------
static u32 adler32(const u8* p, size_t n, u32 start) {
  u32 a = start & 0xFFFF, b = start >> 16;
  while (n) {
    size_t chunk = n > 5552 ? 5552 : n;
    n -= chunk;
    while (chunk--) { a += *p++; b += a; }
    a %= 65521;
    b %= 65521;
  }
  return (b << 16) | a;
}

// ---------------------------------------------------------------------------
// length / distance code tables (RFC 1951 §3.2.5)
// ---------------------------------------------------------------------------
static const u16 LEN_BASE[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
  23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258};
static const u8 LEN_XBITS[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
  2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
static const u16 DIST_BASE[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49,
  65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
  8193, 12289, 16385, 24577};
static const u8 DIST_XBITS[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
  6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
static const u8 CL_ORDER[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
  3, 13, 2, 14, 1, 15};

struct LenCodeLut {  // magic-static init: thread-safe under C++11
  int lut[259];
  LenCodeLut() {
    for (int c = 0; c < 29; c++) {
      int hi = (c == 28) ? 258 : LEN_BASE[c + 1] - 1;
      for (int l = LEN_BASE[c]; l <= hi && l <= 258; l++) lut[l] = c;
    }
  }
};

static int len_code_of(int len) {  // len in [3,258]
  static const LenCodeLut lc;
  return lc.lut[len];
}

struct DistCodeLut {  // zlib trees.c d_code idiom: 512-entry two-level LUT
  u8 lut[512];
  DistCodeLut() {
    for (int d = 1; d <= 256; d++) {
      int c = 29;
      while (DIST_BASE[c] > (u16)d) c--;
      lut[d - 1] = (u8)c;
    }
    for (int k = 0; k < 256; k++) {  // (d-1) >> 7 for d in (256, 32768]
      int d = (k << 7) + 1;
      int c = 29;
      while (DIST_BASE[c] > (u16)d) c--;
      lut[256 + k] = (u8)c;
    }
  }
};

static int dist_code_of(int d) {  // d in [1,32768]
  static const DistCodeLut dcl;
  return d <= 256 ? dcl.lut[d - 1] : dcl.lut[256 + ((d - 1) >> 7)];
}

// ---------------------------------------------------------------------------
// bit IO
// ---------------------------------------------------------------------------
struct BitWriter {
  u8* out;
  size_t cap, len = 0;
  u64 acc = 0;
  int nbits = 0;
  bool overflow = false;

  BitWriter(u8* o, size_t c) : out(o), cap(c) {}
  void put(u32 v, int n) {  // LSB-first; word-granular flush (the
    // per-byte drain was 55% of deflate L1 encode time in emit_block)
    acc |= (u64)(v & ((n >= 32) ? 0xFFFFFFFFu : ((1u << n) - 1))) << nbits;
    nbits += n;
    if (nbits >= 32) {
      if (len + 4 > cap) { overflow = true; nbits &= 7; return; }
      u32 w = (u32)acc;
      memcpy(out + len, &w, 4);
      len += 4;
      acc >>= 32;
      nbits -= 32;
    }
  }
  void align() {  // pad to a byte boundary and drain whole bytes
    if (nbits & 7) put(0, 8 - (nbits & 7));
    while (nbits >= 8) {
      if (len >= cap) { overflow = true; nbits = 0; return; }
      out[len++] = (u8)acc;
      acc >>= 8;
      nbits -= 8;
    }
  }
  void bytes(const u8* p, size_t n) {
    if (len + n > cap) { overflow = true; return; }
    memcpy(out + len, p, n);
    len += n;
  }
};

struct BitReader {
  const u8* p;
  const u8* end;
  u64 acc = 0;
  int nbits = 0;
  bool fail = false;

  BitReader(const u8* s, const u8* e) : p(s), end(e) {}
  void refill() {
    if (end - p >= 8) {
      // single 8-byte load; p += bytes absorbed. k + 8*((63-k)>>3) == k|56
      // for k in [0,63], so nbits lands in [56,63] branch-free.
      u64 w;
      memcpy(&w, p, 8);
      acc |= w << nbits;
      p += (63 - nbits) >> 3;
      nbits |= 56;
      return;
    }
    while (nbits <= 56 && p < end) { acc |= (u64)(*p++) << nbits; nbits += 8; }
  }
  u32 get(int n) {
    if (nbits < n) refill();
    if (nbits < n) { fail = true; return 0; }
    u32 v = (u32)(acc & ((1ULL << n) - 1));
    acc >>= n;
    nbits -= n;
    return v;
  }
  u32 peek(int n) {
    if (nbits < n) refill();
    return (u32)(acc & ((1ULL << n) - 1));
  }
  void drop(int n) { acc >>= n; nbits -= n; if (nbits < 0) fail = true; }
  void align() { int r = nbits & 7; acc >>= r; nbits -= r; }
  size_t bytes_left() const { return (size_t)(end - p) + (size_t)(nbits / 8); }
};

// ---------------------------------------------------------------------------
// canonical Huffman decode table (full lookup, maxbits <= 15)
// ---------------------------------------------------------------------------
struct HTable {
  u16 sym[1 << 15];
  u8 len[1 << 15];
  int maxbits = 0;

  // lens[i] = code length of symbol i (0 = absent). allow_incomplete:
  // distance trees may be under-subscribed (zlib compat; unfilled entries
  // decode as invalid only if actually referenced)
  bool build(const u8* lens, int n, bool allow_incomplete = false) {
    int bl_count[16] = {0};
    maxbits = 0;
    for (int i = 0; i < n; i++) {
      if (lens[i] > 15) return false;
      bl_count[lens[i]]++;
      if (lens[i] > maxbits) maxbits = lens[i];
    }
    if (maxbits == 0) return false;
    int code = 0, next_code[16];
    bl_count[0] = 0;
    for (int b = 1; b <= 15; b++) {
      code = (code + bl_count[b - 1]) << 1;
      next_code[b] = code;
    }
    // over-subscribed / incomplete check
    int left = 1;
    for (int b = 1; b <= 15; b++) {
      left <<= 1;
      left -= bl_count[b];
      if (left < 0) return false;
    }
    if (left > 0 && !allow_incomplete
        && !(maxbits == 1 && bl_count[1] == 1)) return false;
    int size = 1 << maxbits;
    memset(len, 0, (size_t)size);
    for (int s = 0; s < n; s++) {
      int l = lens[s];
      if (!l) continue;
      u32 c = (u32)next_code[l]++;
      // deflate codes are read MSB-first; our reader is LSB-first, so store
      // the entry at every bit-reversed index with the code as prefix
      u32 rc = 0;
      for (int b = 0; b < l; b++) rc |= ((c >> b) & 1) << (l - 1 - b);
      for (u32 idx = rc; idx < (u32)size; idx += (1u << l)) {
        sym[idx] = (u16)s;
        len[idx] = (u8)l;
      }
    }
    return true;
  }
};

// ---------------------------------------------------------------------------
// Two-level Huffman decode table for the inflate hot loop (the zlib
// inflate_table design class, own build): a 10-bit L1-resident root of
// packed u32 entries + subtables for longer codes. The flat 15-bit
// HTable costs two random loads over 96 KiB per symbol; this costs one
// load in 4 KiB for the overwhelmingly common <=10-bit codes, and the
// entry embeds base value + extra-bit count so there is no second
// LEN_BASE/DIST_BASE lookup.
//
// Entry layout (u32):
//   [0:5)   bits consumed (total code length; SUB pointer entries: root)
//   [5:8)   kind: 0 literal, 1 match/dist code, 2 end-of-block,
//           3 subtable pointer, 4 invalid
//   [8:12)  extra bits (kind 1) / subtable index width (kind 3)
//   [16:32) payload: literal byte / length-dist base / subtable offset
// ---------------------------------------------------------------------------
static const int FT_ROOT = 10;
static const u32 FT_INV = 15u | (4u << 5);

static inline u32 revbits(u32 c, int l) {
  u32 rc = 0;
  for (int b = 0; b < l; b++) rc |= ((c >> b) & 1) << (l - 1 - b);
  return rc;
}

struct FTable {
  u32 root[1 << FT_ROOT];
  u32 sub[2048];  // >= the zlib ENOUGH bound for a 10-bit root

  void make_invalid() {  // degenerate distance tree: any use is corrupt
    for (int i = 0; i < (1 << FT_ROOT); i++) root[i] = FT_INV;
  }

  bool build(const u8* lens, int n, bool isDist, bool allow_incomplete) {
    int bl_count[16] = {0};
    int maxbits = 0;
    for (int i = 0; i < n; i++) {
      if (lens[i] > 15) return false;
      bl_count[lens[i]]++;
      if (lens[i] > maxbits) maxbits = lens[i];
    }
    if (maxbits == 0) return false;
    int left = 1;
    for (int b = 1; b <= 15; b++) {
      left <<= 1;
      left -= bl_count[b];
      if (left < 0) return false;  // over-subscribed
    }
    if (left > 0 && !allow_incomplete
        && !(maxbits == 1 && bl_count[1] == 1)) return false;
    int code = 0, next_code[16];
    bl_count[0] = 0;
    for (int b = 1; b <= 15; b++) {
      code = (code + bl_count[b - 1]) << 1;
      next_code[b] = code;
    }
    for (int i = 0; i < (1 << FT_ROOT); i++) root[i] = FT_INV;

    // pass A: per-root-prefix subtable widths for codes longer than root
    u8 submax[1 << FT_ROOT];
    u32 suboff[1 << FT_ROOT];
    bool anyLong = maxbits > FT_ROOT;
    if (anyLong) {
      memset(submax, 0, sizeof(submax));
      int nc[16];
      memcpy(nc, next_code, sizeof(nc));
      for (int s = 0; s < n; s++) {
        int l = lens[s];
        if (!l) continue;
        u32 c = (u32)nc[l]++;
        if (l <= FT_ROOT) continue;
        u32 pref = revbits(c, l) & ((1u << FT_ROOT) - 1);
        if (l - FT_ROOT > submax[pref]) submax[pref] = (u8)(l - FT_ROOT);
      }
      u32 off = 0;
      for (int i = 0; i < (1 << FT_ROOT); i++) {
        if (!submax[i]) continue;
        suboff[i] = off;
        off += 1u << submax[i];
        if (off > 2048) return false;  // beyond any complete tree's need
        root[i] = (u32)FT_ROOT | (3u << 5) | ((u32)submax[i] << 8)
                  | (suboff[i] << 16);
      }
      for (u32 i = 0; i < off; i++) sub[i] = FT_INV;
    }

    // pass B: fill entries
    for (int s = 0; s < n; s++) {
      int l = lens[s];
      if (!l) continue;
      u32 c = (u32)next_code[l]++;
      u32 rc = revbits(c, l);
      u32 e;
      if (!isDist) {
        if (s < 256) e = (u32)l | ((u32)s << 16);
        else if (s == 256) e = (u32)l | (2u << 5);
        else if (s <= 285) {
          int cx = s - 257;
          e = (u32)l | (1u << 5) | ((u32)LEN_XBITS[cx] << 8)
              | ((u32)LEN_BASE[cx] << 16);
        } else {
          e = (u32)l | (4u << 5);  // 286/287 reserved
        }
      } else {
        if (s < 30)
          e = (u32)l | (1u << 5) | ((u32)DIST_XBITS[s] << 8)
              | ((u32)DIST_BASE[s] << 16);
        else
          e = (u32)l | (4u << 5);  // 30/31 reserved
      }
      if (l <= FT_ROOT) {
        for (u32 idx = rc; idx < (1u << FT_ROOT); idx += (1u << l))
          root[idx] = e;
      } else {
        u32 pref = rc & ((1u << FT_ROOT) - 1);
        u32 sb = submax[pref];
        for (u32 idx = rc >> FT_ROOT; idx < (1u << sb);
             idx += (1u << (l - FT_ROOT)))
          sub[suboff[pref] + idx] = e;
      }
    }
    return true;
  }

  // resolve one entry from the low bits of `a` (no state change)
  inline u32 look(u64 a) const {
    u32 e = root[a & ((1u << FT_ROOT) - 1)];
    if (((e >> 5) & 7) == 3)
      e = sub[(e >> 16) + ((a >> FT_ROOT) & ((1u << ((e >> 8) & 15)) - 1))];
    return e;
  }
};

static int decode_sym(BitReader& br, const HTable& t) {
  u32 idx = br.peek(t.maxbits);
  int l = t.len[idx];
  if (!l || br.nbits < l) { br.refill(); idx = br.peek(t.maxbits);
    l = t.len[idx]; if (!l) return -1; }
  if (br.nbits < l) return -1;
  br.drop(l);
  return t.sym[idx];
}

// ---------------------------------------------------------------------------
// inflate
// ---------------------------------------------------------------------------
static const u8 STATIC_LIT_LENS_INIT = 0;

static void static_tables(HTable& lit, HTable& dist) {
  u8 ll[288], dl[32];
  for (int i = 0; i < 144; i++) ll[i] = 8;
  for (int i = 144; i < 256; i++) ll[i] = 9;
  for (int i = 256; i < 280; i++) ll[i] = 7;
  for (int i = 280; i < 288; i++) ll[i] = 8;
  // the static distance tree has 32 five-bit codes; 30-31 are reserved
  // (decoded but rejected at use, RFC 1951 3.2.6)
  for (int i = 0; i < 32; i++) dl[i] = 5;
  lit.build(ll, 288);
  dist.build(dl, 32);
}

// inflate raw deflate; stops after the final block (mode 1) or when input
// is exhausted on a block boundary (mode 2 chunks have no final block).
// memoized static-tree decode tables (built once, 24 KiB)
struct FStatic {
  FTable lit, dist;
  FStatic() {
    u8 ll[288], dl[32];
    for (int i = 0; i < 144; i++) ll[i] = 8;
    for (int i = 144; i < 256; i++) ll[i] = 9;
    for (int i = 256; i < 280; i++) ll[i] = 7;
    for (int i = 280; i < 288; i++) ll[i] = 8;
    for (int i = 0; i < 32; i++) dl[i] = 5;
    lit.build(ll, 288, false, false);
    dist.build(dl, 32, true, false);
  }
};

static i64 inflate_raw(const u8* src, size_t srcSize, u8* dst, size_t dstCap,
                       size_t* consumed) {
  BitReader br(src, src + srcSize);
  size_t op = 0;
  FTable* lit = (FTable*)malloc(sizeof(FTable) * 2);
  if (!lit) return ERR_CORRUPT;
  FTable* dist = lit + 1;
  static const FStatic fstat;
  i64 result = ERR_CORRUPT;
  for (;;) {
    if (br.bytes_left() == 0 && br.nbits == 0) { result = (i64)op; break; }
    u32 bfinal = br.get(1);
    u32 btype = br.get(2);
    if (br.fail) { result = (i64)op; break; }  // clean boundary: done
    if (btype == 0) {  // stored
      br.align();
      if (br.nbits >= 32) {
        // pull LEN/NLEN from the accumulator
      }
      u32 len = br.get(16), nlen = br.get(16);
      if (br.fail || (len ^ nlen) != 0xFFFF) goto done;
      if (op + len > dstCap) { result = ERR_DST_SMALL; goto done; }
      // drain accumulator bytes, then bulk-copy straight from the input
      // (stored blocks = incompressible data; the per-byte get(8) path
      // was the whole cost there)
      while (len && br.nbits >= 8) {
        dst[op++] = (u8)br.get(8);
        len--;
      }
      if (len) {
        if ((size_t)(br.end - br.p) < len) goto done;
        memcpy(dst + op, br.p, len);
        // manual p advance invalidates the refill borrow: the branch-free
        // refill leaves up to 7 bits of *p above nbits in acc (consistent
        // only while p moves through refill). nbits is 0 here (the drain
        // stopped below 8 on a byte boundary) — drop the remnants.
        br.acc = 0;
        br.p += len;
        op += len;
      }
    } else if (btype == 1 || btype == 2) {
      const FTable* flit;
      const FTable* fdist;
      if (btype == 1) {
        flit = &fstat.lit;
        fdist = &fstat.dist;
      } else {
        int hlit = (int)br.get(5) + 257;
        int hdist = (int)br.get(5) + 1;
        int hclen = (int)br.get(4) + 4;
        if (br.fail || hlit > 288 || hdist > 30) goto done;
        u8 cl_lens[19] = {0};
        for (int i = 0; i < hclen; i++)
          cl_lens[CL_ORDER[i]] = (u8)br.get(3);
        if (br.fail) goto done;
        HTable cl;
        if (!cl.build(cl_lens, 19)) goto done;
        u8 lens[288 + 30] = {0};
        int total = hlit + hdist;
        for (int i = 0; i < total;) {
          int s = decode_sym(br, cl);
          if (s < 0) goto done;
          if (s < 16) lens[i++] = (u8)s;
          else if (s == 16) {
            if (i == 0) goto done;
            int r = 3 + (int)br.get(2);
            // a repeat overrunning hlit+hdist is "invalid bit length
            // repeat" in stock zlib (inflate.c) — reject, don't truncate
            if (r > total - i) goto done;
            u8 v = lens[i - 1];
            while (r--) lens[i++] = v;
          } else if (s == 17) {
            int r = 3 + (int)br.get(3);
            if (r > total - i) goto done;
            i += r;
          } else {
            int r = 11 + (int)br.get(7);
            if (r > total - i) goto done;
            i += r;
          }
          if (br.fail) goto done;
        }
        if (!lit->build(lens, hlit, false, false)) goto done;
        if (lens[hlit] == 0 && hdist == 1) {
          // no distance codes: any match is corrupt
          dist->make_invalid();
        } else if (!dist->build(lens + hlit, hdist, true, true)) {
          goto done;
        }
        flit = lit;
        fdist = dist;
      }
      // Symbol loop (the reference's inffast_chunk axis): one branch-free
      // 8-byte refill per iteration, then up to two literals + a match
      // resolved from the buffered bits without per-read checks. Budget:
      // lit(<=15) + lit(<=15) + len code(<=15) = 45 <= 48, length extra
      // (<=5) brings the worst chain to 50 <= 56; the distance half
      // refills once more. The <48-bit tail (last ~6 input bytes) steps
      // through the same tables with explicit checks.
      for (;;) {
        br.refill();
        u32 e, k;
        if (br.nbits >= 48) {
          e = flit->look(br.acc);
          br.acc >>= (e & 31);
          br.nbits -= (int)(e & 31);
          k = (e >> 5) & 7;
          if (k == 0) {
            if (op >= dstCap) { result = ERR_DST_SMALL; goto done; }
            dst[op++] = (u8)(e >> 16);
            e = flit->look(br.acc);
            br.acc >>= (e & 31);
            br.nbits -= (int)(e & 31);
            k = (e >> 5) & 7;
            if (k == 0) {
              if (op >= dstCap) { result = ERR_DST_SMALL; goto done; }
              dst[op++] = (u8)(e >> 16);
              continue;
            }
          }
          if (k != 1) {
            if (k == 2) break;
            goto done;  // invalid code
          }
          int xb = (int)((e >> 8) & 15);
          int len = (int)(e >> 16) + (int)(br.acc & ((1u << xb) - 1));
          br.acc >>= xb;
          br.nbits -= xb;
          br.refill();
          u32 de = fdist->look(br.acc);
          int dnb = (int)(de & 31);
          if (((de >> 5) & 7) != 1 || br.nbits < dnb) goto done;
          br.acc >>= dnb;
          br.nbits -= dnb;
          int d = (int)(de >> 16) + (int)br.get((int)((de >> 8) & 15));
          if (br.fail || (size_t)d > op) goto done;
          size_t nend = op + (size_t)len;
          if (nend > dstCap) { result = ERR_DST_SMALL; goto done; }
          u8* o = dst + op;
          const u8* q = o - d;
          // copy ladder under a +32 slack margin (16-byte chunks may
          // write past the logical end; later output overwrites)
          if (nend + 32 <= dstCap && d >= 32) {
            // one vmovdqu ymm per step at x86-64-v3; overrun <= 31 stays
            // inside the +32 slack gate
            i64 nn = len;
            do {
              memcpy(o, q, 32);
              o += 32;
              q += 32;
              nn -= 32;
            } while (nn > 0);
          } else if (nend + 32 <= dstCap && d >= 16) {
            i64 nn = len;
            do {
              memcpy(o, q, 16);
              o += 16;
              q += 16;
              nn -= 16;
            } while (nn > 0);
          } else if (d >= 8 && nend + 8 <= dstCap) {
            u8* e2 = o + len;
            do {
              memcpy(o, q, 8);
              o += 8;
              q += 8;
            } while (o < e2);
          } else if (d < 8 && len >= 8 && nend + 16 <= dstCap) {
            // periodic expansion: 8 pattern bytes bytewise, then 8-byte
            // steps from the first aligned repeat >= 8 back
            for (int i2 = 0; i2 < 8; i2++) o[i2] = q[i2];
            int gap = ((8 + d - 1) / d) * d;
            const u8* q2 = o + 8 - gap;
            u8* oo = o + 8;
            u8* e2 = o + len;
            do {
              memcpy(oo, q2, 8);
              oo += 8;
              q2 += 8;
            } while (oo < e2);
          } else {
            for (int i2 = 0; i2 < len; i2++) o[i2] = q[i2];
          }
          op = nend;
          continue;
        }
        // checked tail
        e = flit->look(br.acc);
        {
          int nb = (int)(e & 31);
          k = (e >> 5) & 7;
          if (k == 4 || br.nbits < nb) goto done;
          br.acc >>= nb;
          br.nbits -= nb;
        }
        if (k == 0) {
          if (op >= dstCap) { result = ERR_DST_SMALL; goto done; }
          dst[op++] = (u8)(e >> 16);
          continue;
        }
        if (k == 2) break;
        {
          int len = (int)(e >> 16) + (int)br.get((int)((e >> 8) & 15));
          br.refill();
          u32 de = fdist->look(br.acc);
          int dnb = (int)(de & 31);
          if (((de >> 5) & 7) != 1 || br.nbits < dnb) goto done;
          br.acc >>= dnb;
          br.nbits -= dnb;
          int d = (int)(de >> 16) + (int)br.get((int)((de >> 8) & 15));
          if (br.fail || (size_t)d > op) goto done;
          if (op + (size_t)len > dstCap) { result = ERR_DST_SMALL; goto done; }
          u8* o = dst + op;
          const u8* q = o - d;
          op += (size_t)len;
          if (d >= 8 && op + 8 <= dstCap) {
            u8* e2 = o + len;
            do {
              memcpy(o, q, 8);
              o += 8;
              q += 8;
            } while (o < e2);
          } else {
            for (int i2 = 0; i2 < len; i2++) o[i2] = q[i2];
          }
        }
      }
    } else {
      goto done;
    }
    if (bfinal) { result = (i64)op; break; }
  }
done:
  if (result >= 0 && consumed) {
    *consumed = srcSize - ((size_t)(br.end - br.p) + (size_t)(br.nbits / 8));
  }
  free(lit);
  return result;
}

// ---------------------------------------------------------------------------
// Huffman code construction (encoder side): length-limited to 15 bits via
// the zlib-style overflow adjustment, canonical code assignment.
// ---------------------------------------------------------------------------
struct HeapNode { u32 freq; int id; };

static void build_lengths(const u32* freq, int n, int maxlen, u8* lens) {
  // Huffman via two sorted queues over a combined node array.
  int nsym = 0;
  int order[320];
  for (int i = 0; i < n; i++) if (freq[i]) order[nsym++] = i;
  memset(lens, 0, (size_t)n);
  if (nsym == 0) return;
  if (nsym == 1) { lens[order[0]] = 1; return; }
  // sort leaves by freq ascending (insertion sort; n <= 288)
  for (int i = 1; i < nsym; i++) {
    int v = order[i];
    int j = i - 1;
    while (j >= 0 && freq[order[j]] > freq[v]) { order[j + 1] = order[j]; j--; }
    order[j + 1] = v;
  }
  // build tree: parent array
  u32 nf[640];
  int parent[640];
  for (int i = 0; i < nsym; i++) nf[i] = freq[order[i]];
  int leafq = 0, nodeq = nsym, nodes = nsym;
  int head = nsym;  // internal nodes appended from index nsym
  (void)head;
  while (nodes - (leafq + (nodeq - nsym)) >= 2) {
    // pick two smallest among remaining leaves and internal nodes
    int picks[2];
    for (int k = 0; k < 2; k++) {
      bool leafOk = leafq < nsym;
      bool nodeOk = nodeq < nodes;
      if (leafOk && (!nodeOk || nf[leafq] <= nf[nodeq])) picks[k] = leafq++;
      else picks[k] = nodeq++;
    }
    nf[nodes] = nf[picks[0]] + nf[picks[1]];
    parent[picks[0]] = nodes;
    parent[picks[1]] = nodes;
    nodes++;
  }
  // depth of each leaf
  int root = nodes - 1;
  int depth[640];
  depth[root] = 0;
  for (int i = root - 1; i >= 0; i--) depth[i] = depth[parent[i]] + 1;
  // histogram with clamping + zlib-style overflow repair. CRITICAL:
  // zlib's gen_bitlen counts EVERY clamped node — internal nodes too
  // (trees.c: the heap walk hits both) — because a depth-(maxlen+k)
  // leaf sits under k clamped internal nodes and the repair loop frees
  // exactly one Kraft unit per 2 counted overflows. Counting only
  // leaves under-repairs deeply skewed trees and emits an
  // OVER-SUBSCRIBED code that inflate rejects ("invalid
  // literal/lengths set" — found on a 3 MB single-shot L6 stream).
  int bl_count[64] = {0};
  int overflow = 0;
  for (int i = 0; i < nsym; i++) {
    int d2 = depth[i];
    if (d2 > maxlen) { overflow += 1; d2 = maxlen; }
    bl_count[d2]++;
  }
  for (int i = nsym; i < nodes - 1; i++)  // internal nodes (root exempt)
    if (depth[i] > maxlen) overflow += 1;
  while (overflow > 0) {
    int bits = maxlen - 1;
    while (bits > 0 && bl_count[bits] == 0) bits--;
    if (bits == 0) break;
    bl_count[bits]--;
    bl_count[bits + 1] += 2;
    bl_count[maxlen]--;
    overflow -= 2;
  }
  // belt + braces: the emitted code must be EXACTLY complete (inflate
  // rejects over- and under-subscribed literal/length tables). If the
  // repair left the histogram off, rebuild a flat complete code: all
  // leaves at ceil(log2 nsym), then promote one-by-one to fill.
  {
    long long limit = 1LL << maxlen, k = 0;
    for (int b = 1; b <= maxlen; b++)
      k += (long long)bl_count[b] << (maxlen - b);
    if (k != limit) {
      int L = 1;
      while ((1 << L) < nsym) L++;
      memset(bl_count, 0, sizeof(bl_count));
      bl_count[L] = nsym;
      k = (long long)nsym << (maxlen - L);
      int d = L;
      while (k < limit && d >= 2) {
        if (bl_count[d] && k + (1LL << (maxlen - d)) <= limit) {
          bl_count[d]--;
          bl_count[d - 1]++;
          k += 1LL << (maxlen - d);
        } else {
          d--;
        }
      }
    }
  }
  // assign lengths: longest first to the rarest symbols (order[] ascending
  // frequency => walk from the front)
  int oi = 0;
  for (int bits = maxlen; bits >= 1; bits--) {
    for (int k = 0; k < bl_count[bits]; k++) lens[order[oi++]] = (u8)bits;
  }
}

static void assign_codes(const u8* lens, int n, u16* codes) {
  int bl_count[16] = {0};
  for (int i = 0; i < n; i++) bl_count[lens[i]]++;
  bl_count[0] = 0;
  int code = 0, next_code[16];
  for (int b = 1; b <= 15; b++) {
    code = (code + bl_count[b - 1]) << 1;
    next_code[b] = code;
  }
  for (int s = 0; s < n; s++) {
    if (!lens[s]) { codes[s] = 0; continue; }
    u32 c = (u32)next_code[lens[s]]++;
    u32 rc = 0;  // emit LSB-first => pre-reverse
    for (int b = 0; b < lens[s]; b++) rc |= ((c >> b) & 1) << (lens[s] - 1 - b);
    codes[s] = (u16)rc;
  }
}

// ---------------------------------------------------------------------------
// deflate encoder
// ---------------------------------------------------------------------------
struct LevelParams { int good, lazy, nice, chain; };
static const int TOO_FAR = 4096;  // zlib deflate.c: max distance for len-3
// semantics mirror the reference ladder (algos/zlib/deflate.c
// configuration_table): good = shorten search above this, lazy = defer
// threshold, nice = stop at this length, chain = max chain walk
static const LevelParams LP[10] = {
  {0, 0, 0, 0},
  {4, 0, 8, 4},      // 1: greedy quick (deflate_quick class)
  {4, 0, 16, 8},     // 2
  {4, 0, 32, 32},    // 3 (deflate_medium class)
  {4, 4, 16, 16},    // 4: lazy from here
  {8, 16, 32, 32},   // 5
  {8, 32, 258, 128}, // 6
  {16, 64, 258, 256}, // 7
  {32, 128, 258, 512},    // 8
  {32, 258, 258, 1024},   // 9
};

struct Token { u16 lit_or_len; u16 dist; };  // dist==0 -> literal

struct SymStats {
  u32 lfreq[286] = {0};
  u32 dfreq[30] = {0};
};

// emit one block of tokens with the best of {dynamic, static, stored}
static bool emit_block(BitWriter& bw, const Token* toks, size_t ntok,
                       const u8* raw, size_t rawLen, bool final_block) {
  SymStats st;
  for (size_t i = 0; i < ntok; i++) {
    if (toks[i].dist) {
      st.lfreq[257 + len_code_of(toks[i].lit_or_len)]++;
      st.dfreq[dist_code_of(toks[i].dist)]++;
    } else {
      st.lfreq[toks[i].lit_or_len]++;
    }
  }
  st.lfreq[256]++;

  u8 llen[286], dlen[30];
  build_lengths(st.lfreq, 286, 15, llen);
  build_lengths(st.dfreq, 30, 15, dlen);
  // deflate requires at least one distance code slot in the header
  u16 lcode[286], dcode[30];
  assign_codes(llen, 286, lcode);
  assign_codes(dlen, 30, dcode);

  // --- size estimates ---
  u64 dynBits = 0, statBits = 0;
  for (int s = 0; s < 286; s++) {
    int xb = (s >= 257 && s < 286) ? LEN_XBITS[s - 257] : 0;
    int sl = (s < 144) ? 8 : (s < 256) ? 9 : (s < 280) ? 7 : 8;
    dynBits += (u64)st.lfreq[s] * (llen[s] + xb);
    statBits += (u64)st.lfreq[s] * (sl + xb);
  }
  for (int s = 0; s < 30; s++) {
    dynBits += (u64)st.dfreq[s] * (dlen[s] + DIST_XBITS[s]);
    statBits += (u64)st.dfreq[s] * (5 + DIST_XBITS[s]);
  }

  // --- code length code (dynamic header) ---
  u8 all[286 + 30];
  int hlit = 286, hdist = 30;
  while (hlit > 257 && llen[hlit - 1] == 0) hlit--;
  while (hdist > 1 && dlen[hdist - 1] == 0) hdist--;
  memcpy(all, llen, (size_t)hlit);
  memcpy(all + hlit, dlen, (size_t)hdist);
  int total = hlit + hdist;
  // RLE the length sequence into CL symbols
  u16 cl_syms[286 + 30];
  u8 cl_extra[286 + 30];
  int ncl = 0;
  u32 clfreq[19] = {0};
  for (int i = 0; i < total;) {
    int v = all[i];
    int run = 1;
    while (i + run < total && all[i + run] == v) run++;
    if (v == 0) {
      int r = run;
      while (r >= 11) { int t = r > 138 ? 138 : r;
        cl_syms[ncl] = 18; cl_extra[ncl++] = (u8)(t - 11); clfreq[18]++;
        r -= t; }
      while (r >= 3) { int t = r > 10 ? 10 : r;
        cl_syms[ncl] = 17; cl_extra[ncl++] = (u8)(t - 3); clfreq[17]++;
        r -= t; }
      while (r--) { cl_syms[ncl] = 0; cl_extra[ncl++] = 0; clfreq[0]++; }
    } else {
      cl_syms[ncl] = (u16)v; cl_extra[ncl++] = 0; clfreq[v]++;
      int r = run - 1;
      while (r >= 3) { int t = r > 6 ? 6 : r;
        cl_syms[ncl] = 16; cl_extra[ncl++] = (u8)(t - 3); clfreq[16]++;
        r -= t; }
      while (r--) { cl_syms[ncl] = (u16)v; cl_extra[ncl++] = 0; clfreq[v]++; }
    }
    i += run;
  }
  u8 cllen[19];
  build_lengths(clfreq, 19, 7, cllen);
  u16 clcode[19];
  assign_codes(cllen, 19, clcode);
  int hclen = 19;
  while (hclen > 4 && cllen[CL_ORDER[hclen - 1]] == 0) hclen--;
  u64 hdrBits = 14 + (u64)hclen * 3;
  for (int i = 0; i < ncl; i++) {
    hdrBits += cllen[cl_syms[i]];
    if (cl_syms[i] == 16) hdrBits += 2;
    else if (cl_syms[i] == 17) hdrBits += 3;
    else if (cl_syms[i] == 18) hdrBits += 7;
  }
  dynBits += hdrBits;

  u64 storedBits = 8 * (u64)(rawLen + 5 * (rawLen / 65535 + 1)) + 8;

  if (storedBits < dynBits && storedBits < statBits) {
    // stored block(s)
    size_t off = 0;
    while (true) {
      size_t chunk = rawLen - off > 65535 ? 65535 : rawLen - off;
      bool last = final_block && (off + chunk == rawLen);
      bw.put(last ? 1 : 0, 1);
      bw.put(0, 2);
      bw.align();
      bw.put((u32)chunk, 16);
      bw.put((u32)chunk ^ 0xFFFF, 16);
      bw.bytes(raw + off, chunk);
      off += chunk;
      if (off == rawLen) break;
    }
    return !bw.overflow;
  }

  bool use_dyn = dynBits < statBits;
  bw.put(final_block ? 1 : 0, 1);
  bw.put(use_dyn ? 2 : 1, 2);

  u8 ell[288];
  u16 ecc[288];
  u8 edl[32];
  u16 edc[32];
  if (use_dyn) {
    bw.put((u32)(hlit - 257), 5);
    bw.put((u32)(hdist - 1), 5);
    bw.put((u32)(hclen - 4), 4);
    for (int i = 0; i < hclen; i++) bw.put(cllen[CL_ORDER[i]], 3);
    for (int i = 0; i < ncl; i++) {
      bw.put(clcode[cl_syms[i]], cllen[cl_syms[i]]);
      if (cl_syms[i] == 16) bw.put(cl_extra[i], 2);
      else if (cl_syms[i] == 17) bw.put(cl_extra[i], 3);
      else if (cl_syms[i] == 18) bw.put(cl_extra[i], 7);
    }
    memcpy(ell, llen, 286);
    memcpy(ecc, lcode, 286 * sizeof(u16));
    memcpy(edl, dlen, 30);
    memcpy(edc, dcode, 30 * sizeof(u16));
  } else {
    // the static trees are defined over 288 literal/length and 32 distance
    // symbols (RFC 1951 3.2.6) -- canonical assignment must use the full
    // alphabets or every 9-bit code shifts
    u8 sl[288], sd[32];
    for (int i = 0; i < 288; i++)
      sl[i] = (i < 144) ? 8 : (i < 256) ? 9 : (i < 280) ? 7 : 8;
    for (int i = 0; i < 32; i++) sd[i] = 5;
    assign_codes(sl, 288, ecc);
    assign_codes(sd, 32, edc);
    memcpy(ell, sl, 288);
    memcpy(edl, sd, 32);
  }
  for (size_t i = 0; i < ntok; i++) {
    if (toks[i].dist) {
      // fuse code + extra bits into one put each (len <= 15+5, dist
      // <= 15+13 bits) — halves the hot-loop put count
      int lc = len_code_of(toks[i].lit_or_len);
      int ln = ell[257 + lc];
      bw.put(ecc[257 + lc]
                 | ((u32)(toks[i].lit_or_len - LEN_BASE[lc]) << ln),
             ln + LEN_XBITS[lc]);
      int dc = dist_code_of(toks[i].dist);
      int dn = edl[dc];
      bw.put(edc[dc] | ((u32)(toks[i].dist - DIST_BASE[dc]) << dn),
             dn + DIST_XBITS[dc]);
    } else {
      bw.put(ecc[toks[i].lit_or_len], ell[toks[i].lit_or_len]);
    }
  }
  bw.put(ecc[256], ell[256]);  // end of block
  return !bw.overflow;
}

static const int HASH_BITS = 15, HASH_SIZE = 1 << HASH_BITS;
static inline u32 hash3(const u8* p) {
  u32 v = (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16);
  return (v * 2654435761u) >> (32 - HASH_BITS);
}

static int match_len(const u8* a, const u8* b, const u8* limit) {
  const u8* s = a;
  while (a + 8 <= limit) {
    u64 x, y;
    memcpy(&x, a, 8);
    memcpy(&y, b, 8);
    u64 diff = x ^ y;
    if (diff) return (int)(a - s) + (__builtin_ctzll(diff) >> 3);
    a += 8;
    b += 8;
  }
  while (a < limit && *a == *b) { a++; b++; }
  return (int)(a - s);
}

struct Matcher {
  int32_t head[HASH_SIZE];
  int32_t prev[WSIZE];
  // 3-byte last-occurrence table, maintained only in h4 mode: the len-3
  // matches a 4-byte hash can no longer see are only ever useful within
  // TOO_FAR (zlib's own demotion rule), and the most recent occurrence
  // is the only one with a small enough distance to price in — one
  // lookup replaces the whole hash3 chain walk.
  static const int H3_BITS = 15;
  int32_t h3last[1 << H3_BITS];
  bool h4;

  static u32 hash3s(const u8* p) {
    u32 v = (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16);
    return (v * 2654435761u) >> (32 - H3_BITS);
  }
  // chain hash: 3 bytes at the fast levels (zlib semantics), 4 bytes at
  // the lazy levels — trigram chains on text are thousands deep and
  // nearly all candidates fail the scan-end probe after a cache miss;
  // hashing one more byte is where the reference's fast_zlib-based
  // longest_match gets its chain sparsity (longest_match_x86.c).
  u32 hcode(const u8* p) const {
    if (h4) {
      u32 v;
      memcpy(&v, p, 4);
      return (v * 2654435761u) >> (32 - HASH_BITS);
    }
    return hash3(p);
  }

  void init(bool use4) {
    h4 = use4;
    memset(head, -1, sizeof(head));
    if (use4) memset(h3last, -1, sizeof(h3last));
  }
  void insert(const u8* base, size_t pos) {
    u32 h = hcode(base + pos);
    prev[pos & (WSIZE - 1)] = head[h];
    head[h] = (int32_t)pos;
    if (h4) h3last[hash3s(base + pos)] = (int32_t)pos;
  }
  // best (len, dist) at pos
  int find(const u8* base, size_t pos, size_t end, const LevelParams& lp,
           int* distOut, int prev_best = 0) const {
    u32 h = hcode(base + pos);
    int32_t cand = head[h];
    int best = MIN_MATCH - 1, bestd = 0;
    // stock zlib's good_match rule (deflate.c longest_match caller):
    // already holding a good match quarters the chain budget
    int chain = prev_best >= lp.good ? (lp.chain >> 2) : lp.chain;
    const u8* scan = base + pos;
    const u8* limit = base + (end - pos > MAX_MATCH ? pos + MAX_MATCH : end);
    const int maxl = (int)(limit - scan);
    // Chain-continuation walk (h4 mode): once a match of length `best`
    // is held, only a window position containing scan[best-3..best] at
    // relative offset best-3 can beat it — so jump to THAT 4-byte
    // chain instead of grinding the head chain, whose candidates share
    // only the first 4 bytes. The idea is fast_zlib's variable-prefix
    // chain continuation (the reference wires it in as
    // longest_match_x86.c); scheme re-derived here on our 4-byte
    // chains with full re-verification of every jump candidate.
    size_t offset = 0;
    while (cand >= 0 && chain-- > 0) {
      size_t c = (size_t)cand;
      size_t mstart;
      if (offset) {
        if (c < offset || c - offset >= pos) {
          cand = prev[c & (WSIZE - 1)];
          if ((size_t)cand >= c) break;
          continue;
        }
        mstart = c - offset;
      } else {
        mstart = c;
      }
      if (pos - mstart > WSIZE - 1) break;  // chains age monotonically
      const u8* mp = base + mstart;
      if (offset == 0) {
        // zlib longest_match scan-end reject: a candidate can only beat
        // `best` if it also matches at scan[best-1..best] — two loads
        // kill most candidates before the full compare
        if (best >= MIN_MATCH && scan + best < limit) {
          u16 se, me;
          memcpy(&se, scan + best - 1, 2);
          memcpy(&me, mp + best - 1, 2);
          if (se != me) {
            cand = prev[c & (WSIZE - 1)];
            if ((size_t)cand >= c) break;
            continue;
          }
        }
      } else {
        // tail bytes agree by chain membership; reject on the head
        u32 s0, m0;
        memcpy(&s0, scan, 4);
        memcpy(&m0, mp, 4);
        if (s0 != m0) {
          cand = prev[c & (WSIZE - 1)];
          if ((size_t)cand >= c) break;
          continue;
        }
      }
      int l = match_len(scan, mp, limit);
      if (l > best) {
        best = l;
        bestd = (int)(pos - mstart);
        if (l >= lp.nice || l >= maxl) break;
        if (h4 && best >= 4) {
          offset = (size_t)best - 3;
          cand = head[hcode(scan + offset)];
          continue;
        }
      }
      cand = prev[c & (WSIZE - 1)];
      if ((size_t)cand >= c) break;  // corrupt chain guard
    }
    if (h4 && best < MIN_MATCH) {
      // len-3 fallback: the nearest trigram occurrence, priced by the
      // same TOO_FAR rule the caller applies
      int32_t c3 = h3last[hash3s(scan)];
      if (c3 >= 0 && pos - (size_t)c3 <= (size_t)TOO_FAR) {
        const u8* mp = base + c3;
        if (mp[0] == scan[0] && mp[1] == scan[1] && mp[2] == scan[2]) {
          int l = match_len(scan, mp, limit);
          if (l > best) {
            best = l;
            bestd = (int)(pos - (size_t)c3);
          }
        }
      }
    }
    *distOut = bestd;
    return best;
  }
};

// raw-deflate compress of one buffer; tokens blocked every ~64K symbols
static i64 deflate_raw(const u8* src, size_t n, u8* dst, size_t dstCap,
                       int level, int mode) {
  LevelParams lp = LP[level < 1 ? 1 : (level > 9 ? 9 : level)];
  BitWriter bw(dst, dstCap);
  Matcher* m = (Matcher*)malloc(sizeof(Matcher));
  if (!m) return ERR_CORRUPT;
  // 4-byte chains from the first lazy level up; mg guards the wider read
  const bool use4 = level >= 4;
  const size_t mg = use4 ? 4 : (size_t)MIN_MATCH;
  m->init(use4);
  // ~16K symbols per block: matches the reference's lit_bufsize adaptivity
  // (algos/zlib/deflate.c memLevel 8) — regime changes inside a buffer get
  // their own Huffman tables / stored-block choice
  const size_t TOKCAP = 1 << 14;
  Token* toks = (Token*)malloc(sizeof(Token) * TOKCAP);
  if (!toks) { free(m); return ERR_CORRUPT; }
  size_t ntok = 0;
  size_t blockStart = 0;
  size_t pos = 0;
  bool ok = true;

  auto flush = [&](bool final_blk) {
    ok = ok && emit_block(bw, toks, ntok, src + blockStart, pos - blockStart,
                          final_blk);
    ntok = 0;
    blockStart = pos;
  };

  // Binary-tree matcher for the top levels (shared bt4, csrc/btmf.h —
  // the same component serving lzma L6+ and zstd L16+): hash-chain walks
  // at chain=1024/4096 spend a cache miss per candidate and nearly all
  // candidates die on the scan-end probe; the bt visits candidates in
  // suffix order, so every visit either extends the match or halves the
  // remaining space. Reference analog: the fast_zlib-based
  // longest_match (algos/zlib/longest_match_x86.c) — different scheme,
  // same goal of skipping prefix-only candidates.
  if (level >= 8 && n >= 4 && getenv("ATPU_DEFLATE_BT")) {
    btmf::BtMF btm;
    if (btm.alloc(WSIZE, n, 16)) {
      btm.minLen = MIN_MATCH;
      const int depth = level == 9 ? 96 : 40;
      btmf::BtPair prs[64];
      size_t insertedUpTo = 0;
      auto btq = [&](size_t p, int* dout) -> int {
        int cnt = btm.insert_get(src, p, n, depth, MAX_MATCH, prs, 64);
        insertedUpTo = p + 1;
        if (!cnt) { *dout = 0; return 0; }
        int bl = prs[cnt - 1].len;
        int bd = (int)prs[cnt - 1].dist;
        if (bl == MIN_MATCH && bd > TOO_FAR) { *dout = 0; return 0; }
        *dout = bd;
        return bl;
      };
      int pendL = 0, pendD = 0;
      bool havePend = false;
      while (pos < n) {
        if (ntok >= TOKCAP - 2) flush(false);
        if (pos + 4 > n) {
          toks[ntok++] = {(u16)src[pos], 0};
          pos++;
          continue;
        }
        int d1, l1;
        if (havePend) {
          l1 = pendL;
          d1 = pendD;
          havePend = false;
        } else {
          l1 = btq(pos, &d1);
        }
        if (l1 >= MIN_MATCH && l1 < lp.lazy && pos + 1 + 4 <= n) {
          int d2;
          int l2 = btq(pos + 1, &d2);
          if (l2 > l1) {
            toks[ntok++] = {(u16)src[pos], 0};
            pos++;
            pendL = l2;
            pendD = d2;
            havePend = true;
            continue;
          }
        }
        if (l1 >= MIN_MATCH) {
          toks[ntok++] = {(u16)l1, (u16)d1};
          size_t insEnd = pos + (size_t)l1;
          for (size_t q = insertedUpTo; q < insEnd && q + 4 <= n; q++)
            btm.insert(src, q, n, depth, MAX_MATCH);
          if (insEnd > insertedUpTo) insertedUpTo = insEnd;
          pos = insEnd;
        } else {
          toks[ntok++] = {(u16)src[pos], 0};
          pos++;
        }
      }
      flush(mode == 1);
      btm.release();
      if (mode == 2) {
        bw.put(0, 1);
        bw.put(0, 2);
        bw.align();
        bw.put(0, 16);
        bw.put(0xFFFF, 16);
      } else {
        bw.align();
      }
      free(toks);
      free(m);
      if (!ok || bw.overflow) return ERR_DST_SMALL;
      return (i64)bw.len;
    }
  }

  size_t missRun = 0;
  int pendL = 0, pendD = 0;
  bool havePend = false;
  while (pos < n) {
    if (ntok >= TOKCAP - 2) flush(false);
    if (pos + mg > n) {
      toks[ntok++] = {(u16)src[pos], 0};
      pos++;
      continue;
    }
    // miss-skip acceleration (fast levels): during long literal runs,
    // probe only every 2nd (or 4th) position — the reference's
    // deflate_quick/dfast dynamic-step idea
    if (!lp.lazy && missRun > 64) {
      size_t stride = missRun > 512 ? 4 : 2;
      if (pos % stride) {
        toks[ntok++] = {(u16)src[pos], 0};
        pos++;
        missRun++;
        continue;
      }
    }
    int d1, l1;
    if (havePend) {
      // the deferred lazy peek IS this position's search (the matcher
      // held identical state at both call sites — exact reuse)
      l1 = pendL;
      d1 = pendD;
      havePend = false;
      m->insert(src, pos);
    } else {
      l1 = m->find(src, pos, n, lp, &d1);
      m->insert(src, pos);
      // zlib's TOO_FAR rule (deflate.c): a minimum-length match far away
      // costs more bits than the literals it replaces — demote it
      if (l1 == MIN_MATCH && d1 > TOO_FAR) l1 = MIN_MATCH - 1;
    }
    if (l1 >= MIN_MATCH && lp.lazy && pos + 1 + mg <= n &&
        l1 < lp.lazy) {
      // lazy: peek the next position; emit a literal if it matches longer
      int d2;
      int l2 = m->find(src, pos + 1, n, lp, &d2, l1);
      if (l2 == MIN_MATCH && d2 > TOO_FAR) l2 = MIN_MATCH - 1;
      if (l2 > l1) {
        toks[ntok++] = {(u16)src[pos], 0};
        pos++;
        pendL = l2;
        pendD = d2;
        havePend = true;
        continue;
      }
    }
    if (l1 >= MIN_MATCH) {
      missRun = 0;
      toks[ntok++] = {(u16)l1, (u16)d1};
      // insert hash entries over the whole match span — skipping entries
      // removes NEAR candidates from the chains and measurably pushes
      // later matches to farther (more distance bits) copies
      size_t insEnd = pos + (size_t)l1;
      // insert EVERY span position (deflate_slow inserts start+1..end-1
      // across its visit + tally loop): any hole means the next occurrence
      // of that substring is only findable one byte late — each missing
      // rung measured ~0.5% ratio on C source
      for (size_t q = pos + 1; q < insEnd && q + mg <= n; q++)
        m->insert(src, q);
      pos = insEnd;
    } else {
      toks[ntok++] = {(u16)src[pos], 0};
      pos++;
      missRun++;
    }
  }
  flush(mode == 1);  // mode 1: final block; mode 2: sync chunk, no final
  if (mode == 2) {
    // Z_SYNC_FLUSH: empty stored block, byte-aligned
    bw.put(0, 1);
    bw.put(0, 2);
    bw.align();
    bw.put(0, 16);
    bw.put(0xFFFF, 16);
  } else {
    bw.align();
  }
  free(toks);
  free(m);
  if (!ok || bw.overflow) return ERR_DST_SMALL;
  return (i64)bw.len;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

// mode: 0 zlib stream, 1 raw final, 2 raw sync-flushed chunk
ATPU_EXPORT i64 atpu_deflate(const u8* src, size_t n, u8* dst, size_t dstCap,
                             int level, int mode) {
  if (mode == 0) {
    if (dstCap < 6) return ERR_DST_SMALL;
    dst[0] = 0x78;
    dst[1] = (level >= 7) ? 0xDA : (level >= 5) ? 0x9C
             : (level >= 2) ? 0x5E : 0x01;
    i64 body = deflate_raw(src, n, dst + 2, dstCap - 6, level, 1);
    if (body < 0) return body;
    u32 ad = adler32(src, n, 1);
    u8* t = dst + 2 + body;
    t[0] = (u8)(ad >> 24); t[1] = (u8)(ad >> 16);
    t[2] = (u8)(ad >> 8); t[3] = (u8)ad;
    return body + 6;
  }
  return deflate_raw(src, n, dst, dstCap, level, mode);
}

// mode: 0 zlib stream (verify adler32), 1 raw
ATPU_EXPORT i64 atpu_inflate(const u8* src, size_t n, u8* dst, size_t dstCap,
                             int mode) {
  if (mode == 0) {
    if (n < 6) return ERR_CORRUPT;
    if ((src[0] & 0x0F) != 8) return ERR_CORRUPT;      // CM must be deflate
    if (((src[0] << 8) | src[1]) % 31 != 0) return ERR_CORRUPT;
    if (src[1] & 0x20) return ERR_CORRUPT;             // FDICT unsupported
    size_t consumed = 0;
    i64 out = inflate_raw(src + 2, n - 2, dst, dstCap, &consumed);
    if (out < 0) return out;
    if (2 + consumed + 4 > n) return ERR_CORRUPT;
    const u8* t = src + 2 + consumed;
    u32 want = ((u32)t[0] << 24) | ((u32)t[1] << 16) | ((u32)t[2] << 8)
               | (u32)t[3];
    if (adler32(dst, (size_t)out, 1) != want) return ERR_CHECKSUM;
    return out;
  }
  size_t consumed = 0;
  return inflate_raw(src, n, dst, dstCap, &consumed);
}

// raw inflate with consumed-byte reporting (gzip/multi-member framing)
ATPU_EXPORT i64 atpu_inflate_consumed(const u8* src, size_t n, u8* dst,
                                      size_t dstCap, size_t* consumed) {
  *consumed = 0;
  return inflate_raw(src, n, dst, dstCap, consumed);
}

// ---------------------------------------------------------------------------
// Device-inflate planner (ops/inflate_device.py): crack the FIRST block
// header of a raw-deflate region so the TPU scan can decode the symbol
// section. Only the first block's tables matter — the device scan stops at
// that block's EOB and the caller compares produced bytes against the
// chunk's expected dlen; multi-block chunks come up short and fall back to
// the host tier. Reference analog: the header/table-build states of
// algos/zlib/inflate.c (the symbol loop itself runs on device).
// ---------------------------------------------------------------------------

// Kraft validity without building a decode table (the device decodes
// straight from the canonical (first_code, count) arithmetic).
static bool lens_valid(const u8* lens, int n, bool allow_incomplete) {
  int bl[16] = {0}, mx = 0;
  for (int i = 0; i < n; i++) {
    if (lens[i] > 15) return false;
    bl[lens[i]]++;
    if (lens[i] > mx) mx = lens[i];
  }
  if (mx == 0) return false;
  bl[0] = 0;
  int left = 1;
  for (int b = 1; b <= 15; b++) {
    left <<= 1;
    left -= bl[b];
    if (left < 0) return false;
  }
  if (left > 0 && !allow_incomplete && !(mx == 1 && bl[1] == 1))
    return false;
  return true;
}

// Returns 2 static / 1 dynamic (ll_lens[288] + d_lens[32] filled and
// *bitoff = absolute bit offset of the symbol section), 0 stored-first
// (caller uses the host tier), <0 corrupt.
ATPU_EXPORT i64 atpu_inflate_plan(const u8* src, size_t n, u8* ll_lens,
                                  u8* d_lens, i64* bitoff) {
  BitReader br(src, src + n);
  (void)br.get(1);  // BFINAL is irrelevant: dlen mismatch gates multi-block
  u32 btype = br.get(2);
  if (br.fail || btype == 3) return ERR_CORRUPT;
  memset(ll_lens, 0, 288);
  memset(d_lens, 0, 32);
  if (btype == 0) return 0;
  if (btype == 1) {
    for (int i = 0; i < 144; i++) ll_lens[i] = 8;
    for (int i = 144; i < 256; i++) ll_lens[i] = 9;
    for (int i = 256; i < 280; i++) ll_lens[i] = 7;
    for (int i = 280; i < 288; i++) ll_lens[i] = 8;
    for (int i = 0; i < 32; i++) d_lens[i] = 5;
    *bitoff = (i64)(br.p - src) * 8 - br.nbits;
    return 2;
  }
  int hlit = (int)br.get(5) + 257;
  int hdist = (int)br.get(5) + 1;
  int hclen = (int)br.get(4) + 4;
  if (br.fail || hlit > 288 || hdist > 30) return ERR_CORRUPT;
  u8 cl_lens[19] = {0};
  for (int i = 0; i < hclen; i++) cl_lens[CL_ORDER[i]] = (u8)br.get(3);
  if (br.fail) return ERR_CORRUPT;
  HTable* cl = (HTable*)malloc(sizeof(HTable));
  if (!cl) return ERR_CORRUPT;
  if (!cl->build(cl_lens, 19)) { free(cl); return ERR_CORRUPT; }
  u8 lens[288 + 30] = {0};
  int total = hlit + hdist;
  for (int i = 0; i < total;) {
    int s = decode_sym(br, *cl);
    if (s < 0) { free(cl); return ERR_CORRUPT; }
    if (s < 16) {
      lens[i++] = (u8)s;
    } else if (s == 16) {
      if (i == 0) { free(cl); return ERR_CORRUPT; }
      int r = 3 + (int)br.get(2);
      if (r > total - i) { free(cl); return ERR_CORRUPT; }
      u8 v = lens[i - 1];
      while (r--) lens[i++] = v;
    } else if (s == 17) {
      int r = 3 + (int)br.get(3);
      if (r > total - i) { free(cl); return ERR_CORRUPT; }
      i += r;
    } else {
      int r = 11 + (int)br.get(7);
      if (r > total - i) { free(cl); return ERR_CORRUPT; }
      i += r;
    }
    if (br.fail) { free(cl); return ERR_CORRUPT; }
  }
  free(cl);
  if (!lens_valid(lens, hlit, false)) return ERR_CORRUPT;
  bool no_dist = (hdist == 1 && lens[hlit] == 0);
  if (!no_dist && !lens_valid(lens + hlit, hdist, true)) return ERR_CORRUPT;
  memcpy(ll_lens, lens, (size_t)hlit);
  if (!no_dist) memcpy(d_lens, lens + hlit, (size_t)hdist);
  *bitoff = (i64)(br.p - src) * 8 - br.nbits;
  return 1;
}

// ---------------------------------------------------------------------------
// Resumable streaming inflate — the z_stream analog (reference capability:
// algos/zlib/inflate.c's incremental state machine). Input arrives in
// arbitrary-size feeds; decode resumes at symbol/header boundaries via
// snapshot-and-rollback on input starvation; back-references resolve
// through a 32 KiB ring, so memory stays O(window) however long the
// stream is. Used by streaming.DecompressStream for zlib.
// ---------------------------------------------------------------------------
namespace {

enum { IST_ZHDR, IST_BLOCK, IST_STORED, IST_HUFF, IST_CHECK, IST_DONE };

struct InflateStream {
  u8* in;            // pending (unconsumed) input
  size_t in_len, in_cap;
  u64 bitpos;        // bits of `in` already consumed (kept < 8 after trim)
  int state;
  int raw;           // 1 = raw deflate, 0 = zlib wrapper (adler verified)
  bool final_block;
  HTable lit, dist;
  u32 stored_left;
  u8 win[1 << 15];
  u64 total_out;
  u32 adler;
};

struct BrSnap { const u8* p; u64 acc; int nbits; };
static inline BrSnap snap(const BitReader& br) {
  return {br.p, br.acc, br.nbits};
}
static inline void restore(BitReader& br, const BrSnap& s) {
  br.p = s.p; br.acc = s.acc; br.nbits = s.nbits; br.fail = false;
}

// parse one block header (incl. a full dynamic table section).
// returns 1 ok, 0 starved/invalid (caller rolls back), -1 hard corrupt
static int ist_block_header(InflateStream* z, BitReader& br) {
  u32 bfinal = br.get(1);
  u32 btype = br.get(2);
  if (br.fail) return 0;
  z->final_block = bfinal != 0;
  if (btype == 0) {
    br.align();
    u32 len = br.get(16), nlen = br.get(16);
    if (br.fail) return 0;
    if ((len ^ nlen) != 0xFFFF) return -1;
    z->stored_left = len;
    z->state = IST_STORED;
    return 1;
  }
  if (btype == 1) {
    static_tables(z->lit, z->dist);
    z->state = IST_HUFF;
    return 1;
  }
  if (btype != 2) return -1;
  int hlit = (int)br.get(5) + 257;
  int hdist = (int)br.get(5) + 1;
  int hclen = (int)br.get(4) + 4;
  if (br.fail) return 0;
  if (hlit > 288 || hdist > 30) return -1;
  u8 cl_lens[19] = {0};
  for (int i = 0; i < hclen; i++) cl_lens[CL_ORDER[i]] = (u8)br.get(3);
  if (br.fail) return 0;
  HTable* cl = (HTable*)malloc(sizeof(HTable));
  if (!cl) return -1;
  if (!cl->build(cl_lens, 19)) { free(cl); return -1; }
  u8 lens[288 + 30] = {0};
  int total = hlit + hdist;
  for (int i = 0; i < total;) {
    int s = decode_sym(br, *cl);
    if (s < 0) { free(cl); return br.bytes_left() ? -1 : 0; }
    if (s < 16) lens[i++] = (u8)s;
    else if (s == 16) {
      if (i == 0) { free(cl); return -1; }
      int r = 3 + (int)br.get(2);
      if (br.fail) { free(cl); return 0; }
      if (r > total - i) { free(cl); return -1; }
      u8 v = lens[i - 1];
      while (r--) lens[i++] = v;
    } else if (s == 17) {
      int r = 3 + (int)br.get(3);
      if (br.fail) { free(cl); return 0; }
      if (r > total - i) { free(cl); return -1; }
      i += r;
    } else {
      int r = 11 + (int)br.get(7);
      if (br.fail) { free(cl); return 0; }
      if (r > total - i) { free(cl); return -1; }
      i += r;
    }
  }
  free(cl);
  if (!z->lit.build(lens, hlit)) return -1;
  if (lens[hlit] == 0 && hdist == 1) {
    u8 one[2] = {1, 0};
    z->dist.build(one, 2);
    z->dist.maxbits = 0;
  } else if (!z->dist.build(lens + hlit, hdist, true)) {
    return -1;
  }
  z->state = IST_HUFF;
  return 1;
}

}  // namespace

ATPU_EXPORT void* atpu_inflate_stream_new(int raw) {
  InflateStream* z = (InflateStream*)calloc(1, sizeof(InflateStream));
  if (!z) return nullptr;
  z->raw = raw;
  z->state = raw ? IST_BLOCK : IST_ZHDR;
  z->adler = 1;
  return z;
}

ATPU_EXPORT void atpu_inflate_stream_free(void* p) {
  if (!p) return;
  InflateStream* z = (InflateStream*)p;
  free(z->in);
  free(z);
}

ATPU_EXPORT i64 atpu_inflate_stream_feed(void* p, const u8* src, size_t n) {
  InflateStream* z = (InflateStream*)p;
  if (!z) return ERR_CORRUPT;
  if (z->in_len + n > z->in_cap) {
    size_t cap = (z->in_len + n) * 2 + 4096;
    u8* nb = (u8*)realloc(z->in, cap);
    if (!nb) return ERR_CORRUPT;
    z->in = nb;
    z->in_cap = cap;
  }
  memcpy(z->in + z->in_len, src, n);
  z->in_len += n;
  return (i64)z->in_len;
}

ATPU_EXPORT i64 atpu_inflate_stream_pending(void* p) {
  InflateStream* z = (InflateStream*)p;
  return z ? (i64)z->in_len : 0;
}

// Unconsumed WHOLE input bytes: like pending, but excludes a partially
// consumed byte when the deflate stream ended mid-byte — what a framing
// layer (gzip member trailer) needs to locate the next section.
ATPU_EXPORT i64 atpu_inflate_stream_tail(void* p) {
  InflateStream* z = (InflateStream*)p;
  if (!z) return 0;
  return (i64)z->in_len - ((z->bitpos & 7) ? 1 : 0);
}

// Decode as much as possible into dst (cap must be >= 64 KiB). final_in=1
// once no more input will arrive. *done set when the stream is complete.
// Returns bytes written or ERR_*; call again while it returns cap-limited
// output or after feeding more input.
ATPU_EXPORT i64 atpu_inflate_stream_run(void* p, u8* dst, size_t cap,
                                        int final_in, int* done) {
  InflateStream* z = (InflateStream*)p;
  if (done) *done = 0;
  if (!z || cap < (1 << 16)) return ERR_CORRUPT;
  size_t op = 0;
  BitReader br(z->in + (z->bitpos >> 3), z->in + z->in_len);
  if (z->bitpos & 7) br.get((int)(z->bitpos & 7));  // skip partial byte

  // Ring-window maintenance is deferred: the loop writes dst only, and
  // the last <=32K bytes fold into the ring ONCE per call (two memcpys)
  // instead of a masked store per output byte. Matches whose source lies
  // inside this call's dst copy with the same ladder as one-shot inflate;
  // only the (rare) head reaching before this call reads the ring.
  const u64 baseOut = z->total_out;
  auto emit = [&](u8 b) { dst[op++] = b; };
  i64 result = -1000;  // sentinel: keep looping
  while (result == -1000) {
    BrSnap s = snap(br);
    switch (z->state) {
      case IST_ZHDR: {
        u32 h0 = br.get(8), h1 = br.get(8);
        if (br.fail) { restore(br, s);
          result = final_in ? (i64)ERR_CORRUPT : (i64)op; break; }
        if ((h0 & 0x0F) != 8 || ((h0 << 8 | h1) % 31) != 0 || (h1 & 0x20)) {
          result = ERR_CORRUPT; break; }
        z->state = IST_BLOCK;
        break;
      }
      case IST_BLOCK: {
        int r = ist_block_header(z, br);
        if (r < 0) { result = ERR_CORRUPT; break; }
        if (r == 0) {
          restore(br, s);
          if (!final_in) { result = (i64)op; break; }
          // final: raw chunk streams may end cleanly on a block boundary
          // (mode-2 sync chunks carry no BFINAL)
          u64 left = (u64)(br.end - br.p) * 8 + (u64)br.nbits;
          if (z->raw && left < 8) { z->state = IST_DONE; break; }
          result = ERR_CORRUPT;
        }
        break;
      }
      case IST_STORED: {
        while (z->stored_left && op < cap) {
          BrSnap b2 = snap(br);
          u32 b = br.get(8);
          if (br.fail) { restore(br, b2);
            result = final_in ? (i64)ERR_CORRUPT : (i64)op; break; }
          emit((u8)b);
          z->stored_left--;
        }
        if (result != -1000) break;
        if (z->stored_left) { result = (i64)op; break; }  // out of dst space
        z->state = z->final_block ? IST_CHECK : IST_BLOCK;
        break;
      }
      case IST_HUFF: {
        for (;;) {
          // 258 max match + 16 wildcopy slack
          if (cap - op < 274) { result = (i64)op; break; }  // refill dst
          BrSnap b2 = snap(br);
          int sy = decode_sym(br, z->lit);
          if (sy < 0) { restore(br, b2);
            result = final_in ? (i64)ERR_CORRUPT : (i64)op; break; }
          if (sy < 256) { emit((u8)sy); continue; }
          if (sy == 256) {
            z->state = z->final_block ? IST_CHECK : IST_BLOCK;
            break;
          }
          int c = sy - 257;
          if (c >= 29 || z->dist.maxbits == 0) { result = ERR_CORRUPT;
            break; }
          int len = LEN_BASE[c] + (int)br.get(LEN_XBITS[c]);
          int dc = decode_sym(br, z->dist);
          if (dc < 0) { restore(br, b2);
            result = final_in ? (i64)ERR_CORRUPT : (i64)op; break; }
          if (dc >= 30) { result = ERR_CORRUPT; break; }
          int d = DIST_BASE[dc] + (int)br.get(DIST_XBITS[dc]);
          if (br.fail) { restore(br, b2);
            result = final_in ? (i64)ERR_CORRUPT : (i64)op; break; }
          if ((u64)d > baseOut + (u64)op) { result = ERR_CORRUPT; break; }
          if ((u64)d <= (u64)op) {
            // source inside this call's output: wildcopy ladder
            u8* o = dst + op;
            const u8* q = o - d;
            if (d >= 16) {
              i64 nn = len;
              do {
                memcpy(o, q, 16);
                o += 16;
                q += 16;
                nn -= 16;
              } while (nn > 0);
            } else if (d >= 8) {
              u8* e2 = dst + op + len;
              do {
                memcpy(o, q, 8);
                o += 8;
                q += 8;
              } while (o < e2);
            } else {
              for (int i = 0; i < len; i++) o[i] = q[i];
            }
            op += (size_t)len;
          } else {
            // head reaches before this call: bytes from the ring (state
            // as of call entry), remainder continues inside dst
            u64 start = baseOut + (u64)op - (u64)d;
            i64 hw = (i64)((u64)d - (u64)op);
            if (hw > len) hw = len;
            for (i64 i = 0; i < hw; i++)
              dst[op + (size_t)i] = z->win[(start + (u64)i) & 32767];
            op += (size_t)hw;
            for (i64 i = hw; i < len; i++) {
              dst[op] = dst[op - (size_t)d];
              op++;
            }
          }
        }
        break;
      }
      case IST_CHECK: {
        if (z->raw) { z->state = IST_DONE; break; }
        br.align();
        u32 a3 = br.get(8), a2 = br.get(8), a1 = br.get(8), a0 = br.get(8);
        if (br.fail) { restore(br, s);
          result = final_in ? (i64)ERR_CORRUPT : (i64)op; break; }
        u32 want = (a3 << 24) | (a2 << 16) | (a1 << 8) | a0;
        u32 got = adler32(dst, op, z->adler);  // fold the tail below too
        z->adler = got;
        if (z->adler != want) { result = ERR_CHECKSUM; break; }
        z->state = IST_DONE;
        break;
      }
      case IST_DONE:
        if (done) *done = 1;
        result = (i64)op;
        break;
    }
  }
  if (result >= 0) {
    // fold this call's tail into the ring window and advance total_out
    if (op > 0) {
      size_t n = op < 32768 ? op : 32768;
      u64 startAbs = baseOut + (u64)op - n;
      size_t r0 = (size_t)(startAbs & 32767);
      size_t first = 32768 - r0 < n ? 32768 - r0 : n;
      memcpy(z->win + r0, dst + op - n, first);
      if (n - first) memcpy(z->win, dst + op - n + first, n - first);
      z->total_out = baseOut + (u64)op;
    }
    // running adler over everything emitted this call (unless the CHECK
    // state already folded it in)
    if (!z->raw && z->state != IST_DONE)
      z->adler = adler32(dst, op, z->adler);
    if (z->state == IST_DONE && done) *done = 1;
    // trim consumed whole bytes so pending memory stays O(chunk)
    z->bitpos = (u64)(br.p - z->in) * 8 - (u64)br.nbits;
    size_t drop = (size_t)(z->bitpos >> 3);
    if (drop) {
      memmove(z->in, z->in + drop, z->in_len - drop);
      z->in_len -= drop;
      z->bitpos &= 7;
    }
  }
  return result;
}

// CRC-32 (IEEE 802.3, reflected 0xEDB88320) — the gzip/xz-crc32 checksum.
// Slice-by-8 (reference capability: zlib crc32.c's braided tables):
// 8 bytes per step, ~8x the byte-at-a-time rate
static u32 crc32_tab8[8][256];
static void crc32_init() {
  for (u32 i = 0; i < 256; i++) {
    u32 c = i;
    for (int k = 0; k < 8; k++)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc32_tab8[0][i] = c;
  }
  for (int t = 1; t < 8; t++)
    for (u32 i = 0; i < 256; i++)
      crc32_tab8[t][i] =
          crc32_tab8[t - 1][i] >> 8 ^ crc32_tab8[0][crc32_tab8[t - 1][i] & 0xFF];
}
// load-time init: callers may race from the host RAP thread pool
static const bool crc32_tables_ready = (crc32_init(), true);

ATPU_EXPORT u32 atpu_crc32(const u8* p, size_t n, u32 crc) {
  (void)crc32_tables_ready;
  crc = ~crc;
  while (n >= 8) {
    u32 lo, hi;
    memcpy(&lo, p, 4);
    memcpy(&hi, p + 4, 4);
    lo ^= crc;
    crc = crc32_tab8[7][lo & 0xFF] ^ crc32_tab8[6][(lo >> 8) & 0xFF]
        ^ crc32_tab8[5][(lo >> 16) & 0xFF] ^ crc32_tab8[4][lo >> 24]
        ^ crc32_tab8[3][hi & 0xFF] ^ crc32_tab8[2][(hi >> 8) & 0xFF]
        ^ crc32_tab8[1][(hi >> 16) & 0xFF] ^ crc32_tab8[0][hi >> 24];
    p += 8;
    n -= 8;
  }
  while (n--) crc = crc32_tab8[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
  return ~crc;
}

ATPU_EXPORT i64 atpu_deflate_bound(i64 n) {
  return n + (n >> 8) + 5 * (n / 65535 + 1) + 32;
}

ATPU_EXPORT u32 atpu_adler32(const u8* src, size_t n, u32 start) {
  return adler32(src, n, start);
}
