// Own LZMA codec (.lzma ALONE format) — encoder + decoder, no third-party
// code. Replaces the round-1 CPython-lzma delegate (VERDICT item 5).
//
// Capability parity targets: /root/reference/algos/lzma/ — LzmaEnc.c
// (range encoder + packet state machine), LzmaDec.c (decoder), LzFind.c
// (match finder; here hash-4 chains with rep-distance probes, the CEHC
// contiguous-layout idea of algos/common/aoclHashChain.h:116-149 realized
// as a flat prev[] ring). Independent implementation from the public LZMA
// specification; validity is proven by cross-decoding with liblzma both
// directions (tests/test_lzma_native.py).
//
// Layout (FORMAT_ALONE): 1 byte props ((pb*5+lp)*9+lc), 4B LE dictSize,
// 8B LE uncompressed size (we write the real size; we decode both real
// and unknown-size + end-marker streams).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstddef>

#include "btmf.h"

#define ATPU_EXPORT extern "C" __attribute__((visibility("default")))

namespace {

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;
typedef long long i64;
typedef int32_t i32;

enum { ERR_CORRUPT = -1, ERR_DST_SMALL = -2 };

static const int NSTATES = 12, NPOSSTATES = 16;
static const u32 PROB_INIT = 1024;  // 2048/2
static const int MATCH_LEN_MIN = 2, MATCH_LEN_MAX = 273;

struct LenProbs {
  u16 choice, choice2;
  u16 low[NPOSSTATES][8], mid[NPOSSTATES][8], high[256];
};

struct Probs {
  u16 isMatch[NSTATES][NPOSSTATES];
  u16 isRep[NSTATES], isRepG0[NSTATES], isRepG1[NSTATES], isRepG2[NSTATES];
  u16 isRep0Long[NSTATES][NPOSSTATES];
  u16 posSlot[4][64];
  u16 specPos[115];
  u16 align_[16];
  LenProbs matchLen, repLen;
  u16* lit;  // (1 << (lc+lp)) * 0x300
  int lc, lp, pb;

  bool alloc(int lc_, int lp_, int pb_) {
    lc = lc_; lp = lp_; pb = pb_;
    size_t nlit = ((size_t)0x300) << (lc + lp);
    lit = (u16*)malloc(sizeof(u16) * nlit);
    if (!lit) return false;
    // init everything to PROB_INIT (all prob fields precede `lit`)
    u16* base = (u16*)this;
    size_t nhdr = (offsetof(Probs, lit)) / sizeof(u16);
    for (size_t i = 0; i < nhdr; i++) base[i] = PROB_INIT;
    for (size_t i = 0; i < nlit; i++) lit[i] = PROB_INIT;
    return true;
  }
  void release() { free(lit); lit = nullptr; }

  void reset() {  // re-init all probabilities, keep lc/lp/pb + allocation
    u16* base = (u16*)this;
    size_t nhdr = (offsetof(Probs, lit)) / sizeof(u16);
    for (size_t i = 0; i < nhdr; i++) base[i] = PROB_INIT;
    size_t nlit = ((size_t)0x300) << (lc + lp);
    for (size_t i = 0; i < nlit; i++) lit[i] = PROB_INIT;
  }
};

static inline int state_after_lit(int s) {
  return s < 4 ? 0 : s < 10 ? s - 3 : s - 6;
}

// ---------------------------------------------------------------------------
// range decoder
// ---------------------------------------------------------------------------
struct RDec {
  const u8* p;
  const u8* end;
  u32 range = 0xFFFFFFFFu;
  u32 code = 0;
  bool fail = false;

  bool init(const u8* s, const u8* e) {
    p = s;
    end = e;
    if (end - p < 5 || *p != 0) return false;
    p++;
    code = 0;
    for (int i = 0; i < 4; i++) code = (code << 8) | *p++;
    return true;
  }
  inline u8 next() { return p < end ? *p++ : (fail = true, 0); }
  inline void norm() {
    if (range < (1u << 24)) { range <<= 8; code = (code << 8) | next(); }
  }
  inline int bit(u16* prob) {
    u32 bound = (range >> 11) * *prob;
    int b;
    if (code < bound) {
      range = bound;
      *prob = (u16)(*prob + ((2048 - *prob) >> 5));
      b = 0;
    } else {
      code -= bound;
      range -= bound;
      *prob = (u16)(*prob - (*prob >> 5));
      b = 1;
    }
    norm();
    return b;
  }
  inline u32 direct(int n) {
    u32 res = 0;
    while (n--) {
      range >>= 1;
      u32 t = (code - range) >> 31;  // 0 if code >= range
      code -= range & (t - 1);
      res = (res << 1) | (1 - t);
      norm();
    }
    return res;
  }
  // bittree forward: n bits, probs[1..]
  inline u32 tree(u16* probs, int n) {
    u32 m = 1;
    for (int i = 0; i < n; i++) m = (m << 1) | (u32)bit(&probs[m]);
    return m - (1u << n);
  }
  inline u32 tree_rev(u16* probs, int n) {
    u32 m = 1, res = 0;
    for (int i = 0; i < n; i++) {
      int b = bit(&probs[m]);
      m = (m << 1) | (u32)b;
      res |= (u32)b << i;
    }
    return res;
  }
};

// ---------------------------------------------------------------------------
// range encoder
// ---------------------------------------------------------------------------
struct REnc {
  u8* out;
  size_t cap, len = 0;
  u64 low = 0;
  u32 range = 0xFFFFFFFFu;
  u8 cache = 0;
  u64 cacheSize = 1;
  bool overflow = false;

  REnc(u8* o, size_t c) : out(o), cap(c) {}
  void shift_low() {
    if ((u32)(low >> 32) != 0 || (u32)low < 0xFF000000u) {
      u8 carry = (u8)(low >> 32);
      while (cacheSize--) {
        if (len >= cap) { overflow = true; cacheSize = 1; break; }
        out[len++] = (u8)(cache + carry);
        cache = 0xFF;
      }
      cache = (u8)(low >> 24);
      cacheSize = 0;
    }
    cacheSize++;
    low = (low << 8) & 0xFFFFFFFFu;
  }
  inline void norm() {
    while (range < (1u << 24)) { shift_low(); range <<= 8; }
  }
  inline void bit(u16* prob, int b) {
    u32 bound = (range >> 11) * *prob;
    if (!b) {
      range = bound;
      *prob = (u16)(*prob + ((2048 - *prob) >> 5));
    } else {
      low += bound;
      range -= bound;
      *prob = (u16)(*prob - (*prob >> 5));
    }
    norm();
  }
  inline void direct(u32 v, int n) {
    while (n--) {
      range >>= 1;
      if ((v >> n) & 1) low += range;
      norm();
    }
  }
  inline void tree(u16* probs, int n, u32 sym) {
    u32 m = 1;
    for (int i = n - 1; i >= 0; i--) {
      u32 b = (sym >> i) & 1;
      bit(&probs[m], (int)b);
      m = (m << 1) | b;
    }
  }
  inline void tree_rev(u16* probs, int n, u32 sym) {
    u32 m = 1;
    for (int i = 0; i < n; i++) {
      u32 b = (sym >> i) & 1;
      bit(&probs[m], (int)b);
      m = (m << 1) | b;
    }
  }
  void flush() { for (int i = 0; i < 5; i++) shift_low(); }
};

static void enc_len(REnc& re, LenProbs& lp2, int posState, int len) {
  int v = len - MATCH_LEN_MIN;
  if (v < 8) {
    re.bit(&lp2.choice, 0);
    re.tree(lp2.low[posState], 3, (u32)v);
  } else if (v < 16) {
    re.bit(&lp2.choice, 1);
    re.bit(&lp2.choice2, 0);
    re.tree(lp2.mid[posState], 3, (u32)(v - 8));
  } else {
    re.bit(&lp2.choice, 1);
    re.bit(&lp2.choice2, 1);
    re.tree(lp2.high, 8, (u32)(v - 16));
  }
}

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------
static i64 lzma_decode_raw_state(Probs& P, RDec& rd, u8* dst,
                                 size_t dstCap, u64 unpackEnd,
                                 bool sizeKnown, size_t op0, u32 reps[4],
                                 int* statep, size_t base = 0) {
  // `base` = dictionary start (last LZMA2 dict reset): position contexts,
  // literal-prev and distance bounds are relative to it
  size_t op = op0;
  u32 rep0 = reps[0], rep1 = reps[1], rep2 = reps[2], rep3 = reps[3];
  int state = *statep;
  u32 posMask = (1u << P.pb) - 1;
  u32 litPosMask = (1u << P.lp) - 1;

  // Localized range-decoder state: dst is u8*, so stores through it may
  // alias the RDec object and would force range/code/p reloads every
  // symbol; locals whose address never escapes cannot alias.
  u32 Rrange = rd.range, Rcode = rd.code;
  const u8* Rp = rd.p;
  const u8* const Rend = rd.end;
  bool Rfail = rd.fail;
  auto SYNC = [&]() {
    rd.range = Rrange; rd.code = Rcode; rd.p = Rp; rd.fail = Rfail;
  };
  auto BIT = [&](u16* prob) -> int {
    u32 bound = (Rrange >> 11) * *prob;
    int b;
    if (Rcode < bound) {
      Rrange = bound;
      *prob = (u16)(*prob + ((2048 - *prob) >> 5));
      b = 0;
    } else {
      Rcode -= bound;
      Rrange -= bound;
      *prob = (u16)(*prob - (*prob >> 5));
      b = 1;
    }
    if (Rrange < (1u << 24)) {
      Rrange <<= 8;
      Rcode = (Rcode << 8) | (Rp < Rend ? *Rp++ : (Rfail = true, 0));
    }
    return b;
  };
  auto TREE = [&](u16* probs, int n) -> u32 {
    u32 m = 1;
    for (int i = 0; i < n; i++) m = (m << 1) | (u32)BIT(&probs[m]);
    return m - (1u << n);
  };
  auto TREE_REV = [&](u16* probs, int n) -> u32 {
    u32 m = 1, res = 0;
    for (int i = 0; i < n; i++) {
      int b = BIT(&probs[m]);
      m = (m << 1) | (u32)b;
      res |= (u32)b << i;
    }
    return res;
  };
  auto DIRECT = [&](int n) -> u32 {
    u32 res = 0;
    while (n--) {
      Rrange >>= 1;
      u32 t = (Rcode - Rrange) >> 31;  // 0 if code >= range
      Rcode -= Rrange & (t - 1);
      res = (res << 1) | (1 - t);
      if (Rrange < (1u << 24)) {
        Rrange <<= 8;
        Rcode = (Rcode << 8) | (Rp < Rend ? *Rp++ : (Rfail = true, 0));
      }
    }
    return res;
  };
  auto DEC_LEN = [&](LenProbs& lp2, int ps) -> int {
    if (!BIT(&lp2.choice))
      return MATCH_LEN_MIN + (int)TREE(lp2.low[ps], 3);
    if (!BIT(&lp2.choice2))
      return MATCH_LEN_MIN + 8 + (int)TREE(lp2.mid[ps], 3);
    return MATCH_LEN_MIN + 16 + (int)TREE(lp2.high, 8);
  };

  while (!sizeKnown || op < unpackEnd) {
    if (Rfail) { SYNC(); return ERR_CORRUPT; }
    // No dst-capacity check here: every producing path below checks before
    // writing, and an unknown-size stream that has exactly filled dstCap
    // must still be allowed to read its trailing end marker (otherwise an
    // exact-size buffer spuriously reports DST_SMALL and callers re-decode).
    int posState = (int)((u32)(op - base) & posMask);
    if (!BIT(&P.isMatch[state][posState])) {
      // literal
      if (op >= dstCap) { SYNC(); return ERR_DST_SMALL; }
      u8 prev = op > base ? dst[op - 1] : 0;
      u16* probs = P.lit + 0x300 * ((((u32)(op - base) & litPosMask)
                                     << P.lc) + (prev >> (8 - P.lc)));
      u32 symbol = 1;
      if (state >= 7) {
        if (rep0 > op - base) { SYNC(); return ERR_CORRUPT; }
        u8 matchByte = dst[op - rep0];
        do {
          u32 matchBit = (matchByte >> 7) & 1;
          matchByte <<= 1;
          u32 b = (u32)BIT(&probs[((1 + matchBit) << 8) + symbol]);
          symbol = (symbol << 1) | b;
          if (matchBit != b) break;
        } while (symbol < 0x100);
      }
      while (symbol < 0x100)
        symbol = (symbol << 1) | (u32)BIT(&probs[symbol]);
      dst[op++] = (u8)symbol;
      state = state_after_lit(state);
      continue;
    }
    int len;
    if (BIT(&P.isRep[state])) {
      // rep match
      if (op == 0) { SYNC(); return ERR_CORRUPT; }
      if (!BIT(&P.isRepG0[state])) {
        if (!BIT(&P.isRep0Long[state][posState])) {
          // short rep: 1 byte — validate against the dict-reset base like
          // the literal match-byte and main-copy paths (LZMA2 resets)
          if (rep0 > op - base || op >= dstCap) { SYNC(); return ERR_CORRUPT; }
          dst[op] = dst[op - rep0];
          op++;
          state = state < 7 ? 9 : 11;
          continue;
        }
      } else {
        u32 dist;
        if (!BIT(&P.isRepG1[state])) {
          dist = rep1;
        } else if (!BIT(&P.isRepG2[state])) {
          dist = rep2;
          rep2 = rep1;
        } else {
          dist = rep3;
          rep3 = rep2;
          rep2 = rep1;
        }
        rep1 = rep0;
        rep0 = dist;
      }
      len = DEC_LEN(P.repLen, posState);
      state = state < 7 ? 8 : 11;
    } else {
      // new match
      rep3 = rep2;
      rep2 = rep1;
      rep1 = rep0;
      len = DEC_LEN(P.matchLen, posState);
      int lps = len - 2 < 3 ? len - 2 : 3;
      u32 slot = TREE(P.posSlot[lps], 6);
      if (slot < 4) {
        rep0 = slot;
      } else {
        int nd = (int)(slot >> 1) - 1;
        rep0 = (2 | (slot & 1)) << nd;
        if (slot < 14) {
          rep0 += TREE_REV(P.specPos + rep0 - slot, nd);
        } else {
          rep0 += DIRECT(nd - 4) << 4;
          rep0 += TREE_REV(P.align_, 4);
        }
      }
      if (rep0 == 0xFFFFFFFFu) {
        // end marker. With a declared size the loop already exits at
        // unpackEnd before reading a trailing marker (known-size+marker
        // streams, legal in LZMA ALONE, decode fine — tested); reaching
        // one *early* means the stream is short, i.e. corrupt.
        if (sizeKnown) { SYNC(); return ERR_CORRUPT; }
        reps[0] = rep0; reps[1] = rep1; reps[2] = rep2; reps[3] = rep3;
        *statep = state;
        SYNC();
        return (i64)op;
      }
      rep0++;
      state = state < 7 ? 7 : 10;
    }
    if (rep0 > op - base) { SYNC(); return ERR_CORRUPT; }
    if (op + (size_t)len > dstCap) { SYNC(); return ERR_DST_SMALL; }
    const u8* q = dst + op - rep0;
    u8* o = dst + op;
    op += (size_t)len;
    // 8-byte wildcopy when distance and tail slack allow (same recast
    // as the lz4/snappy/inflate decoders); byte loop = overlap fallback
    if (rep0 >= 8 && op + 8 <= dstCap) {
      u8* e = o + len;
      do {
        memcpy(o, q, 8);
        o += 8;
        q += 8;
      } while (o < e);
    } else {
      for (int i = 0; i < len; i++) o[i] = q[i];
    }
  }
  reps[0] = rep0; reps[1] = rep1; reps[2] = rep2; reps[3] = rep3;
  *statep = state;
  SYNC();
  return (i64)op;
}

// compatibility wrapper: fresh state, start at offset 0
static i64 lzma_decode_raw(Probs& P, RDec& rd, u8* dst, size_t dstCap,
                           u64 unpackSize, bool sizeKnown) {
  u32 reps[4] = {1, 1, 1, 1};
  int state = 0;
  return lzma_decode_raw_state(P, rd, dst, dstCap, unpackSize, sizeKnown,
                               0, reps, &state);
}

// ---------------------------------------------------------------------------
// encoder
// ---------------------------------------------------------------------------
static const int EHASH_BITS = 16, EHASH_SIZE = 1 << EHASH_BITS;

static inline u32 ehash4(const u8* p) {
  u32 v;
  memcpy(&v, p, 4);
  return (v * 2654435761u) >> (32 - EHASH_BITS);
}

static int ematch_len(const u8* a, const u8* b, const u8* limit) {
  const u8* s = a;
  while (a + 8 <= limit) {
    u64 x, y;
    memcpy(&x, a, 8);
    memcpy(&y, b, 8);
    u64 d = x ^ y;
    if (d) return (int)(a - s) + (__builtin_ctzll(d) >> 3);
    a += 8;
    b += 8;
  }
  while (a < limit && *a == *b) { a++; b++; }
  return (int)(a - s);
}

struct EncMF {
  int32_t* head;
  int32_t* prev;
  u32 window;
  u32 cmask;

  bool alloc(u32 win, int clog) {
    window = win;
    u32 csize = (u32)1 << clog;
    if (csize > win) csize = win;
    cmask = csize - 1;
    head = (int32_t*)malloc(sizeof(int32_t) * EHASH_SIZE);
    prev = (int32_t*)malloc(sizeof(int32_t) * (size_t)csize);
    if (!head || !prev) return false;
    memset(head, -1, sizeof(int32_t) * EHASH_SIZE);
    return true;
  }
  void release() { free(head); free(prev); }
  void insert(const u8* base, size_t pos) {
    u32 h = ehash4(base + pos);
    prev[pos & cmask] = head[h];
    head[h] = (int32_t)pos;
  }
  int find(const u8* base, size_t pos, size_t n, int depth, u32* distOut) {
    const u8* limit = base + (n - pos > MATCH_LEN_MAX
                              ? pos + MATCH_LEN_MAX : n);
    const u8* scan = base + pos;
    int best = 0;
    u32 bestd = 0;
    int32_t cand = head[ehash4(base + pos)];
    while (cand >= 0 && depth-- > 0) {
      size_t c = (size_t)cand;
      if (pos - c >= window) break;
      const u8* mp = base + c;
      // scan-end fast reject (zlib longest_match idiom; same win as in
      // csrc/deflate.cpp): only a candidate matching at scan[best-1..best]
      // can improve on `best`
      if (best >= 2 && scan + best < limit) {
        u16 se, me;
        memcpy(&se, scan + best - 1, 2);
        memcpy(&me, mp + best - 1, 2);
        if (se != me) {
          int32_t nx0 = prev[c & cmask];
          if (nx0 >= (int32_t)c) break;
          cand = nx0;
          continue;
        }
      }
      int l = ematch_len(scan, mp, limit);
      if (l > best) { best = l; bestd = (u32)(pos - c); }
      int32_t nxt = prev[c & cmask];
      if (nxt >= (int32_t)c) break;
      cand = nxt;
    }
    *distOut = bestd;
    return best;
  }

  // pair walk for the optimal parse: record (len, dist) each time the
  // chain improves the best length, so every length in [2, maxLen] has
  // its cheapest (closest) achieving distance
  struct MPair { int len; u32 dist; };
  int find_pairs(const u8* base, size_t pos, size_t n, int depth,
                 MPair* out, int maxPairs) {
    const u8* limit = base + (n - pos > MATCH_LEN_MAX
                              ? pos + MATCH_LEN_MAX : n);
    const u8* scan = base + pos;
    int best = 1;
    int cnt = 0;
    int32_t cand = head[ehash4(base + pos)];
    while (cand >= 0 && depth-- > 0 && cnt < maxPairs) {
      size_t c = (size_t)cand;
      if (pos - c >= window) break;
      const u8* mp = base + c;
      if (scan + best < limit) {
        u16 se, me;
        memcpy(&se, scan + best - 1, 2);
        memcpy(&me, mp + best - 1, 2);
        if (se != me) {
          int32_t nx0 = prev[c & cmask];
          if (nx0 >= (int32_t)c) break;
          cand = nx0;
          continue;
        }
      }
      int l = ematch_len(scan, mp, limit);
      if (l > best) {
        out[cnt].len = l;
        out[cnt].dist = (u32)(pos - c);
        cnt++;
        best = l;
      }
      int32_t nxt = prev[c & cmask];
      if (nxt >= (int32_t)c) break;
      cand = nxt;
    }
    return cnt;
  }
};

// Binary-tree matcher adapter for the optimal parse (levels 7+): same
// find_pairs/insert surface as EncMF so lzma_run_optimal stays matcher-
// generic. insert_get both searches and inserts in one walk, so the
// DP's find_pairs-then-insert pair collapses (lastIns guard). Shared
// implementation: csrc/btmf.h (the AOCL_Bt4_MatchFinder_* /
// ZSTD_BtGetAllMatches investment point, own structure).
struct BtEncMF {
  btmf::BtMF bt;
  size_t n = 0;
  size_t lastIns = (size_t)-1;
  int depthCap = 32;
  struct MPair { int len; u32 dist; };

  bool alloc(u32 win, size_t len, int depth) {
    n = len;
    depthCap = depth;
    bt.minLen = 2;
    return bt.alloc(win, len, EHASH_BITS);
  }
  void release() { bt.release(); }
  void insert(const u8* base, size_t pos) {
    if (pos == lastIns) return;
    lastIns = pos;
    bt.insert(base, pos, n, depthCap, MATCH_LEN_MAX);
  }
  int find(const u8* base, size_t pos, size_t len, int depth, u32* distOut) {
    btmf::BtPair tmp[48];
    lastIns = pos;
    int c = bt.insert_get(base, pos, len, depth, MATCH_LEN_MAX, tmp, 48);
    if (!c) { *distOut = 0; return 0; }
    *distOut = tmp[c - 1].dist;
    return tmp[c - 1].len;
  }
  int find_pairs(const u8* base, size_t pos, size_t len, int depth,
                 MPair* out, int maxPairs) {
    btmf::BtPair tmp[48];
    if (maxPairs > 48) maxPairs = 48;
    lastIns = pos;
    int c = bt.insert_get(base, pos, len, depth, MATCH_LEN_MAX, tmp,
                          maxPairs);
    for (int i = 0; i < c; i++) {
      out[i].len = tmp[i].len;
      out[i].dist = tmp[i].dist;
    }
    return c;
  }
};

// ---------------------------------------------------------------------------
// bit prices (1/16-bit units) for the optimal parse — the LZMA SDK's
// GetPrice idea (algos/lzma/LzmaEnc.c price machinery), own tables
// ---------------------------------------------------------------------------
struct PriceTab {
  u16 t[128];
  PriceTab() {
    for (int i = 0; i < 128; i++) {
      double p = (i * 16 + 8) / 2048.0;
      t[i] = (u16)(-std::log2(p) * 16.0 + 0.5);
    }
  }
};
static const PriceTab PT;
static inline u32 prc0(u16 p) { return PT.t[p >> 4]; }
static inline u32 prc1(u16 p) { return PT.t[(2048 - p) >> 4]; }
static inline u32 prcBit(u16 p, u32 b) { return b ? prc1(p) : prc0(p); }
static inline u32 prcTree(const u16* probs, int nb, u32 sym) {
  u32 price = 0, m = 1;
  for (int i = nb - 1; i >= 0; i--) {
    u32 b = (sym >> i) & 1;
    price += prcBit(probs[m], b);
    m = (m << 1) | b;
  }
  return price;
}
static inline u32 prcTreeRev(const u16* probs, int nb, u32 sym) {
  u32 price = 0, m = 1;
  for (int i = 0; i < nb; i++) {
    u32 b = (sym >> i) & 1;
    price += prcBit(probs[m], b);
    m = (m << 1) | b;
  }
  return price;
}

// chunk-static price tables, refreshed from the adaptive probs at every
// chunk boundary (prices guide choices; the replay coder stays adaptive)
struct ChunkPrices {
  u32 lenM[NPOSSTATES][MATCH_LEN_MAX - MATCH_LEN_MIN + 1];
  u32 lenR[NPOSSTATES][MATCH_LEN_MAX - MATCH_LEN_MIN + 1];
  u32 fullDist[4][128];   // dist-1 < 128: exact tree price
  u32 posSlot[4][64];
  u32 align_[16];

  static void lenTable(const LenProbs& lp2, int pb,
                       u32 out[NPOSSTATES][MATCH_LEN_MAX - MATCH_LEN_MIN
                                           + 1]) {
    u32 c0 = prc0(lp2.choice), c1 = prc1(lp2.choice);
    u32 c20 = prc0(lp2.choice2), c21 = prc1(lp2.choice2);
    for (int ps = 0; ps < (1 << pb); ps++) {
      for (int v = 0; v <= MATCH_LEN_MAX - MATCH_LEN_MIN; v++) {
        u32 p;
        if (v < 8) p = c0 + prcTree(lp2.low[ps], 3, (u32)v);
        else if (v < 16) p = c1 + c20 + prcTree(lp2.mid[ps], 3,
                                                (u32)(v - 8));
        else p = c1 + c21 + prcTree(lp2.high, 8, (u32)(v - 16));
        out[ps][v] = p;
      }
    }
  }
  void refresh(const Probs& P) {
    lenTable(P.matchLen, P.pb, lenM);
    lenTable(P.repLen, P.pb, lenR);
    for (int lps = 0; lps < 4; lps++) {
      for (int slot = 0; slot < 64; slot++)
        posSlot[lps][slot] = prcTree(P.posSlot[lps], 6, (u32)slot);
      for (u32 d = 0; d < 128; d++) {
        u32 slot;
        if (d < 4) slot = d;
        else {
          int nb = 31 - __builtin_clz(d);
          slot = (u32)(nb * 2) + ((d >> (nb - 1)) & 1);
        }
        u32 p = posSlot[lps][slot];
        if (slot >= 4) {
          int ndr = (int)(slot >> 1) - 1;
          u32 bse = (2 | (slot & 1)) << ndr;
          p += prcTreeRev(P.specPos + bse - slot, ndr, d - bse);
        }
        fullDist[lps][d] = p;
      }
    }
    for (u32 a = 0; a < 16; a++)
      align_[a] = prcTreeRev(P.align_, 4, a);
  }
  inline u32 dist(int len, u32 d) const {  // d = dist - 1
    int lps = len - 2 < 3 ? len - 2 : 3;
    if (d < 128) return fullDist[lps][d];
    int nb = 31 - __builtin_clz(d);
    u32 slot = (u32)(nb * 2) + ((d >> (nb - 1)) & 1);
    int ndr = (int)(slot >> 1) - 1;
    return posSlot[lps][slot] + (u32)(ndr - 4) * 16 + align_[d & 15];
  }
};

// clog caps the chain-link ring at 2^clog entries (same chainLog axis
// as csrc/zstd_encode.cpp): a dict-sized prev ring (16 MB at -6) makes
// every chain step a DRAM access; truncated chains alias rarely and
// find() breaks on a non-monotonic link.
struct EncParams { u32 dict; int depth; int clog; };
static EncParams eparams(int level) {
  switch (level < 0 ? 0 : (level > 9 ? 9 : level)) {
    case 0: return {1u << 16, 4, 16};
    case 1: return {1u << 17, 8, 17};
    case 2: return {1u << 18, 12, 17};
    case 3: return {1u << 19, 16, 18};
    case 4: return {1u << 20, 24, 18};
    case 5: return {1u << 21, 32, 19};
    case 6: return {1u << 22, 48, 20};
    case 7: return {1u << 22, 96, 21};
    case 8: return {1u << 23, 192, 22};
    default: return {1u << 23, 384, 23};
  }
}

static void enc_literal(REnc& re, Probs& P, const u8* dst, size_t op,
                        int state, u32 rep0, u8 sym) {
  u8 prev = op ? dst[op - 1] : 0;
  u32 litPosMask = (1u << P.lp) - 1;
  u16* probs = P.lit + 0x300 * ((((u32)op & litPosMask) << P.lc)
                                + (prev >> (8 - P.lc)));
  u32 symbol = 0x100 | sym;
  if (state >= 7) {
    u8 matchByte = dst[op - rep0];
    u32 m = 1;
    int i = 7;
    for (; i >= 0; i--) {
      u32 matchBit = (matchByte >> i) & 1;
      u32 b = (symbol >> i) & 1;
      re.bit(&probs[((1 + matchBit) << 8) + m], (int)b);
      m = (m << 1) | b;
      if (matchBit != b) { i--; break; }
    }
    for (; i >= 0; i--) {
      u32 b = (symbol >> i) & 1;
      re.bit(&probs[m], (int)b);
      m = (m << 1) | b;
    }
  } else {
    u32 m = 1;
    for (int i = 7; i >= 0; i--) {
      u32 b = (symbol >> i) & 1;
      re.bit(&probs[m], (int)b);
      m = (m << 1) | b;
    }
  }
}

static void enc_dist(REnc& re, Probs& P, int len, u32 dist) {
  // dist is the raw distance-1 ("dist slot value"), i.e. rep0 - 1
  int lps = len - 2 < 3 ? len - 2 : 3;
  u32 slot;
  if (dist < 4) {
    slot = dist;
  } else {
    int nb = 31 - __builtin_clz(dist);
    slot = (u32)(nb * 2) + ((dist >> (nb - 1)) & 1);
  }
  re.tree(P.posSlot[lps], 6, slot);
  if (slot >= 4) {
    int nd = (int)(slot >> 1) - 1;
    u32 base = (2 | (slot & 1)) << nd;
    u32 rest = dist - base;
    if (slot < 14) {
      re.tree_rev(P.specPos + base - slot, nd, rest);
    } else {
      re.direct(rest >> 4, nd - 4);
      re.tree_rev(P.align_, 4, rest & 15);
    }
  }
}


// ---------------------------------------------------------------------------
// Optimal parse (levels 7+) — chunked shortest-path over bit prices, the
// LZMA SDK GetOptimum idea (algos/lzma/LzmaEnc.c) re-done as a plain
// forward DP: prices are frozen per 4 KiB chunk (refreshed from the
// adaptive probs at every boundary), every node carries the state and
// rep history of its best predecessor, and the winning path is replayed
// through the real adaptive coder — so pricing is approximate but the
// emitted stream is exact.
// ---------------------------------------------------------------------------
static u32 lit_price(const Probs& P, const u8* src, size_t absPos, int st,
                     u32 r0) {
  u8 prev = absPos ? src[absPos - 1] : 0;
  u32 litPosMask = (1u << P.lp) - 1;
  const u16* probs = P.lit + 0x300 * ((((u32)absPos & litPosMask) << P.lc)
                                      + (prev >> (8 - P.lc)));
  u32 symbol = 0x100 | src[absPos];
  u32 price = 0;
  if (st >= 7 && r0 <= absPos) {
    u8 matchByte = src[absPos - r0];
    u32 m = 1;
    int i = 7;
    for (; i >= 0; i--) {
      u32 matchBit = (matchByte >> i) & 1;
      u32 b = (symbol >> i) & 1;
      price += prcBit(probs[((1 + matchBit) << 8) + m], b);
      m = (m << 1) | b;
      if (matchBit != b) { i--; break; }
    }
    for (; i >= 0; i--) {
      u32 b = (symbol >> i) & 1;
      price += prcBit(probs[m], b);
      m = (m << 1) | b;
    }
  } else {
    u32 m = 1;
    for (int i = 7; i >= 0; i--) {
      u32 b = (symbol >> i) & 1;
      price += prcBit(probs[m], b);
      m = (m << 1) | b;
    }
  }
  return price;
}

static const int OPT_CHUNK = 4096;
static const int OPT_SLACK = MATCH_LEN_MAX;
static const u32 REP_MARK = 0xFFFFFFFCu;  // dist >= REP_MARK => rep idx

struct OptNode {
  u32 price;
  i32 from;   // predecessor index, -1 = unreachable
  i32 len;    // bytes produced by the entering op (1 for lit/shortrep)
  u32 dist;   // 0 = literal; REP_MARK+r = rep; else match distance
  u8 state;
  u32 reps[4];
};

template <class MF>
static bool lzma_run_optimal(const u8* src, size_t n, REnc& re, Probs& P,
                             MF& mf, const EncParams& ep) {
  u32 posMask = (1u << P.pb) - 1;
  const int NN = OPT_CHUNK + OPT_SLACK + 1;
  OptNode* nd = (OptNode*)malloc(sizeof(OptNode) * (size_t)NN);
  typename MF::MPair pairs[48];
  i32* path = (i32*)malloc(sizeof(i32) * (size_t)NN);
  ChunkPrices* cp = (ChunkPrices*)malloc(sizeof(ChunkPrices));
  if (!nd || !path || !cp) { free(nd); free(path); free(cp); return false; }

  size_t pos = 0;
  int state = 0;
  u32 reps[4] = {1, 1, 1, 1};

  while (pos < n) {
    cp->refresh(P);
    size_t base = pos;
    size_t tgt = n - base < OPT_CHUNK ? n - base : OPT_CHUNK;
    size_t maxo = n - base < (size_t)(OPT_CHUNK + OPT_SLACK)
                      ? n - base : (size_t)(OPT_CHUNK + OPT_SLACK);
    for (size_t i = 0; i <= maxo; i++) {
      nd[i].price = 0xFFFFFFFFu;
      nd[i].from = -1;
    }
    nd[0].price = 0;
    nd[0].from = 0;
    nd[0].state = (u8)state;
    memcpy(nd[0].reps, reps, sizeof(reps));

    auto relax = [&](size_t j, u32 p, size_t i, i32 len, u32 dist, u8 st,
                     const u32* rp) {
      if (p >= nd[j].price) return;
      nd[j].price = p;
      nd[j].from = (i32)i;
      nd[j].len = len;
      nd[j].dist = dist;
      nd[j].state = st;
      memcpy(nd[j].reps, rp, 4 * sizeof(u32));
    };

    size_t skipUntil = 0;  // long-match jump (the SDK returns from
                           // GetOptimum at nice length; nodes inside the
                           // jump keep chain continuity only)
    for (size_t i = 0; i < tgt; i++) {
      if (nd[i].from < 0) continue;
      if (i < skipUntil) {
        if (base + i + 4 <= n) mf.insert(src, base + i);
        continue;
      }
      u32 basePrice = nd[i].price;
      int st = nd[i].state;
      const u32* rp = nd[i].reps;
      size_t abs = base + i;
      int ps = (int)((u32)abs & posMask);
      size_t room = maxo - i;
      int maxLen = room < (size_t)MATCH_LEN_MAX ? (int)room : MATCH_LEN_MAX;
      const u8* limit = src + abs + (size_t)maxLen;

      // literal
      if (i + 1 <= maxo) {
        u32 p = basePrice + prc0(P.isMatch[st][ps])
                + lit_price(P, src, abs, st, rp[0]);
        relax(i + 1, p, i, 1, 0, (u8)state_after_lit(st), rp);
      }
      if (maxLen < 2) continue;
      u32 pM = basePrice + prc1(P.isMatch[st][ps]);
      u32 pRep = pM + prc1(P.isRep[st]);

      // nice-length shortcut (the SDK's GetOptimum early-out): when a
      // candidate is already long, relax ONLY the longest arrival — the
      // exhaustive per-length loops buy nothing on long matches and
      // dominated the DP's cost on matchy data
      const int NICE = 64;
      int repLens[4];
      int bestRepL = 0;
      for (int r = 0; r < 4; r++) {
        u32 rd = rp[r];
        repLens[r] = 0;
        if ((size_t)rd > abs) continue;
        repLens[r] = ematch_len(src + abs, src + abs - rd, limit);
        if (repLens[r] > bestRepL) bestRepL = repLens[r];
      }

      // rep matches (and the short rep)
      for (int r = 0; r < 4; r++) {
        u32 rd = rp[r];
        if ((size_t)rd > abs) continue;
        int rl = repLens[r];
        if (rl <= 0) continue;
        u32 selP;
        u32 nreps[4] = {rp[0], rp[1], rp[2], rp[3]};
        if (r == 0) {
          selP = prc0(P.isRepG0[st]);
        } else {
          selP = prc1(P.isRepG0[st]);
          if (r == 1) {
            selP += prc0(P.isRepG1[st]);
          } else {
            selP += prc1(P.isRepG1[st])
                    + prcBit(P.isRepG2[st], r == 2 ? 0u : 1u);
            if (r == 3) nreps[3] = nreps[2];
            nreps[2] = nreps[1];
          }
          nreps[1] = nreps[0];
          nreps[0] = rd;
        }
        if (r == 0) {
          // short rep: one byte via rep0
          u32 p = pRep + selP + prc0(P.isRep0Long[st][ps]);
          relax(i + 1, p, i, 1, REP_MARK + 0, (u8)(st < 7 ? 9 : 11), rp);
        }
        if (rl >= 2) {
          u32 lp2 = pRep + selP
                    + (r == 0 ? prc1(P.isRep0Long[st][ps]) : 0);
          u8 nst = (u8)(st < 7 ? 8 : 11);
          int L0 = 2;
          if (bestRepL >= NICE) {
            if (rl < bestRepL) continue;  // only the longest rep
            L0 = rl;                      // and only its full length
            skipUntil = i + (size_t)rl;
          }
          for (int L = L0; L <= rl; L++)
            relax(i + (size_t)L,
                  lp2 + cp->lenR[ps][L - MATCH_LEN_MIN], i, L,
                  REP_MARK + (u32)r, nst, nreps);
        }
      }

      // new matches
      if (abs + 4 <= n && bestRepL < NICE) {
        int dpDepth = ep.depth >> 2;  // 24/48/96 at L7/8/9
        int cnt = mf.find_pairs(src, abs, n, dpDepth, pairs, 48);
        mf.insert(src, abs);
        if (cnt > 0) {
          u32 pNew = pM + prc0(P.isRep[st]);
          u8 nst = (u8)(st < 7 ? 7 : 10);
          int longest = pairs[cnt - 1].len < maxLen ? pairs[cnt - 1].len
                                                    : maxLen;
          int L = 2;
          if (longest >= NICE) {  // shortcut: only the longest arrival
            u32 d = pairs[cnt - 1].dist;
            u32 nreps[4] = {d, rp[0], rp[1], rp[2]};
            relax(i + (size_t)longest,
                  pNew + cp->lenM[ps][longest - MATCH_LEN_MIN]
                      + cp->dist(longest, d - 1),
                  i, longest, d, nst, nreps);
            skipUntil = i + (size_t)longest;
          } else {
            for (int k = 0; k < cnt; k++) {
              int kl = pairs[k].len < maxLen ? pairs[k].len : maxLen;
              u32 d = pairs[k].dist;
              u32 nreps[4] = {d, rp[0], rp[1], rp[2]};
              for (; L <= kl; L++)
                relax(i + (size_t)L,
                      pNew + cp->lenM[ps][L - MATCH_LEN_MIN]
                          + cp->dist(L, d - 1),
                      i, L, d, nst, nreps);
              if (pairs[k].len >= maxLen) break;
            }
          }
        }
      } else if (abs + 4 <= n) {
        mf.insert(src, abs);  // long rep shortcut: skip the chain walk
      }
    }

    // chunk end: cheapest reachable node at or past the target
    size_t end = tgt;
    u32 bestP = 0xFFFFFFFFu;
    for (size_t i = tgt; i <= maxo; i++) {
      if (nd[i].from >= 0 && nd[i].price < bestP) {
        bestP = nd[i].price;
        end = i;
      }
    }

    // backtrack, then replay through the adaptive coder
    int steps = 0;
    for (size_t i = end; i > 0; i = (size_t)nd[i].from) path[steps++] = (i32)i;
    for (int k = steps - 1; k >= 0; k--) {
      OptNode& o = nd[path[k]];
      size_t abs = base + (size_t)nd[path[k]].from;
      int ps = (int)((u32)abs & posMask);
      if (o.dist == 0) {  // literal
        re.bit(&P.isMatch[state][ps], 0);
        enc_literal(re, P, src, abs, state, reps[0], src[abs]);
        state = state_after_lit(state);
      } else if (o.dist >= REP_MARK) {
        int r = (int)(o.dist - REP_MARK);
        re.bit(&P.isMatch[state][ps], 1);
        re.bit(&P.isRep[state], 1);
        if (r == 0) {
          re.bit(&P.isRepG0[state], 0);
          re.bit(&P.isRep0Long[state][ps], o.len == 1 ? 0 : 1);
        } else {
          re.bit(&P.isRepG0[state], 1);
          u32 d = reps[r];
          if (r == 1) {
            re.bit(&P.isRepG1[state], 0);
          } else {
            re.bit(&P.isRepG1[state], 1);
            re.bit(&P.isRepG2[state], r == 2 ? 0 : 1);
            if (r == 3) reps[3] = reps[2];
            reps[2] = reps[1];
          }
          reps[1] = reps[0];
          reps[0] = d;
        }
        if (o.len == 1) {
          state = state < 7 ? 9 : 11;
        } else {
          enc_len(re, P.repLen, ps, o.len);
          state = state < 7 ? 8 : 11;
        }
      } else {  // new match
        re.bit(&P.isMatch[state][ps], 1);
        re.bit(&P.isRep[state], 0);
        reps[3] = reps[2];
        reps[2] = reps[1];
        reps[1] = reps[0];
        reps[0] = o.dist;
        enc_len(re, P.matchLen, ps, o.len);
        enc_dist(re, P, o.len, o.dist - 1);
        state = state < 7 ? 7 : 10;
      }
    }
    // match-finder continuity for positions the DP never probed
    for (size_t q = tgt; q < end; q++)
      if (base + q + 4 <= n) mf.insert(src, base + q);
    pos = base + end;
  }
  free(nd);
  free(path);
  free(cp);
  return true;
}

static i64 lzma_encode(const u8* src, size_t n, u8* dst, size_t dstCap,
                       int level) {
  const int lc = 3, lp = 0, pb = 2;
  EncParams ep = eparams(level);
  if (dstCap < 13) return ERR_DST_SMALL;
  dst[0] = (u8)((pb * 5 + lp) * 9 + lc);
  u32 dsize = ep.dict;
  for (int i = 0; i < 4; i++) dst[1 + i] = (u8)(dsize >> (8 * i));
  for (int i = 0; i < 8; i++) dst[5 + i] = (u8)((u64)n >> (8 * i));

  Probs P;
  if (!P.alloc(lc, lp, pb)) return ERR_CORRUPT;

  if (ep.depth >= 48 && n <= btmf::BTMF_MAX_N) {
    // levels 6+: optimal parse over the binary-tree matcher (reach
    // analog of liblzma's bt4 at presets 6-9). Falls through to the
    // chain matcher if the tree allocation fails (2*i32*n).
    BtEncMF bmf;
    if (bmf.alloc(ep.dict, n, ep.depth >> 2)) {
      REnc re(dst + 13, dstCap - 13);
      bool ok = lzma_run_optimal(src, n, re, P, bmf, ep);
      re.flush();
      bmf.release();
      P.release();
      if (!ok) return ERR_CORRUPT;
      if (re.overflow) return ERR_DST_SMALL;
      return (i64)(13 + re.len);
    }
  }

  EncMF mf;
  if (!mf.alloc(ep.dict, ep.clog)) { P.release(); return ERR_CORRUPT; }
  REnc re(dst + 13, dstCap - 13);

  if (ep.depth >= 48) {  // levels 6+: price-based optimal parse
    bool ok = lzma_run_optimal(src, n, re, P, mf, ep);
    re.flush();
    mf.release();
    P.release();
    if (!ok) return ERR_CORRUPT;
    if (re.overflow) return ERR_DST_SMALL;
    return (i64)(13 + re.len);
  }

  u32 rep0 = 1, rep1 = 1, rep2 = 1, rep3 = 1;
  int state = 0;
  u32 posMask = (1u << pb) - 1;
  size_t pos = 0;
  size_t missRun = 0;  // miss-skip acceleration (fast levels)

  // one-position evaluation: best rep match + best chain match. Used by
  // the main loop and (at depth >= 16) the lazy lookahead.
  struct LzEval { int repLen, repIdx, nl; u32 nd; };
  auto evalPos = [&](size_t p, bool insert, int depth) -> LzEval {
    LzEval e{0, -1, 0, 0};
    if (p >= 1) {
      u32 reps[4] = {rep0, rep1, rep2, rep3};
      const u8* limit = src + (n - p > MATCH_LEN_MAX
                               ? p + MATCH_LEN_MAX : n);
      for (int r = 0; r < 4; r++) {
        if (reps[r] > p) continue;
        int l = ematch_len(src + p, src + p - reps[r], limit);
        // longer rep wins; prefer low rep index on ties
        if (l >= 2 && l > e.repLen) { e.repLen = l; e.repIdx = r; }
      }
    }
    if (p + 4 <= n) {
      e.nl = mf.find(src, p, n, depth, &e.nd);
      if (insert) mf.insert(src, p);
    }
    if (e.nl < 3) e.nl = 0;  // new matches below 3 rarely pay the distance
    return e;
  };
  const bool lazy = ep.depth >= 16;
  size_t cachePos = (size_t)-1;
  LzEval cacheEv{0, -1, 0, 0};

  while (pos < n) {
    int posState = (int)((u32)pos & posMask);
    int bestRepLen, bestRepIdx, nl;
    u32 nd;
    if (lazy) {
      LzEval e;
      if (pos == cachePos) {
        e = cacheEv;
        if (pos + 4 <= n) mf.insert(src, pos);
      } else {
        e = evalPos(pos, true, ep.depth);
      }
      // one-step lookahead: a longer candidate one byte ahead means this
      // position is better spent as a literal (the SDK's GetOptimum does
      // this with bit prices; length with a rep bonus is the cheap proxy)
      int eff = e.nl > e.repLen + 1 ? e.nl : e.repLen + 1;
      int niceGate = ep.depth >= 192 ? 48 : 32;
      if ((e.repLen >= 2 || e.nl >= 3) && eff < niceGate && pos + 1 < n) {
        LzEval e2 = evalPos(pos + 1, false, ep.depth);
        int eff2 = e2.nl > e2.repLen + 1 ? e2.nl : e2.repLen + 1;
        if (eff2 > eff + 1 || (e2.repLen > e.nl && e2.repLen + 1 > eff)) {
          cachePos = pos + 1;
          cacheEv = e2;
          re.bit(&P.isMatch[state][posState], 0);
          enc_literal(re, P, src, pos, state, rep0, src[pos]);
          state = state_after_lit(state);
          pos++;
          continue;
        }
      }
      bestRepLen = e.repLen;
      bestRepIdx = e.repIdx;
      nl = e.nl;
      nd = e.nd;
    } else {
      // greedy fast path with miss-skip: on long literal runs probe the
      // chain only every 2nd/4th position (the zstd/lz4 dynamic-step
      // idea — rep probes still run everywhere, so short periodic data
      // keeps its rep matches)
      int bestRepLen0 = 0, bestRepIdx0 = -1;
      if (pos >= 1) {
        u32 reps[4] = {rep0, rep1, rep2, rep3};
        const u8* limit = src + (n - pos > MATCH_LEN_MAX
                                 ? pos + MATCH_LEN_MAX : n);
        for (int r = 0; r < 4; r++) {
          if (reps[r] > pos) continue;
          int l = ematch_len(src + pos, src + pos - reps[r], limit);
          if (l >= 2 && l > bestRepLen0) { bestRepLen0 = l; bestRepIdx0 = r; }
        }
      }
      nd = 0;
      nl = 0;
      bool probe = true;
      if (ep.depth <= 12 && missRun > 64)
        probe = (pos % (missRun > 512 ? 4 : 2)) == 0;
      if (pos + 4 <= n && probe) {
        nl = mf.find(src, pos, n, ep.depth, &nd);
        mf.insert(src, pos);
      }
      if (nl < 3) nl = 0;
      bestRepLen = bestRepLen0;
      bestRepIdx = bestRepIdx0;
    }

    bool useRep = bestRepLen >= 2 &&
                  (bestRepLen + 1 >= nl || (bestRepIdx == 0 &&
                                            bestRepLen + 2 >= nl));
    if (useRep && bestRepLen >= 2) {
      // emit rep match
      re.bit(&P.isMatch[state][posState], 1);
      re.bit(&P.isRep[state], 1);
      u32 reps[4] = {rep0, rep1, rep2, rep3};
      if (bestRepIdx == 0) {
        re.bit(&P.isRepG0[state], 0);
        re.bit(&P.isRep0Long[state][posState], 1);
      } else {
        re.bit(&P.isRepG0[state], 1);
        if (bestRepIdx == 1) {
          re.bit(&P.isRepG1[state], 0);
        } else {
          re.bit(&P.isRepG1[state], 1);
          re.bit(&P.isRepG2[state], bestRepIdx == 2 ? 0 : 1);
          if (bestRepIdx == 3) rep3 = rep2;
          rep2 = rep1;
        }
        u32 d = reps[bestRepIdx];
        if (bestRepIdx >= 2) { /* rep2/rep3 rotation done above */ }
        rep1 = rep0;
        rep0 = d;
      }
      enc_len(re, P.repLen, posState, bestRepLen);
      state = state < 7 ? 8 : 11;
      // insert skipped positions into the match finder (sparse at fast
      // levels; the end-2 anchor keeps chains connected)
      size_t endp = pos + (size_t)bestRepLen;
      size_t istep = ep.depth <= 12 ? 2 : 1;
      for (size_t q = pos + 1; q + 4 <= n && q < endp; q += istep)
        mf.insert(src, q);
      if (istep > 1 && endp >= 2 && endp - 2 > pos && endp + 2 <= n)
        mf.insert(src, endp - 2);
      missRun = 0;
      pos = endp;
      continue;
    }
    if (nl >= 3) {
      int len = nl;
      u32 dist = nd;
      re.bit(&P.isMatch[state][posState], 1);
      re.bit(&P.isRep[state], 0);
      rep3 = rep2;
      rep2 = rep1;
      rep1 = rep0;
      rep0 = dist;
      enc_len(re, P.matchLen, posState, len);
      enc_dist(re, P, len, dist - 1);
      state = state < 7 ? 7 : 10;
      size_t endp = pos + (size_t)len;
      size_t istep = ep.depth <= 12 ? 2 : 1;
      for (size_t q = pos + 1; q + 4 <= n && q < endp; q += istep)
        mf.insert(src, q);
      if (istep > 1 && endp >= 2 && endp - 2 > pos && endp + 2 <= n)
        mf.insert(src, endp - 2);
      missRun = 0;
      pos = endp;
      continue;
    }
    // literal
    re.bit(&P.isMatch[state][posState], 0);
    enc_literal(re, P, src, pos, state, rep0, src[pos]);
    state = state_after_lit(state);
    pos++;
    missRun++;
  }
  re.flush();
  mf.release();
  P.release();
  if (re.overflow) return ERR_DST_SMALL;
  return (i64)(13 + re.len);
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Candidate-driven encode — the TPU match-finder-assist entry (SURVEY §7
// step 6; reference investment point: algos/lzma/LzFind.c hash chains +
// algos/common/aoclHashChain.h). The device pipeline
// (ops/lz4_device._find_matches + _grid_select) elects non-overlapping
// (pos, len, dist) sequences and ships ONLY those (~12 B each, about
// 0.5-1 B per input byte at LZMA-class ratios); this encoder range-codes
// them with NO host hash chains at all — rep-match probing in the gaps is
// the only remaining host search. Candidates are advisory: every one is
// re-validated (and truncated to its true common prefix) before use, so a
// device quirk can shorten a match but never corrupt the stream.
// ---------------------------------------------------------------------------
static i64 lzma_encode_cand(const u8* src, size_t n, u8* dst, size_t dstCap,
                            int level, const i64* cpos, const i32* clen,
                            const i32* cdist, i64 ncand) {
  const int lc = 3, lp = 0, pb = 2;
  EncParams ep = eparams(level);
  if (dstCap < 13) return ERR_DST_SMALL;
  dst[0] = (u8)((pb * 5 + lp) * 9 + lc);
  u32 dsize = ep.dict;
  for (int i = 0; i < 4; i++) dst[1 + i] = (u8)(dsize >> (8 * i));
  for (int i = 0; i < 8; i++) dst[5 + i] = (u8)((u64)n >> (8 * i));

  Probs P;
  if (!P.alloc(lc, lp, pb)) return ERR_CORRUPT;
  REnc re(dst + 13, dstCap - 13);

  u32 rep0 = 1, rep1 = 1, rep2 = 1, rep3 = 1;
  int state = 0;
  u32 posMask = (1u << pb) - 1;
  size_t pos = 0;
  i64 ci = 0;

  while (pos < n) {
    int posState = (int)((u32)pos & posMask);
    while (ci < ncand && (size_t)cpos[ci] < pos) ci++;
    // rep probes (cheap, run everywhere — they carry periodic data and
    // the short matches the device tier does not elect)
    int bestRepLen = 0, bestRepIdx = -1;
    if (pos >= 1) {
      u32 reps[4] = {rep0, rep1, rep2, rep3};
      const u8* limit = src + (n - pos > MATCH_LEN_MAX
                               ? pos + MATCH_LEN_MAX : n);
      for (int r = 0; r < 4; r++) {
        if (reps[r] > pos) continue;
        int l = ematch_len(src + pos, src + pos - reps[r], limit);
        if (l >= 2 && l > bestRepLen) { bestRepLen = l; bestRepIdx = r; }
      }
    }
    // device-elected candidate at this exact position (validated)
    int nl = 0;
    u32 nd = 0;
    if (ci < ncand && (size_t)cpos[ci] == pos) {
      u32 d = (u32)cdist[ci];
      int l = clen[ci];
      if (d >= 1 && d <= pos && l >= 2) {
        const u8* limit = src + (n - pos > MATCH_LEN_MAX
                                 ? pos + MATCH_LEN_MAX : n);
        // the true common prefix both validates the candidate AND
        // extends it past the device tile parse's match-length cap
        // (the device elects where; the host measures how long)
        int tl = ematch_len(src + pos, src + pos - d, limit);
        if (tl >= 3) { nl = tl; nd = d; }
      }
    }

    bool useRep = bestRepLen >= 2 &&
                  (bestRepLen + 1 >= nl || (bestRepIdx == 0 &&
                                            bestRepLen + 2 >= nl));
    if (useRep && bestRepLen >= 2) {
      re.bit(&P.isMatch[state][posState], 1);
      re.bit(&P.isRep[state], 1);
      u32 reps[4] = {rep0, rep1, rep2, rep3};
      if (bestRepIdx == 0) {
        re.bit(&P.isRepG0[state], 0);
        re.bit(&P.isRep0Long[state][posState], 1);
      } else {
        re.bit(&P.isRepG0[state], 1);
        if (bestRepIdx == 1) {
          re.bit(&P.isRepG1[state], 0);
        } else {
          re.bit(&P.isRepG1[state], 1);
          re.bit(&P.isRepG2[state], bestRepIdx == 2 ? 0 : 1);
          if (bestRepIdx == 3) rep3 = rep2;
          rep2 = rep1;
        }
        u32 d = reps[bestRepIdx];
        rep1 = rep0;
        rep0 = d;
      }
      enc_len(re, P.repLen, posState, bestRepLen);
      state = state < 7 ? 8 : 11;
      pos += (size_t)bestRepLen;
      continue;
    }
    if (nl >= 3) {
      re.bit(&P.isMatch[state][posState], 1);
      re.bit(&P.isRep[state], 0);
      rep3 = rep2;
      rep2 = rep1;
      rep1 = rep0;
      rep0 = nd;
      enc_len(re, P.matchLen, posState, nl);
      enc_dist(re, P, nl, nd - 1);
      state = state < 7 ? 7 : 10;
      pos += (size_t)nl;
      continue;
    }
    re.bit(&P.isMatch[state][posState], 0);
    enc_literal(re, P, src, pos, state, rep0, src[pos]);
    state = state_after_lit(state);
    pos++;
  }
  re.flush();
  P.release();
  if (re.overflow) return ERR_DST_SMALL;
  return (i64)(13 + re.len);
}

ATPU_EXPORT i64 atpu_lzma_compress(const u8* src, size_t n, u8* dst,
                                   size_t dstCap, int level) {
  return lzma_encode(src, n, dst, dstCap, level);
}

ATPU_EXPORT i64 atpu_lzma_compress_cand(const u8* src, size_t n, u8* dst,
                                        size_t dstCap, int level,
                                        const i64* cpos, const i32* clen,
                                        const i32* cdist, i64 ncand) {
  return lzma_encode_cand(src, n, dst, dstCap, level, cpos, clen, cdist,
                          ncand);
}

ATPU_EXPORT i64 atpu_lzma_decompress(const u8* src, size_t n, u8* dst,
                                     size_t dstCap) {
  if (n < 13) return ERR_CORRUPT;
  u8 props = src[0];
  if (props >= 9 * 5 * 5) return ERR_CORRUPT;
  int lc = props % 9;
  int rem = props / 9;
  int lp = rem % 5;
  int pb = rem / 5;
  u64 unpack = 0;
  for (int i = 0; i < 8; i++) unpack |= (u64)src[5 + i] << (8 * i);
  bool sizeKnown = unpack != 0xFFFFFFFFFFFFFFFFULL;
  if (sizeKnown && unpack > dstCap) return ERR_DST_SMALL;
  Probs P;
  if (!P.alloc(lc, lp, pb)) return ERR_CORRUPT;
  RDec rd;
  i64 r;
  if (!rd.init(src + 13, src + n)) {
    r = ERR_CORRUPT;
  } else {
    r = lzma_decode_raw(P, rd, dst, dstCap, unpack, sizeKnown);
  }
  P.release();
  return r;
}

// declared uncompressed size (-1 unknown, -10 corrupt header)
ATPU_EXPORT i64 atpu_lzma_unpacked_size(const u8* src, size_t n) {
  if (n < 13) return -10;
  u64 unpack = 0;
  for (int i = 0; i < 8; i++) unpack |= (u64)src[5 + i] << (8 * i);
  if (unpack == 0xFFFFFFFFFFFFFFFFULL) return -1;
  if (unpack > (1ULL << 62)) return -10;
  return (i64)unpack;
}

// ---------------------------------------------------------------------------
// LZMA2 chunk decoding with carried state (full stock-xz continuation:
// chunks without dict/state reset reference the prior output and keep the
// probability model; reference capability: liblzma's lzma2_decoder)
// ---------------------------------------------------------------------------
namespace {
struct Lzma2Ctx {
  Probs P;
  u32 reps[4];
  int state;
  bool alive;  // P allocated
};
}  // namespace

ATPU_EXPORT void* atpu_lzma2_ctx_new() {
  Lzma2Ctx* c = (Lzma2Ctx*)calloc(1, sizeof(Lzma2Ctx));
  return c;
}

ATPU_EXPORT void atpu_lzma2_ctx_free(void* p) {
  Lzma2Ctx* c = (Lzma2Ctx*)p;
  if (!c) return;
  if (c->alive) c->P.release();
  free(c);
}

// Decode one LZMA2 LZMA chunk. dst holds ALL prior block output; op0 is
// where this chunk's bytes begin (dictionary = dst[0..op0)). props: the
// packed lc/lp/pb byte, or -1 to keep the current ones. reset_state != 0
// reinitializes reps/state/probability model. Returns bytes produced.
ATPU_EXPORT i64 atpu_lzma2_decode_chunk(void* pctx, const u8* src, size_t n,
                                        u8* dst, size_t dstCap, size_t op0,
                                        u64 usize, int props,
                                        int reset_state, size_t dict_base) {
  Lzma2Ctx* c = (Lzma2Ctx*)pctx;
  if (!c || op0 + usize > dstCap) return ERR_CORRUPT;
  if (props >= 0) {
    if (props >= 9 * 5 * 5) return ERR_CORRUPT;
    if (c->alive) c->P.release();
    c->alive = false;
    int lc = props % 9;
    int rem = props / 9;
    if (!c->P.alloc(lc, rem % 5, rem / 5)) return ERR_CORRUPT;
    c->alive = true;
    reset_state = 1;  // new props imply a state reset
  }
  if (!c->alive) return ERR_CORRUPT;  // chunk before any props
  if (reset_state) {
    c->P.reset();
    c->reps[0] = c->reps[1] = c->reps[2] = c->reps[3] = 1;
    c->state = 0;
  }
  RDec rd;
  if (!rd.init(src, src + n)) return ERR_CORRUPT;
  i64 r = lzma_decode_raw_state(c->P, rd, dst, dstCap, op0 + usize, true,
                                op0, c->reps, &c->state, dict_base);
  if (r < 0) return r;
  return r - (i64)op0;
}

// An uncompressed LZMA2 chunk resets the LZMA state (spec) — the caller
// copies the bytes itself and calls this to mark the reset.
ATPU_EXPORT void atpu_lzma2_mark_uncompressed(void* pctx) {
  Lzma2Ctx* c = (Lzma2Ctx*)pctx;
  if (c && c->alive) {
    c->P.reset();
    c->reps[0] = c->reps[1] = c->reps[2] = c->reps[3] = 1;
    c->state = 0;
  }
}
