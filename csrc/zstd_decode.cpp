// Own zstd frame decoder (RFC 8878) — no third-party code.
//
// Replaces the round-1 delegate to the `zstandard` pip package for every
// decompression path (VERDICT item 3). Decodes stock-zstd frames, our
// device-pipeline frames (ops/zstd_device.py), skippable frames, and
// frames using structured or raw-content dictionaries.
//
// Capability parity target: /root/reference/algos/zstd/lib/decompress/
// zstd_decompress.c (frame loop, :1252-1330), zstd_decompress_block.c
// (literals + sequences), huf_decompress.c (Huffman), and the FSE ncount
// reader in lib/common/entropy_common.c. This file is an independent
// implementation from the spec; conventions (canonical Huffman ordering,
// FSE state spread, backward bitstreams) cross-checked against our own
// encoder in aocl_compression_tpu/codecs/zstd_format.py.

#include <cstdint>
#include <cstring>
#include <cstdlib>

#define ATPU_EXPORT extern "C" __attribute__((visibility("default")))

// Stage profiling (build with -DATPU_PROF; zero-cost otherwise). Cycle
// totals for the literal-decode and sequence-execute halves of
// decode_block, read back via atpu_zstd_prof().
#ifdef ATPU_PROF
#include <x86intrin.h>
static unsigned long long g_prof[4];  // lit, seq, hufTable, fseTables
#define PROF_T0() unsigned long long _t0 = __rdtsc()
#define PROF_ADD(slot) (g_prof[slot] += __rdtsc() - _t0, _t0 = __rdtsc())
ATPU_EXPORT void atpu_zstd_prof(unsigned long long* out) {
  for (int i = 0; i < 4; i++) { out[i] = g_prof[i]; g_prof[i] = 0; }
}
#else
#define PROF_T0() ((void)0)
#define PROF_ADD(slot) ((void)0)
#endif

namespace {

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef int32_t i32;
typedef uint64_t u64;
typedef long long i64;

// error codes (negative returns through the C API)
enum {
  ERR_CORRUPT = -1,
  ERR_DST_SMALL = -2,
  ERR_DICT = -3,
  ERR_CHECKSUM = -4,
};

static inline int highbit32(u32 v) { return 31 - __builtin_clz(v); }

// ---------------------------------------------------------------------------
// XXH64 (checksum verification; spec constants)
// ---------------------------------------------------------------------------
static const u64 P1 = 0x9E3779B185EBCA87ULL, P2 = 0xC2B2AE3D27D4EB4FULL,
                 P3 = 0x165667B19E3779F9ULL, P4 = 0x85EBCA77C2B2AE63ULL,
                 P5 = 0x27D4EB2F165667C5ULL;

static inline u64 rotl64(u64 x, int r) { return (x << r) | (x >> (64 - r)); }
static inline u64 rd64le(const u8* p) { u64 v; memcpy(&v, p, 8); return v; }
static inline u32 rd32le(const u8* p) { u32 v; memcpy(&v, p, 4); return v; }
static inline u16 rd16le(const u8* p) { u16 v; memcpy(&v, p, 2); return v; }

static u64 xxh64(const u8* p, size_t len, u64 seed) {
  const u8* end = p + len;
  u64 h;
  if (len >= 32) {
    u64 v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const u8* limit = end - 32;
    do {
      v1 = rotl64(v1 + rd64le(p) * P2, 31) * P1; p += 8;
      v2 = rotl64(v2 + rd64le(p) * P2, 31) * P1; p += 8;
      v3 = rotl64(v3 + rd64le(p) * P2, 31) * P1; p += 8;
      v4 = rotl64(v4 + rd64le(p) * P2, 31) * P1; p += 8;
    } while (p <= limit);
    h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
    u64 vs[4] = {v1, v2, v3, v4};
    for (int i = 0; i < 4; i++) {
      h ^= rotl64(vs[i] * P2, 31) * P1;
      h = h * P1 + P4;
    }
  } else {
    h = seed + P5;
  }
  h += (u64)len;
  while (p + 8 <= end) {
    h ^= rotl64(rd64le(p) * P2, 31) * P1;
    h = rotl64(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (u64)rd32le(p) * P1;
    h = rotl64(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p++) * P5;
    h = rotl64(h, 11) * P1;
  }
  h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
  return h;
}

// ---------------------------------------------------------------------------
// Bit readers. Bits are numbered LSB-first within the byte stream; codes
// were accumulated little-endian by the encoder. The backward reader
// consumes from the sentinel bit (highest set bit of the last byte) down.
// ---------------------------------------------------------------------------

static inline u64 bits_range(const u8* base, const u8* bend, i64 lo, int n) {
  // value of bits [lo, lo+n) with zero-fill below bit 0
  if (n <= 0) return 0;
  int pre = 0;
  if (lo < 0) {
    pre = (int)(-lo);
    if (pre >= n) return 0;
    lo = 0;
    n -= pre;
  }
  const u8* p = base + (lo >> 3);
  u64 v = 0;
  size_t avail = (p < bend) ? (size_t)(bend - p) : 0;
  memcpy(&v, p, avail > 8 ? 8 : avail);
  v >>= (lo & 7);
  if (n < 64) v &= ((1ULL << n) - 1);
  return v << pre;
}

struct BackReader {
  const u8* base;
  const u8* bend;
  i64 pos;     // number of unread payload bits
  i64 safe8;   // lowest bit offset whose byte window [lo>>3, +8) is in-buffer
  bool ok;

  bool init(const u8* src, size_t size) {
    base = src;
    bend = src + size;
    ok = true;
    safe8 = ((i64)size - 8) * 8;  // lo>>3 <= size-8  <=>  lo < (size-7)*8
    if (size == 0 || src[size - 1] == 0) { ok = false; pos = 0; return false; }
    pos = (i64)(size - 1) * 8 + highbit32(src[size - 1]);
    return true;
  }
  // bits [lo, lo+n): one unaligned load when the 8-byte window fits; the
  // bounded bits_range path only runs within the first 7 bytes of the
  // buffer (stream end — it is read backwards) or past the start
  inline u64 at(i64 lo, int n) const {
    if (lo >= 0 && lo <= safe8) {
      u64 v;
      memcpy(&v, base + (lo >> 3), 8);
      v >>= (lo & 7);
      return v & ((1ULL << n) - 1);
    }
    return bits_range(base, bend, lo, n);
  }
  inline u64 read(int n) {  // consume n bits (zero-filled past start)
    pos -= n;
    return at(pos, n);
  }
  inline u64 peek(int n) const { return at(pos - n, n); }
  inline void skip(int n) { pos -= n; }
  bool finished() const { return pos == 0; }
  bool overflowed() const { return pos < 0; }
};

// Backward reader with a register-resident 64-bit window: the sequence
// loop reads up to ~9 bit fields per sequence, and each BackReader::at is
// a guarded unaligned load — here the common read is two shifts and a
// mask, with one reload per ~56 consumed bits (the reference's
// BIT_DStream_t recast, lib/common/bitstream.h).
struct RegBack {
  const u8* base;
  const u8* bend;
  i64 pos;    // unread payload bits
  u64 cache;  // bits [cbit, cbit + 64)
  i64 cbit;
  bool ok;

  bool init(const u8* src, size_t size) {
    base = src;
    bend = src + size;
    ok = true;
    cache = 0;
    if (size == 0 || src[size - 1] == 0) { ok = false; pos = 0; return false; }
    pos = (i64)(size - 1) * 8 + highbit32(src[size - 1]);
    cbit = pos + 1;  // force a reload on the first read
    return true;
  }
  inline u64 read(int n) {  // n in [0, 56]
    i64 lo = pos - n;
    pos = lo;
    if (lo < cbit) {
      if (lo < 0) return 0;  // overflow: caller checks overflowed()
      // re-center so the window covers the read's top bit (lo + n) and
      // extends as far down as possible: [cbyte*8, cbyte*8 + 64)
      i64 cbyte = ((lo + n) >> 3) - 7;
      if (cbyte < 0) cbyte = 0;
      if (base + cbyte + 8 <= bend) {
        memcpy(&cache, base + cbyte, 8);
      } else {
        cache = 0;
        size_t avail = (size_t)(bend - (base + cbyte));
        memcpy(&cache, base + cbyte, avail > 8 ? 8 : avail);
      }
      cbit = cbyte * 8;
    }
    return (cache >> (lo - cbit)) & ((1ULL << n) - 1);
  }
  // Unconditional branch-free window refill. Caller guarantees pos >= 56;
  // then bits [cbit, pos) with pos - cbit >= 56 are readable via readFast.
  // In-bounds: pos <= size*8 - 1 always, so cbyte + 8 = (pos>>3)+1 <= size.
  inline void refill() {
    i64 cbyte = (pos >> 3) - 7;
    memcpy(&cache, base + cbyte, 8);
    cbit = cbyte * 8;
  }
  inline u64 readFast(int n) {  // requires a refill() window covering n bits
    i64 lo = pos - n;
    pos = lo;
    return (cache >> (lo - cbit)) & ((1ULL << n) - 1);
  }
  bool finished() const { return pos == 0; }
  bool overflowed() const { return pos < 0; }
};

struct FwdReader {
  const u8* base;
  const u8* bend;
  i64 pos = 0;

  FwdReader(const u8* p, const u8* e) : base(p), bend(e) {}
  u64 read(int n) { u64 v = bits_range(base, bend, pos, n); pos += n; return v; }
  u64 peek(int n) const { return bits_range(base, bend, pos, n); }
  void skip(int n) { pos += n; }
  size_t bytes_used() const { return (size_t)((pos + 7) >> 3); }
};

// ---------------------------------------------------------------------------
// FSE decode tables
// ---------------------------------------------------------------------------

static const int FSE_MAX_LOG = 9;          // LL/ML <= 9, OF <= 8, weights <= 6
static const int FSE_MAX_SYMBS = 256;

struct FSEDec {
  u16 base[1 << FSE_MAX_LOG];   // new state base
  u8 sym[1 << FSE_MAX_LOG];
  u8 nb[1 << FSE_MAX_LOG];
  u32 ent[1 << FSE_MAX_LOG];    // packed base<<16 | nb<<8 | sym: the
                                // sequence loop reads one word per state
  int log = -1;
};

// Parse a normalized-count header (forward bitstream). Returns header size
// in bytes, or <0. norm[] gets counts (-1 = less-than-1 probability).
static int parse_ncount(const u8* src, size_t srcSize, short* norm,
                        int maxSym, int maxLog, int* tableLogOut,
                        int* lastSymOut) {
  if (srcSize < 1) return ERR_CORRUPT;
  FwdReader br(src, src + srcSize);
  int tl = (int)br.read(4) + 5;
  if (tl > maxLog) return ERR_CORRUPT;
  int remaining = (1 << tl) + 1;
  int threshold = 1 << tl;
  int nbbits = tl + 1;
  int s = 0;
  bool prev0 = false;
  memset(norm, 0, sizeof(short) * (maxSym + 1));
  while (remaining > 1) {
    if (s > maxSym) return ERR_CORRUPT;
    if (prev0) {
      for (;;) {
        int v = (int)br.read(2);
        if (v == 3) { s += 3; if (s > maxSym + 1) return ERR_CORRUPT; }
        else { s += v; break; }
      }
      if (s > maxSym) return ERR_CORRUPT;
      prev0 = false;
      continue;
    }
    int maxv = (2 * threshold - 1) - remaining;
    int count;
    int low = (int)(br.peek(nbbits) & (u32)(threshold - 1));
    if (low < maxv) {
      count = low;
      br.skip(nbbits - 1);
    } else {
      int full = (int)(br.peek(nbbits) & (u32)(2 * threshold - 1));
      if (full >= threshold) full -= maxv;
      count = full;
      br.skip(nbbits);
    }
    count -= 1;  // -1 = low-probability
    remaining -= count < 0 ? -count : count;
    norm[s++] = (short)count;
    prev0 = (count == 0);
    while (remaining < threshold && remaining > 1) { nbbits--; threshold >>= 1; }
  }
  if (remaining != 1) return ERR_CORRUPT;
  if (br.bytes_used() > srcSize) return ERR_CORRUPT;
  *tableLogOut = tl;
  *lastSymOut = s - 1;
  return (int)br.bytes_used();
}

// Build a decode table from normalized counts (the canonical spread).
static int fse_build(FSEDec* t, const short* norm, int lastSym, int tableLog) {
  if (tableLog > FSE_MAX_LOG) return ERR_CORRUPT;
  int size = 1 << tableLog;
  int hi = size - 1;
  u16 symbolNext[FSE_MAX_SYMBS];
  // low-probability symbols parked at the table end (state count 1,
  // transition reads a full tableLog bits)
  for (int sy = 0; sy <= lastSym; sy++) {
    if (norm[sy] == -1) {
      t->sym[hi--] = (u8)sy;
      symbolNext[sy] = 1;
    } else {
      symbolNext[sy] = (u16)norm[sy];
    }
  }
  int pos = 0;
  int step = (size >> 1) + (size >> 3) + 3;
  int mask = size - 1;
  for (int sy = 0; sy <= lastSym; sy++) {
    for (int k = 0; k < norm[sy]; k++) {
      t->sym[pos] = (u8)sy;
      pos = (pos + step) & mask;
      while (pos > hi) pos = (pos + step) & mask;
    }
  }
  if (pos != 0) return ERR_CORRUPT;
  for (int st = 0; st < size; st++) {
    u8 sy = t->sym[st];
    u16 next = symbolNext[sy]++;  // >= 1 always (count or parked lowprob)
    int nb = tableLog - highbit32(next);
    t->nb[st] = (u8)nb;
    t->base[st] = (u16)((next << nb) - size);
    t->ent[st] = ((u32)t->base[st] << 16) | ((u32)nb << 8) | sy;
  }
  t->log = tableLog;
  return 0;
}

static void fse_rle(FSEDec* t, u8 symbol) {
  t->log = 0;
  t->sym[0] = symbol;
  t->nb[0] = 0;
  t->base[0] = 0;
  t->ent[0] = symbol;
}

// ---------------------------------------------------------------------------
// Huffman
// ---------------------------------------------------------------------------

static const int HUF_MAX_LOG = 11;

struct HufDec {
  // packed entries: symbol | (bits << 8) — one load per decoded symbol
  // (split sym[]/nb[] arrays cost two)
  u16 ent[1 << HUF_MAX_LOG];
  int log = -1;
};

// Decode the weight stream (direct nibbles or FSE-compressed) and build the
// single-level decode table. Returns bytes consumed from src, or <0.
static int huf_read_table(HufDec* h, const u8* src, size_t srcSize) {
  if (srcSize < 1) return ERR_CORRUPT;
  int hb = src[0];
  u8 weights[256];
  int nweights;
  size_t used;
  if (hb >= 128) {
    nweights = hb - 127;
    used = 1 + (size_t)((nweights + 1) / 2);
    if (used > srcSize) return ERR_CORRUPT;
    for (int i = 0; i < nweights; i++) {
      u8 b = src[1 + i / 2];
      weights[i] = (i & 1) ? (b & 0x0F) : (b >> 4);
    }
  } else {
    size_t csize = (size_t)hb;
    if (1 + csize > srcSize) return ERR_CORRUPT;
    const u8* ws = src + 1;
    short norm[256];
    int tl, lastSym;
    int hdr = parse_ncount(ws, csize, norm, 255, 6, &tl, &lastSym);
    if (hdr < 0) return hdr;
    FSEDec ft;
    if (fse_build(&ft, norm, lastSym, tl) < 0) return ERR_CORRUPT;
    BackReader br;
    if (!br.init(ws + hdr, csize - hdr)) return ERR_CORRUPT;
    int s1 = (int)br.read(tl);
    int s2 = (int)br.read(tl);
    if (br.overflowed()) return ERR_CORRUPT;
    // two interleaved states; when a transition would overrun the stream,
    // the other state emits its final symbol and decoding stops
    nweights = 0;
    for (;;) {
      if (nweights >= 255) return ERR_CORRUPT;
      weights[nweights++] = ft.sym[s1];
      int nb = ft.nb[s1];
      if (br.pos < nb) { // s1 cannot update: flush s2 and stop
        if (nweights >= 255) return ERR_CORRUPT;
        weights[nweights++] = ft.sym[s2];
        break;
      }
      s1 = ft.base[s1] + (int)br.read(nb);
      int t = s1; s1 = s2; s2 = t;
    }
    used = 1 + csize;
  }
  if (nweights < 1 || nweights > 255) return ERR_CORRUPT;
  // implied last weight completes the Kraft sum to a power of two
  u32 total = 0;
  for (int i = 0; i < nweights; i++) {
    if (weights[i] > HUF_MAX_LOG) return ERR_CORRUPT;
    if (weights[i]) total += 1u << (weights[i] - 1);
  }
  if (total == 0) return ERR_CORRUPT;
  int tableLog = highbit32(total) + 1;
  if (tableLog > HUF_MAX_LOG) return ERR_CORRUPT;
  u32 rest = (1u << tableLog) - total;
  if (rest == 0 || (rest & (rest - 1))) return ERR_CORRUPT;  // must be 2^k
  int lastW = highbit32(rest) + 1;
  int nsym = nweights + 1;
  if (nsym > 256) return ERR_CORRUPT;
  u8 wts[257];
  memcpy(wts, weights, nweights);
  wts[nweights] = (u8)lastW;

  // canonical fill: weight ascending (longest codes first), natural symbol
  // order within a weight; symbol of weight w spans 2^(w-1) table cells
  int pos = 0;
  for (int w = 1; w <= tableLog; w++) {
    int span = 1 << (w - 1);
    for (int sy = 0; sy < nsym; sy++) {
      if (wts[sy] != w) continue;
      if (pos + span > (1 << tableLog)) return ERR_CORRUPT;
      u16 e = (u16)sy | ((u16)(tableLog + 1 - w) << 8);
      for (int q = 0; q < span; q++) h->ent[pos + q] = e;
      pos += span;
    }
  }
  if (pos != (1 << tableLog)) return ERR_CORRUPT;
  h->log = tableLog;
  return (int)used;
}

static int huf_decode_stream(const HufDec* h, const u8* src, size_t srcSize,
                             u8* dst, size_t outLen) {
  BackReader br;
  if (!br.init(src, srcSize)) return ERR_CORRUPT;
  int log = h->log;
  for (size_t i = 0; i < outLen; i++) {
    u16 e = h->ent[br.peek(log)];
    dst[i] = (u8)e;
    br.skip(e >> 8);
    if (br.pos < 0) return ERR_CORRUPT;
  }
  if (!br.finished()) return ERR_CORRUPT;
  return 0;
}

// Four independent bitstreams decoded in lockstep: each stream keeps its
// bit window in a register and decodes FIVE symbols per one unconditional
// refill (5 * HUF_MAX_LOG = 55 <= 56 guaranteed window bits after
// RegBack::refill), with the four streams' chains interleaved for ILP.
// The reference ships this loop as hand-written assembly
// (algos/zstd/lib/decompress/huf_decompress_amd64.S, 4 streams x 5 symbols
// per reload); this is the C++ recast of the same schedule — the previous
// per-symbol guarded-load peek (BackReader::at) cost a branch + address
// recompute on every symbol of every stream.
static int huf_decode_4streams(const HufDec* h, const u8* sp,
                               const size_t ss[4], u8* litBuf,
                               const size_t lens[4]) {
  RegBack br[4];
  u8* out[4];
  size_t off = 0;
  const u8* p = sp;
  for (int i = 0; i < 4; i++) {
    if (!br[i].init(p, ss[i])) return ERR_CORRUPT;
    out[i] = litBuf + off;
    off += lens[i];
    p += ss[i];
  }
  const int log = h->log;
  const u16* const ent = h->ent;
  const u32 mask = (1u << log) - 1;
  size_t n = lens[3];  // lens[0..2] == q >= lens[3]
  for (int i = 0; i < 3; i++) if (lens[i] < n) n = lens[i];
  size_t i = 0;
  while (i + 5 <= n && br[0].pos >= 56 && br[1].pos >= 56 &&
         br[2].pos >= 56 && br[3].pos >= 56) {
    br[0].refill(); br[1].refill(); br[2].refill(); br[3].refill();
    // local copies keep the hot state in registers across the unroll
    u64 c0 = br[0].cache, c1 = br[1].cache, c2 = br[2].cache,
        c3 = br[3].cache;
    i64 p0 = br[0].pos - br[0].cbit, p1 = br[1].pos - br[1].cbit,
        p2 = br[2].pos - br[2].cbit, p3 = br[3].pos - br[3].cbit;
    u8* o0 = out[0] + i; u8* o1 = out[1] + i;
    u8* o2 = out[2] + i; u8* o3 = out[3] + i;
    for (int j = 0; j < 5; j++) {
      u16 e0 = ent[(u32)(c0 >> (p0 - log)) & mask];
      u16 e1 = ent[(u32)(c1 >> (p1 - log)) & mask];
      u16 e2 = ent[(u32)(c2 >> (p2 - log)) & mask];
      u16 e3 = ent[(u32)(c3 >> (p3 - log)) & mask];
      o0[j] = (u8)e0; p0 -= e0 >> 8;
      o1[j] = (u8)e1; p1 -= e1 >> 8;
      o2[j] = (u8)e2; p2 -= e2 >> 8;
      o3[j] = (u8)e3; p3 -= e3 >> 8;
    }
    br[0].pos = p0 + br[0].cbit; br[1].pos = p1 + br[1].cbit;
    br[2].pos = p2 + br[2].cbit; br[3].pos = p3 + br[3].cbit;
    i += 5;
  }
  // checked tail: per-stream guarded reads finish each stream exactly
  for (int k = 0; k < 4; k++) {
    BackReader cb;
    cb.base = br[k].base;
    cb.bend = br[k].bend;
    cb.ok = true;
    cb.pos = br[k].pos;
    cb.safe8 = ((i64)(br[k].bend - br[k].base) - 8) * 8;
    for (size_t j = i; j < lens[k]; j++) {
      u16 e = ent[cb.peek(log)];
      out[k][j] = (u8)e;
      cb.skip(e >> 8);
      if (cb.pos < 0) return ERR_CORRUPT;
    }
    if (!cb.finished()) return ERR_CORRUPT;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Sequences
// ---------------------------------------------------------------------------

static const u32 LL_BASE[36] = {
  0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20, 22, 24,
  28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
  65536};
static const u8 LL_BITS[36] = {
  0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
  4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};
static const u32 ML_BASE[53] = {
  3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22,
  23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37, 39, 41, 43, 47,
  51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051, 4099, 8195, 16387, 32771,
  65539};
static const u8 ML_BITS[53] = {
  0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
  11, 12, 13, 14, 15, 16};

// RFC 8878 predefined distributions
static const short LL_DEF[36] = {4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1,
  1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1};
static const short ML_DEF[53] = {1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1};
static const short OF_DEF[29] = {1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1};

// ---------------------------------------------------------------------------
// Frame decoding context
// ---------------------------------------------------------------------------

struct DCtx {
  HufDec huf;                 // persists across blocks (treeless literals)
  FSEDec ll, of, ml;
  bool llV = false, ofV = false, mlV = false;
  u32 rep[3] = {1, 4, 8};
  const u8* dictContent = nullptr;
  size_t dictLen = 0;
  u32 dictID = 0;
};

// Parse a structured dictionary (magic 0xEC30A437): entropy tables
// (Huffman, then OF/ML/LL FSE), 3 rep offsets, then content.
// Raw-content dictionaries are any buffer without the magic.
static int load_dict(DCtx* ctx, const u8* dict, size_t dictSize) {
  if (dictSize == 0) return 0;
  if (dictSize < 8 || rd32le(dict) != 0xEC30A437u) {
    ctx->dictContent = dict;
    ctx->dictLen = dictSize;
    return 0;
  }
  ctx->dictID = rd32le(dict + 4);
  const u8* p = dict + 8;
  const u8* end = dict + dictSize;
  int used = huf_read_table(&ctx->huf, p, (size_t)(end - p));
  if (used < 0) return ERR_DICT;
  p += used;
  struct { FSEDec* t; int maxSym; int maxLog; bool* v; } specs[3] = {
    {&ctx->of, 31, 8, &ctx->ofV},
    {&ctx->ml, 52, 9, &ctx->mlV},
    {&ctx->ll, 35, 9, &ctx->llV},
  };
  for (int i = 0; i < 3; i++) {
    short norm[256];
    int tl, lastSym;
    int hdr = parse_ncount(p, (size_t)(end - p), norm, specs[i].maxSym,
                           specs[i].maxLog, &tl, &lastSym);
    if (hdr < 0) return ERR_DICT;
    if (fse_build(specs[i].t, norm, lastSym, tl) < 0) return ERR_DICT;
    *specs[i].v = true;
    p += hdr;
  }
  if (end - p < 12) return ERR_DICT;
  for (int i = 0; i < 3; i++) {
    ctx->rep[i] = rd32le(p);
    p += 4;
    if (ctx->rep[i] == 0) return ERR_DICT;
  }
  ctx->dictContent = p;
  ctx->dictLen = (size_t)(end - p);
  return 0;
}

// copy `len` bytes from `offset` back (possibly reaching into the dict
// prefix); overlap-safe forward byte copy
static int match_copy(u8* dst, size_t pos, size_t dstLen, u32 offset,
                      size_t len, const DCtx* ctx) {
  if (pos + len > dstLen) return ERR_DST_SMALL;
  if (offset == 0) return ERR_CORRUPT;
  if ((size_t)offset > pos) {
    size_t fromDict = (size_t)offset - pos;
    if (fromDict > ctx->dictLen) return ERR_CORRUPT;
    const u8* dsrc = ctx->dictContent + (ctx->dictLen - fromDict);
    size_t n = fromDict < len ? fromDict : len;
    memcpy(dst + pos, dsrc, n);
    pos += n;
    len -= n;
    if (len == 0) return 0;
    offset = (u32)pos;  // continue from the start of dst
  }
  u8* op = dst + pos;
  const u8* ip = op - offset;
  u8* const oend = op + len;
  if (offset >= 16) {
    while (len >= 16) { memcpy(op, ip, 16); op += 16; ip += 16; len -= 16; }
    while (len--) *op++ = *ip++;
    return 0;
  }
  if (offset >= 8) {
    // 8-byte wildcopy is overlap-safe at distance >= 8; the final partial
    // chunk is done bytewise to stay inside dstCap
    while (len >= 8) { memcpy(op, ip, 8); op += 8; ip += 8; len -= 8; }
    while (len--) *op++ = *ip++;
    return 0;
  }
  // small offset: materialize 8 bytes of the period bytewise, then read
  // from the smallest multiple of the offset that is >= 8 back — that
  // window repeats identically and no longer overlaps the 8-byte writes
  {
    int k = (8 + (int)offset - 1) / (int)offset;
    size_t gap = (size_t)k * offset;
    u8* bw_end = op + (len < 8 ? len : 8);
    while (op < bw_end) { *op = *(op - offset); op++; }
    const u8* ip2 = op - gap;
    while (oend - op >= 8) { memcpy(op, ip2, 8); op += 8; ip2 += 8; }
    while (op < oend) { *op = *(op - offset); op++; }
  }
  return 0;
}

struct SeqTables { FSEDec* ll; FSEDec* of; FSEDec* ml; };

// Decode one compressed block into dst at position *posInOut.
static i64 decode_block(DCtx* ctx, const u8* src, size_t srcSize, u8* dst,
                        size_t dstCap, size_t pos, u8* litBuf) {
  PROF_T0();
  // ---- literals section ----
  if (srcSize < 1) return ERR_CORRUPT;
  int type = src[0] & 3;
  int sizeFmt = (src[0] >> 2) & 3;
  size_t regen = 0, csize = 0, lhSize = 0;
  const u8* lit = nullptr;
  u8 rleByte = 0;
  bool treeless = false;

  if (type == 0 || type == 1) {  // raw / RLE
    if (sizeFmt == 0 || sizeFmt == 2) { lhSize = 1; regen = src[0] >> 3; }
    else if (sizeFmt == 1) {
      if (srcSize < 2) return ERR_CORRUPT;
      lhSize = 2; regen = (rd16le(src) >> 4);
    } else {
      if (srcSize < 3) return ERR_CORRUPT;
      lhSize = 3;
      regen = ((u32)src[0] >> 4) | ((u32)src[1] << 4) | ((u32)src[2] << 12);
    }
    if (type == 0) {
      if (lhSize + regen > srcSize) return ERR_CORRUPT;
      lit = src + lhSize;
      csize = regen;
    } else {
      if (lhSize + 1 > srcSize) return ERR_CORRUPT;
      rleByte = src[lhSize];
      csize = 1;
      if (regen <= (1u << 17)) {
        // materialize small RLE literal runs once — the sequence loop
        // then runs branch-free on `lit` like any other block type
        memset(litBuf, rleByte, regen);
        lit = litBuf;
        type = 0;
      }
    }
  } else {  // Huffman compressed (2) / treeless (3)
    treeless = (type == 3);
    u32 h;
    if (sizeFmt == 0 || sizeFmt == 1) {
      if (srcSize < 3) return ERR_CORRUPT;
      h = (u32)src[0] | ((u32)src[1] << 8) | ((u32)src[2] << 16);
      lhSize = 3;
      regen = (h >> 4) & 0x3FF;
      csize = (h >> 14) & 0x3FF;
    } else if (sizeFmt == 2) {
      if (srcSize < 4) return ERR_CORRUPT;
      h = rd32le(src);
      lhSize = 4;
      regen = (h >> 4) & 0x3FFF;
      csize = (h >> 18) & 0x3FFF;
    } else {
      if (srcSize < 5) return ERR_CORRUPT;
      u64 h5 = (u64)rd32le(src) | ((u64)src[4] << 32);
      lhSize = 5;
      regen = (h5 >> 4) & 0x3FFFF;
      csize = (h5 >> 22) & 0x3FFFF;
    }
    if (regen > (1u << 17)) return ERR_CORRUPT;
    if (lhSize + csize > srcSize) return ERR_CORRUPT;
    const u8* cp = src + lhSize;
    size_t crem = csize;
    if (!treeless) {
      int used = huf_read_table(&ctx->huf, cp, crem);
      if (used < 0) return used;
      cp += used;
      crem -= (size_t)used;
    } else if (ctx->huf.log < 0) {
      return ERR_CORRUPT;  // treeless with no previous table
    }
    // size_format 00 means ONE stream; all other formats mean four
    bool fourStreams = (sizeFmt != 0);
    if (!fourStreams) {
      if (huf_decode_stream(&ctx->huf, cp, crem, litBuf, regen) < 0)
        return ERR_CORRUPT;
    } else {
      if (crem < 6) return ERR_CORRUPT;
      size_t s1 = rd16le(cp), s2 = rd16le(cp + 2), s3 = rd16le(cp + 4);
      const u8* sp = cp + 6;
      size_t rem = crem - 6;
      if (s1 + s2 + s3 > rem) return ERR_CORRUPT;
      size_t s4 = rem - s1 - s2 - s3;
      size_t q = (regen + 3) / 4;
      if (3 * q > regen) return ERR_CORRUPT;  // 4-stream needs regen >= 6
      size_t lens[4] = {q, q, q, regen - 3 * q};
      size_t ss[4] = {s1, s2, s3, s4};
      if (huf_decode_4streams(&ctx->huf, sp, ss, litBuf, lens) < 0)
        return ERR_CORRUPT;
    }
    lit = litBuf;
  }
  PROF_ADD(0);

  // ---- sequences section ----
  const u8* sp = src + lhSize + csize;
  size_t srem = srcSize - lhSize - csize;
  if (srem < 1) return ERR_CORRUPT;
  u32 nbSeq;
  {
    u32 b0 = *sp++;
    srem--;
    if (b0 < 128) nbSeq = b0;
    else if (b0 < 255) {
      if (srem < 1) return ERR_CORRUPT;
      nbSeq = ((b0 - 128) << 8) + *sp++;
      srem--;
    } else {
      if (srem < 2) return ERR_CORRUPT;
      nbSeq = rd16le(sp) + 0x7F00;
      sp += 2;
      srem -= 2;
    }
  }

  if (nbSeq == 0) {
    // literals only
    if (type == 1) {
      if (pos + regen > dstCap) return ERR_DST_SMALL;
      memset(dst + pos, rleByte, regen);
    } else {
      if (pos + regen > dstCap) return ERR_DST_SMALL;
      memcpy(dst + pos, lit, regen);
    }
    return (i64)regen;
  }

  if (srem < 1) return ERR_CORRUPT;
  u8 scMode = *sp++;
  srem--;
  if (scMode & 3) return ERR_CORRUPT;  // reserved bits

  struct { int mode; FSEDec* tab; bool* valid; const short* def; int defLog;
           int maxSym; int maxLog; } specs[3] = {
    {(scMode >> 6) & 3, &ctx->ll, &ctx->llV, LL_DEF, 6, 35, 9},
    {(scMode >> 4) & 3, &ctx->of, &ctx->ofV, OF_DEF, 5, 28, 8},
    {(scMode >> 2) & 3, &ctx->ml, &ctx->mlV, ML_DEF, 6, 52, 9},
  };
  for (int i = 0; i < 3; i++) {
    switch (specs[i].mode) {
      case 0: {  // predefined
        if (fse_build(specs[i].tab, specs[i].def, specs[i].maxSym,
                      specs[i].defLog) < 0)
          return ERR_CORRUPT;
        *specs[i].valid = true;
        break;
      }
      case 1: {  // RLE: single symbol byte
        if (srem < 1) return ERR_CORRUPT;
        u8 sym = *sp++;
        srem--;
        if (sym > specs[i].maxSym) return ERR_CORRUPT;
        fse_rle(specs[i].tab, sym);
        *specs[i].valid = true;
        break;
      }
      case 2: {  // FSE-described
        short norm[256];
        int tl, lastSym;
        int hdr = parse_ncount(sp, srem, norm, specs[i].maxSym,
                               specs[i].maxLog, &tl, &lastSym);
        if (hdr < 0) return ERR_CORRUPT;
        if (fse_build(specs[i].tab, norm, lastSym, tl) < 0) return ERR_CORRUPT;
        *specs[i].valid = true;
        sp += hdr;
        srem -= (size_t)hdr;
        break;
      }
      case 3: {  // repeat: previous table (or dict-provided)
        if (!*specs[i].valid) return ERR_CORRUPT;
        break;
      }
    }
  }

  PROF_ADD(3);
  // ---- interleaved sequence bitstream (backwards) ----
  RegBack br;
  if (!br.init(sp, srem)) return ERR_CORRUPT;
  int llS = (int)br.read(ctx->ll.log);
  int ofS = (int)br.read(ctx->of.log);
  int mlS = (int)br.read(ctx->ml.log);
  if (br.overflowed()) return ERR_CORRUPT;

  size_t litPos = 0;
  size_t litRegen = regen;  // RLE literals are materialized via memset
  size_t outPos = pos;

  // rep codes live in registers for the whole loop (ctx->rep round-trips
  // were on the critical path); repcode resolution is branch-free — the
  // rep0/rep1/rep2 history select and update are cmov ladders, so the
  // data-dependent repcode pattern costs no mispredicts.
  u32 rep0 = ctx->rep[0], rep1 = ctx->rep[1], rep2 = ctx->rep[2];
  u32 repErr = 0;
  const u32* const llEnt = ctx->ll.ent;
  const u32* const ofEnt = ctx->of.ent;
  const u32* const mlEnt = ctx->ml.ent;

  // Wildcopy-safe literal bound: fast-path copies may read up to 15 bytes
  // past litPos + llv. litBuf-backed literals have 64 bytes of allocation
  // slack (litRegen <= 1<<17); raw literals point into src, so the fast
  // path stays 16 bytes short of the section end (the checked branch and
  // the trailing-literal copy run exact). Big RLE blocks (> 128 KiB, not
  // materialized) take the exact path throughout.
  size_t litWild;
  if (type == 1) litWild = 0;
  else if (lit == litBuf) litWild = litRegen;
  else litWild = litRegen >= 32 ? litRegen - 32 : 0;  // 32B wild steps
                                  // may read 31 past the section

  u32 s = 0;
  // Fast loop: one unconditional branch-free window refill per read group
  // instead of a data-dependent reload check inside every bit read (the
  // reload-taken pattern is irregular — it was a per-sequence mispredict).
  // Bit budget per refill window is >= 56: OF extra (<=31) + ML extra
  // (<=16) = 47 fits the first window; LL extra (<=16) + 3 state reloads
  // (<= 9+9+8 = 26) = 42 fits the second. Symbol codes out of the FSE
  // tables are bounded at build time (parse_ncount rejects lastSym >
  // maxSym; predefined/RLE/dict tables are range-checked on load), so
  // ofc<=31, mlc<=52, llc<=35 hold without per-sequence checks.
  for (; s < nbSeq; s++) {
    if (br.pos < 56) break;  // checked tail loop finishes the block
    br.refill();
    u32 ofE = ofEnt[ofS], mlE = mlEnt[mlS], llE = llEnt[llS];
    int ofc = (int)(ofE & 0xFF);
    u32 ofv = (1u << ofc) + (u32)br.readFast(ofc);
    int mlc = (int)(mlE & 0xFF);
    u32 mlv = ML_BASE[mlc] + (u32)br.readFast(ML_BITS[mlc]);
    int llc = (int)(llE & 0xFF);
    u32 llv;
    if (br.pos >= 56) {
      br.refill();
      llv = LL_BASE[llc] + (u32)br.readFast(LL_BITS[llc]);
      if (s + 1 < nbSeq) {  // update states LL, ML, OF (read order)
        llS = (int)(llE >> 16) + (int)br.readFast((int)((llE >> 8) & 0xFF));
        mlS = (int)(mlE >> 16) + (int)br.readFast((int)((mlE >> 8) & 0xFF));
        ofS = (int)(ofE >> 16) + (int)br.readFast((int)((ofE >> 8) & 0xFF));
      }
    } else {  // stream nearly exhausted: checked reads for this group
      llv = LL_BASE[llc] + (u32)br.read(LL_BITS[llc]);
      if (s + 1 < nbSeq) {
        llS = (int)(llE >> 16) + (int)br.read((int)((llE >> 8) & 0xFF));
        mlS = (int)(mlE >> 16) + (int)br.read((int)((mlE >> 8) & 0xFF));
        ofS = (int)(ofE >> 16) + (int)br.read((int)((ofE >> 8) & 0xFF));
      }
      if (br.overflowed()) return ERR_CORRUPT;
    }

    // repcode resolution (ofc>1 <=> ofv>3 <=> a real offset); the repcode
    // history select/update is a cmov ladder — no data-dependent branch
    u32 offset;
    if (ofc > 1) {
      offset = ofv - 3;
      rep2 = rep1;
      rep1 = rep0;
      rep0 = offset;
    } else {
      u32 repIdx = ofv - 1 + (llv == 0 ? 1u : 0u);  // 0..3
      u32 c12 = (repIdx == 1) ? rep1 : rep2;
      offset = (repIdx == 3) ? rep0 - 1 : c12;
      offset = (repIdx == 0) ? rep0 : offset;
      repErr |= (offset == 0) & (repIdx != 0);
      rep2 = (repIdx >= 2) ? rep1 : rep2;
      rep1 = (repIdx != 0) ? rep0 : rep1;
      rep0 = offset;
    }

    // execute: literals then match, 16-byte wildcopy chunks (the
    // reference's ZSTD_execSequence / ZSTD_wildcopy recast). Writes past
    // the logical end are overwritten by later sequences; the +32 slack
    // gate keeps every wild write inside dstCap. (offset-1 < outPos+llv)
    // is offset != 0 && offset <= outPos + llv in one compare.
    if (litPos + llv > litRegen) return ERR_CORRUPT;
    size_t need = outPos + llv + (size_t)mlv;
    if (need + 32 <= dstCap && (size_t)(offset - 1) < outPos + llv &&
        litPos + llv <= litWild) {
      u8* op = dst + outPos;
      const u8* lp = lit + litPos;
      memcpy(op, lp, 16);
      if (llv > 16) {
        // literals never overlap the output: 32-byte ymm steps (wild
        // writes stay inside the +32 dstCap slack gate above)
        u8* o = op + 16;
        const u8* q = lp + 16;
        i64 n = (i64)llv - 16;
        do { memcpy(o, q, 32); o += 32; q += 32; n -= 32; } while (n > 0);
      }
      litPos += llv;
      u8* op2 = op + llv;
      if (offset >= 8) {
        // consecutive 8-byte steps are overlap-safe at distance >= 8
        memcpy(op2, op2 - offset, 8);
        memcpy(op2 + 8, op2 + 8 - offset, 8);
        if (mlv > 16) {
          u8* o = op2 + 16;
          i64 n = (i64)mlv - 16;
          if (offset >= 32) {
            do { memcpy(o, o - offset, 32); o += 32; n -= 32; } while (n > 0);
          } else if (offset >= 16) {
            do { memcpy(o, o - offset, 16); o += 16; n -= 16; } while (n > 0);
          } else {
            do {
              memcpy(o, o - offset, 8);
              memcpy(o + 8, o + 8 - offset, 8);
              o += 16;
              n -= 16;
            } while (n > 0);
          }
        }
      } else {  // small periodic offset: exact expansion
        int mc = match_copy(dst, outPos + llv, dstCap, offset, mlv, ctx);
        if (mc < 0) return mc;
      }
      outPos = need;
    } else {
      if (outPos + llv > dstCap) return ERR_DST_SMALL;
      if (type == 1) memset(dst + outPos, rleByte, llv);
      else memcpy(dst + outPos, lit + litPos, llv);
      litPos += llv;
      outPos += llv;
      int mc = match_copy(dst, outPos, dstCap, offset, mlv, ctx);
      if (mc < 0) return mc;
      outPos += mlv;
    }
  }

  // Checked tail: the last few sequences (fewer than 56 bits left in the
  // stream) decode with the per-read-checked reader and exact copies.
  for (; s < nbSeq; s++) {
    u32 ofE = ofEnt[ofS], mlE = mlEnt[mlS], llE = llEnt[llS];
    int ofc = (int)(ofE & 0xFF);
    u32 ofv = (1u << ofc) + (u32)br.read(ofc);
    int mlc = (int)(mlE & 0xFF);
    u32 mlv = ML_BASE[mlc] + (u32)br.read(ML_BITS[mlc]);
    int llc = (int)(llE & 0xFF);
    u32 llv = LL_BASE[llc] + (u32)br.read(LL_BITS[llc]);
    if (br.overflowed()) return ERR_CORRUPT;

    u32 offset;
    if (ofc > 1) {
      offset = ofv - 3;
      rep2 = rep1;
      rep1 = rep0;
      rep0 = offset;
    } else {
      u32 repIdx = ofv - 1 + (llv == 0 ? 1u : 0u);
      u32 c12 = (repIdx == 1) ? rep1 : rep2;
      offset = (repIdx == 3) ? rep0 - 1 : c12;
      offset = (repIdx == 0) ? rep0 : offset;
      repErr |= (offset == 0) & (repIdx != 0);
      rep2 = (repIdx >= 2) ? rep1 : rep2;
      rep1 = (repIdx != 0) ? rep0 : rep1;
      rep0 = offset;
    }

    if (s + 1 < nbSeq) {  // update states LL, ML, OF (read order)
      llS = (int)(llE >> 16) + (int)br.read((int)((llE >> 8) & 0xFF));
      mlS = (int)(mlE >> 16) + (int)br.read((int)((mlE >> 8) & 0xFF));
      ofS = (int)(ofE >> 16) + (int)br.read((int)((ofE >> 8) & 0xFF));
      if (br.overflowed()) return ERR_CORRUPT;
    }

    if (litPos + llv > litRegen) return ERR_CORRUPT;
    if (outPos + llv > dstCap) return ERR_DST_SMALL;
    if (type == 1) memset(dst + outPos, rleByte, llv);
    else memcpy(dst + outPos, lit + litPos, llv);
    litPos += llv;
    outPos += llv;
    int mc = match_copy(dst, outPos, dstCap, offset, mlv, ctx);
    if (mc < 0) return mc;
    outPos += mlv;
  }
  if (repErr) return ERR_CORRUPT;
#ifdef ATPU_PROF
  g_prof[2] += nbSeq;
#endif
  ctx->rep[0] = rep0;
  ctx->rep[1] = rep1;
  ctx->rep[2] = rep2;
  if (!br.finished()) return ERR_CORRUPT;

  // trailing literals
  size_t rem = litRegen - litPos;
  if (outPos + rem > dstCap) return ERR_DST_SMALL;
  if (type == 1) memset(dst + outPos, rleByte, rem);
  else memcpy(dst + outPos, lit + litPos, rem);
  outPos += rem;
  PROF_ADD(1);
  return (i64)(outPos - pos);
}

// Decode one zstd frame. Returns bytes written, sets *consumed.
static i64 decode_frame(const u8* src, size_t srcSize, u8* dst, size_t dstCap,
                        const u8* dict, size_t dictSize, size_t* consumed) {
  if (srcSize < 4) return ERR_CORRUPT;
  u32 magic = rd32le(src);
  if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) {  // skippable
    if (srcSize < 8) return ERR_CORRUPT;
    u32 sz = rd32le(src + 4);
    if (8 + (size_t)sz > srcSize) return ERR_CORRUPT;
    *consumed = 8 + sz;
    return 0;
  }
  if (magic != 0xFD2FB528u) return ERR_CORRUPT;
  const u8* p = src + 4;
  const u8* end = src + srcSize;
  if (p >= end) return ERR_CORRUPT;
  u8 fhd = *p++;
  int fcsFlag = fhd >> 6;
  bool singleSeg = (fhd >> 5) & 1;
  bool checksum = (fhd >> 2) & 1;
  int didFlag = fhd & 3;
  if ((fhd >> 3) & 1) return ERR_CORRUPT;  // reserved bit
  if (!singleSeg) {
    if (p >= end) return ERR_CORRUPT;
    p++;  // window descriptor (we decode whole frames; bound is dstCap)
  }
  static const int didSizes[4] = {0, 1, 2, 4};
  if (p + didSizes[didFlag] > end) return ERR_CORRUPT;
  p += didSizes[didFlag];
  u64 contentSize = (u64)-1;
  int fcsSizes[4] = {singleSeg ? 1 : 0, 2, 4, 8};
  int fcsLen = fcsSizes[fcsFlag];
  if (p + fcsLen > end) return ERR_CORRUPT;
  if (fcsLen == 1) contentSize = *p;
  else if (fcsLen == 2) contentSize = (u64)rd16le(p) + 256;
  else if (fcsLen == 4) contentSize = rd32le(p);
  else if (fcsLen == 8) contentSize = rd64le(p);
  p += fcsLen;

  DCtx ctx;
  if (load_dict(&ctx, dict, dictSize) < 0) return ERR_DICT;

  u8* litBuf = (u8*)malloc((1u << 17) + 64);
  if (!litBuf) return ERR_CORRUPT;

  size_t pos = 0;
  i64 result = ERR_CORRUPT;
  for (;;) {
    if (p + 3 > end) goto done;
    u32 bh = (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16);
    p += 3;
    int last = bh & 1;
    int btype = (bh >> 1) & 3;
    size_t bsize = bh >> 3;
    if (btype == 0) {  // raw
      if (p + bsize > end) goto done;
      if (pos + bsize > dstCap) { result = ERR_DST_SMALL; goto done; }
      memcpy(dst + pos, p, bsize);
      p += bsize;
      pos += bsize;
    } else if (btype == 1) {  // RLE
      if (p + 1 > end) goto done;
      if (pos + bsize > dstCap) { result = ERR_DST_SMALL; goto done; }
      memset(dst + pos, *p, bsize);
      p += 1;
      pos += bsize;
    } else if (btype == 2) {
      if (p + bsize > end) goto done;
      i64 n = decode_block(&ctx, p, bsize, dst, dstCap, pos, litBuf);
      if (n < 0) { result = n; goto done; }
      // Block_Maximum_Size conformance (RFC 8878 §3.1.1.2.3): a block
      // may not regenerate more than 128 KiB; the reference rejects
      // such streams (we once emitted one — r5 row-level overrun bug)
      if (n > 131072) goto done;
      p += bsize;
      pos += (size_t)n;
    } else {
      goto done;  // reserved block type
    }
    if (last) break;
  }
  if (contentSize != (u64)-1 && pos != contentSize) goto done;
  if (checksum) {
    if (p + 4 > end) goto done;
    u32 want = rd32le(p);
    u32 got = (u32)xxh64(dst, pos, 0);
    p += 4;
    if (want != got) { result = ERR_CHECKSUM; goto done; }
  }
  *consumed = (size_t)(p - src);
  result = (i64)pos;
done:
  free(litBuf);
  return result;
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

// Structural frame size walk (no decoding): returns the frame's total
// compressed size (header + blocks + checksum) when `src` holds a
// complete frame, -5 when more input is needed (streaming), <0 corrupt.
ATPU_EXPORT i64 atpu_zstd_frame_compressed_size(const u8* src,
                                                size_t srcSize) {
  const i64 ERR_TRUNCATED = -5;
  if (srcSize < 4) return ERR_TRUNCATED;
  u32 magic = rd32le(src);
  if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) {
    if (srcSize < 8) return ERR_TRUNCATED;
    u64 need = 8 + (u64)rd32le(src + 4);
    return need <= srcSize ? (i64)need : ERR_TRUNCATED;
  }
  if (magic != 0xFD2FB528u) return ERR_CORRUPT;
  size_t p = 4;
  if (p >= srcSize) return ERR_TRUNCATED;
  u8 fhd = src[p++];
  int fcsFlag = fhd >> 6;
  bool singleSeg = (fhd >> 5) & 1;
  bool checksum = (fhd >> 2) & 1;
  int didFlag = fhd & 3;
  if ((fhd >> 3) & 1) return ERR_CORRUPT;
  if (!singleSeg) {
    if (p >= srcSize) return ERR_TRUNCATED;
    p++;
  }
  static const int didSizes[4] = {0, 1, 2, 4};
  p += didSizes[didFlag];
  int fcsSizes[4] = {singleSeg ? 1 : 0, 2, 4, 8};
  p += fcsSizes[fcsFlag];
  if (p > srcSize) return ERR_TRUNCATED;
  for (;;) {
    if (p + 3 > srcSize) return ERR_TRUNCATED;
    u32 bh = (u32)src[p] | ((u32)src[p + 1] << 8) | ((u32)src[p + 2] << 16);
    p += 3;
    int last = bh & 1;
    int btype = (bh >> 1) & 3;
    size_t bsize = bh >> 3;
    if (btype == 3) return ERR_CORRUPT;
    size_t body = (btype == 1) ? 1 : bsize;  // RLE blocks carry one byte
    p += body;
    if (p > srcSize) return ERR_TRUNCATED;
    if (last) break;
  }
  if (checksum) {
    p += 4;
    if (p > srcSize) return ERR_TRUNCATED;
  }
  return (i64)p;
}

// Decode one frame (skippable frames consume bytes and write nothing).
// Returns decompressed size (>=0) or a negative error; *consumed gets the
// compressed bytes consumed.
ATPU_EXPORT i64 atpu_zstd_decompress_frame(const u8* src, size_t srcSize,
                                           u8* dst, size_t dstCap,
                                           const u8* dict, size_t dictSize,
                                           size_t* consumed) {
  *consumed = 0;
  return decode_frame(src, srcSize, dst, dstCap, dict, dictSize, consumed);
}

// Decode a whole stream of concatenated frames.
ATPU_EXPORT i64 atpu_zstd_decompress(const u8* src, size_t srcSize, u8* dst,
                                     size_t dstCap, const u8* dict,
                                     size_t dictSize) {
  size_t ip = 0, op = 0;
  while (ip < srcSize) {
    size_t consumed = 0;
    i64 n = decode_frame(src + ip, srcSize - ip, dst + op, dstCap - op, dict,
                         dictSize, &consumed);
    if (n < 0) return n;
    ip += consumed;
    op += (size_t)n;
  }
  return (i64)op;
}

// Frame content size: >=0 known, -1 unknown, -2 skippable, <=-10 corrupt.
ATPU_EXPORT i64 atpu_zstd_frame_content_size(const u8* src, size_t srcSize) {
  if (srcSize < 5) return -10;
  u32 magic = rd32le(src);
  if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) return -2;
  if (magic != 0xFD2FB528u) return -10;
  u8 fhd = src[4];
  int fcsFlag = fhd >> 6;
  bool singleSeg = (fhd >> 5) & 1;
  int didFlag = fhd & 3;
  static const int didSizes[4] = {0, 1, 2, 4};
  size_t off = 5 + (singleSeg ? 0 : 1) + didSizes[didFlag];
  int fcsSizes[4] = {singleSeg ? 1 : 0, 2, 4, 8};
  int fcsLen = fcsSizes[fcsFlag];
  if (fcsLen == 0) return -1;
  if (off + (size_t)fcsLen > srcSize) return -10;
  if (fcsLen == 1) return src[off];
  if (fcsLen == 2) return (i64)rd16le(src + off) + 256;
  if (fcsLen == 4) return rd32le(src + off);
  return (i64)rd64le(src + off);
}

ATPU_EXPORT u64 atpu_xxh64(const u8* src, size_t len, u64 seed) {
  return xxh64(src, len, seed);
}

// Parse a dictionary for the encoder: returns content length (>=0) or <0;
// fills *contentOff, reps[3], *dictID. Raw-content dicts: whole buffer,
// default reps, id 0.
ATPU_EXPORT i64 atpu_zstd_dict_info(const u8* dict, size_t dictSize,
                                    size_t* contentOff, u32* reps,
                                    u32* dictID) {
  DCtx ctx;
  if (load_dict(&ctx, dict, dictSize) < 0) return ERR_DICT;
  *contentOff = (size_t)(ctx.dictContent ? ctx.dictContent - dict : 0);
  reps[0] = ctx.rep[0];
  reps[1] = ctx.rep[1];
  reps[2] = ctx.rep[2];
  *dictID = ctx.dictID;
  return (i64)ctx.dictLen;
}

// Parse a structured dictionary's ENTROPY section for the encoder:
// per-symbol Huffman code lengths (0 = absent) and the three FSE
// normalized-count tables, in a form the encoder can rebuild encode
// tables from. The encoder then emits Treeless_Literals / Repeat_Mode
// blocks that reference the dictionary tables — where the reference's
// small-payload dictionary win lives (ZSTD_compress_usingCDict path).
// hufNb: 256 bytes. llNorm: 36 shorts, ofNorm: 32, mlNorm: 53.
ATPU_EXPORT i64 atpu_zstd_dict_entropy(const u8* dict, size_t dictSize,
                                       u8* hufNb, int* hufLog,
                                       short* llNorm, int* llLog,
                                       short* ofNorm, int* ofLog,
                                       short* mlNorm, int* mlLog) {
  if (dictSize < 8 || rd32le(dict) != 0xEC30A437u) return ERR_DICT;
  const u8* p = dict + 8;
  const u8* end = dict + dictSize;
  HufDec h;
  int used = huf_read_table(&h, p, (size_t)(end - p));
  if (used < 0) return ERR_DICT;
  p += used;
  memset(hufNb, 0, 256);
  for (int c = 0; c < (1 << h.log); c++) {
    u16 e = h.ent[c];
    hufNb[e & 0xFF] = (u8)(e >> 8);  // entry already stores nbBits
  }
  *hufLog = h.log;
  struct { short* norm; int n; int* log; int maxSym; int maxLog; }
  specs[3] = {
    {ofNorm, 32, ofLog, 31, 8},
    {mlNorm, 53, mlLog, 52, 9},
    {llNorm, 36, llLog, 35, 9},
  };
  for (int i = 0; i < 3; i++) {
    int tl, lastSym;
    memset(specs[i].norm, 0, sizeof(short) * (size_t)specs[i].n);
    int hdr = parse_ncount(p, (size_t)(end - p), specs[i].norm,
                           specs[i].maxSym, specs[i].maxLog, &tl, &lastSym);
    if (hdr < 0) return ERR_DICT;
    *specs[i].log = tl;
    p += hdr;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Device-decode frame planner.
//
// The TPU decode tier (ops/zstd_decode_device.py) splits a frame into the
// parts the hardware is good at (bulk Huffman/FSE symbol scans over many
// independent streams, LZ77 resolution over the output domain) and the
// parts that are irreducibly tiny and serial (header cracking, table
// construction). This export walks a frame's headers WITHOUT touching the
// bitstreams and emits, per block: the literal/stream/sequence byte
// ranges plus fully-built decode tables, reusing the same parse_ncount /
// fse_build / huf_read_table machinery the host decoder runs (mirrors
// decode_block's header arithmetic; reference capability:
// algos/zstd/lib/decompress/zstd_decompress_block.c table setup).
//
// meta layout per block: PM_* below, PLAN_STRIDE i32s.
// huf:  PLAN_HUF  u16 per block — (sym << 4) | nbBits
// fse:  3 * PLAN_FSE u32 per block (LL, OF, ML) —
//       (newStateBase << 16) | (nbBits << 8) | sym
// ---------------------------------------------------------------------------
namespace {
enum {
  PM_BTYPE = 0,    // 0 raw, 1 rle, 2 compressed
  PM_BOFF, PM_BSIZE,          // block content range (absolute in src)
  PM_LITTYPE,                 // 0 raw, 1 rle, 2 huffman (incl. treeless)
  PM_LITREGEN, PM_RLEBYTE, PM_NSTREAMS,
  PM_S0OFF, PM_S0LEN, PM_S1OFF, PM_S1LEN,
  PM_S2OFF, PM_S2LEN, PM_S3OFF, PM_S3LEN,
  PM_NBSEQ, PM_SEQOFF, PM_SEQLEN,
  PM_HUFLOG, PM_LLLOG, PM_OFLOG, PM_MLLOG,
  PLAN_STRIDE
};
const int PLAN_HUF = 1 << HUF_MAX_LOG;
const int PLAN_FSE = 1 << FSE_MAX_LOG;

void export_fse(const FSEDec& t, u32* out) {
  int size = 1 << (t.log > 0 ? t.log : 0);
  for (int i = 0; i < size; i++)
    out[i] = ((u32)t.base[i] << 16) | ((u32)t.nb[i] << 8) | t.sym[i];
}
}  // namespace

ATPU_EXPORT i64 atpu_zstd_frame_plan(const u8* src, size_t srcSize,
                                     i32* meta, u16* huf, u32* fse,
                                     i64 maxBlocks, i64* consumed) {
  size_t fsz;
  i64 probe = atpu_zstd_frame_compressed_size(src, srcSize);
  if (probe < 0) return probe;
  fsz = (size_t)probe;
  if (consumed) *consumed = (i64)fsz;
  u32 magic = rd32le(src);
  if ((magic & 0xFFFFFFF0u) == 0x184D2A50u) return 0;  // skippable
  // frame header walk (mirrors decode_frame)
  const u8* p = src + 4;
  const u8* end = src + fsz;
  u8 fhd = *p++;
  int fcsFlag = fhd >> 6;
  bool singleSeg = (fhd >> 5) & 1;
  int didFlag = fhd & 3;
  if ((fhd >> 3) & 1) return ERR_CORRUPT;
  if (!singleSeg) p++;
  static const int didSizes[4] = {0, 1, 2, 4};
  p += didSizes[didFlag];
  int fcsSizes[4] = {singleSeg ? 1 : 0, 2, 4, 8};
  p += fcsSizes[fcsFlag];
  if (p > end) return ERR_CORRUPT;

  HufDec hufState;          // carried across blocks (treeless literals)
  FSEDec llT, ofT, mlT;     // carried (repeat mode 3)
  bool llV = false, ofV = false, mlV = false;
  i64 nb = 0;

  bool last = false;
  while (!last) {
    if (p + 3 > end) return ERR_CORRUPT;
    u32 bh = (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16);
    last = bh & 1;
    int btype = (bh >> 1) & 3;
    size_t bsize = bh >> 3;
    p += 3;
    if (btype == 3) return ERR_CORRUPT;
    size_t contentBytes = (btype == 1) ? 1 : bsize;
    if (p + contentBytes > end) return ERR_CORRUPT;
    if (nb >= maxBlocks) return ERR_DST_SMALL;
    i32* m = meta + nb * PLAN_STRIDE;
    u16* hout = huf + nb * PLAN_HUF;
    u32* fout = fse + nb * 3 * PLAN_FSE;
    memset(m, 0, sizeof(i32) * PLAN_STRIDE);
    m[PM_BTYPE] = btype;
    m[PM_BOFF] = (i32)(p - src);
    m[PM_BSIZE] = (i32)bsize;
    if (btype != 2) { nb++; p += contentBytes; continue; }

    const u8* bp = p;
    size_t brem = bsize;
    p += bsize;
    // ---- literal section header (mirrors decode_block) ----
    if (brem < 1) return ERR_CORRUPT;
    int ltype = bp[0] & 3;
    int sizeFmt = (bp[0] >> 2) & 3;
    size_t regen = 0, csize = 0, lhSize = 0;
    if (ltype == 0 || ltype == 1) {
      if (sizeFmt == 0 || sizeFmt == 2) { lhSize = 1; regen = bp[0] >> 3; }
      else if (sizeFmt == 1) {
        if (brem < 2) return ERR_CORRUPT;
        lhSize = 2; regen = rd16le(bp) >> 4;
      } else {
        if (brem < 3) return ERR_CORRUPT;
        lhSize = 3;
        regen = ((u32)bp[0] >> 4) | ((u32)bp[1] << 4) | ((u32)bp[2] << 12);
      }
      csize = (ltype == 0) ? regen : 1;
      if (lhSize + csize > brem) return ERR_CORRUPT;
      m[PM_LITTYPE] = ltype;
      m[PM_LITREGEN] = (i32)regen;
      if (ltype == 0) {
        m[PM_S0OFF] = (i32)(bp + lhSize - src);
        m[PM_S0LEN] = (i32)regen;
      } else {
        m[PM_RLEBYTE] = bp[lhSize];
      }
    } else {
      bool treeless = (ltype == 3);
      u32 h;
      if (sizeFmt == 0 || sizeFmt == 1) {
        if (brem < 3) return ERR_CORRUPT;
        h = (u32)bp[0] | ((u32)bp[1] << 8) | ((u32)bp[2] << 16);
        lhSize = 3; regen = (h >> 4) & 0x3FF; csize = (h >> 14) & 0x3FF;
      } else if (sizeFmt == 2) {
        if (brem < 4) return ERR_CORRUPT;
        h = rd32le(bp);
        lhSize = 4; regen = (h >> 4) & 0x3FFF; csize = (h >> 18) & 0x3FFF;
      } else {
        if (brem < 5) return ERR_CORRUPT;
        u64 h5 = (u64)rd32le(bp) | ((u64)bp[4] << 32);
        lhSize = 5; regen = (h5 >> 4) & 0x3FFFF; csize = (h5 >> 22) & 0x3FFFF;
      }
      if (regen > (1u << 17) || lhSize + csize > brem) return ERR_CORRUPT;
      const u8* cp = bp + lhSize;
      size_t crem = csize;
      if (!treeless) {
        int used = huf_read_table(&hufState, cp, crem);
        if (used < 0) return used;
        cp += used; crem -= (size_t)used;
      } else if (hufState.log < 0) {
        return ERR_CORRUPT;
      }
      for (int i = 0; i < (1 << HUF_MAX_LOG); i++)
        hout[i] = (u16)(((u16)(hufState.ent[i] & 0xFF) << 4)
                        | (hufState.ent[i] >> 8));
      m[PM_LITTYPE] = 2;
      m[PM_LITREGEN] = (i32)regen;
      m[PM_HUFLOG] = hufState.log;
      if (sizeFmt == 0) {
        m[PM_NSTREAMS] = 1;
        m[PM_S0OFF] = (i32)(cp - src);
        m[PM_S0LEN] = (i32)crem;
      } else {
        if (crem < 6) return ERR_CORRUPT;
        size_t s1 = rd16le(cp), s2 = rd16le(cp + 2), s3 = rd16le(cp + 4);
        if (s1 + s2 + s3 > crem - 6) return ERR_CORRUPT;
        size_t s4 = crem - 6 - s1 - s2 - s3;
        size_t q = (regen + 3) / 4;
        if (3 * q > regen) return ERR_CORRUPT;
        m[PM_NSTREAMS] = 4;
        i32 off = (i32)(cp + 6 - src);
        size_t ss[4] = {s1, s2, s3, s4};
        for (int i = 0; i < 4; i++) {
          m[PM_S0OFF + 2 * i] = off;
          m[PM_S0LEN + 2 * i] = (i32)ss[i];
          off += (i32)ss[i];
        }
      }
    }
    // ---- sequence section ----
    const u8* sp = bp + lhSize + csize;
    size_t srem = bsize - lhSize - csize;
    if (srem < 1) return ERR_CORRUPT;
    u32 nbSeq;
    u32 b0 = *sp++; srem--;
    if (b0 < 128) nbSeq = b0;
    else if (b0 < 255) {
      if (srem < 1) return ERR_CORRUPT;
      nbSeq = ((b0 - 128) << 8) + *sp++; srem--;
    } else {
      if (srem < 2) return ERR_CORRUPT;
      nbSeq = rd16le(sp) + 0x7F00; sp += 2; srem -= 2;
    }
    m[PM_NBSEQ] = (i32)nbSeq;
    if (nbSeq > 0) {
      if (srem < 1) return ERR_CORRUPT;
      u8 scMode = *sp++; srem--;
      if (scMode & 3) return ERR_CORRUPT;
      struct { int mode; FSEDec* tab; bool* valid; const short* def;
               int defLog; int maxSym; int maxLog; } specs[3] = {
        {(scMode >> 6) & 3, &llT, &llV, LL_DEF, 6, 35, 9},
        {(scMode >> 4) & 3, &ofT, &ofV, OF_DEF, 5, 28, 8},
        {(scMode >> 2) & 3, &mlT, &mlV, ML_DEF, 6, 52, 9},
      };
      for (int i = 0; i < 3; i++) {
        switch (specs[i].mode) {
          case 0:
            if (fse_build(specs[i].tab, specs[i].def, specs[i].maxSym,
                          specs[i].defLog) < 0) return ERR_CORRUPT;
            *specs[i].valid = true;
            break;
          case 1: {
            if (srem < 1) return ERR_CORRUPT;
            u8 sym = *sp++; srem--;
            if (sym > specs[i].maxSym) return ERR_CORRUPT;
            fse_rle(specs[i].tab, sym);
            *specs[i].valid = true;
            break;
          }
          case 2: {
            short norm[256];
            int tl, lastSym;
            int hdr = parse_ncount(sp, srem, norm, specs[i].maxSym,
                                   specs[i].maxLog, &tl, &lastSym);
            if (hdr < 0) return ERR_CORRUPT;
            if (fse_build(specs[i].tab, norm, lastSym, tl) < 0)
              return ERR_CORRUPT;
            *specs[i].valid = true;
            sp += hdr; srem -= (size_t)hdr;
            break;
          }
          case 3:
            if (!*specs[i].valid) return ERR_CORRUPT;
            break;
        }
      }
      export_fse(llT, fout);
      export_fse(ofT, fout + PLAN_FSE);
      export_fse(mlT, fout + 2 * PLAN_FSE);
      m[PM_SEQOFF] = (i32)(sp - src);
      m[PM_SEQLEN] = (i32)srem;
      m[PM_LLLOG] = llT.log;
      m[PM_OFLOG] = ofT.log;
      m[PM_MLLOG] = mlT.log;
    }
    nb++;
  }
  return nb;
}
