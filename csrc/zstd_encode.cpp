// Own zstd frame encoder (RFC 8878), levels 1-22 — no third-party code.
//
// Replaces the round-1 delegate to the `zstandard` pip package for all
// host compression levels (VERDICT coverage item A7). Capability parity
// targets: /root/reference/algos/zstd/lib/compress/zstd_compress.c (frame
// and block assembly, level table :7311-7405), zstd_compress_sequences.c
// (FSE sequence coding), huf_compress.c (literal Huffman + weight
// description). Independent implementation; bit-level conventions
// cross-checked against our own decoder (csrc/zstd_decode.cpp) and
// validated by stock-zstd decoding in tests.
//
// Design: hash-chain match finder over a level-laddered window with lazy
// evaluation and repcode probes; per block, literals get a per-block
// canonical Huffman table (FSE-compressed weight description, 1 or 4
// streams) with a raw/RLE fallback by exact size accounting; sequences
// use per-block FSE tables (normalized from block histograms) with
// predefined/RLE fallbacks, whichever is smaller.

#include <cstdint>
#include <cstring>

#include "btmf.h"
#include <cstdlib>
#include <cstdio>
#include <cstddef>
#include <cmath>
#include <emmintrin.h>

#define ATPU_EXPORT extern "C" __attribute__((visibility("default")))

// Encode-phase profiling (build with -DATPU_PROF; zero-cost otherwise).
// Slots: 0 scan, 1 literal histogram, 2 huf build+desc, 3 huf stream,
// 4 write_sequences, 5 frame/rest.
#ifdef ATPU_PROF
#include <x86intrin.h>
static unsigned long long g_eprof[8];
#define EPROF_T0() unsigned long long _t0 = __rdtsc()
#define EPROF_ADD(slot) (g_eprof[slot] += __rdtsc() - _t0, _t0 = __rdtsc())
ATPU_EXPORT void atpu_zstd_enc_prof(unsigned long long* out) {
  for (int i = 0; i < 8; i++) { out[i] = g_eprof[i]; g_eprof[i] = 0; }
}
#else
#define EPROF_T0() ((void)0)
#define EPROF_ADD(slot) ((void)0)
#endif

namespace {

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;
typedef long long i64;

enum { ERR_CORRUPT = -1, ERR_DST_SMALL = -2 };

static inline int highbit32(u32 v) { return 31 - __builtin_clz(v); }
static inline void wr32le(u8* p, u32 v) { memcpy(p, &v, 4); }
static inline void wr16le(u8* p, u16 v) { memcpy(p, &v, 2); }
static inline u32 rd32le_(const u8* p) { u32 v; memcpy(&v, p, 4); return v; }
static inline u64 rd64le_(const u8* p) { u64 v; memcpy(&v, p, 8); return v; }

static const int BLOCK_MAX = 1 << 17;  // 128 KiB
static const int MIN_MATCH = 3;

// ---------------------------------------------------------------------------
// backward bit writer (LSB-first accumulate; stream read from the end)
// ---------------------------------------------------------------------------
struct BitW {
  u8* out;
  size_t cap, len = 0;
  u64 acc = 0;
  int nbits = 0;
  bool overflow = false;

  BitW(u8* o, size_t c) : out(o), cap(c) {}
  inline void put(u32 v, int n) {  // word-granular flush (hot in
    // write_sequences — profiled at a third of L3 encode)
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
  // 64-bit fast path for the sequence/Huffman hot loops: add() never
  // checks capacity (caller guarantees nbits + n <= 64 between flushes),
  // flush() stores 8 bytes and retires whole bytes only — one
  // unaligned store replaces up to two checked 4-byte puts
  inline void add(u64 v, int n) {
    acc |= v << nbits;
    nbits += n;
  }
  inline void flush() {
    if (len + 8 > cap) { overflow = true; nbits &= 7; return; }
    memcpy(out + len, &acc, 8);
    len += (size_t)(nbits >> 3);
    acc >>= nbits & ~7;
    nbits &= 7;
  }
  size_t close() {  // sentinel bit + flush
    put(1, 1);
    while (nbits > 0) {
      if (len >= cap) { overflow = true; return len; }
      out[len++] = (u8)acc;
      acc >>= 8;
      nbits -= 8;
    }
    acc = 0;
    nbits = 0;
    return len;
  }
};

// ---------------------------------------------------------------------------
// FSE encoder (mirrors our tested Python reference zstd_format.py)
// ---------------------------------------------------------------------------
struct FSEEnc {
  u16 nxt[1 << 9];
  int dnb[256], dfs[256];
  int log, state = 0;

  // dist: normalized counts (may contain -1)
  void build(const short* dist, int nsym, int tableLog) {
    log = tableLog;
    int size = 1 << tableLog;
    int table[1 << 9];
    int hi = size - 1;
    for (int s = 0; s < nsym; s++)
      if (dist[s] == -1) table[hi--] = s;
    int pos = 0, step = (size >> 1) + (size >> 3) + 3, mask = size - 1;
    for (int s = 0; s < nsym; s++) {
      for (int k = 0; k < dist[s]; k++) {
        table[pos] = s;
        pos = (pos + step) & mask;
        while (pos > hi) pos = (pos + step) & mask;
      }
    }
    int cumul[257];
    cumul[0] = 0;
    for (int s = 0; s < nsym; s++)
      cumul[s + 1] = cumul[s] + (dist[s] < 0 ? 1 : dist[s]);
    int cum[257];
    memcpy(cum, cumul, sizeof(int) * (size_t)(nsym + 1));
    for (int st = 0; st < size; st++) {
      int s = table[st];
      nxt[cum[s]++] = (u16)(size + st);
    }
    int total = 0;
    for (int s = 0; s < nsym; s++) {
      int f = dist[s] < 0 ? 1 : dist[s];
      if (f == 0) { dnb[s] = 0; dfs[s] = 0; continue; }
      if (f == 1) {
        dnb[s] = (tableLog << 16) - (1 << tableLog);
        dfs[s] = total - 1;
      } else {
        int maxBitsOut = tableLog - highbit32((u32)(f - 1));
        dnb[s] = (maxBitsOut << 16) - (f << maxBitsOut);
        dfs[s] = total - f;
      }
      total += f;
    }
  }
  inline void init_state(int sym) {
    int nbout = (dnb[sym] + (1 << 15)) >> 16;
    state = nxt[(((nbout << 16) - dnb[sym]) >> nbout) + dfs[sym]];
  }
  inline void encode(BitW& bw, int sym) {
    int nbits = (state + dnb[sym]) >> 16;
    bw.put((u32)state, nbits);
    state = nxt[(state >> nbits) + dfs[sym]];
  }
  // like encode() but returns the bits for the caller to pack into a
  // fused put (write_sequences emits one put for all three state
  // transitions instead of three)
  inline u32 step(int sym, int* nOut) {
    int nbits = (state + dnb[sym]) >> 16;
    u32 bits = (u32)state & ((1u << nbits) - 1);
    state = nxt[(state >> nbits) + dfs[sym]];
    *nOut = nbits;
    return bits;
  }
  inline void flush(BitW& bw) { bw.put((u32)(state - (1 << log)), log); }
};

// FSE_writeNCount-compatible header (mirrors zstd_format.write_ncount)
static int write_ncount(const short* norm, int nsym, int tableLog, u8* out,
                        size_t cap) {
  u32 bits = 0;
  int cnt = 0;
  size_t len = 0;
  bool of = false;
  auto put = [&](u32 v, int n) {
    bits |= (v & ((1u << n) - 1)) << cnt;
    cnt += n;
    while (cnt >= 16) {
      if (len + 2 > cap) { of = true; return; }
      out[len++] = (u8)bits;
      out[len++] = (u8)(bits >> 8);
      bits >>= 16;
      cnt -= 16;
    }
  };
  put((u32)(tableLog - 5), 4);
  int remaining = (1 << tableLog) + 1;
  int threshold = 1 << tableLog;
  int nbbits = tableLog + 1;
  int s = 0;
  bool prev0 = false;
  while (s < nsym && remaining > 1) {
    if (prev0) {
      int start = s;
      while (s < nsym && norm[s] == 0) s++;
      if (s >= nsym) return -1;
      while (s >= start + 24) { start += 24; put(0xFFFF, 16); }
      while (s >= start + 3) { start += 3; put(3, 2); }
      put((u32)(s - start), 2);
    }
    int count = norm[s++];
    int maxv = (2 * threshold - 1) - remaining;
    remaining -= count < 0 ? -count : count;
    count += 1;
    if (count >= threshold) count += maxv;
    put((u32)count, nbbits - (count < maxv ? 1 : 0));
    prev0 = (count == 1);
    while (remaining < threshold && remaining > 1) {
      nbbits--;
      threshold >>= 1;
    }
  }
  if (remaining != 1) return -1;
  if (cnt) {
    if (len + 2 > cap) return -1;
    out[len++] = (u8)bits;
    if (cnt > 8) out[len++] = (u8)(bits >> 8);
  }
  return of ? -1 : (int)len;
}

// normalize a histogram to sum 2^tableLog (largest-share; low counts get
// -1 "less than 1" slots when justified)
static int normalize_counts(const u32* freq, int nsym, u32 total,
                            int tableLog, short* norm) {
  if (total == 0) return -1;
  int size = 1 << tableLog;
  i64 acc = 0;
  int big = 0;
  for (int s = 0; s < nsym; s++) {
    if (freq[s] == 0) { norm[s] = 0; continue; }
    if (freq[s] > freq[big]) big = s;
    i64 n = ((i64)freq[s] * size) / total;
    if (n == 0) n = (freq[s] * 3 < total) ? -1 : 1;
    norm[s] = (short)n;
    acc += n < 0 ? 1 : n;
  }
  i64 fix = size - acc;
  if (norm[big] + fix < 1) {
    // spread shortfall crudely: clamp everything low-prob except big
    int acc2 = 0;
    for (int s = 0; s < nsym; s++) {
      if (s == big || norm[s] == 0) continue;
      norm[s] = (short)((norm[s] < 0) ? -1 : 1);
      acc2 += 1;
    }
    norm[big] = (short)(size - acc2);
    if (norm[big] < 1) return -1;
    return 0;
  }
  norm[big] = (short)(norm[big] + fix);
  return 0;
}

// cost in bits of coding `freq` with normalized table `norm` (approximate,
// for table-choice decisions)
static i64 fse_cost_bits(const u32* freq, const short* norm, int nsym,
                         int tableLog) {
  i64 bits = 0;
  for (int s = 0; s < nsym; s++) {
    if (!freq[s]) continue;
    int n = norm[s] < 0 ? 1 : norm[s];
    if (n == 0) return -1;  // symbol not representable
    int nb = tableLog - highbit32((u32)n);
    bits += (i64)freq[s] * (nb + 1);  // +1 fudge for sub-range splits
  }
  return bits;
}

// ---------------------------------------------------------------------------
// literal Huffman (canonical, <= 11 bits), weight description via FSE
// ---------------------------------------------------------------------------
struct HufEnc {
  u8 nbits[256];
  u16 codes[256];
  int maxSym;   // last present symbol
  int tableLog;

  // returns false if literals are degenerate (<= 1 distinct symbol)
  bool build(const u32* freq) {
    maxSym = -1;
    int nsym = 0;
    for (int s = 0; s < 256; s++)
      if (freq[s]) { maxSym = s; nsym++; }
    if (nsym <= 1) return false;
    // Huffman lengths via the sorted two-queue method, limited to 11
    int order[256], no = 0;
    for (int s = 0; s < 256; s++) if (freq[s]) order[no++] = s;
    for (int i = 1; i < no; i++) {
      int v = order[i], j = i - 1;
      while (j >= 0 && freq[order[j]] > freq[v]) {
        order[j + 1] = order[j];
        j--;
      }
      order[j + 1] = v;
    }
    u32 nf[512];
    int parent[512];
    for (int i = 0; i < no; i++) nf[i] = freq[order[i]];
    int leafq = 0, nodeq = no, nodes = no;
    while ((no - leafq) + (nodes - nodeq) >= 2) {
      int picks[2];
      for (int k = 0; k < 2; k++) {
        bool lo = leafq < no, nd = nodeq < nodes;
        if (lo && (!nd || nf[leafq] <= nf[nodeq])) picks[k] = leafq++;
        else picks[k] = nodeq++;
      }
      nf[nodes] = nf[picks[0]] + nf[picks[1]];
      parent[picks[0]] = nodes;
      parent[picks[1]] = nodes;
      nodes++;
    }
    int depth[512];
    depth[nodes - 1] = 0;
    for (int i = nodes - 2; i >= 0; i--) depth[i] = depth[parent[i]] + 1;
    const int MAXL = 11;
    int bl[64] = {0};
    int overflow = 0;
    for (int i = 0; i < no; i++) {
      int d = depth[i];
      if (d > MAXL) { overflow++; d = MAXL; }
      bl[d]++;
    }
    // zlib gen_bitlen counts clamped INTERNAL nodes too — leaf-only
    // counting under-repairs deep-skew trees into an over-subscribed
    // code (same bug class fixed in csrc/deflate.cpp build_lengths;
    // HUF completeness is load-bearing here: the decoder derives the
    // last weight from the Kraft remainder)
    for (int i = no; i < nodes - 1; i++)
      if (depth[i] > MAXL) overflow++;
    while (overflow > 0) {
      int b = MAXL - 1;
      while (b > 0 && bl[b] == 0) b--;
      if (b == 0) break;
      bl[b]--;
      bl[b + 1] += 2;
      bl[MAXL]--;
      overflow -= 2;
    }
    // exact completeness (belt + braces): rebuild flat + promote if off
    {
      long long limit = 1LL << MAXL, kr = 0;
      for (int b = 1; b <= MAXL; b++)
        kr += (long long)bl[b] << (MAXL - b);
      if (kr != limit) {
        int L = 1;
        while ((1 << L) < no) L++;
        memset(bl, 0, sizeof(bl));
        bl[L] = no;
        kr = (long long)no << (MAXL - L);
        int d = L;
        while (kr < limit && d >= 2) {
          if (bl[d] && kr + (1LL << (MAXL - d)) <= limit) {
            bl[d]--;
            bl[d - 1]++;
            kr += 1LL << (MAXL - d);
          } else {
            d--;
          }
        }
      }
    }
    memset(nbits, 0, sizeof(nbits));
    int oi = 0;
    for (int b = MAXL; b >= 1; b--)
      for (int k = 0; k < bl[b]; k++) nbits[order[oi++]] = (u8)b;
    // tableLog = max bits actually used
    tableLog = 0;
    for (int s = 0; s < 256; s++)
      if (nbits[s] > tableLog) tableLog = nbits[s];
    // canonical codes, HUF convention (mirrors zstd_format.build_fixed_
    // huffman): longest codes from 0, natural order within a rank
    int per_rank[16] = {0};
    for (int s = 0; s < 256; s++) if (nbits[s]) per_rank[nbits[s]]++;
    int val[16] = {0};
    int mn = 0;
    for (int nb = tableLog; nb >= 1; nb--) {
      val[nb] = mn;
      mn += per_rank[nb];
      mn >>= 1;
    }
    int nxtv[16];
    memcpy(nxtv, val, sizeof(val));
    for (int s = 0; s < 256; s++) {
      if (!nbits[s]) { codes[s] = 0; continue; }
      codes[s] = (u16)nxtv[nbits[s]]++;
    }
    return true;
  }

  // Adopt externally-provided code lengths (a dictionary's Huffman table:
  // the decoder and every other zstd assign canonical codes from lengths
  // the same way, so the codes computed here match the dict table cells).
  bool build_from_nbits(const u8* nb) {
    memcpy(nbits, nb, 256);
    maxSym = -1;
    tableLog = 0;
    int nsym = 0;
    for (int s = 0; s < 256; s++) {
      if (!nbits[s]) continue;
      maxSym = s;
      nsym++;
      if (nbits[s] > tableLog) tableLog = nbits[s];
    }
    if (nsym <= 1 || tableLog > 11) return false;
    int per_rank[16] = {0};
    for (int s = 0; s < 256; s++) if (nbits[s]) per_rank[nbits[s]]++;
    int val[16] = {0};
    int mn = 0;
    for (int nb2 = tableLog; nb2 >= 1; nb2--) {
      val[nb2] = mn;
      mn += per_rank[nb2];
      mn >>= 1;
    }
    int nxtv[16];
    memcpy(nxtv, val, sizeof(val));
    for (int s = 0; s < 256; s++) {
      if (!nbits[s]) { codes[s] = 0; continue; }
      codes[s] = (u16)nxtv[nbits[s]]++;
    }
    return true;
  }

  // weight description: weights[s] = tableLog + 1 - nbits (for s < maxSym;
  // the last symbol's weight is implied). Direct nibbles if <= 127 weights,
  // else FSE-compressed. Returns size, or <0.
  int write_desc(u8* out, size_t cap) const {
    int nw = maxSym;  // weights for symbols 0..maxSym-1
    u8 w[256];
    for (int s = 0; s < nw; s++)
      w[s] = nbits[s] ? (u8)(tableLog + 1 - nbits[s]) : 0;
    // try FSE compression of the weight stream
    if (nw >= 2) {
      u32 wf[13] = {0};
      int wmax = 0;
      for (int s = 0; s < nw; s++) {
        wf[w[s]]++;
        if (w[s] > wmax) wmax = w[s];
      }
      int wlog = 6;
      while ((1 << wlog) > 2 * nw && wlog > 1) wlog--;
      short norm[13];
      if (normalize_counts(wf, wmax + 1, (u32)nw, wlog, norm) == 0) {
        u8 hdr[64];
        int hs = write_ncount(norm, wmax + 1, wlog, hdr, sizeof(hdr));
        if (hs > 0) {
          FSEEnc e1, e2;
          e1.build(norm, wmax + 1, wlog);
          e2.build(norm, wmax + 1, wlog);
          u8 tmp[512];
          BitW bw(tmp, sizeof(tmp));
          int i = nw;
          if (nw & 1) {
            e1.init_state(w[i - 1]);
            e2.init_state(w[i - 2]);
            e1.encode(bw, w[i - 3]);
            i -= 3;
          } else {
            e2.init_state(w[i - 1]);
            e1.init_state(w[i - 2]);
            i -= 2;
          }
          while (i > 0) {
            e2.encode(bw, w[i - 1]);
            e1.encode(bw, w[i - 2]);
            i -= 2;
          }
          e2.flush(bw);
          e1.flush(bw);
          size_t sl = bw.close();
          if (!bw.overflow && hs + sl < 128 &&
              (size_t)(1 + hs + sl) <= cap &&
              (int)(hs + sl) < (nw + 1) / 2 + 1) {
            out[0] = (u8)(hs + sl);
            memcpy(out + 1, hdr, (size_t)hs);
            memcpy(out + 1 + hs, tmp, sl);
            return 1 + hs + (int)sl;
          }
        }
      }
    }
    // direct nibbles (headerByte = 127 + nw requires 0 < nw <= 128)
    if (nw <= 0 || nw > 128) return -1;
    size_t need = 1 + (size_t)((nw + 1) / 2);
    if (need > cap) return -1;
    out[0] = (u8)(127 + nw);
    memset(out + 1, 0, need - 1);
    for (int s = 0; s < nw; s++) {
      if (s & 1) out[1 + s / 2] |= w[s];
      else out[1 + s / 2] |= (u8)(w[s] << 4);
    }
    return (int)need;
  }

  size_t stream_bits(const u8* lit, size_t n) const {
    u64 bits = 0;
    for (size_t i = 0; i < n; i++) bits += nbits[lit[i]];
    return (size_t)bits;
  }
  // encode one stream (symbols emitted from the END, decoder reads
  // backwards to get them in order)
  size_t stream(const u8* lit, size_t n, u8* out, size_t cap) const {
    // 3 symbols per flush check: codes are canonical (pre-masked) and
    // <= 11 bits, so with <= 31 pending bits after a flush, three ors
    // peak at 64 accumulated bits (last shift 53) — no masking, one
    // amortized flush per batch instead of a checked put per symbol
    // (the Huffman emit was 17% of L3 encode, gprof).
    BitW bw(out, cap);
    size_t i = n;
    if (cap >= 16) {
      size_t safe = cap - 8;  // word flushes stay in bounds unchecked
      while (i >= 3 && bw.len <= safe) {
        u8 s2 = lit[i - 1], s1 = lit[i - 2], s0 = lit[i - 3];
        i -= 3;
        bw.acc |= (u64)codes[s2] << bw.nbits;
        bw.nbits += nbits[s2];
        bw.acc |= (u64)codes[s1] << bw.nbits;
        bw.nbits += nbits[s1];
        bw.acc |= (u64)codes[s0] << bw.nbits;
        bw.nbits += nbits[s0];
        while (bw.nbits >= 32) {
          u32 w = (u32)bw.acc;
          memcpy(bw.out + bw.len, &w, 4);
          bw.len += 4;
          bw.acc >>= 32;
          bw.nbits -= 32;
        }
      }
    }
    while (i-- > 0) bw.put(codes[lit[i]], nbits[lit[i]]);
    size_t sl = bw.close();
    return bw.overflow ? 0 : sl;
  }

  // Interleaved 4-stream encode: the format's four independent bitstreams
  // (mandatory above 1023 regenerated bytes) exist exactly so four
  // accumulator chains can run in parallel — sequential emission leaves
  // three of the four chains idle behind one serial shift/or chain.
  // 4 symbols per stream per iteration (4 x 11 bits + 7 pending <= 64),
  // one 8-byte byte-granular store per stream per iteration. Streams 1-3
  // land in a bounded scratch and are compacted behind stream 0.
  // Returns total bytes at out (jumbo sizes in sls[4]), or -1.
  i64 stream4(const u8* lit, size_t n, u8* out, size_t cap,
              size_t sls[4]) const {
    if (n > (size_t)BLOCK_MAX || cap < 8) return -1;
    size_t q = (n + 3) / 4;
    const u8* src[4] = {lit, lit + q, lit + 2 * q, lit + 3 * q};
    const size_t scap = ((size_t)BLOCK_MAX / 4 * 11) / 8 + 32;
    static thread_local u8 scr[3 * (((size_t)BLOCK_MAX / 4 * 11) / 8 + 32)];
    u8* outs[4] = {out, scr, scr + scap, scr + 2 * scap};
    u64 acc[4] = {0, 0, 0, 0};
    int nb[4] = {0, 0, 0, 0};
    size_t len[4] = {0, 0, 0, 0};
    size_t idx[4] = {q, q, q, n - 3 * q};
    const size_t safe0 = cap - 8;
    while (idx[0] >= 4 && idx[3] >= 4 && len[0] <= safe0) {
      for (int k = 0; k < 4; k++) {
        const u8* s = src[k];
        size_t ik = idx[k];
        u64 a = acc[k];
        int nbk = nb[k];
        u8 c3 = s[ik - 1], c2 = s[ik - 2], c1 = s[ik - 3], c0 = s[ik - 4];
        a |= (u64)codes[c3] << nbk;
        nbk += nbits[c3];
        a |= (u64)codes[c2] << nbk;
        nbk += nbits[c2];
        a |= (u64)codes[c1] << nbk;
        nbk += nbits[c1];
        a |= (u64)codes[c0] << nbk;
        nbk += nbits[c0];
        memcpy(outs[k] + len[k], &a, 8);
        len[k] += (size_t)(nbk >> 3);
        acc[k] = a >> (nbk & ~7);
        nb[k] = nbk & 7;
        idx[k] = ik - 4;
      }
    }
    for (int k = 0; k < 4; k++) {  // scalar tails + sentinel + drain
      u64 a = acc[k];
      int nbk = nb[k];
      size_t ik = idx[k], lk = len[k];
      const size_t capk = k == 0 ? cap : scap;
      while (ik-- > 0) {
        u8 c = src[k][ik];
        a |= (u64)codes[c] << nbk;
        nbk += nbits[c];
        if (nbk >= 32) {
          if (lk + 8 > capk) return -1;
          memcpy(outs[k] + lk, &a, 8);
          lk += (size_t)(nbk >> 3);
          a >>= nbk & ~7;
          nbk &= 7;
        }
      }
      a |= 1ull << nbk;  // closing sentinel bit
      nbk += 1;
      while (nbk > 0) {
        if (lk >= capk) return -1;
        outs[k][lk++] = (u8)a;
        a >>= 8;
        nbk -= 8;
      }
      sls[k] = lk;
      if (k < 3 && lk >= 65536) return -1;  // jumbo u16 size fields
    }
    size_t tot = sls[0];
    for (int k = 1; k < 4; k++) {
      if (tot + sls[k] > cap) return -1;
      memmove(out + tot, outs[k], sls[k]);
      tot += sls[k];
    }
    return (i64)tot;
  }
};

// ---------------------------------------------------------------------------
// sequence code tables (shared with the decoder's constants)
// ---------------------------------------------------------------------------
static const u32 LL_BASE[36] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
  13, 14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
  2048, 4096, 8192, 16384, 32768, 65536};
static const u8 LL_BITS[36] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};
static const u32 ML_BASE[53] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
  16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33,
  34, 35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
  4099, 8195, 16387, 32771, 65539};
static const u8 ML_BITS[53] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
  0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3,
  3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16};
static const short LL_DEF[36] = {4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1,
  1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1};
static const short ML_DEF[53] = {1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1};
static const short OF_DEF[29] = {1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1,
  1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1};
static const int LL_DEFLOG = 6, ML_DEFLOG = 6, OF_DEFLOG = 5;

// LUT-backed code lookups: the reverse scans were 30% of fast-level
// encode (one per sequence per stream plus the histogram pass)
struct SeqCodeLut {
  u8 ll[256];   // ll in [0, 256)
  u8 ml[384];   // ml in [0, 384)
  SeqCodeLut() {
    for (u32 v = 0; v < 256; v++) {
      int c = 35;
      while (c > 0 && LL_BASE[c] > v) c--;
      ll[v] = (u8)c;
    }
    for (u32 v = 0; v < 384; v++) {
      int c = 52;
      while (c > 0 && ML_BASE[c] > v) c--;
      ml[v] = (u8)c;
    }
  }
};
// namespace-scope instance: function-local statics pay a thread-safe
// init guard load+branch on EVERY call, and these run 2-4x per sequence
static const SeqCodeLut kSeqLut;
static inline int ll_code(u32 ll) {
  if (ll < 256) return kSeqLut.ll[ll];
  for (int c = 35; c >= 16; c--)
    if (ll >= LL_BASE[c]) return c;
  return 16;
}
static inline int ml_code(u32 ml) {
  if (ml < 384) return kSeqLut.ml[ml];
  for (int c = 52; c >= 0; c--)
    if (ml >= ML_BASE[c]) return c;
  return 0;
}

struct Seq { u32 ll, ml, ofv; };  // ofv = offset_value (repcodes 1-3, else off+3)

// general repcode emission, mirroring the decoder's shifted semantics
// (repIdx = ofv-1 + (ll==0)); history updates per repIdx match the
// decoder exactly. Returns the offset_value for (dist, litRun).
static inline u32 zofv_map(const u32 rep[3], u32 dist, size_t litRun,
                           u32 nrep[3]) {
  nrep[0] = rep[0];
  nrep[1] = rep[1];
  nrep[2] = rep[2];
  if (litRun > 0) {
    if (dist == rep[0]) return 1;
    if (dist == rep[1]) {
      nrep[1] = rep[0];
      nrep[0] = dist;
      return 2;
    }
    if (dist == rep[2]) {
      nrep[2] = rep[1];
      nrep[1] = rep[0];
      nrep[0] = dist;
      return 3;
    }
  } else {
    if (dist == rep[1]) {
      nrep[1] = rep[0];
      nrep[0] = dist;
      return 1;
    }
    if (dist == rep[2]) {
      nrep[2] = rep[1];
      nrep[1] = rep[0];
      nrep[0] = dist;
      return 2;
    }
    if (dist + 1 == rep[0]) {
      nrep[2] = rep[1];
      nrep[1] = rep[0];
      nrep[0] = dist;
      return 3;
    }
  }
  nrep[2] = rep[1];
  nrep[1] = rep[0];
  nrep[0] = dist;
  return dist + 3;
}

static inline u32 zofv_emit(u32 rep[3], u32 dist, size_t litRun) {
  u32 nr[3];
  u32 ofv = zofv_map(rep, dist, litRun, nr);
  rep[0] = nr[0];
  rep[1] = nr[1];
  rep[2] = nr[2];
  return ofv;
}

// pick the cheapest mode for one code stream: 0 predefined, 1 RLE, 2 FSE
struct TableChoice {
  int mode;
  int tableLog;
  short norm[64];
  u8 rleSym;
};

static void choose_table(const u32* freq, int nsym, u32 total,
                         const short* def, int defLog, int maxLog,
                         TableChoice* tc) {
  memset(tc->norm, 0, sizeof(tc->norm));  // builders may scan past nsym
  int nz = 0, last = 0;
  for (int s = 0; s < nsym; s++)
    if (freq[s]) { nz++; last = s; }
  if (nz == 1) {
    tc->mode = 1;
    tc->rleSym = (u8)last;
    return;
  }
  i64 defCost = fse_cost_bits(freq, def, nsym, defLog);
  int tl = maxLog;
  while ((1 << (tl - 1)) > (int)total && tl > 5) tl--;
  short norm[64];
  i64 fseCost = -1;
  if (normalize_counts(freq, nsym, total, tl, norm) == 0) {
    fseCost = fse_cost_bits(freq, norm, nsym, tl);
    if (fseCost >= 0) fseCost += 40;  // ~ncount header bytes
  }
  if (defCost >= 0 && (fseCost < 0 || defCost <= fseCost)) {
    tc->mode = 0;
    return;
  }
  if (fseCost < 0) {  // predefined can't represent (freq beyond def range)
    // force FSE with a minimal valid normalization
    normalize_counts(freq, nsym, total, tl, norm);
  }
  tc->mode = 2;
  tc->tableLog = tl;
  memcpy(tc->norm, norm, sizeof(short) * (size_t)nsym);
}

// ---------------------------------------------------------------------------
// match finder: hash chains + lazy + repcode probe
// ---------------------------------------------------------------------------
static const int ZHASH_BITS = 17, ZHASH_SIZE = 1 << ZHASH_BITS;
static const int ZFAST_BITS_FWD = 17;  // kept in sync with ZFAST_BITS below
static const int HEAD_SLOTS = (2 << ZFAST_BITS_FWD) > ZHASH_SIZE
                                  ? (2 << ZFAST_BITS_FWD) : ZHASH_SIZE;

static inline u32 zhash(const u8* p) {
  u32 v;
  memcpy(&v, p, 4);
  return (v * 2654435761u) >> (32 - ZHASH_BITS);
}

static inline u32 zhash6(const u8* p) {  // 6-byte hash: the fast loop's
  // single probe then only surfaces candidates worth a sequence (matches
  // the reference's mls=6 at the fast levels on larger windows)
  u64 v;
  memcpy(&v, p, 8);
  return (u32)(((v & 0xFFFFFFFFFFFFULL) * 227718039650203ULL)
               >> (64 - ZHASH_BITS));
}

// Fast-loop bucket hash: 16 bits indexing 2-entry interleaved buckets in
// mf.head — both candidate slots land on ONE cache line (the split
// head/prev layout cost two random lines per probe; the probe is
// L2-bound, so halving the touched lines is the speed lever).
static const int ZFAST_BITS = ZFAST_BITS_FWD;
// The fast/dfast table width is a per-call parameter: stock sizes its
// hashLog ~13-16 so the single-probe tables stay cache-resident
// (clevels.h); a 2^17-bucket table made every probe an L2/DRAM miss —
// measured 6x encode cost on record-structured data (MEASURED.md r4).
static inline u32 zhash6f(const u8* p, int bits) {
  u64 v;
  memcpy(&v, p, 8);
  return (u32)(((v & 0xFFFFFFFFFFFFULL) * 227718039650203ULL)
               >> (64 - bits));
}

static inline u32 zhash8d(const u8* p, int bits) {  // 8-byte "long" hash
  // (dfast): a hit confirms 8 matching bytes in one 64-bit compare
  u64 v;
  memcpy(&v, p, 8);
  return (u32)((v * 0x9E3779B185EBCA87ULL) >> (64 - bits));
}

static inline u32 zhash5(const u8* p, int bits) {  // 5-byte hash for the
  // dfast short probe: fewer false positives than 4 bytes, so the single
  // probe usually hits a real match (the reference's ZSTD_hash5 idea)
  u64 v;
  memcpy(&v, p, 8);
  return (u32)(((v & 0xFFFFFFFFFFULL) * 889523592379ULL)
               >> (64 - bits));
}

static int zmatch_len(const u8* a, const u8* b, const u8* limit) {
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

// match-finder strategy per level (the reference's ZSTD_strategy axis):
// fast = single-probe bucket table; dfast = two tables (8-byte long hash
// + 5-byte short hash, no chain walking); chain = hash chains (+ lazy)
enum { ZSTRAT_CHAIN = 0, ZSTRAT_FAST = 1, ZSTRAT_DFAST = 2,
       ZSTRAT_ROW = 3, ZSTRAT_OPT = 4 };
// dstep: dfast interior-insertion stride inside matches (ratio/speed
// trade measured on text+ELF: 4 -> -1.6% output, 2 -> -2.9%, vs ~15%
// speed cost per halving); unused by the other strategies
struct LevelP { u32 window; int depth; int lazy; int nice; int clog;
                int strat; int dstep; };
// Row-hash match finder for the lazy mid levels — the same axis the
// reference invests in (AOCL_ZSTD_compressBlock_{greedy,lazy,lazy2}_row,
// algos/zstd/lib/compress/zstd_compress.c:3119-3144), own design: a row
// of 16 one-byte tags per hash bucket, probed with ONE SIMD compare, so
// a "chain walk" is a movemask loop over at most 16 in-cache candidates
// instead of a pointer chase through a window-sized prev ring.
static const int ZROW_BITS = 15;  // 32K rows
struct RowMF {
  u8* tags;       // [nrows][entries], 16-byte-aligned (SSE loads)
  int32_t* posr;  // [nrows][entries]
  u8* heads;      // [nrows] circular insert cursor
  u32 window;
  u32 entries;    // 16/32/64 per level — the depth analog
  u32 emask;

  bool alloc(u32 win, u32 nent) {
    window = win;
    entries = nent;
    emask = nent - 1;
    size_t nrows = (size_t)1 << ZROW_BITS;
    tags = (u8*)aligned_alloc(16, nrows * nent);
    posr = (int32_t*)malloc(sizeof(int32_t) * nrows * nent);
    heads = (u8*)calloc(nrows, 1);
    if (!tags || !posr || !heads) return false;
    memset(tags, 0, nrows * nent);
    // position slots start at -1 so stale tag hits validate out
    for (size_t i = 0; i < nrows * nent; i++) posr[i] = -1;
    return true;
  }
  void release() { free(tags); free(posr); free(heads); }

  static inline u64 rhash(const u8* p) {
    u64 v;
    memcpy(&v, p, 8);
    return (v & 0xFFFFFFFFFFFFULL) * 227718039650203ULL;
  }
  inline void insert(const u8* base, size_t pos) {
    u64 h = rhash(base + pos);
    u32 row = (u32)(h >> (64 - ZROW_BITS));
    u8 tag = (u8)(h >> (64 - ZROW_BITS - 8));
    u32 slot = (u32)(heads[row] = (u8)((heads[row] + 1) & emask));
    tags[row * entries + slot] = tag;
    posr[row * entries + slot] = (int32_t)pos;
  }
  int find(const u8* base, size_t pos, size_t n, int depth, int nice,
           u32* distOut) {
    const u8* limit = base + n;
    const u8* scan = base + pos;
    u64 h = rhash(base + pos);
    u32 row = (u32)(h >> (64 - ZROW_BITS));
    u8 tag = (u8)(h >> (64 - ZROW_BITS - 8));
    const u8* trow = tags + (size_t)row * entries;
    const int32_t* prow = posr + (size_t)row * entries;
    __m128i tv = _mm_set1_epi8((char)tag);
    u64 mask = 0;
    for (u32 b = 0; b < entries; b += 16) {
      __m128i rv = _mm_load_si128((const __m128i*)(trow + b));
      mask |= (u64)(u32)_mm_movemask_epi8(_mm_cmpeq_epi8(rv, tv)) << b;
    }
    int best = 0;
    u32 bestd = 0;
    // newest-first: walk slots backward from the insert cursor so the
    // nice-length cutoff lands on the closest (cheapest) offset
    u32 head = heads[row];
    u64 rot = (entries == 64 && head == 63)
                  ? mask
                  : ((mask >> (head + 1)) | (mask << (entries - head - 1)));
    if (entries < 64) rot &= ((u64)1 << entries) - 1;
    while (rot && depth > 0) {
      int rb = 63 - __builtin_clzll(rot);  // highest bit = most recent
      rot &= ~((u64)1 << rb);
      u32 slot = (u32)(rb + head + 1) & emask;
      int32_t cand = prow[slot];
      if (cand < 0) continue;
      size_t c = (size_t)cand;
      if (c >= pos || pos - c > window) continue;
      depth--;
      const u8* mp = base + c;
      if (best >= 2 && scan + best < limit) {
        u16 se, me;
        memcpy(&se, scan + best - 1, 2);
        memcpy(&me, mp + best - 1, 2);
        if (se != me) continue;
      }
      int l = zmatch_len(scan, mp, limit);
      if (l > best || (l == best && (u32)(pos - c) < bestd)) {
        best = l;
        bestd = (u32)(pos - c);
        if (l >= nice) break;
      }
    }
    *distOut = bestd;
    return best;
  }
};

// ---------------------------------------------------------------------------
// Optimal parse (levels 16+) — shortest path over approximate bit prices.
// The reference's btopt/btultra axis (zstd_opt.c idea, own structure):
// literal and ll/ml/of code prices are refreshed per block from the
// PREVIOUS block's emitted symbols (first block: flat defaults), nodes
// carry the repcode history and pending literal run of their best
// predecessor, and the winning path is replayed into the ordinary
// seqs/lits arrays — the block writer is unchanged, so the stream stays
// format-exact whatever the price model says.
// ---------------------------------------------------------------------------
struct ZOptPrices {
  u32 lit[256];  // 1/16-bit units
  u32 ll[36], ml[53], of[32];

  void defaults() {
    for (int i = 0; i < 256; i++) lit[i] = 6 * 16;
    for (int i = 0; i < 36; i++) ll[i] = 5 * 16 + (u32)LL_BITS[i] * 16;
    for (int i = 0; i < 53; i++) ml[i] = 5 * 16 + (u32)ML_BITS[i] * 16;
    for (int i = 0; i < 32; i++) of[i] = 5 * 16 + (u32)i * 16;
  }
  static void hist_prices(const u32* freq, u32* out, int nsym,
                          const u8* extraBits) {
    u64 total = 0;
    for (int i = 0; i < nsym; i++) total += freq[i];
    if (total == 0) return;  // keep previous prices
    double lt = std::log2((double)total);
    for (int i = 0; i < nsym; i++) {
      // unseen symbols get ~"1 occurrence" so they stay representable
      double f = freq[i] ? (double)freq[i] : 0.5;
      u32 p = (u32)((lt - std::log2(f)) * 16.0 + 0.5);
      if (p < 16) p = 16;
      out[i] = p + (extraBits ? (u32)extraBits[i] * 16 : 0);
    }
  }
  void refresh(const u8* lits, size_t nlit, const Seq* seqs, size_t nseq) {
    if (nlit >= 64) {
      u32 f[256] = {0};
      for (size_t i = 0; i < nlit; i++) f[lits[i]]++;
      hist_prices(f, lit, 256, nullptr);
    }
    if (nseq >= 16) {
      u32 fl[36] = {0}, fm[53] = {0}, fo[32] = {0};
      for (size_t i = 0; i < nseq; i++) {
        fl[ll_code(seqs[i].ll)]++;
        fm[ml_code(seqs[i].ml)]++;
        fo[highbit32(seqs[i].ofv)]++;
      }
      hist_prices(fl, ll, 36, LL_BITS);
      hist_prices(fm, ml, 53, ML_BITS);
      static const u8 ofExtra[32] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
                                     12, 13, 14, 15, 16, 17, 18, 19, 20,
                                     21, 22, 23, 24, 25, 26, 27, 28, 29,
                                     30, 31};
      hist_prices(fo, of, 32, ofExtra);
    }
  }
  inline u32 seq(u32 litRun, u32 mlv, u32 ofv) const {
    return ll[ll_code(litRun)] + ml[ml_code(mlv)] + of[highbit32(ofv)];
  }
};

struct ZOptNode {
  u32 price;
  int32_t from;
  int32_t len;    // bytes of the entering op (1 for literal)
  u32 dist;   // 0 = literal, else match distance
  u32 reps[3];
  u32 litRun;
};

// level ladder in the spirit of ZSTD_defaultCParameters
// (zstd_compress.c:7311-7405): window / depth / lazy steps / strategy.
// Strategy axis mirrors the reference's: fast (L1), dfast (L2-3),
// row-lazy (L5-12: SIMD tag rows + 4-byte assist, the
// AOCL_ZSTD_compressBlock_*_row analog), hash chains (L4, L13+)
static LevelP zparams(int level) {
  if (level < 0) {
    // negative = --fast levels (reference clevels.h row 0 "base for
    // negative levels" {19,12,13,1,6,1,fast} with targetLength = -level
    // as scan acceleration; zstd_compress.c ZSTD_getCParams_internal).
    // dstep carries the acceleration for the FAST scan loop.
    int accel = -level;
    if (accel > 64) accel = 64;
    return {1u << 19, 4, 0, 16, 13, ZSTRAT_FAST, accel};
  }
  if (level < 1) level = 1;
  if (level > 22) level = 22;
  // clog caps the chain-link table at 2^clog entries (the reference's
  // chainLog axis): full-window prev tables put every chain step in
  // DRAM at the mid levels; truncated chains alias rarely and find()
  // already breaks on a non-monotonic link.
  static const LevelP t[23] = {
    {0, 0, 0, 0, 0, 0, 0},
    // 8 MiB windows at L1-4: the reference replaces stock's level table
    // with wlog 23 for the fast tiers (clevels.h AOCL_ZSTD_defaultC-
    // Parameters L1-4) — on large inputs window reach IS the ratio
    // (measured: their L3 beat ours by 27% on an 8 MB ELF until this)
    {1u << 23, 4, 0, 16, 16, ZSTRAT_FAST, 0},  // 1
    {1u << 23, 6, 0, 24, 17, ZSTRAT_DFAST, 4}, // 2
    {1u << 23, 8, 0, 32, 17, ZSTRAT_DFAST, 2}, // 3
    {1u << 23, 12, 0, 48, 18, ZSTRAT_DFAST, 1},// 4 (dfast like the ref's L4)
    {1u << 21, 16, 1, 48, 18, ZSTRAT_ROW, 0},  // 5
    {1u << 21, 24, 1, 64, 18, ZSTRAT_ROW, 0},  // 6
    {1u << 21, 32, 2, 96, 19, ZSTRAT_ROW, 0},  // 7
    {1u << 22, 48, 2, 128, 20, ZSTRAT_ROW, 0}, // 8
    {1u << 22, 64, 2, 128, 20, ZSTRAT_ROW, 0}, // 9
    {1u << 22, 96, 2, 160, 21, ZSTRAT_ROW, 0}, // 10
    {1u << 22, 128, 2, 192, 21, ZSTRAT_ROW, 0},// 11
    {1u << 22, 192, 2, 224, 22, ZSTRAT_ROW, 0},// 12
    {1u << 23, 256, 2, 256, 22, ZSTRAT_CHAIN, 0},// 13
    {1u << 23, 384, 2, 273, 23, ZSTRAT_CHAIN, 0},// 14
    {1u << 23, 512, 2, 273, 23, ZSTRAT_CHAIN, 0},// 15
    {1u << 23, 768, 2, 273, 23, ZSTRAT_OPT, 0},// 16
    {1u << 24, 1024, 2, 273, 24, ZSTRAT_OPT, 0},// 17
    {1u << 24, 1536, 2, 273, 24, ZSTRAT_OPT, 0},// 18
    {1u << 24, 2048, 2, 273, 24, ZSTRAT_OPT, 0},// 19
    {1u << 25, 3072, 2, 273, 24, ZSTRAT_OPT, 0},// 20
    {1u << 25, 4096, 2, 273, 24, ZSTRAT_OPT, 0},// 21
    {1u << 26, 6144, 2, 273, 24, ZSTRAT_OPT, 0},// 22
  };
  return t[level];
}

struct ZMF {
  int32_t* head;
  int32_t* prev;
  u32 window;
  u32 cmask;  // chain-link table mask (2^clog - 1, <= window - 1)

  bool alloc(u32 win, int clog, int headSlots = HEAD_SLOTS) {
    window = win;
    u32 csize = (u32)1 << clog;
    if (csize > win) csize = win;
    cmask = csize - 1;
    // sized for BOTH layouts: the chain-level single-entry table
    // (ZHASH_SIZE) and the fast loop's interleaved 2-entry buckets
    // (2 << fbits); only the slots the strategy actually indexes are
    // cleared (small fast tables keep the per-call memset cheap too)
    head = (int32_t*)malloc(sizeof(int32_t) * HEAD_SLOTS);
    prev = (int32_t*)malloc(sizeof(int32_t) * (size_t)csize);
    if (!head || !prev) return false;
    memset(head, -1, sizeof(int32_t) * (size_t)headSlots);
    return true;
  }
  void release() { free(head); free(prev); }
  inline void insert(const u8* base, size_t pos) {
    u32 h = zhash(base + pos);
    prev[pos & cmask] = head[h];
    head[h] = (int32_t)pos;
  }
  int find(const u8* base, size_t pos, size_t n, int depth, int nice,
           u32* distOut) {
    const u8* limit = base + n;
    const u8* scan = base + pos;
    int best = 0;
    u32 bestd = 0;
    int32_t cand = head[zhash(base + pos)];
    while (cand >= 0 && depth-- > 0) {
      size_t c = (size_t)cand;
      if (pos - c >= window) break;
      const u8* mp = base + c;
      // scan-end fast reject (zlib longest_match idiom, same win as in
      // csrc/deflate.cpp): a candidate can only beat `best` if it also
      // matches at scan[best-1..best]
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
      int l = zmatch_len(scan, mp, limit);
      if (l > best) {
        best = l;
        bestd = (u32)(pos - c);
        if (l >= nice) break;
      }
      int32_t nx = prev[c & cmask];
      if (nx >= (int32_t)c) break;
      cand = nx;
    }
    *distOut = bestd;
    return best;
  }

  // pair walk for the optimal parse: record (len, dist) on every length
  // improvement so each length gets its closest achieving distance
  struct MPair { int len; u32 dist; };
  int find_pairs(const u8* base, size_t pos, size_t n, int depth,
                 MPair* out, int maxPairs) {
    const u8* limit = base + n;
    const u8* scan = base + pos;
    int best = 2;  // pairs start at len 3 (zstd min match)
    int cnt = 0;
    int fskip = depth * 4;  // future-skip budget, not charged to depth
    int32_t cand = head[zhash(base + pos)];
    while (cand >= 0 && cnt < maxPairs) {
      size_t c = (size_t)cand;
      if (c >= pos) {  // the two-pass DP pre-inserts positions ahead
        if (fskip-- <= 0) break;
        int32_t nxf = prev[c & cmask];
        if (nxf >= (int32_t)c) break;
        cand = nxf;
        continue;
      }
      if (pos - c >= window) break;
      if (depth-- <= 0) break;
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
      int l = zmatch_len(scan, mp, limit);
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

// ---------------------------------------------------------------------------
// block assembly
// ---------------------------------------------------------------------------

// Previous-block / dictionary entropy state threaded through the block
// writers — the encode-side mirror of the decoder's DCtx persistence.
// Treeless_Literals blocks and Repeat_Mode sequence tables reference it;
// a structured dictionary seeds it (the reference's CDict small-payload
// win: no per-frame table headers — zstd_compress_usingCDict path).
struct PrevEntropy {
  HufEnc huf;
  bool hufV = false;
  short llN[64] = {0}, ofN[64] = {0}, mlN[64] = {0};
  int llL = 0, ofL = 0, mlL = 0;
  bool llV = false, ofV = false, mlV = false;
};

// Training-time histogram collection (dictionary builder only): when the
// trainer arms these via atpu_zstd_set_stats, the block writers
// accumulate the literal/code distributions the emitted stream actually
// used — the input ZDICT_analyzeEntropy derives its tables from. Not
// thread-safe; nulled in production.
static u32* g_statLit = nullptr;
static u32* g_statLL = nullptr;
static u32* g_statOF = nullptr;
static u32* g_statML = nullptr;

// write the literals section; returns size or <0
static i64 write_literals(const u8* lit, size_t n, u8* out, size_t cap,
                          PrevEntropy* pe) {
  if (g_statLit)
    for (size_t i = 0; i < n; i++) g_statLit[lit[i]]++;
  // try Huffman: a fresh per-block table vs treeless reuse of the
  // dictionary/previous table (no description bytes) — whichever is
  // smaller. Treeless is attempted from n >= 8 (zero header amortizes
  // at much smaller blocks than a fresh table does).
  u8* body = nullptr;
  size_t bl = 0;
  int type = 2;
  HufEnc he;
  EPROF_T0();
  if (n >= 8) {
    // 4-way split histogram: a single count table store-forwards every
    // repeated symbol (text literals repeat constantly); four disjoint
    // tables let the increments pipeline (the reference's HIST_count_
    // parallel idea, hist.c — own shape)
    u32 freq[256] = {0};
    {
      u32 f1[256] = {0}, f2[256] = {0}, f3[256] = {0};
      size_t i = 0;
      for (; i + 4 <= n; i += 4) {
        freq[lit[i]]++;
        f1[lit[i + 1]]++;
        f2[lit[i + 2]]++;
        f3[lit[i + 3]]++;
      }
      for (; i < n; i++) freq[lit[i]]++;
      for (int v = 0; v < 256; v++) freq[v] += f1[v] + f2[v] + f3[v];
    }
    EPROF_ADD(1);
    // exact treeless cost in bits; -1 = a literal the prev table can't code
    i64 tlBits = (pe && pe->hufV) ? 0 : -1;
    if (tlBits == 0) {
      for (int s = 0; s < 256; s++) {
        if (!freq[s]) continue;
        if (!pe->huf.nbits[s]) { tlBits = -1; break; }
        tlBits += (i64)freq[s] * pe->huf.nbits[s];
      }
    }
    // Shannon pre-reject for the fresh attempt: skip the table build +
    // encode pass when even the entropy bound cannot beat raw
    double bits = 0.0;
    for (int s = 0; s < 256; s++)
      if (freq[s]) bits += (double)freq[s] * log2((double)n / freq[s]);
    u8 desc[300];
    int ds = 0;
    bool heBuilt = false;
    if (n >= 32 && (size_t)(bits / 8.0) + 64 < n && he.build(freq)) {
      ds = he.write_desc(desc, sizeof(desc));
      heBuilt = ds > 0;
    }
    EPROF_ADD(2);
    bool four = n > 1023;  // 4 streams mandatory above 1023 regenerated

    auto stream_body = [&](const HufEnc& h, const u8* d, int dsz,
                           u8* b) -> i64 {
      size_t l = (size_t)dsz;
      if (dsz > 0) memcpy(b, d, (size_t)dsz);
      if (!four) {
        size_t sl = h.stream(lit, n, b + l, n + 400 - l);
        if (!sl) return -1;
        return (i64)(l + sl);
      }
      size_t j = l;
      l += 6;
      size_t sls[4];
      i64 sl4 = h.stream4(lit, n, b + l, n + 400 - l, sls);
      if (sl4 < 0) return -1;
      l += (size_t)sl4;
      wr16le(b + j, (u16)sls[0]);
      wr16le(b + j + 2, (u16)sls[1]);
      wr16le(b + j + 4, (u16)sls[2]);
      return (i64)l;
    };

    u8* bodyF = nullptr;
    i64 blF = -1;
    u8* bodyT = nullptr;
    i64 blT = -1;
    if (heBuilt) {
      bodyF = (u8*)malloc(n + 512);
      if (bodyF) blF = stream_body(he, desc, ds, bodyF);
    }
    if (tlBits >= 0 && (size_t)(tlBits / 8) + 8 < n) {
      bodyT = (u8*)malloc(n + 512);
      if (bodyT) blT = stream_body(pe->huf, nullptr, 0, bodyT);
    }
    EPROF_ADD(3);
    if (blT >= 0 && (blF < 0 || blT <= blF)) {
      body = bodyT;
      bl = (size_t)blT;
      type = 3;
      free(bodyF);
    } else if (blF >= 0) {
      body = bodyF;
      bl = (size_t)blF;
      type = 2;
      free(bodyT);
    } else {
      free(bodyF);
      free(bodyT);
    }
  }
  if (body) {
    // header: choose the smallest size_format that fits
    size_t csz = bl;
    bool four = n > 1023;
    size_t hdr;
    u64 h;
    u64 ty = (u64)type;
    if (!four && n < 1024 && csz < 1024) {
      h = ty | (0ull << 2) | ((u64)n << 4) | ((u64)csz << 14);
      hdr = 3;
    } else if (n < 16384 && csz < 16384) {
      hdr = 4;
      h = ty | (2ull << 2) | ((u64)n << 4) | ((u64)csz << 18);
    } else {
      h = ty | (3ull << 2) | ((u64)n << 4) | ((u64)csz << 22);
      hdr = 5;
    }
    // size_format 1 (4 streams, 10-bit sizes) packed in 3 bytes:
    if (four && n < 1024 && csz < 1024) {
      h = ty | (1ull << 2) | ((u64)n << 4) | ((u64)csz << 14);
      hdr = 3;
    }
    if (hdr + csz < n && hdr + csz <= cap) {
      for (size_t k = 0; k < hdr; k++) out[k] = (u8)(h >> (8 * k));
      memcpy(out + hdr, body, csz);
      free(body);
      if (type == 2 && pe) {
        pe->huf = he;  // the decoder's ctx->huf now holds this table
        pe->hufV = true;
      }
      return (i64)(hdr + csz);
    }
    free(body);
  }
  // RLE literals
  if (n >= 2) {
    bool all = true;
    for (size_t i = 1; i < n && all; i++) all = lit[i] == lit[0];
    if (all) {
      if (n < 32) {
        if (cap < 2) return ERR_DST_SMALL;
        out[0] = (u8)(1 | (0 << 2) | (n << 3));
        out[1] = lit[0];
        return 2;
      }
      if (n < 4096) {
        if (cap < 3) return ERR_DST_SMALL;
        u32 h = 1u | (1u << 2) | ((u32)n << 4);
        out[0] = (u8)h;
        out[1] = (u8)(h >> 8);
        out[2] = lit[0];
        return 3;
      }
      if (cap < 4) return ERR_DST_SMALL;
      u32 h = 1u | (3u << 2) | ((u32)n << 4);
      out[0] = (u8)h;
      out[1] = (u8)(h >> 8);
      out[2] = (u8)(h >> 16);
      out[3] = lit[0];
      return 4;
    }
  }
  // raw literals
  size_t hdr;
  if (n < 32) {
    if (cap < 1 + n) return ERR_DST_SMALL;
    out[0] = (u8)(0 | (0 << 2) | (n << 3));
    hdr = 1;
  } else if (n < 4096) {
    if (cap < 2 + n) return ERR_DST_SMALL;
    u32 h = 0u | (1u << 2) | ((u32)n << 4);
    out[0] = (u8)h;
    out[1] = (u8)(h >> 8);
    hdr = 2;
  } else {
    if (cap < 3 + n) return ERR_DST_SMALL;
    u32 h = 0u | (3u << 2) | ((u32)n << 4);
    out[0] = (u8)h;
    out[1] = (u8)(h >> 8);
    out[2] = (u8)(h >> 16);
    hdr = 3;
  }
  memcpy(out + hdr, lit, n);
  return (i64)(hdr + n);
}

static i64 write_sequences(const Seq* seqs, size_t nseq, u8* out,
                           size_t cap, PrevEntropy* pe) {
  size_t len = 0;
  if (nseq < 128) {
    if (cap < 1) return ERR_DST_SMALL;
    out[len++] = (u8)nseq;
  } else if (nseq < 0x7F00) {
    if (cap < 2) return ERR_DST_SMALL;
    out[len++] = (u8)((nseq >> 8) + 0x80);
    out[len++] = (u8)nseq;
  } else {
    if (cap < 3) return ERR_DST_SMALL;
    out[len++] = 0xFF;
    wr16le(out + len, (u16)(nseq - 0x7F00));
    len += 2;
  }
  if (nseq == 0) return (i64)len;

  // histogram pass also stages the three per-sequence code bytes so the
  // hot encode loop below reads bytes instead of re-deriving codes
  // (stock's ZSTD_seqToCodes shape — own code)
  static thread_local u8 llcArr[BLOCK_MAX / 3 + 16];
  static thread_local u8 mlcArr[BLOCK_MAX / 3 + 16];
  static thread_local u8 ofcArr[BLOCK_MAX / 3 + 16];
  u32 llf[36] = {0}, mlf[53] = {0}, off[32] = {0};
  for (size_t i = 0; i < nseq; i++) {
    int lc = ll_code(seqs[i].ll);
    int mc = ml_code(seqs[i].ml);
    int oc = highbit32(seqs[i].ofv);
    llcArr[i] = (u8)lc;
    mlcArr[i] = (u8)mc;
    ofcArr[i] = (u8)oc;
    llf[lc]++;
    mlf[mc]++;
    if (oc > 30) return ERR_CORRUPT;
    off[oc]++;
  }
  if (g_statLL) {
    for (int s = 0; s < 36; s++) g_statLL[s] += llf[s];
    for (int s = 0; s < 32; s++) g_statOF[s] += off[s];
    for (int s = 0; s < 53; s++) g_statML[s] += mlf[s];
  }
  EPROF_T0();
  TableChoice tcll, tcof, tcml;
  choose_table(llf, 36, (u32)nseq, LL_DEF, LL_DEFLOG, 9, &tcll);
  choose_table(off, 29, (u32)nseq, OF_DEF, OF_DEFLOG, 8, &tcof);
  // offsets beyond the predefined table's 28 codes force FSE/RLE
  {
    bool big = false;
    for (int s = 29; s < 32; s++) if (off[s]) big = true;
    if (big) {
      int tl = 8;
      short norm[32];
      if (normalize_counts(off, 32, (u32)nseq, tl, norm) != 0)
        return ERR_CORRUPT;
      tcof.mode = 2;
      tcof.tableLog = tl;
      memcpy(tcof.norm, norm, sizeof(short) * 32);
    }
  }
  choose_table(mlf, 53, (u32)nseq, ML_DEF, ML_DEFLOG, 9, &tcml);

  // Repeat_Mode: when the dictionary / previous block's table covers the
  // histogram and beats the chosen mode's cost (FSE pays ~5 bytes of
  // ncount header; repeat pays zero), reference it instead — the
  // small-payload dictionary win (decoder ctx tables persist; mode 3).
  auto consider_repeat = [&](TableChoice& tc, const u32* freq, int nsym,
                             const short* pN, int pL, bool pV,
                             const short* def, int defLog, int defSyms) {
    if (!pV || tc.mode == 1) return;  // RLE's 1-byte header always wins
    i64 rep = fse_cost_bits(freq, pN, nsym, pL);
    if (rep < 0) return;
    i64 cur;
    if (tc.mode == 0) {
      cur = fse_cost_bits(freq, def, defSyms, defLog);
    } else {
      cur = fse_cost_bits(freq, tc.norm, nsym, tc.tableLog);
      if (cur >= 0) cur += 40;  // ~ncount header, matches choose_table
    }
    if (cur < 0 || rep < cur) tc.mode = 3;
  };
  if (pe) {
    consider_repeat(tcll, llf, 36, pe->llN, pe->llL, pe->llV,
                    LL_DEF, LL_DEFLOG, 36);
    consider_repeat(tcof, off, 32, pe->ofN, pe->ofL, pe->ofV,
                    OF_DEF, OF_DEFLOG, 29);
    consider_repeat(tcml, mlf, 53, pe->mlN, pe->mlL, pe->mlV,
                    ML_DEF, ML_DEFLOG, 53);
  }

  if (cap < len + 1) return ERR_DST_SMALL;
  out[len++] = (u8)((tcll.mode << 6) | (tcof.mode << 4) | (tcml.mode << 2));
  EPROF_ADD(6);

  FSEEnc ell, eof_, eml;
  auto setup = [&](TableChoice& tc, FSEEnc& e, const short* def, int defLog,
                   int nsym, int defSyms, short* pN, int* pL,
                   bool* pV) -> bool {
    // defSyms = entry count of the predefined table (OF_DEF has 29, not
    // nsym=32 — reading def[29..31] is out of bounds)
    if (tc.mode == 0) {
      e.build(def, defSyms, defLog);
      if (pN) {  // the decoder's ctx table now holds the predefined dist
        memset(pN, 0, sizeof(short) * 64);
        memcpy(pN, def, sizeof(short) * (size_t)defSyms);
        *pL = defLog;
        *pV = true;
      }
    } else if (tc.mode == 1) {
      if (len + 1 > cap) return false;
      out[len++] = tc.rleSym;
      short rle[64] = {0};
      // RLE mode: tableLog 0 — emulate with a 1-entry table (log 0 means
      // state bits 0); our FSEEnc needs log>=1, so build a trivial table
      rle[tc.rleSym] = 1;
      e.build(rle, tc.rleSym + 1, 0);
      if (pN) {
        memset(pN, 0, sizeof(short) * 64);
        pN[tc.rleSym] = 1;
        *pL = 0;
        *pV = true;
      }
    } else if (tc.mode == 3) {  // repeat: previous/dictionary table
      e.build(pN, nsym, *pL);
    } else {
      u8 hdr[80];
      int maxs = 0;
      for (int s = 0; s < nsym; s++) if (tc.norm[s]) maxs = s;
      int hs = write_ncount(tc.norm, maxs + 1, tc.tableLog, hdr,
                            sizeof(hdr));
      if (hs <= 0 || len + (size_t)hs > cap) return false;
      memcpy(out + len, hdr, (size_t)hs);
      len += (size_t)hs;
      e.build(tc.norm, nsym, tc.tableLog);
      if (pN) {
        memset(pN, 0, sizeof(short) * 64);
        memcpy(pN, tc.norm, sizeof(short) * (size_t)nsym);
        *pL = tc.tableLog;
        *pV = true;
      }
    }
    return true;
  };
  short dumN[64];
  int dumL;
  bool dumV;
  short* llN = pe ? pe->llN : dumN;
  short* ofN = pe ? pe->ofN : dumN;
  short* mlN = pe ? pe->mlN : dumN;
  int* llL = pe ? &pe->llL : &dumL;
  int* ofL = pe ? &pe->ofL : &dumL;
  int* mlL = pe ? &pe->mlL : &dumL;
  bool* llV = pe ? &pe->llV : &dumV;
  bool* ofV = pe ? &pe->ofV : &dumV;
  bool* mlV = pe ? &pe->mlV : &dumV;
  if (!setup(tcll, ell, LL_DEF, LL_DEFLOG, 36, 36, llN, llL, llV) ||
      !setup(tcof, eof_, OF_DEF, OF_DEFLOG, 32, 29, ofN, ofL, ofV) ||
      !setup(tcml, eml, ML_DEF, ML_DEFLOG, 53, 53, mlN, mlL, mlV))
    return ERR_DST_SMALL;

  EPROF_ADD(7);
  BitW bw(out + len, cap - len);
  // encode backwards: init states from the LAST sequence, then loop.
  // Per sequence: ONE fused put for the three state transitions
  // (of|ml|ll, <= 27 bits) and one for the ll+ml extras (<= 32 bits) —
  // the same bit layout as the former six puts, a third of the
  // flush-check overhead.
  size_t n1 = nseq - 1;
  {
    int lc = llcArr[n1], mc = mlcArr[n1], oc = ofcArr[n1];
    ell.init_state(lc);
    eof_.init_state(oc);
    eml.init_state(mc);
    int lb = LL_BITS[lc], mb = ML_BITS[mc];
    bw.put((seqs[n1].ll - LL_BASE[lc])
               | ((seqs[n1].ml - ML_BASE[mc]) << lb), lb + mb);
    bw.put(seqs[n1].ofv - (1u << oc), oc);
  }
  for (size_t i = n1; i-- > 0;) {
    int lc = llcArr[i], mc = mlcArr[i], oc = ofcArr[i];
    int no, nm, nl;
    u32 bo = eof_.step(oc, &no);
    u32 bm = eml.step(mc, &nm);
    u32 bl = ell.step(lc, &nl);
    // two unchecked adds + two byte-granular flushes per sequence
    // (invariant: nbits <= 7 after flush; states <= 27 bits, extras
    // lb+mb+oc <= 56 except astronomically long ll/ml with a 25+ bit
    // offset together — split path below keeps the invariant exact)
    bw.add(bo | (bm << no) | ((u64)bl << (no + nm)), no + nm + nl);
    bw.flush();
    int lb = LL_BITS[lc], mb = ML_BITS[mc];
    u64 exll = (u64)(seqs[i].ll - LL_BASE[lc])
               | ((u64)(seqs[i].ml - ML_BASE[mc]) << lb);
    if (lb + mb + oc <= 56) {
      bw.add(exll | ((u64)(seqs[i].ofv - (1u << oc)) << (lb + mb)),
             lb + mb + oc);
    } else {
      bw.add(exll, lb + mb);
      bw.flush();
      bw.add(seqs[i].ofv - (1u << oc), oc);
    }
    bw.flush();
  }
  eml.flush(bw);
  eof_.flush(bw);
  ell.flush(bw);
  size_t sl = bw.close();
  if (bw.overflow) return ERR_DST_SMALL;
  return (i64)(len + sl);
}

// ---------------------------------------------------------------------------
// frame encoder
// ---------------------------------------------------------------------------

struct EvalResult { int len; u32 dist; };

}  // namespace

extern "C" u64 atpu_xxh64(const u8* src, size_t len, u64 seed);
extern "C" i64 atpu_zstd_dict_info(const u8* dict, size_t dictSize,
                                   size_t* contentOff, u32* reps,
                                   u32* dictID);
extern "C" i64 atpu_zstd_dict_entropy(const u8* dict, size_t dictSize,
                                      u8* hufNb, int* hufLog,
                                      short* llNorm, int* llLog,
                                      short* ofNorm, int* ofLog,
                                      short* mlNorm, int* mlLog);

// flags bit 0: emit a Content_Checksum (low 32 of XXH64, RFC 8878 §3.1.1;
// reference: ZSTD_c_checksumFlag, zstd_compress.c:916)
ATPU_EXPORT i64 atpu_zstd_compress_ex(const u8* src, size_t n, u8* dst,
                                      size_t dstCap, int level,
                                      const u8* dict, size_t dictSize,
                                      int flags) {
  LevelP lp = zparams(level);
  u32 rep[3] = {1, 4, 8};
  const u8* dcontent = nullptr;
  size_t dlen = 0;
  u32 dictID = 0;
  PrevEntropy pe;
  if (dict && dictSize) {
    size_t coff = 0;
    u32 reps2[3];
    u32 did = 0;
    i64 cl = atpu_zstd_dict_info(dict, dictSize, &coff, reps2, &did);
    if (cl < 0) return ERR_CORRUPT;
    dcontent = dict + coff;
    dlen = (size_t)cl;
    dictID = did;
    rep[0] = reps2[0];
    rep[1] = reps2[1];
    rep[2] = reps2[2];
    if (did || coff > 8) {  // structured dict: seed the entropy state
      u8 hufNb[256];
      int hufLog;
      if (atpu_zstd_dict_entropy(dict, dictSize, hufNb, &hufLog,
                                 pe.llN, &pe.llL, pe.ofN, &pe.ofL,
                                 pe.mlN, &pe.mlL) == 0) {
        pe.hufV = pe.huf.build_from_nbits(hufNb);
        pe.llV = pe.ofV = pe.mlV = true;
      }
    }
  }

  // ---- long-distance match pre-pass (LDM) ----
  // Reference capability: zstd_ldm.c + zstd_ldm_geartab.h find
  // window-scale matches the chain/row matchers cannot reach. Own
  // scheme: one forward pass hashing the 8-byte window at EVERY
  // position into a 2^20 last-occurrence table; a verified far match
  // >= 64 bytes is recorded and the scan jumps over it. Candidates are
  // interval-filled per block and injected after the normal matcher's
  // evaluate() — a longer LDM match simply wins the comparison. The
  // declared frame window grows to cover the distances (capped at
  // 2^27, the stock decoder's no-flag acceptance limit). Active at the
  // row/chain levels on >= 8 MiB inputs; the opt tier's bt matcher
  // already reaches the whole window.
  u32* ldmStart = nullptr;
  u32* ldmDistA = nullptr;
  u32* ldmLenA = nullptr;
  size_t ldmCount = 0, ldmCursor = 0;
  u32* ldmD = nullptr;
  int32_t* ldmR = nullptr;
  {
    bool wantLdm = (lp.strat == ZSTRAT_ROW || lp.strat == ZSTRAT_CHAIN) &&
                   n >= ((size_t)8 << 20);
    const char* e = getenv("AOCL_ZSTD_LDM");
    if (e && e[0] == '0') wantLdm = false;
    if (wantLdm) {
      const size_t cap = n / 64 + 64;
      ldmStart = (u32*)malloc(cap * sizeof(u32) * 3);
      int32_t* ltab = (int32_t*)malloc(sizeof(int32_t) << 20);
      if (ldmStart && ltab) {
        ldmDistA = ldmStart + cap;
        ldmLenA = ldmDistA + cap;
        memset(ltab, 0xFF, sizeof(int32_t) << 20);
        u32 maxDist = 0;
        const size_t minFar = lp.window >> 1;
        const size_t send = n > 80 ? n - 80 : 0;
        const u8* lim = src + n;
        size_t p = 0;
        while (p < send) {
          u32 h = (u32)((rd64le_(src + p) * 0x9E3779B185EBCA87ull) >> 44);
          int32_t c = ltab[h];
          ltab[h] = (int32_t)p;
          if (c >= 0) {
            size_t d = p - (size_t)c;
            if (d > minFar && d <= ((size_t)1 << 27) &&
                rd64le_(src + (size_t)c) == rd64le_(src + p)) {
              size_t l = 8 + (size_t)zmatch_len(src + p + 8,
                                                src + (size_t)c + 8, lim);
              if (l >= 64 && ldmCount < cap) {
                ldmStart[ldmCount] = (u32)p;
                ldmDistA[ldmCount] = (u32)d;
                ldmLenA[ldmCount] =
                    (u32)(l > 0x20000 ? 0x20000 : l);
                ldmCount++;
                if ((u32)d > maxDist) maxDist = (u32)d;
                p += l;
                continue;
              }
            }
          }
          p++;
        }
        if (ldmCount) {
          while (lp.window < maxDist) lp.window <<= 1;
          ldmD = (u32*)malloc(sizeof(u32) * BLOCK_MAX);
          ldmR = (int32_t*)malloc(sizeof(int32_t) * BLOCK_MAX);
          if (!ldmD || !ldmR) {
            free(ldmD);
            free(ldmR);
            ldmD = nullptr;
            ldmR = nullptr;
            ldmCount = 0;
          }
        }
      }
      free(ltab);
      if (!ldmCount) {
        free(ldmStart);
        ldmStart = nullptr;
      }
    }
  }

  // ---- frame header ----
  size_t op = 0;
  if (dstCap < 24) return ERR_DST_SMALL;
  wr32le(dst, 0xFD2FB528u);
  op = 4;
  u8 fhd;
  int fcsLen;
  if (n >= (1ull << 32)) { fhd = 0xC0; fcsLen = 8; }
  else if (n >= 65536 + 256) { fhd = 0x80; fcsLen = 4; }
  else if (n >= 256) { fhd = 0x40; fcsLen = 2; }
  else { fhd = 0x00; fcsLen = 1; }
  if (fcsLen == 1) fhd |= 0x20;  // single-segment => 1-byte FCS present
  if (flags & 1) fhd |= 0x04;    // Content_Checksum_flag
  if (dictID) fhd |= 3;          // 4-byte dictionary ID
  dst[op++] = fhd;
  if (!(fhd & 0x20)) {
    u32 wsz = lp.window;
    int wlog = highbit32(wsz);
    if (wlog < 10) wlog = 10;
    dst[op++] = (u8)((wlog - 10) << 3);
  }
  if (dictID) { wr32le(dst + op, dictID); op += 4; }
  if (fcsLen == 1) dst[op++] = (u8)n;
  else if (fcsLen == 2) { wr16le(dst + op, (u16)(n - 256)); op += 2; }
  else if (fcsLen == 4) { wr32le(dst + op, (u32)n); op += 4; }
  else { u64 v = n; memcpy(dst + op, &v, 8); op += 8; }

  // ---- virtual prefix: dict content precedes src in match space ----
  size_t pref = dlen;
  u8* buf = nullptr;
  const u8* base = src;
  if (pref) {
    buf = (u8*)malloc(pref + n + 8);
    if (!buf) return ERR_CORRUPT;
    memcpy(buf, dcontent, pref);
    memcpy(buf + pref, src, n);
    base = buf;
  }
  size_t total = pref + n;

  ZMF mf;
  Seq* seqs = nullptr;
  u8* lits = nullptr;
  u8* scratch = nullptr;
  ZOptNode* onodes = nullptr;
  u8* scratch2 = nullptr;   // block-splitter trial buffers (opt tier)
  u8* scratch3 = nullptr;
  int32_t* h3tab = nullptr;  // 3-byte last-occurrence (opt tier assist)
  u32* ppIdx = nullptr;
  u8* ppCnt = nullptr;
  u32* ppPool = nullptr;
  const size_t PP_POOL_CAP = (size_t)(BLOCK_MAX + 1) * 8;
  int32_t* opath = nullptr;
  ZOptPrices* oprices = nullptr;
  i64 result = ERR_CORRUPT;
  RowMF rmf{};
  btmf::BtMF btm;   // bt matcher for the optimal-parse levels (L16+)
  bool useBt = false;
  bool useRow = lp.strat == ZSTRAT_ROW;
  bool useOpt = lp.strat == ZSTRAT_OPT;
  // fast/dfast single-probe table width: sized to stay cache-resident
  // (stock's hashLog idiom, clevels.h). Chain/row levels keep ZHASH_BITS.
  bool useFastTabs = (lp.strat == ZSTRAT_FAST || lp.strat == ZSTRAT_DFAST)
                     && pref == 0;
  int fbits = ZFAST_BITS;
  if (useFastTabs) {
    // re-measured round 5 AFTER the 8 MiB-window change (which made the
    // old r4 "14/15 beat 17" numbers stale): at wlog 23 a 16-bit fast
    // table beats 15 on BOTH axes for ELF input (libc 200 -> 244 MB/s,
    // ratio 2.44 -> 3.38) at ~5% scan cost on text; 17 pays 10-20%
    // speed for +0.5% ratio — 16 is the knee
    // dfast: 16-bit tables keep L2/L3 in L2-cache; L4 (depth 12 in the
    // table = the ref's hlog-18 tier) trades residency for reach
    fbits = (lp.strat == ZSTRAT_FAST) ? (lp.dstep ? 13 : 16)
            : (lp.strat == ZSTRAT_DFAST && lp.depth >= 12) ? 17 : 16;
    int slog = highbit32((u32)(total | 1)) + 1;  // don't oversize on
    if (fbits > slog) fbits = slog;              // small inputs
  }
  if (!mf.alloc(lp.window, useRow ? 4 : lp.clog,
                useFastTabs ? (2 << fbits) : HEAD_SLOTS)) {
    free(buf);
    return ERR_CORRUPT;
  }
  // row width = the depth analog: 16 at L5-6, 32 at L7-8, 64 at L9+
  u32 rowEnt = lp.depth <= 24 ? 16 : (lp.depth <= 48 ? 32 : 64);
  if (useRow && !rmf.alloc(lp.window, rowEnt)) {
    mf.release();
  btm.release();
  if (useRow) rmf.release();
    free(buf);
    return ERR_CORRUPT;
  }
  // fast loop's interleaved 2-entry buckets live in mf.head (HEAD_SLOTS
  // covers 2 << ZFAST_BITS), which alloc() already clears — mf.prev is
  // untouched at the fast levels (no extra clear per call)
  seqs = (Seq*)malloc(sizeof(Seq) * (BLOCK_MAX / 3 + 16));
  lits = (u8*)malloc(BLOCK_MAX + 64);
  scratch = (u8*)malloc(BLOCK_MAX + (BLOCK_MAX >> 2) + 4096);
  if (!seqs || !lits || !scratch) goto done;
  if (useOpt) {
    onodes = (ZOptNode*)malloc(sizeof(ZOptNode) * (BLOCK_MAX + 1));
    opath = (int32_t*)malloc(sizeof(int32_t) * (BLOCK_MAX + 1));
    oprices = (ZOptPrices*)malloc(sizeof(ZOptPrices));
    // pass-1 pair pool: the repriced second DP pass replays the
    // dominance-filtered candidate set instead of re-walking the
    // tree/chains (btultra2-style two-pass at every block would
    // otherwise double the match-finding bill)
    ppIdx = (u32*)malloc(sizeof(u32) * (BLOCK_MAX + 1));
    ppCnt = (u8*)malloc(BLOCK_MAX + 1);
    ppPool = (u32*)malloc(sizeof(u32) * 2 * PP_POOL_CAP);
    // dedicated 3-byte table: chains/bt hash >= 4 bytes, so cheap CLOSE
    // len-3 matches (repcode fodder) were invisible to the DP — the
    // reference's btopt keeps an explicit hash3 for exactly this
    // (ZSTD_insertAndFindFirstIndexHash3, zstd_opt.c)
    h3tab = (int32_t*)malloc(sizeof(int32_t) << 16);
    scratch2 = (u8*)malloc(BLOCK_MAX + (BLOCK_MAX >> 2) + 16384);
    scratch3 = (u8*)malloc(BLOCK_MAX + (BLOCK_MAX >> 2) + 16384);
    if (!onodes || !opath || !oprices || !ppIdx || !ppCnt || !ppPool ||
        !h3tab || !scratch2 || !scratch3)
      goto done;
    memset(h3tab, 0xFF, sizeof(int32_t) << 16);
    oprices->defaults();
    // binary-tree matcher (the ZSTD_BtGetAllMatches / btopt investment
    // point, shared implementation csrc/btmf.h): deeper verified reach
    // than chains at the same visit budget. Chain fallback if the
    // 2*i32*total tree does not fit.
    const char* btEnv = getenv("AOCL_ZSTD_BT");
    if (total <= btmf::BTMF_MAX_N && !(btEnv && btEnv[0] == '0')) {
      useBt = btm.alloc(lp.window, total, ZHASH_BITS);
      btm.minLen = 3;  // zstd minimum match length
    }
  }
  if (useRow) {
    for (size_t i = 0; i + 8 <= pref; i++) {
      rmf.insert(base, i);
      mf.head[zhash(base + i)] = (int32_t)i;
    }
  } else if (useBt) {
    for (size_t i = 0; i + 4 <= pref; i++)
      btm.insert(base, i, total, 16, 65538);
  } else {
    for (size_t i = 0; i + 4 <= pref; i++) mf.insert(base, i);
  }

  {
    size_t pos = pref;
    bool first = true;
    while (pos < total || first) {
      first = false;
      size_t bstart = pos;
      size_t blockEnd = pos + BLOCK_MAX < total ? pos + BLOCK_MAX : total;
      size_t nseq = 0, nlit = 0;
      u32 run = 0;
      u32 repSnap[3] = {rep[0], rep[1], rep[2]};
      EPROF_T0();

      // interval-fill this block's LDM candidates (positions are
      // src-relative in the list; +pref maps into match space)
      const bool ldmBlk = ldmD != nullptr;
      if (ldmBlk) {
        memset(ldmD, 0, sizeof(u32) * (blockEnd - bstart));
        while (ldmCursor < ldmCount &&
               (size_t)ldmStart[ldmCursor] + pref + ldmLenA[ldmCursor]
                   <= bstart + 16)
          ldmCursor++;
        for (size_t k = ldmCursor; k < ldmCount; k++) {
          size_t s = (size_t)ldmStart[k] + pref;
          if (s >= blockEnd) break;
          size_t e = s + ldmLenA[k];
          size_t from = s > bstart ? s : bstart;
          size_t to = e > 16 ? e - 16 : 0;
          if (to > blockEnd) to = blockEnd;
          for (size_t q = from; q < to; q++) {
            ldmD[q - bstart] = ldmDistA[k];
            ldmR[q - bstart] = (int32_t)(e - q);
          }
        }
      }

      auto evaluate = [&](size_t p, bool insert) -> EvalResult {
        const u8* limit = base + (blockEnd - p > 65538
                                  ? p + 65538 : blockEnd);
        int repLen = 0;
        u32 repDist = 0;
        if ((size_t)rep[0] <= p && rep[0] <= lp.window && p + 3 <= total) {
          repLen = zmatch_len(base + p, base + p - rep[0], limit);
          repDist = rep[0];
        }
        // rep1 probe: at a source-side break rep0 fails here but the
        // two-periods-back copy is clean — without this the finder hands
        // the position to a full-offset candidate and the drifting rep
        // chain costs double breaks on periodic data (records.bin L4
        // was -23% vs the reference until this; same fix as fast/dfast)
        if (rep[1] != 0 && (size_t)rep[1] <= p && rep[1] <= lp.window &&
            p + 3 <= total) {
          int l1 = zmatch_len(base + p, base + p - rep[1], limit);
          if (l1 > repLen) {
            repLen = l1;
            repDist = rep[1];
          }
        }
        u32 nd = 0;
        int nl = 0;
        if (p + 4 <= total) {
          if (useRow && p + 8 <= total) {
            nl = rmf.find(base, p, (size_t)(limit - base), lp.depth,
                          lp.nice, &nd);
            // 4-byte single-entry assist (mf.head is idle at row levels):
            // the 6-byte row hash cannot see len-4/5 matches, which cost
            // 3-4% ratio on ELF-class data
            int32_t c4 = nl < 8 ? mf.head[zhash(base + p)] : -1;
            if (c4 >= 0 && (size_t)c4 < p && p - (size_t)c4 <= lp.window &&
                rd32le_(base + (size_t)c4) == rd32le_(base + p)) {
              int l4 = 4 + zmatch_len(base + p + 4, base + (size_t)c4 + 4,
                                      limit);
              u32 d4 = (u32)(p - (size_t)c4);
              if (l4 > nl || (l4 == nl && d4 < nd)) {
                nl = l4;
                nd = d4;
              }
            }
            if (insert) {
              rmf.insert(base, p);
              mf.head[zhash(base + p)] = (int32_t)p;
            }
          } else if (!useRow) {
            nl = mf.find(base, p, (size_t)(limit - base), lp.depth, lp.nice,
                         &nd);
            if (insert) mf.insert(base, p);
          }
        }
        // Clamp to the block: the 4-byte candidate baselines verify
        // bytes that may cross blockEnd (their zmatch_len extension is
        // limit-capped but the +4 base is not), and a sequence past
        // blockEnd makes the block regenerate >128 KiB — legal to our
        // decoder but rejected by stock's Block_Maximum_Size check
        // (found by the round-5 large-input interop matrix).
        {
          int room = (int)(blockEnd - p);
          if (nl > room) nl = room;
          if (repLen > room) repLen = room;
        }
        if (nl < 4) nl = 0;  // 3-byte far matches rarely pay
        if (repLen >= 3 && repLen + 1 >= nl) return {repLen, repDist};
        if (nl >= 4) return {nl, nd};
        if (repLen >= 3) return {repLen, repDist};
        return {0, 0};
      };

      if (lp.strat == ZSTRAT_FAST && pref == 0) {
        // Fast-level scan: single-entry 5-byte-hash table, rep-check
        // first, one probe per position with miss-stride acceleration,
        // backward match extension, two table refreshes per match —
        // the reference's ZSTD_fast loop shape
        // (algos/zstd/lib/compress/zstd_fast.c), own code.
        int32_t* tab = mf.head;  // 2^fbits interleaved 2-entry buckets
        size_t anchor = pos;
        // match scans clamp at blockEnd (a crossing match would re-encode
        // the next block's first bytes); ml <= BLOCK_MAX = 131072 fits ML
        // code 52 (base 65539 + 16 extra bits = 131074), so no per-
        // position 65538 window recompute is needed
        const u8* const limit = base + blockEnd;
        // tail becomes literals; the min-match baseline of 4 below must
        // not cross blockEnd (signed: tiny inputs would underflow)
        const i64 scanEnd = ((i64)total - 8 < (i64)blockEnd - 4
                                 ? (i64)total - 8 : (i64)blockEnd - 4);
        // Pipelined scan: the per-position critical path is 4 dependent
        // reads (input -> hash -> table -> candidate bytes); issue the
        // NEXT position's hash + table lookup before this position's
        // compares resolve so consecutive probes overlap (the published
        // analysis of this latency chain: zstd_fast.c:98-143 — own
        // structure). Single-entry table at L1: half the footprint of
        // the old 2-entry buckets = better cache residency.
        if ((i64)pos <= scanEnd) {
        u32 hN = zhash6f(base + pos, fbits);
        int32_t candN = tab[hN];
        // candidate CONTENT is also pipelined: base+cand is a random
        // access into the window (L2/L3 miss), the single longest link
        // in the chain — issue it one iteration early, unconditionally
        // (clamped index on empty slots; one wasted load beats a stall)
        u32 cbN = rd32le_(base + (size_t)(candN < 0 ? 0 : candN));
        while ((i64)pos <= scanEnd) {
          int len = 0;
          u32 dist = 0;
          bool isRep = false;
          const u32 h = hN;
          const int32_t cand = candN;
          const u32 cb = cbN;
          const u32 cur = rd32le_(base + pos);
          // miss-stride acceleration through incompressible spans
          // (the reference's kSearchStrength idiom)
          const size_t nxt = pos + 1 + (size_t)lp.dstep
                             + ((pos - anchor) >> 6);
          if ((i64)nxt <= scanEnd) {
            hN = zhash6f(base + nxt, fbits);
            candN = tab[hN];
            cbN = rd32le_(base + (size_t)(candN < 0 ? 0 : candN));
          }
          // ll == 0 shifts repcode meaning (offset_value 1 = rep1), so at
          // a match boundary probe rep1 directly, then fall back to the
          // one-literal rep0 trick (the reference's ZSTD_fast rep-at-ip+1)
          if (pos == anchor) {
            // At a match boundary a rep1 hit RIGHT HERE codes ZERO
            // literals (ll == 0 shifts repcodes: offset_value 1 = rep1)
            // while the classic rep0-at-ip+1 trick pays one literal.
            // A "source-side" break (the mismatch byte lives in the
            // match SOURCE, not at pos) makes exactly this shape: pos is
            // clean against two-periods-back even though one-period-back
            // is dirty. Compute both reps and keep the ll=0 one unless
            // rep0 covers strictly more bytes (stock averages 0.77
            // lit/seq on records.bin vs 1.05 for rep0-first — the whole
            // -11% ratio gap was this literal-per-break).
            int lenR1 = 0;
            if ((size_t)rep[1] <= pos && rep[1] != 0 &&
                cur == rd32le_(base + pos - rep[1]))
              lenR1 = 4 + zmatch_len(base + pos + 4,
                                     base + pos - rep[1] + 4, limit);
            int lenR0 = 0;
            if (lenR1 < 16 && (size_t)rep[0] <= pos + 1 &&
                pos + 1 + 8 <= total && pos + 1 + 4 <= blockEnd &&
                rd32le_(base + pos + 1)
                    == rd32le_(base + pos + 1 - rep[0]))
              lenR0 = 4 + zmatch_len(base + pos + 1 + 4,
                                     base + pos + 1 - rep[0] + 4, limit);
            if (lenR1 >= 4 && lenR1 >= lenR0) {
              len = lenR1;
              dist = rep[1];
              isRep = true;
            } else if (lenR0 >= 4) {
              tab[h] = (int32_t)pos;
              // nxt == pos + 1 at the anchor, so the pipelined hN/candN
              // already hold the values for the next position
              pos++;
              continue;
            } else if ((size_t)rep[1] <= pos + 1 && rep[1] != 0 &&
                       pos + 1 + 8 <= total && pos + 1 + 4 <= blockEnd &&
                       rd32le_(base + pos + 1)
                           == rd32le_(base + pos + 1 - rep[1])) {
              // rep1 one literal ahead: a failed rep0 probe would
              // otherwise hand the position to the hash candidate, whose
              // (often far) distance then becomes the new rep0 — on
              // periodic data that "distance drift" doubles the break
              // rate and was measured at -11% ratio (records.bin L1).
              // One extra compare at match boundaries re-locks the chain.
              len = 4 + zmatch_len(base + pos + 1 + 4,
                                   base + pos + 1 - rep[1] + 4, limit);
              pos++;  // the common store below uses the pre-increment h,
                      // whose slot then points one past its hash site; the
                      // candidate content check makes that harmless
              dist = rep[1];
              isRep = true;
              // emitted below with ll = 1 (pos - anchor == 1)
            }
          }
          tab[h] = (int32_t)pos;
          if (!len && pos > anchor && (size_t)rep[0] <= pos &&
              cur == rd32le_(base + pos - rep[0])) {
            len = 4 + zmatch_len(base + pos + 4, base + pos - rep[0] + 4,
                                 limit);
            dist = rep[0];
            isRep = true;
          } else if (!len && cand >= 0 &&
                     pos - (size_t)cand <= lp.window && cb == cur) {
            len = 4 + zmatch_len(base + pos + 4, base + (size_t)cand + 4,
                                 limit);
            dist = (u32)(pos - (size_t)cand);
          }
          if (!len) {
            pos = nxt;
            continue;
          }
          // extend backward over pending literals (rep0 emission needs
          // ll >= 1 — offset_value 1 with ll == 0 means rep1)
          size_t floorPos = isRep ? anchor + 1 : anchor;
          while (pos > floorPos && (size_t)dist < pos &&
                 base[pos - 1] == base[pos - 1 - dist]) {
            pos--;
            len++;
          }
          size_t run2 = pos - anchor;
          if (run2 <= 16 && anchor + 16 <= total) {
            // tiny-run fast path: two unconditional 8-byte words beat a
            // variable-size memcpy PLT call (runs are 0-2 on rep chains)
            memcpy(lits + nlit, base + anchor, 8);
            memcpy(lits + nlit + 8, base + anchor + 8, 8);
          } else {
            memcpy(lits + nlit, base + anchor, run2);
          }
          nlit += run2;
          u32 ofv = zofv_emit(rep, dist, run2);
          seqs[nseq].ll = (u32)run2;
          seqs[nseq].ml = (u32)len;
          seqs[nseq].ofv = ofv;
          nseq++;
          size_t endp = pos + (size_t)len;
          if (pos + 1 + 8 <= total)
            tab[zhash6f(base + pos + 1, fbits)] = (int32_t)(pos + 1);
          // long matches: refresh the table inside the matched span too —
          // nearer candidates shrink offset extra bits (48% of the seq
          // section on text) and raise the hit rate after the match
          for (size_t q = pos + 9; q + 8 <= endp && q + 8 <= total; q += 8)
            tab[zhash6f(base + q, fbits)] = (int32_t)q;
          if (endp >= 2 && endp - 2 > pos + 1 && endp - 2 + 8 <= total)
            tab[zhash6f(base + endp - 2, fbits)] = (int32_t)(endp - 2);
          pos = endp;
          anchor = pos;
          if ((i64)pos <= scanEnd) {
            hN = zhash6f(base + pos, fbits);
            candN = tab[hN];
            cbN = rd32le_(base + (size_t)(candN < 0 ? 0 : candN));
          }
        }
        }
        // trailing literals of this block
        {
          size_t tl = blockEnd - anchor;
          memcpy(lits + nlit, base + anchor, tl);
          nlit += tl;
          run = (u32)tl;
          pos = blockEnd;
        }
      } else if (lp.strat == ZSTRAT_DFAST && pref == 0) {
        // Double-fast scan — the reference's ZSTD_dfast strategy shape
        // (algos/zstd/lib/compress/zstd_double_fast.c), own code: two
        // tables, an 8-byte "long" hash whose hit confirms 8 matching
        // bytes in one compare and a 5-byte "short" hash whose hits get
        // one chance to upgrade to a long match one byte ahead. No chain
        // walking: at most three probes per position, so the mid levels
        // run at fast-loop speed while the long-hash confirms keep the
        // ratio near the chain matcher's.
        int32_t* tabL = mf.head;                 // 1<<fbits slots
        int32_t* tabS = mf.head + (1 << fbits);  // 1<<fbits slots
        size_t anchor = pos;
        // hoisted scan clamps, same reasoning as the fast loop above
        const u8* const limit = base + blockEnd;
        const i64 scanEnd = ((i64)total - 8 < (i64)blockEnd - 4
                                 ? (i64)total - 8 : (i64)blockEnd - 4);
        // pipelined like the fast loop: next position's two hashes, two
        // table slots AND both candidate contents (the random window
        // loads) issue one iteration ahead of this position's compares
        if ((i64)pos <= scanEnd) {
        u32 hlN = zhash8d(base + pos, fbits), hsN = zhash5(base + pos, fbits);
        int32_t clN = tabL[hlN], csN = tabS[hsN];
        u64 cblN = rd64le_(base + (size_t)(clN < 0 ? 0 : clN));
        u32 cbsN = rd32le_(base + (size_t)(csN < 0 ? 0 : csN));
        while ((i64)pos <= scanEnd) {
          int len = 0;
          u32 dist = 0;
          bool isRep = false;
          const u32 hl = hlN, hs = hsN;
          const int32_t cl = clN, cs = csN;
          const u64 cbl = cblN;
          const u32 cbs = cbsN;
          const size_t nxt = pos + 1 + ((pos - anchor) >> 7);
          if ((i64)nxt <= scanEnd) {
            hlN = zhash8d(base + nxt, fbits);
            hsN = zhash5(base + nxt, fbits);
            clN = tabL[hlN];
            csN = tabS[hsN];
            cblN = rd64le_(base + (size_t)(clN < 0 ? 0 : clN));
            cbsN = rd32le_(base + (size_t)(csN < 0 ? 0 : csN));
          }
          if (pos == anchor) {
            // boundary rep probes, same shifted-repcode priority as the
            // fast loop: rep1 RIGHT HERE codes zero literals (ll == 0
            // shifts repcodes) — prefer it over the one-literal
            // rep0-at-anchor+1 trick unless rep0 covers strictly more
            // bytes (source-side breaks; records.bin L3 14.37 -> 16.6)
            int lenR1 = 0;
            if ((size_t)rep[1] <= pos && rep[1] != 0 &&
                rd32le_(base + pos) == rd32le_(base + pos - rep[1]))
              lenR1 = 4 + zmatch_len(base + pos + 4,
                                     base + pos - rep[1] + 4, limit);
            int lenR0 = 0;
            if (lenR1 < 16 && (size_t)rep[0] <= pos + 1 &&
                pos + 1 + 8 <= total && pos + 1 + 4 <= blockEnd &&
                rd32le_(base + pos + 1)
                    == rd32le_(base + pos + 1 - rep[0]))
              lenR0 = 4 + zmatch_len(base + pos + 1 + 4,
                                     base + pos + 1 - rep[0] + 4, limit);
            if (lenR1 >= 4 && lenR1 >= lenR0) {
              len = lenR1;
              dist = rep[1];
              isRep = true;
            } else if (lenR0 >= 4) {
              tabL[hl] = (int32_t)pos;
              tabS[hs] = (int32_t)pos;
              // nxt == pos + 1 at the anchor: pipeline already holds it
              pos++;
              continue;
            } else if ((size_t)rep[1] <= pos + 1 && rep[1] != 0 &&
                       pos + 1 + 8 <= total && pos + 1 + 4 <= blockEnd &&
                       rd32le_(base + pos + 1)
                           == rd32le_(base + pos + 1 - rep[1])) {
              // rep1 one literal ahead: re-lock the rep chain instead of
              // handing the break to a far hash candidate (same
              // distance-drift fix as the fast loop)
              len = 4 + zmatch_len(base + pos + 1 + 4,
                                   base + pos + 1 - rep[1] + 4, limit);
              tabL[hl] = (int32_t)pos;
              tabS[hs] = (int32_t)pos;
              pos++;
              dist = rep[1];
              isRep = true;
            }
          }
          if (!len && pos > anchor && (size_t)rep[0] <= pos &&
              rd32le_(base + pos) == rd32le_(base + pos - rep[0])) {
            len = 4 + zmatch_len(base + pos + 4, base + pos - rep[0] + 4,
                                 limit);
            dist = rep[0];
            isRep = true;
          } else if (!len) {
            tabL[hl] = (int32_t)pos;
            tabS[hs] = (int32_t)pos;
            if (cl >= 0 && pos - (size_t)cl <= lp.window &&
                cbl == rd64le_(base + pos)) {
              len = 8 + zmatch_len(base + pos + 8, base + (size_t)cl + 8,
                                   limit);
              // the 8-byte confirm may cross blockEnd (the loop only
              // guarantees pos+4 <= blockEnd); clamp to the block
              int maxl = (int)(limit - (base + pos));
              if (len > maxl) len = maxl;
              dist = (u32)(pos - (size_t)cl);
            } else if (cs >= 0 && pos - (size_t)cs <= lp.window &&
                       cbs == rd32le_(base + pos)) {
              len = 4 + zmatch_len(base + pos + 4, base + (size_t)cs + 4,
                                   limit);
              dist = (u32)(pos - (size_t)cs);
              // short hit: one shot at a longer long-hash match one byte
              // ahead (the dfast upgrade probe)
              if (pos + 1 + 8 <= total && pos + 1 + 4 <= blockEnd) {
                u32 hl1 = zhash8d(base + pos + 1, fbits);
                int32_t cl1 = tabL[hl1];
                tabL[hl1] = (int32_t)(pos + 1);
                if (cl1 >= 0 && pos + 1 - (size_t)cl1 <= lp.window &&
                    rd64le_(base + (size_t)cl1) == rd64le_(base + pos + 1)) {
                  int l1 = 8 + zmatch_len(base + pos + 1 + 8,
                                          base + (size_t)cl1 + 8, limit);
                  int maxl1 = (int)(limit - (base + pos + 1));
                  if (l1 > maxl1) l1 = maxl1;
                  if (l1 > len) {
                    pos++;
                    len = l1;
                    dist = (u32)(pos - (size_t)cl1);
                  }
                }
              }
            }
          }
          if (!len) {
            pos = nxt;
            continue;
          }
          // extend backward over pending literals (rep0 emission needs
          // ll >= 1 — offset_value 1 with ll == 0 means rep1)
          size_t floorPos = isRep ? anchor + 1 : anchor;
          while (pos > floorPos && (size_t)dist < pos &&
                 base[pos - 1] == base[pos - 1 - dist]) {
            pos--;
            len++;
          }
          size_t run2 = pos - anchor;
          if (run2 <= 16 && anchor + 16 <= total) {
            // tiny-run fast path: two unconditional 8-byte words beat a
            // variable-size memcpy PLT call (runs are 0-2 on rep chains)
            memcpy(lits + nlit, base + anchor, 8);
            memcpy(lits + nlit + 8, base + anchor + 8, 8);
          } else {
            memcpy(lits + nlit, base + anchor, run2);
          }
          nlit += run2;
          u32 ofv = zofv_emit(rep, dist, run2);
          seqs[nseq].ll = (u32)run2;
          seqs[nseq].ml = (u32)len;
          seqs[nseq].ofv = ofv;
          nseq++;
          size_t endp = pos + (size_t)len;
          if (pos + 1 + 8 <= total) {
            tabL[zhash8d(base + pos + 1, fbits)] = (int32_t)(pos + 1);
            tabS[zhash5(base + pos + 1, fbits)] = (int32_t)(pos + 1);
          }
          // interior inserts: dense for the first 64 bytes of the span,
          // geometrically sparser beyond — positions deep inside a long
          // match stay reachable through rep chains, so dense insertion
          // there buys no ratio while long-match data paid ~len/dstep
          // hash+store pairs per match
          for (size_t q = pos + 2, st = (size_t)lp.dstep;
               q + 8 <= total && q < endp; q += st) {
            tabL[zhash8d(base + q, fbits)] = (int32_t)q;
            tabS[zhash5(base + q, fbits)] = (int32_t)q;
            if (q >= pos + 64 && st < 32) st *= 2;
          }
          if (endp >= 2 && endp - 2 > pos + 2 && endp - 2 + 8 <= total) {
            tabL[zhash8d(base + endp - 2, fbits)] = (int32_t)(endp - 2);
            tabS[zhash5(base + endp - 2, fbits)] = (int32_t)(endp - 2);
          }
          if (endp >= 1 && endp - 1 > pos + 2 && endp - 1 + 8 <= total) {
            tabL[zhash8d(base + endp - 1, fbits)] = (int32_t)(endp - 1);
            tabS[zhash5(base + endp - 1, fbits)] = (int32_t)(endp - 1);
          }
          pos = endp;
          anchor = pos;
          if ((i64)pos <= scanEnd) {  // restart the probe pipeline
            hlN = zhash8d(base + pos, fbits);
            hsN = zhash5(base + pos, fbits);
            clN = tabL[hlN];
            csN = tabS[hsN];
            cblN = rd64le_(base + (size_t)(clN < 0 ? 0 : clN));
            cbsN = rd32le_(base + (size_t)(csN < 0 ? 0 : csN));
          }
        }
        }
        {
          size_t tl = blockEnd - anchor;
          memcpy(lits + nlit, base + anchor, tl);
          nlit += tl;
          run = (u32)tl;
          pos = blockEnd;
        }
      } else if (useOpt) {
        // shortest path over the block: prices from the previous block's
        // symbols, nodes carry reps + the pending literal run, replay
        // fills the ordinary lits/seqs arrays (the block writer and its
        // raw-block rep rollback stay unchanged)
        size_t blen = blockEnd - bstart;
        ZOptNode* o = onodes;
        for (size_t i = 0; i <= blen; i++) {
          o[i].price = 0xFFFFFFFFu;
          o[i].from = -1;
        }
        o[0].price = 0;
        o[0].from = 0;
        o[0].reps[0] = rep[0];
        o[0].reps[1] = rep[1];
        o[0].reps[2] = rep[2];
        o[0].litRun = 0;
        ZMF::MPair zpairs[48];
        int dpDepth = lp.depth >> 3;
        if (dpDepth < 16) dpDepth = 16;
        // Measured frontier on the 4-file realset (MEASURED.md r4 bt
        // section): with the bt supplying reach, the chain walk only
        // needs its CLOSE pairs — a shallow budget (12-48, scaling with
        // level) keeps the hybrid at the chains-DP speed class while the
        // union lifts ratio above chains-only at every level. Env
        // overrides (AOCL_BT_CHD / AOCL_BT_INSD) kept for recalibration.
        static int chD0 = getenv("AOCL_BT_CHD")
            ? atoi(getenv("AOCL_BT_CHD")) : 0;
        static int insD0 = getenv("AOCL_BT_INSD")
            ? atoi(getenv("AOCL_BT_INSD")) : 0;
        int chDepth = dpDepth;
        if (useBt) {
          chDepth = dpDepth >> 3;
          if (chDepth < 12) chDepth = 12;
          if (chD0) chDepth = chD0;
        }
        int insDepth = insD0 ? insD0 : 16;
        const int ONICE = 128;  // long-candidate DP jump
        // btultra2-style two-pass at EVERY block: pass 1 solves with the
        // carried prices and gathers this block's own path statistics,
        // pass 2 re-solves with those prices (reference:
        // ZSTD_compressBlock_btultra2 / ZSTD_initStats, zstd_opt.c:1398
        // — own structure). Pass 2 replays pass-1's candidate pool, so
        // the second solve costs DP relaxation only.
        bool rerun = blen >= 4096;
        bool doInsert = true;
        if (getenv("AOCL_OPT_DEFSEED")) oprices->defaults();
        size_t ppUsed = 0;
        memset(ppCnt, 0xFF, blen);  // 0xFF = no cached pairs (re-find)
      dp_pass:
        size_t skipUntil = 0;
        for (size_t i = 0; i < blen; i++) {
          if (o[i].from < 0) continue;
          size_t abs = bstart + i;
          if (i < skipUntil) {
            if (doInsert && abs + 4 <= total) {
              if (useBt) btm.insert(base, abs, total, insDepth, 65538);
              mf.insert(base, abs);
            }
            continue;
          }
          u32 bp = o[i].price;
          const u32* rp = o[i].reps;
          u32 lr = o[i].litRun;
          const u8* limit = base + (blen - i > 65538 ? abs + 65538
                                                     : blockEnd);
          int maxLen = (int)(limit - (base + abs));
          // literal
          {
            u32 p = bp + oprices->lit[base[abs]];
            ZOptNode& t = o[i + 1];
            if (p < t.price) {
              t.price = p;
              t.from = (int32_t)i;
              t.len = 1;
              t.dist = 0;
              t.reps[0] = rp[0];
              t.reps[1] = rp[1];
              t.reps[2] = rp[2];
              t.litRun = lr + 1;
            }
          }
          if (maxLen < 3 || abs + 4 > total) {
            if (doInsert && abs + 4 <= total) {
              if (useBt) btm.insert(base, abs, total, insDepth, 65538);
              mf.insert(base, abs);
            }
            continue;
          }
          // reps
          int rls[3];
          int bestRep = 0;
          for (int r = 0; r < 3; r++) {
            u32 rd = rp[r];
            rls[r] = 0;
            if (rd != 0 && (size_t)rd <= abs)
              rls[r] = zmatch_len(base + abs, base + abs - rd, limit);
            if (rls[r] > bestRep) bestRep = rls[r];
          }
          for (int r = 0; r < 3; r++) {
            int rl = rls[r];
            if (rl < 3) continue;
            u32 rd = rp[r];
            u32 nr[3];
            u32 ofv = zofv_map(rp, rd, lr, nr);
            u32 pbase = bp + oprices->ll[ll_code(lr)]
                        + oprices->of[highbit32(ofv)];
            int L0 = 3;
            if (bestRep >= ONICE) {
              if (rl < bestRep) continue;
              L0 = rl;
              skipUntil = i + (size_t)rl;
            }
            for (int L = L0; L <= rl; L++) {
              u32 p = pbase + oprices->ml[ml_code((u32)L)];
              ZOptNode& t = o[i + (size_t)L];
              if (p < t.price) {
                t.price = p;
                t.from = (int32_t)i;
                t.len = L;
                t.dist = rd;
                t.reps[0] = nr[0];
                t.reps[1] = nr[1];
                t.reps[2] = nr[2];
                t.litRun = 0;
              }
            }
          }
          // close 3-byte assist: probe + insert the hash3 table (insert
          // only in pass 1 so pass 2 sees the same candidates)
          int l3 = 0;
          u32 d3 = 0;
          if (abs + 8 <= total) {
            u32 k3 = ((rd32le_(base + abs) & 0xFFFFFFu) * 506832829u)
                     >> 16;
            int32_t c3 = h3tab[k3];
            if (doInsert) h3tab[k3] = (int32_t)abs;
            if (c3 >= 0 && (size_t)c3 < abs && abs - (size_t)c3 <= 65535 &&
                base[c3] == base[abs] && base[c3 + 1] == base[abs + 1] &&
                base[c3 + 2] == base[abs + 2]) {
              l3 = 3 + zmatch_len(base + abs + 3, base + (size_t)c3 + 3,
                                  limit);
              d3 = (u32)(abs - (size_t)c3);
            }
          }
          // new matches
          if (bestRep < ONICE) {
            if (l3 >= 3) {
              int kl = l3 < maxLen ? l3 : maxLen;
              u32 nr[3];
              u32 ofv = zofv_map(rp, d3, lr, nr);
              u32 pbase = bp + oprices->ll[ll_code(lr)]
                          + oprices->of[highbit32(ofv)];
              for (int L = 3; L <= kl; L++) {
                u32 p = pbase + oprices->ml[ml_code((u32)L)];
                ZOptNode& t = o[i + (size_t)L];
                if (p < t.price) {
                  t.price = p;
                  t.from = (int32_t)i;
                  t.len = L;
                  t.dist = d3;
                  t.reps[0] = nr[0];
                  t.reps[1] = nr[1];
                  t.reps[2] = nr[2];
                  t.litRun = 0;
                }
              }
            }
            int cnt;
            if (!doInsert && ppCnt[i] != 0xFF) {
              // pass 2: replay pass-1's dominance-filtered pair set
              cnt = ppCnt[i];
              const u32* pp = ppPool + 2 * ppIdx[i];
              for (int k = 0; k < cnt; k++) {
                zpairs[k].len = (int)pp[2 * k];
                zpairs[k].dist = pp[2 * k + 1];
              }
              goto have_pairs;
            }
            cnt = mf.find_pairs(base, abs, (size_t)(limit - base),
                                chDepth, zpairs, 48);
            if (doInsert) mf.insert(base, abs);
            if (useBt) {
              // Hybrid pair set: the chain walk (newest-first) supplies
              // each length's CLOSEST distance; the bt walk supplies
              // reach beyond the chain budget (its improving pairs ride
              // the suffix-ordered path, so their distances skew old —
              // measured 15x the chain's on structured data, which is
              // why bt-only LOST 8% ratio here). Union both, then drop
              // dominated pairs (a later pair with longer len and
              // smaller-or-equal dist prices those lengths cheaper).
              // Horizon is position-independent (n=total, fixed maxLen):
              // the tree's adopt-at-cap collapse is only sound when
              // compare caps never grow between inserts (LzFind's
              // implicit invariant); a block-end horizon corrupted
              // subtree order at every block boundary (caught by the
              // paranoid build). The DP clamps emitted lens to the block.
              btmf::BtPair bp[96];
              int bc = doInsert
                  ? btm.insert_get(base, abs, total, dpDepth, 65538, bp, 48)
                  : btm.get_only(base, abs, total, dpDepth, 65538, bp, 48);
              if (bc) {
                for (int bk = 0; bk < cnt && bc < 96; bk++, bc++) {
                  bp[bc].len = zpairs[bk].len;
                  bp[bc].dist = zpairs[bk].dist;
                }
                // insertion sort by (len asc, dist asc); tiny arrays
                for (int bi = 1; bi < bc; bi++) {
                  btmf::BtPair t = bp[bi];
                  int bj = bi - 1;
                  while (bj >= 0 && (bp[bj].len > t.len ||
                         (bp[bj].len == t.len && bp[bj].dist > t.dist))) {
                    bp[bj + 1] = bp[bj];
                    bj--;
                  }
                  bp[bj + 1] = t;
                }
                // backward dominance sweep: keep a pair only if its dist
                // beats every longer pair's dist
                btmf::BtPair kept[96];
                int m = 0;
                u32 bestD = 0xFFFFFFFFu;
                for (int bi = bc - 1; bi >= 0; bi--) {
                  if (bp[bi].dist < bestD) {
                    bestD = bp[bi].dist;
                    kept[m++] = bp[bi];  // reverse (descending len) order
                  }
                }
                for (int bi = 0; bi < m && bi < 48; bi++) {
                  zpairs[bi].len = kept[m - 1 - bi].len;
                  zpairs[bi].dist = kept[m - 1 - bi].dist;
                }
                cnt = m < 48 ? m : 48;
              }
            }
            if (doInsert && rerun && cnt <= 8 &&
                ppUsed + (size_t)cnt <= PP_POOL_CAP) {
              ppIdx[i] = (u32)ppUsed;
              ppCnt[i] = (u8)cnt;
              u32* pp = ppPool + 2 * ppUsed;
              for (int k = 0; k < cnt; k++) {
                pp[2 * k] = (u32)zpairs[k].len;
                pp[2 * k + 1] = zpairs[k].dist;
              }
              ppUsed += (size_t)cnt;
            }
          have_pairs:;
            int L = 3;
            for (int k = 0; k < cnt; k++) {
              int kl = zpairs[k].len < maxLen ? zpairs[k].len : maxLen;
              u32 d = zpairs[k].dist;
              u32 nr[3];
              u32 ofv = zofv_map(rp, d, lr, nr);
              u32 pbase = bp + oprices->ll[ll_code(lr)]
                          + oprices->of[highbit32(ofv)];
              if (kl >= ONICE && k == cnt - 1) {
                // long-match jump: relax only the full length
                L = kl;
                skipUntil = i + (size_t)kl;
              }
              for (; L <= kl; L++) {
                u32 p = pbase + oprices->ml[ml_code((u32)L)];
                ZOptNode& t = o[i + (size_t)L];
                if (p < t.price) {
                  t.price = p;
                  t.from = (int32_t)i;
                  t.len = L;
                  t.dist = d;
                  t.reps[0] = nr[0];
                  t.reps[1] = nr[1];
                  t.reps[2] = nr[2];
                  t.litRun = 0;
                }
              }
              if (zpairs[k].len >= maxLen) break;
            }
          } else if (doInsert) {
            if (useBt) btm.insert(base, abs, total, insDepth, 65538);
            mf.insert(base, abs);
          }
        }
        if (rerun) {
          // stats-only walk of the pass-1 path, then reprice and re-solve
          u32 f[256] = {0};
          u32 fl[36] = {0}, fm[53] = {0}, fo[32] = {0};
          u32 sreps[3] = {rep[0], rep[1], rep[2]};
          size_t srun = 0;
          size_t ns = 0;
          int steps = 0;
          for (size_t i = blen; i > 0; i = (size_t)o[i].from)
            opath[steps++] = (int32_t)i;
          for (int k = steps - 1; k >= 0; k--) {
            ZOptNode& t = o[opath[k]];
            if (t.dist == 0) {
              f[base[bstart + (size_t)t.from]]++;
              srun++;
            } else {
              u32 ofv = zofv_emit(sreps, t.dist, srun);
              fl[ll_code((u32)srun)]++;
              fm[ml_code((u32)t.len)]++;
              fo[highbit32(ofv)]++;
              srun = 0;
              ns++;
            }
          }
          ZOptPrices::hist_prices(f, oprices->lit, 256, nullptr);
          if (ns >= 16) {
            static const u8 ofX[32] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                       11, 12, 13, 14, 15, 16, 17, 18, 19,
                                       20, 21, 22, 23, 24, 25, 26, 27, 28,
                                       29, 30, 31};
            ZOptPrices::hist_prices(fl, oprices->ll, 36, LL_BITS);
            ZOptPrices::hist_prices(fm, oprices->ml, 53, ML_BITS);
            ZOptPrices::hist_prices(fo, oprices->of, 32, ofX);
          }
          for (size_t i = 0; i <= blen; i++) {
            o[i].price = 0xFFFFFFFFu;
            o[i].from = -1;
          }
          o[0].price = 0;
          o[0].from = 0;
          o[0].reps[0] = rep[0];
          o[0].reps[1] = rep[1];
          o[0].reps[2] = rep[2];
          o[0].litRun = 0;
          rerun = false;
          doInsert = false;
          goto dp_pass;
        }
        // backtrack + replay into lits/seqs
        int steps = 0;
        for (size_t i = blen; i > 0; i = (size_t)o[i].from)
          opath[steps++] = (int32_t)i;
        for (int k = steps - 1; k >= 0; k--) {
          ZOptNode& t = o[opath[k]];
          size_t abs = bstart + (size_t)t.from;
          if (t.dist == 0) {
            lits[nlit++] = base[abs];
            run++;
          } else {
            u32 ofv = zofv_emit(rep, t.dist, run);
            seqs[nseq].ll = run;
            seqs[nseq].ml = (u32)t.len;
            seqs[nseq].ofv = ofv;
            nseq++;
            run = 0;
          }
        }
        pos = blockEnd;
        // price refresh for the next block from this block's symbols
        oprices->refresh(lits, nlit, seqs, nseq);
      } else {
      // deferred-lookahead cache: when lazy evaluation defers to pos+1,
      // the next iteration reuses that search instead of re-walking the
      // chain (every deferral cost two full finds at the same position)
      size_t cachePos = (size_t)-1;
      EvalResult cacheEv{0, 0};
      while (pos < blockEnd) {
        EvalResult ev;
        if (pos == cachePos) {
          ev = cacheEv;
          if (useRow) {
            if (pos + 8 <= total) {
              rmf.insert(base, pos);
              mf.head[zhash(base + pos)] = (int32_t)pos;
            }
          } else if (pos + 4 <= total) {
            mf.insert(base, pos);
          }
        } else {
          ev = evaluate(pos, true);
        }
        if (ldmBlk) {
          u32 ld = ldmD[pos - bstart];
          if (ld) {
            int lrem = ldmR[pos - bstart];
            int room = (int)(blockEnd - pos);
            if (lrem > room) lrem = room;
            // a window-scale match must beat the local one by a margin
            // (its offset code is ~10 bits dearer than a near match's)
            if (lrem >= 16 && lrem > ev.len + 3) {
              ev.len = lrem;
              ev.dist = ld;
            }
          }
        }
        if (ev.len < 3) {
          lits[nlit++] = base[pos++];
          run++;
          // miss-skip acceleration for the chain fast levels: widen the
          // probe stride on long literal runs
          if (!lp.lazy && run > 64) {
            size_t skip = (size_t)((run - 64) >> 5);
            if (skip > 16) skip = 16;
            while (skip-- > 0 && pos < blockEnd) {
              lits[nlit++] = base[pos++];
              run++;
            }
          }
          continue;
        }
        if (lp.lazy && ev.len < lp.nice && pos + 1 < blockEnd) {
          EvalResult ev2 = evaluate(pos + 1, false);
          // offset-aware deferral (the reference's lazy gain rule,
          // zstd_lazy.c ZSTD_compressBlock_lazy_generic: 4*len minus the
          // offset-code log): a one-byte-longer FAR candidate must not
          // displace a repcode match — that trade costs a literal plus a
          // full offset code and breaks the rep chain
          u32 nr[3];
          int g1 = 4 * ev.len
                   - (int)highbit32(zofv_map(rep, ev.dist, run, nr));
          int g2 = 4 * ev2.len
                   - (int)highbit32(zofv_map(rep, ev2.dist, run + 1, nr))
                   - (lp.lazy >= 2 ? 3 : 7);
          if (g2 > g1) {
            cachePos = pos + 1;
            cacheEv = ev2;
            lits[nlit++] = base[pos++];
            run++;
            continue;
          }
        }
        // full repcode mapping (rep1/rep2 hits and the ll==0 shift were
        // previously coded as full offsets here — only rep0-with-
        // literals got the cheap code)
        u32 ofv = zofv_emit(rep, ev.dist, run);
        seqs[nseq].ll = run;
        seqs[nseq].ml = (u32)ev.len;
        seqs[nseq].ofv = ofv;
        nseq++;
        run = 0;
        size_t endp = pos + (size_t)ev.len;
        // sparse insertion inside matches: every position costs a hash +
        // two dependent stores, and interior positions are rarely useful
        // anchors; fast levels keep every 3rd (+ the two positions just
        // before the match end for chain continuity, like LZ4's
        // table[hash(ip-2)] refresh)
        size_t istep = lp.lazy ? 1 : (lp.depth <= 6 ? 3 : 2);
        if (useRow) {
          for (size_t q = pos + 1; q + 8 <= total && q < endp; q += istep) {
            rmf.insert(base, q);
            mf.head[zhash(base + q)] = (int32_t)q;
          }
        } else {
          for (size_t q = pos + 1; q + 4 <= total && q < endp; q += istep)
            mf.insert(base, q);
          if (istep > 1 && endp >= 2 && endp - 2 > pos && endp + 2 <= total)
            mf.insert(base, endp - 2);
        }
        pos = endp;
      }
      }

      // ---- write the block ----
      EPROF_ADD(0);
      if (getenv("ATPU_ZSTD_DEBUG_OVERRUN") && pos > blockEnd) {
        fprintf(stderr, "OVERRUN block bstart=%zu blockEnd=%zu pos=%zu "
                "nseq=%zu lastml=%u lastll=%u lastofv=%u\n", bstart,
                blockEnd, pos, nseq, nseq ? seqs[nseq-1].ml : 0,
                nseq ? seqs[nseq-1].ll : 0, nseq ? seqs[nseq-1].ofv : 0);
      }
      size_t blockRaw = blockEnd - bstart;
      // Block splitting (opt tier): heterogeneous 128K spans (ELF
      // sections, file concatenations) compress better as sub-blocks
      // with their own entropy tables — the reference's splitter is on
      // by default at the btopt+ levels (zstd_compress_superblock /
      // splitBlock; measured: their L19 emits ~33K blocks and beat us
      // 27% on ELF pre-wlog fix, ~1%+ residue after). Trial-emit the
      // whole block vs 2-way vs 4-way sequence-boundary partitions and
      // keep the smallest; a split is only accepted when EVERY part
      // emits compressed (a raw part would discard sequences whose
      // repcode history later parts assume).
      if (useOpt && nseq >= 64 && blockRaw >= 32768) {
        size_t cov[5], sidx[5], lidx[5];
        cov[0] = 0; sidx[0] = 0; lidx[0] = 0;
        // find 3 split points at coverage quartiles (sequence-aligned)
        {
          size_t target[3] = {blockRaw >> 2, blockRaw >> 1,
                              3 * (blockRaw >> 2)};
          size_t c = 0, l = 0, t = 0;
          for (size_t si = 0; si < nseq && t < 3; si++) {
            c += seqs[si].ll + seqs[si].ml;
            l += seqs[si].ll;
            while (t < 3 && c >= target[t]) {
              cov[t + 1] = c; sidx[t + 1] = si + 1; lidx[t + 1] = l;
              t++;
            }
          }
          if (t < 3) goto no_split;  // degenerate coverage
        }
        cov[4] = blockRaw; sidx[4] = nseq; lidx[4] = nlit;
        {
          const size_t CAP = BLOCK_MAX + (BLOCK_MAX >> 2) + 12288;
          PrevEntropy peW = pe, pe2 = pe, pe4 = pe;
          i64 szW = -1, sz2 = -1, sz4 = -1;
          size_t p2off[3], p4off[5];
          i64 p2sz[2], p4sz[4];
          {
            i64 a = write_literals(lits, nlit, scratch, CAP, &peW);
            i64 b = a < 0 ? -1 : write_sequences(seqs, nseq, scratch + a,
                                                 CAP - (size_t)a, &peW);
            if (a >= 0 && b >= 0) szW = a + b + 3;
          }
          // 2-way: parts [0,2) and [2,4) of the quartile table
          {
            size_t o = 0;
            bool okS = true;
            static const int segs2[2][2] = {{0, 2}, {2, 4}};
            for (int k = 0; k < 2 && okS; k++) {
              size_t qa = (size_t)segs2[k][0], qb = (size_t)segs2[k][1];
              size_t ns = sidx[qb] - sidx[qa];
              size_t nl = lidx[qb] - lidx[qa];
              size_t rawN = cov[qb] - cov[qa];
              if (k == 1) nl = nlit - lidx[qa];  // trailing literals
              p2off[k] = o;
              i64 a = write_literals(lits + lidx[qa], nl, scratch2 + o,
                                     CAP - o, &pe2);
              i64 b = a < 0 ? -1
                  : write_sequences(seqs + sidx[qa], ns,
                                    scratch2 + o + a, CAP - o - (size_t)a,
                                    &pe2);
              if (a < 0 || b < 0 || (size_t)(a + b) >= rawN) {
                okS = false;
                break;
              }
              p2sz[k] = a + b;
              o += (size_t)(a + b);
            }
            if (okS) sz2 = (i64)o + 2 * 3;
          }
          // 4-way: quartile parts
          {
            size_t o = 0;
            bool okS = true;
            for (int k = 0; k < 4 && okS; k++) {
              size_t ns = sidx[k + 1] - sidx[k];
              size_t nl = lidx[k + 1] - lidx[k];
              size_t rawN = cov[k + 1] - cov[k];
              if (k == 3) nl = nlit - lidx[k];
              p4off[k] = o;
              i64 a = write_literals(lits + lidx[k], nl, scratch3 + o,
                                     CAP - o, &pe4);
              i64 b = a < 0 ? -1
                  : write_sequences(seqs + sidx[k], ns, scratch3 + o + a,
                                    CAP - o - (size_t)a, &pe4);
              if (a < 0 || b < 0 || (size_t)(a + b) >= rawN) {
                okS = false;
                break;
              }
              p4sz[k] = a + b;
              o += (size_t)(a + b);
            }
            if (okS) sz4 = (i64)o + 4 * 3;
          }
          int last = blockEnd == total ? 1 : 0;
          if (sz4 >= 0 && (szW < 0 || sz4 < szW) && (sz2 < 0 || sz4 <= sz2)
              && (size_t)sz4 < blockRaw) {
            if (op + (size_t)sz4 > dstCap) { result = ERR_DST_SMALL;
                                             goto done; }
            size_t o = 0;
            for (int k = 0; k < 4; k++) {
              u32 bh = ((u32)p4sz[k] << 3) | (2u << 1)
                       | (u32)(last && k == 3);
              dst[op++] = (u8)bh;
              dst[op++] = (u8)(bh >> 8);
              dst[op++] = (u8)(bh >> 16);
              memcpy(dst + op, scratch3 + o, (size_t)p4sz[k]);
              op += (size_t)p4sz[k];
              o += (size_t)p4sz[k];
            }
            pe = pe4;
            if (last) break;
            continue;
          }
          if (sz2 >= 0 && (szW < 0 || sz2 < szW) && (size_t)sz2 < blockRaw) {
            if (op + (size_t)sz2 > dstCap) { result = ERR_DST_SMALL;
                                             goto done; }
            size_t o = 0;
            for (int k = 0; k < 2; k++) {
              u32 bh = ((u32)p2sz[k] << 3) | (2u << 1)
                       | (u32)(last && k == 1);
              dst[op++] = (u8)bh;
              dst[op++] = (u8)(bh >> 8);
              dst[op++] = (u8)(bh >> 16);
              memcpy(dst + op, scratch2 + o, (size_t)p2sz[k]);
              op += (size_t)p2sz[k];
              o += (size_t)p2sz[k];
            }
            pe = pe2;
            if (last) break;
            continue;
          }
          if (szW >= 3 && (size_t)(szW - 3) < blockRaw) {
            if (op + (size_t)szW > dstCap) { result = ERR_DST_SMALL;
                                             goto done; }
            size_t content = (size_t)(szW - 3);
            u32 bh = ((u32)content << 3) | (2u << 1) | (u32)last;
            dst[op++] = (u8)bh;
            dst[op++] = (u8)(bh >> 8);
            dst[op++] = (u8)(bh >> 16);
            memcpy(dst + op, scratch, content);
            op += content;
            pe = peW;
            if (last) break;
            continue;
          }
        }
      }
    no_split:;
      PrevEntropy peSnap = pe;  // raw/RLE fallback must not advance the
                                // decoder-visible entropy state
      i64 litSz = write_literals(lits, nlit, scratch,
                                 BLOCK_MAX + (BLOCK_MAX >> 2) + 2048, &pe);
      bool ok = litSz >= 0;
      i64 seqSz = 0;
      EPROF_ADD(5);
      if (ok) {
        seqSz = write_sequences(seqs, nseq, scratch + litSz,
                                (size_t)(BLOCK_MAX + (BLOCK_MAX >> 2)
                                         + 4096 - litSz), &pe);
        ok = seqSz >= 0;
      }
      EPROF_ADD(4);
      int last = blockEnd == total ? 1 : 0;
      size_t content = ok ? (size_t)(litSz + seqSz) : (size_t)-1;
      // nseq == 0 is a legal compressed block (literals section + a
      // single 0x00 sequence count): literal-only blocks still get
      // Huffman gains (skewed-literal payloads went raw before this)
      if (ok && content < blockRaw) {
        if (op + 3 + content > dstCap) { result = ERR_DST_SMALL; goto done; }
        u32 bh = ((u32)content << 3) | (2u << 1) | (u32)last;
        dst[op++] = (u8)bh;
        dst[op++] = (u8)(bh >> 8);
        dst[op++] = (u8)(bh >> 16);
        memcpy(dst + op, scratch, content);
        op += content;
      } else {
        // raw (or RLE) block; restore rep history — the decoder never
        // sees the sequences we discarded
        rep[0] = repSnap[0];
        rep[1] = repSnap[1];
        rep[2] = repSnap[2];
        pe = peSnap;
        bool allSame = blockRaw > 0;
        for (size_t i = 1; i < blockRaw && allSame; i++)
          allSame = base[bstart + i] == base[bstart];
        if (allSame && blockRaw >= 2) {
          if (op + 4 > dstCap) { result = ERR_DST_SMALL; goto done; }
          u32 bh = ((u32)blockRaw << 3) | (1u << 1) | (u32)last;
          dst[op++] = (u8)bh;
          dst[op++] = (u8)(bh >> 8);
          dst[op++] = (u8)(bh >> 16);
          dst[op++] = base[bstart];
        } else {
          if (op + 3 + blockRaw > dstCap) {
            result = ERR_DST_SMALL;
            goto done;
          }
          u32 bh = ((u32)blockRaw << 3) | (0u << 1) | (u32)last;
          dst[op++] = (u8)bh;
          dst[op++] = (u8)(bh >> 8);
          dst[op++] = (u8)(bh >> 16);
          memcpy(dst + op, base + bstart, blockRaw);
          op += blockRaw;
        }
      }
      if (last) break;
    }
    if (flags & 1) {
      if (op + 4 > dstCap) { result = ERR_DST_SMALL; goto done; }
      wr32le(dst + op, (u32)atpu_xxh64(src, n, 0));
      op += 4;
    }
    result = (i64)op;
  }
done:
  free(buf);
  free(ldmStart);
  free(ldmD);
  free(ldmR);
  free(seqs);
  free(lits);
  free(scratch);
  free(onodes);
  free(opath);
  free(oprices);
  free(ppIdx);
  free(ppCnt);
  free(ppPool);
  free(h3tab);
  free(scratch2);
  free(scratch3);
  mf.release();
  if (useRow) rmf.release();
  return result;
}

ATPU_EXPORT i64 atpu_zstd_compress(const u8* src, size_t n, u8* dst,
                                   size_t dstCap, int level, const u8* dict,
                                   size_t dictSize) {
  return atpu_zstd_compress_ex(src, n, dst, dstCap, level, dict, dictSize,
                               0);
}

// Serialize a structured-dictionary ENTROPY header (the ZDICT format's
// magic + dictID + Huffman table + 3 FSE ncounts + repcodes) from a
// literal histogram; the caller appends the trained content. Reference
// capability: ZDICT_trainFromBuffer's entropy emission
// (algos/zstd/lib/dictBuilder/zdict.c ZDICT_analyzeEntropy) — own
// serialization via the encoder's table writers. The sequence tables are
// the RFC predefined distributions (always valid; Repeat_Mode then costs
// what mode 0 costs while the Huffman table carries the small-payload
// win). Returns header size, or <0.
ATPU_EXPORT void atpu_zstd_set_stats(u32* lit, u32* ll, u32* of, u32* ml) {
  g_statLit = lit;
  g_statLL = ll;
  g_statOF = of;
  g_statML = ml;
}

ATPU_EXPORT i64 atpu_zstd_build_dict_header(const u32* litFreq, u32 dictID,
                                            const u32* llFreq,
                                            const u32* ofFreq,
                                            const u32* mlFreq,
                                            u8* out, size_t cap) {
  if (cap < 16) return ERR_DST_SMALL;
  // +1 smoothing: every byte stays representable so any payload literal
  // can ride the dictionary table (treeless blocks need full coverage)
  u32 freq[256];
  for (int s = 0; s < 256; s++) freq[s] = litFreq[s] + 1;
  HufEnc he;
  if (!he.build(freq)) return ERR_CORRUPT;
  size_t op = 0;
  wr32le(out, 0xEC30A437u);
  op = 4;
  wr32le(out + op, dictID);
  op += 4;
  int ds = he.write_desc(out + op, cap - op);
  if (ds <= 0) return ERR_DST_SMALL;
  op += (size_t)ds;
  // sequence tables: trained from the stats pass when provided (smoothed
  // so every code stays representable for Repeat_Mode), else predefined
  struct { const u32* freq; const short* def; int nsym; int defSyms;
           int defLog; int maxLog; } t[3] = {
    {ofFreq, OF_DEF, 29, 29, OF_DEFLOG, 8},
    {mlFreq, ML_DEF, 53, 53, ML_DEFLOG, 9},
    {llFreq, LL_DEF, 36, 36, LL_DEFLOG, 9}};
  for (int i = 0; i < 3; i++) {
    short norm[64];
    const short* use = t[i].def;
    int nsym = t[i].defSyms;
    int tl = t[i].defLog;
    if (t[i].freq) {
      u32 f[64];
      u32 total = 0;
      for (int s = 0; s < t[i].nsym; s++) {
        f[s] = t[i].freq[s] + 1;  // smoothing: full coverage
        total += f[s];
      }
      int log2 = t[i].maxLog;
      while ((1 << (log2 - 1)) > (int)total && log2 > 5) log2--;
      if (normalize_counts(f, t[i].nsym, total, log2, norm) == 0) {
        use = norm;
        nsym = t[i].nsym;
        tl = log2;
      }
    }
    int hs = write_ncount(use, nsym, tl, out + op, cap - op);
    if (hs <= 0) return ERR_DST_SMALL;
    op += (size_t)hs;
  }
  if (op + 12 > cap) return ERR_DST_SMALL;
  wr32le(out + op, 1);
  wr32le(out + op + 4, 4);
  wr32le(out + op + 8, 8);
  op += 12;
  return (i64)op;
}

ATPU_EXPORT i64 atpu_zstd_compress_bound(i64 n) {
  return n + (n >> 8) + 3 * (n / BLOCK_MAX + 1) + 64;
}
