#ifdef BTMF_PARANOID
#include <stdio.h>
#endif
// Binary-tree match finder (bt4 + short-match h2/h3 probes) shared by the
// LZMA and zstd ratio tiers.
//
// Reference investment point: the upstream libraries put their deepest
// matcher reach behind binary trees — AOCL_Bt4_MatchFinder_* in
// algos/lzma/LzFind.c and ZSTD_BtGetAllMatches in
// algos/zstd/lib/compress/zstd_opt.c. This is an own implementation of
// the classic ordered-suffix-tree scheme: per hash-4 bucket, positions
// form a binary tree ordered by suffix; inserting a position walks from
// the root, hangs the new node between the "less" and "greater" fences,
// and each visited candidate is compared starting at min(lenLess,
// lenGreater) known-equal bytes. Compared to hash chains at equal visit
// budget, every visit either extends the best match or halves the
// candidate space, which is the reach advantage at the optimal-parse
// levels. Like the upstream bt4, two direct-mapped tables catch the
// closest 2-byte and 3-byte matches (hash-4 buckets cannot see them);
// those short-at-close-distance matches are where much of the ratio
// lives for LZMA's cheap rep/short-dist pricing.
//
// Indexing is absolute (tree sized 2 * i32 * n): callers gate on input
// size (BTMF_MAX_N) and fall back to their chain matchers above it.
// Every emitted pair is produced by a real byte comparison, so a tree
// inconsistency can cost reach, never a wrong match.
#ifndef ATPU_BTMF_H_
#define ATPU_BTMF_H_

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

namespace btmf {

typedef uint8_t u8;
typedef uint16_t u16;
typedef uint32_t u32;
typedef uint64_t u64;

static const size_t BTMF_MAX_N = (size_t)1 << 28;  // 256 MiB: 2 GiB tree

struct BtPair {
  int len;
  u32 dist;
};

// match length from a known-equal prefix of `len` bytes
static inline int btmf_extend(const u8* a, const u8* b, int len, int maxLen) {
  while (len + 8 <= maxLen) {
    u64 x, y;
    memcpy(&x, a + len, 8);
    memcpy(&y, b + len, 8);
    u64 d = x ^ y;
    if (d) return len + (int)(__builtin_ctzll(d) >> 3);
    len += 8;
  }
  while (len < maxLen && a[len] == b[len]) len++;
  return len;
}

struct BtMF {
  int32_t* head = nullptr;   // hash4 roots
  int32_t* tree = nullptr;   // [2*pos] = less child, [2*pos+1] = greater
  int32_t* h2t = nullptr;    // closest position per 2-byte hash
  int32_t* h3t = nullptr;    // closest position per 3-byte hash
  u32 window = 0;
  u32 hashBits = 0;
  size_t cap = 0;
  int minLen = 2;            // smallest pair length worth reporting

  static inline u32 hash4(const u8* p, u32 bits) {
    u32 v;
    memcpy(&v, p, 4);
    return (v * 2654435761u) >> (32 - bits);
  }
  static inline u32 hash3(const u8* p) {
    u32 v = (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16);
    return (v * 506832829u) >> (32 - 16);
  }
  static inline u32 hash2(const u8* p) {
    u16 v;
    memcpy(&v, p, 2);
    return ((u32)v * 2654435761u) >> (32 - 13);
  }

  bool alloc(u32 win, size_t n, u32 hbits) {
    if (n > BTMF_MAX_N) return false;
    window = win;
    hashBits = hbits;
    cap = n;
    head = (int32_t*)malloc(sizeof(int32_t) << hbits);
    tree = (int32_t*)malloc(sizeof(int32_t) * 2 * (n + 1));
    h2t = (int32_t*)malloc(sizeof(int32_t) << 13);
    h3t = (int32_t*)malloc(sizeof(int32_t) << 16);
    if (!head || !tree || !h2t || !h3t) { release(); return false; }
    memset(head, -1, sizeof(int32_t) << hbits);
    memset(h2t, -1, sizeof(int32_t) << 13);
    memset(h3t, -1, sizeof(int32_t) << 16);
    return true;
  }
  void release() {
    free(head); free(tree); free(h2t); free(h3t);
    head = tree = h2t = h3t = nullptr;
  }

  // Insert `pos` into the tree; when `out` is non-null, collect improving
  // (len, dist) pairs (strictly increasing len, each from a verified
  // compare). maxLen caps reported and compared lengths. Returns count.
  int insert_get(const u8* base, size_t pos, size_t n, int depth,
                 int maxLen, BtPair* out, int maxPairs) {
    int cnt = 0;
    if (pos + 4 > n) return 0;  // too short for hash4: not inserted
    int lim = maxLen;
    if ((size_t)lim > n - pos) lim = (int)(n - pos);
    const u8* sc = base + pos;
    int best = minLen - 1;

    // short-match probes (closest 2/3-byte occurrences); the bt walk
    // below only sees hash-4 buckets
    if (out) {
      u32 h2 = hash2(sc);
      int32_t c2 = h2t[h2];
      u32 h3 = hash3(sc);
      int32_t c3 = h3t[h3];
      if (c2 >= 0 && pos - (size_t)c2 <= window && base[c2] == sc[0] &&
          base[c2 + 1] == sc[1]) {
        int l = btmf_extend(sc, base + c2, 2, lim);
        if (l > best && cnt < maxPairs) {
          out[cnt].len = l;
          out[cnt].dist = (u32)(pos - (size_t)c2);
          cnt++;
          best = l;
        }
      }
      if (c3 >= 0 && c3 != c2 && pos - (size_t)c3 <= window &&
          base[c3] == sc[0] && base[c3 + 1] == sc[1] &&
          base[c3 + 2] == sc[2]) {
        int l = btmf_extend(sc, base + c3, 3, lim);
        if (l > best && cnt < maxPairs) {
          out[cnt].len = l;
          out[cnt].dist = (u32)(pos - (size_t)c3);
          cnt++;
          best = l;
        }
      }
    }
    h2t[hash2(sc)] = (int32_t)pos;
    h3t[hash3(sc)] = (int32_t)pos;

    u32 h = hash4(sc, hashBits);
    int32_t cur = head[h];
    head[h] = (int32_t)pos;
    int32_t* lessSlot = &tree[2 * pos];
    int32_t* grtrSlot = &tree[2 * pos + 1];
    int lenLess = 0, lenGrtr = 0;

    for (;;) {
      if (cur < 0 || depth-- <= 0 || pos - (size_t)cur > window) {
        *lessSlot = *grtrSlot = -1;
        break;
      }
      const u8* pb = base + cur;
      int len = lenLess < lenGrtr ? lenLess : lenGrtr;
      int l = btmf_extend(sc, pb, len, lim);
#ifdef BTMF_PARANOID
      if (memcmp(sc, pb, (size_t)l) != 0) {
        fprintf(stderr, "BTMF insert_get BAD pair pos=%zu cur=%d len=%d "
                "fence=(%d,%d)\n", pos, cur, l, lenLess, lenGrtr);
        abort();
      }
#endif
      if (l > best) {
        best = l;
        if (out && cnt < maxPairs) {
          out[cnt].len = l;
          out[cnt].dist = (u32)(pos - (size_t)cur);
          cnt++;
        }
      }
      if (l == lim) {
        // full-length tie: adopt the candidate's children (ordering
        // beyond the cap is unknowable; standard bt collapse)
        *lessSlot = tree[2 * cur];
        *grtrSlot = tree[2 * cur + 1];
        break;
      }
      if (pb[l] < sc[l]) {
        // candidate suffix is less: hang it on the less fence, continue
        // into its greater subtree (strings between candidate and scan)
        *lessSlot = cur;
        lessSlot = &tree[2 * cur + 1];
        cur = *lessSlot;
        lenLess = l;
      } else {
        *grtrSlot = cur;
        grtrSlot = &tree[2 * cur];
        cur = *grtrSlot;
        lenGrtr = l;
      }
    }
    return cnt;
  }

  // tree-integrity insert without match collection (LzFind Skip analog)
  void insert(const u8* base, size_t pos, size_t n, int depth, int maxLen) {
    insert_get(base, pos, n, depth, maxLen, nullptr, 0);
  }

  // Read-only lookup: same descent as insert_get but never modifies the
  // tree, and never reports candidates at or past `pos`. Needed by
  // two-pass optimal parses whose pass 1 inserted positions AHEAD of a
  // pass-2 query — those future nodes still steer navigation (their
  // bytes are in the buffer), they just cannot be emitted as matches.
  int get_only(const u8* base, size_t pos, size_t n, int depth,
               int maxLen, BtPair* out, int maxPairs) const {
    int cnt = 0;
    if (pos + 4 > n) return 0;
    int lim = maxLen;
    if ((size_t)lim > n - pos) lim = (int)(n - pos);
    const u8* sc = base + pos;
    int best = minLen - 1;

    int32_t c2 = h2t[hash2(sc)];
    if (c2 >= 0 && (size_t)c2 < pos && pos - (size_t)c2 <= window &&
        base[c2] == sc[0] && base[c2 + 1] == sc[1]) {
      int l = btmf_extend(sc, base + c2, 2, lim);
      if (l > best && cnt < maxPairs) {
        out[cnt].len = l;
        out[cnt].dist = (u32)(pos - (size_t)c2);
        cnt++;
        best = l;
      }
    }
    int32_t c3 = h3t[hash3(sc)];
    if (c3 >= 0 && c3 != c2 && (size_t)c3 < pos &&
        pos - (size_t)c3 <= window && base[c3] == sc[0] &&
        base[c3 + 1] == sc[1] && base[c3 + 2] == sc[2]) {
      int l = btmf_extend(sc, base + c3, 3, lim);
      if (l > best && cnt < maxPairs) {
        out[cnt].len = l;
        out[cnt].dist = (u32)(pos - (size_t)c3);
        cnt++;
        best = l;
      }
    }

    int32_t cur = head[hash4(sc, hashBits)];
    int lenLess = 0, lenGrtr = 0;
    while (cur >= 0 && depth-- > 0) {
      if ((size_t)cur < pos && pos - (size_t)cur > window) break;
      const u8* pb = base + cur;
      int len = lenLess < lenGrtr ? lenLess : lenGrtr;
      int plim = lim;
      if ((size_t)cur >= pos) {
        // future node: cap the compare inside the buffer
        size_t room = n - (size_t)cur;
        if ((size_t)plim > room) plim = (int)room;
      }
      int l = btmf_extend(sc, pb, len < plim ? len : plim, plim);
#ifdef BTMF_PARANOID
      if (memcmp(sc, pb, (size_t)l) != 0) {
        fprintf(stderr, "BTMF get_only BAD pair pos=%zu cur=%d len=%d "
                "fence=(%d,%d)\n", pos, cur, l, lenLess, lenGrtr);
        abort();
      }
#endif
      if (l > best && (size_t)cur < pos) {
        best = l;
        if (cnt < maxPairs) {
          out[cnt].len = l;
          out[cnt].dist = (u32)(pos - (size_t)cur);
          cnt++;
        }
      }
      if (l == plim) {
        // can't order past the cap: stop (insert_get would adopt here)
        break;
      }
      if (pb[l] < sc[l]) {
        cur = tree[2 * cur + 1];
        lenLess = l;
      } else {
        cur = tree[2 * cur];
        lenGrtr = l;
      }
    }
    return cnt;
  }
};

}  // namespace btmf

#endif  // ATPU_BTMF_H_
