// Profile-guided-optimization training driver (build machinery, not part
// of the library). `make` compiles the library sources with
// -fprofile-generate, links this main, runs it, then recompiles with
// -fprofile-use: +5-20% measured on every hot loop (MEASURED.md "PGO").
// The workload must be self-contained (the library auto-builds on first
// import from any checkout), so the corpus is synthesized in-memory:
// text-like phrases, structured records, a periodic run, skewed literals
// and incompressible noise — the same mix the bench corpus uses, hitting
// the match-heavy, literal-heavy and raw-block paths of every codec.
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "llc_api.h"

static uint32_t lcg = 0x12345u;
static inline uint32_t rnd(void) {
  lcg = lcg * 1664525u + 1013904223u;
  return lcg >> 8;
}

static size_t synth(uint8_t* buf, size_t cap) {
  static const char* words[] = {"the ",    "of ",     "compression ",
                                "data ",   "block ",  "match ",
                                "hash ",   "entropy ", "stream ",
                                "window ", "encode ", "profile "};
  size_t n = 0;
  while (n < cap * 5 / 12) {  // text-like
    const char* w = words[rnd() % 12];
    size_t l = strlen(w);
    memcpy(buf + n, w, l);
    n += l;
  }
  uint8_t rec[64];  // structured records
  for (int i = 0; i < 64; i++) rec[i] = (uint8_t)rnd();
  while (n + 64 < cap * 7 / 12) {
    memcpy(buf + n, rec, 64);
    n += 64;
  }
  while (n < cap * 8 / 12) {  // periodic
    buf[n] = (uint8_t)"abcdefg"[n % 7];
    n++;
  }
  while (n < cap * 10 / 12) buf[n++] = (uint8_t)(rnd() % 48);  // skewed lits
  while (n < cap) buf[n++] = (uint8_t)rnd();  // incompressible
  return n;
}

int main(void) {
  const size_t N = 3u << 20;
  uint8_t* src = (uint8_t*)malloc(N);
  if (!src) return 1;
  size_t n = synth(src, N);
  int fail = 0;
  static const int levels[ATPU_METHOD_COUNT][3] = {
      {1, 3, 0},  /* LZ4: accel via opt_var, level unused */
      {1, 9, 12}, /* LZ4HC */
      {1, 6, 9},  /* LZMA */
      {1, 9, 0},  /* BZIP2 */
      {0, 0, 0},  /* SNAPPY: no levels */
      {1, 6, 9},  /* ZLIB */
      {1, 3, 9},  /* ZSTD: fast + dfast + chains */
  };
  for (int m = 0; m < ATPU_METHOD_COUNT; m++) {
    for (int li = 0; li < 3; li++) {
      int lvl = levels[m][li];
      if (li > 0 && lvl == 0) continue;
      int64_t bound = atpu_llc_compress_bound((atpu_method)m, (int64_t)n);
      uint8_t* comp = (uint8_t*)malloc((size_t)bound);
      uint8_t* back = (uint8_t*)malloc(n);
      if (!comp || !back) return 1;
      atpu_llc_desc d;
      memset(&d, 0, sizeof(d));
      d.level = lvl;
      if (atpu_llc_setup(&d, (atpu_method)m) != ATPU_OK) fail = 1;
      d.in = src;
      d.in_size = n;
      d.out = comp;
      d.out_size = (size_t)bound;
      int64_t cs = atpu_llc_compress(&d, (atpu_method)m);
      if (cs <= 0) fail = 1;
      d.in = comp;
      d.in_size = (size_t)cs;
      d.out = back;
      d.out_size = n;
      int64_t ds = atpu_llc_decompress(&d, (atpu_method)m);
      if (ds != (int64_t)n || memcmp(back, src, n) != 0) fail = 1;
      atpu_llc_destroy(&d, (atpu_method)m);
      free(comp);
      free(back);
    }
  }
  free(src);
  if (fail) {
    fprintf(stderr, "pgo_train: roundtrip failure\n");
    return 1;
  }
  return 0;
}
