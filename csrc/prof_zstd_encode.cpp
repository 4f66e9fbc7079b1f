// Standalone zstd host encode profiler (round 5, VERDICT #1).
// Build:  g++ -O3 -march=x86-64-v3 -std=c++17 -DATPU_PROF \
//           csrc/zstd_encode.cpp csrc/prof_zstd_encode.cpp -o /tmp/prof_ze
// Run:    /tmp/prof_ze FILE [level]
// Prints encode MB/s plus the phase cycle split (scan / histogram /
// huf build / huf stream / sequences / write_literals total) so the
// L1/L3 speed-gap attack order is measured, not guessed.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <chrono>

extern "C" {
long long atpu_zstd_compress(const uint8_t*, size_t, uint8_t*, size_t, int,
                             const uint8_t*, size_t);
long long atpu_zstd_compress_bound(long long);
void atpu_zstd_enc_prof(unsigned long long*);
}

static std::vector<uint8_t> slurp(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); exit(1); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> v((size_t)n);
  if (fread(v.data(), 1, (size_t)n, f) != (size_t)n) exit(1);
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s FILE [level]\n", argv[0]); return 2; }
  auto data = slurp(argv[1]);
  int level = argc > 2 ? atoi(argv[2]) : 1;
  std::vector<uint8_t> out((size_t)atpu_zstd_compress_bound((long long)data.size()));
  unsigned long long prof[8];
  atpu_zstd_enc_prof(prof);  // reset
  double best = 1e30;
  long long csz = 0;
  for (int i = 0; i < 9; i++) {
    auto t0 = std::chrono::steady_clock::now();
    csz = atpu_zstd_compress(data.data(), data.size(), out.data(), out.size(),
                             level, nullptr, 0);
    auto t1 = std::chrono::steady_clock::now();
    if (csz <= 0) { fprintf(stderr, "encode err %lld\n", csz); return 1; }
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }
  atpu_zstd_enc_prof(prof);
  unsigned long long tot = 0;
  for (int i = 0; i < 5; i++) tot += prof[i];  // slot5 overlaps 1-3
  printf("%s L%d: %.1f MB/s ratio %.4f\n", argv[1], level,
         data.size() / best / 1e6, (double)data.size() / (double)csz);
  const char* names[8] = {"scan", "hist", "hufbuild", "hufstream",
                          "sequences", "write_lit_total", "seq_hist_choose", "seq_tblbuild"};
  for (int i = 0; i < 8; i++)
    printf("  %-16s %12llu cyc  %5.1f%%\n", names[i], prof[i],
           100.0 * (double)prof[i] / (double)tot);
  return 0;
}
