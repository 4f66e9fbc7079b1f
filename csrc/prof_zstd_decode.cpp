// Standalone zstd host DECODE profiler (round 5, VERDICT #2).
// Build:  g++ -O3 -march=x86-64-v3 -std=c++17 -DATPU_PROF \
//           csrc/zstd_decode.cpp csrc/zstd_encode.cpp \
//           csrc/prof_zstd_decode.cpp -o /tmp/prof_zd
// Run:    /tmp/prof_zd FILE [level]
// Compresses FILE at [level] once, then times decode min-of-9 and prints
// the lit/seq phase cycle split so the Huffman-vs-sequence attack order
// is measured, not guessed.
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
long long atpu_zstd_decompress(const uint8_t*, size_t, uint8_t*, size_t);
void atpu_zstd_prof(unsigned long long*);
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
  int level = argc > 2 ? atoi(argv[2]) : 3;
  std::vector<uint8_t> comp((size_t)atpu_zstd_compress_bound((long long)data.size()));
  long long csz = atpu_zstd_compress(data.data(), data.size(), comp.data(),
                                     comp.size(), level, nullptr, 0);
  if (csz <= 0) { fprintf(stderr, "encode err %lld\n", csz); return 1; }
  std::vector<uint8_t> out(data.size());
  unsigned long long prof[4];
  atpu_zstd_prof(prof);  // reset
  double best = 1e30;
  for (int i = 0; i < 9; i++) {
    auto t0 = std::chrono::steady_clock::now();
    long long dn = atpu_zstd_decompress(comp.data(), (size_t)csz, out.data(),
                                        out.size());
    auto t1 = std::chrono::steady_clock::now();
    if (dn != (long long)data.size()) { fprintf(stderr, "decode err %lld\n", dn); return 1; }
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }
  if (memcmp(out.data(), data.data(), data.size())) { fprintf(stderr, "MISMATCH\n"); return 1; }
  atpu_zstd_prof(prof);
  printf("%s L%d: %.1f MB/s ratio %.3f\n", argv[1], level,
         data.size() / best / 1e6, (double)data.size() / (double)csz);
  const char* names[4] = {"literals", "sequences", "nbSeqTotal", "fse_tables"};
  unsigned long long tot = prof[0] + prof[1] + prof[3];
  for (int i = 0; i < 4; i++)
    printf("  %-11s %14llu %s %5.1f%%\n", names[i], prof[i],
           i == 2 ? "seqs" : "cyc",
           i == 2 ? 0.0 : 100.0 * prof[i] / (tot ? tot : 1));
  return 0;
}
