// Standalone zstd host decode profiler (round 4, VERDICT #4).
// Build:  g++ -O3 -march=x86-64-v3 -std=c++17 -DATPU_PROF \
//           csrc/zstd_decode.cpp csrc/zstd_encode.cpp \
//           csrc/prof_zstd_decode.cpp -o /tmp/prof_zstd
// Run:    /tmp/prof_zstd FILE [level] [stock_stream_file]
// Prints decode MB/s plus the lit/seq cycle split from ATPU_PROF so the
// attack order (Huffman literal kernel vs sequence loop) is measured,
// not guessed.
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
long long atpu_zstd_decompress(const uint8_t*, size_t, uint8_t*, size_t,
                               const uint8_t*, size_t);
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

static void bench_decode(const char* label, const std::vector<uint8_t>& comp,
                         size_t rawLen) {
  std::vector<uint8_t> out(rawLen + 64);
  unsigned long long prof[4];
  atpu_zstd_prof(prof);  // reset
  double best = 1e30;
  int iters = 15;
  for (int i = 0; i < iters; i++) {
    auto t0 = std::chrono::steady_clock::now();
    long long r = atpu_zstd_decompress(comp.data(), comp.size(), out.data(),
                                       rawLen, nullptr, 0);
    auto t1 = std::chrono::steady_clock::now();
    if (r != (long long)rawLen) { fprintf(stderr, "decode err %lld\n", r); exit(1); }
    double dt = std::chrono::duration<double>(t1 - t0).count();
    if (dt < best) best = dt;
  }
  atpu_zstd_prof(prof);
  double tot = (double)(prof[0] + prof[1] + prof[3]);
  printf("%-18s %7.1f MB/s   lit %4.1f%%  seq %4.1f%%  tables %4.1f%%  "
         "(%llu seqs/iter)\n",
         label, rawLen / 1e6 / best, 100.0 * prof[0] / tot,
         100.0 * prof[1] / tot, 100.0 * prof[3] / tot,
         prof[2] / (unsigned long long)iters);
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s FILE [level]\n", argv[0]); return 1; }
  auto raw = slurp(argv[1]);
  int level = argc > 2 ? atoi(argv[2]) : 3;
  std::vector<uint8_t> comp((size_t)atpu_zstd_compress_bound((long long)raw.size()));
  long long c = atpu_zstd_compress(raw.data(), raw.size(), comp.data(),
                                   comp.size(), level, nullptr, 0);
  if (c < 0) { fprintf(stderr, "compress err %lld\n", c); return 1; }
  comp.resize((size_t)c);
  printf("file=%s raw=%zu own-L%d comp=%zu ratio=%.3f\n", argv[1], raw.size(),
         level, comp.size(), (double)raw.size() / comp.size());
  bench_decode("own stream", comp, raw.size());
  if (argc > 3) {
    auto st = slurp(argv[3]);
    bench_decode("stock stream", st, raw.size());
  }
  return 0;
}
