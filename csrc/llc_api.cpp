// C-level unified API over the native host codecs — the aocl_llc_*
// call shape (reference: api/api.cpp:45-195 + the adapter table
// api/codec.cpp). The Python package's unified API adds the device/mesh
// tiers; this entry serves C callers with the host paths and the same
// descriptor/stats/error-code semantics.

#include "llc_api.h"

#include <cstring>
#include <ctime>

extern "C" {
int64_t atpu_lz4_compress_bound(int64_t n);
int64_t atpu_lz4_compress(const uint8_t*, int64_t, uint8_t*, int64_t, int);
int64_t atpu_lz4_decompress(const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t atpu_lz4hc_compress(const uint8_t*, int64_t, uint8_t*, int64_t, int);
int64_t atpu_snappy_max_compressed_length(int64_t);
int64_t atpu_snappy_compress(const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t atpu_snappy_uncompress(const uint8_t*, int64_t, uint8_t*, int64_t);
int64_t atpu_deflate(const uint8_t*, size_t, uint8_t*, size_t, int, int);
int64_t atpu_deflate_bound(int64_t);
int64_t atpu_inflate(const uint8_t*, size_t, uint8_t*, size_t, int);
int64_t atpu_bz2_compress(const uint8_t*, size_t, uint8_t*, size_t, int);
int64_t atpu_bz2_decompress(const uint8_t*, size_t, uint8_t*, size_t);
int64_t atpu_lzma_compress(const uint8_t*, size_t, uint8_t*, size_t, int);
int64_t atpu_lzma_decompress(const uint8_t*, size_t, uint8_t*, size_t);
int64_t atpu_zstd_compress(const uint8_t*, size_t, uint8_t*, size_t, int,
                           const uint8_t*, size_t);
int64_t atpu_zstd_compress_bound(int64_t);
int64_t atpu_zstd_decompress(const uint8_t*, size_t, uint8_t*, size_t,
                             const uint8_t*, size_t);
}

namespace {

double now_ns() {
  struct timespec ts;
  clock_gettime(CLOCK_REALTIME, &ts);  // reference timer: utils.h:219
  return (double)ts.tv_sec * 1e9 + (double)ts.tv_nsec;
}

int64_t run_compress(atpu_llc_desc* d, atpu_method m) {
  const uint8_t* in = d->in;
  size_t n = d->in_size;
  uint8_t* out = d->out;
  size_t cap = d->out_size;
  int lvl = d->level;
  switch (m) {
    case ATPU_LZ4:
      return atpu_lz4_compress(in, (int64_t)n, out, (int64_t)cap,
                               d->opt_var > 0 ? d->opt_var : 1);
    case ATPU_LZ4HC:
      return atpu_lz4hc_compress(in, (int64_t)n, out, (int64_t)cap,
                                 lvl > 0 ? lvl : 9);
    case ATPU_SNAPPY:
      return atpu_snappy_compress(in, (int64_t)n, out, (int64_t)cap);
    case ATPU_ZLIB:
      return atpu_deflate(in, n, out, cap, lvl > 0 ? lvl : 6, 0);
    case ATPU_BZIP2:
      return atpu_bz2_compress(in, n, out, cap, lvl > 0 ? lvl : 9);
    case ATPU_LZMA:
      return atpu_lzma_compress(in, n, out, cap, lvl >= 0 ? lvl : 6);
    case ATPU_ZSTD:
      return atpu_zstd_compress(in, n, out, cap, lvl > 0 ? lvl : 3,
                                nullptr, 0);
    default:
      return ATPU_ERR_UNSUPPORTED_METHOD;
  }
}

int64_t run_decompress(atpu_llc_desc* d, atpu_method m) {
  const uint8_t* in = d->in;
  size_t n = d->in_size;
  uint8_t* out = d->out;
  size_t cap = d->out_size;
  switch (m) {
    case ATPU_LZ4:
    case ATPU_LZ4HC:
      return atpu_lz4_decompress(in, (int64_t)n, out, (int64_t)cap);
    case ATPU_SNAPPY:
      return atpu_snappy_uncompress(in, (int64_t)n, out, (int64_t)cap);
    case ATPU_ZLIB:
      return atpu_inflate(in, n, out, cap, 0);
    case ATPU_BZIP2:
      return atpu_bz2_decompress(in, n, out, cap);
    case ATPU_LZMA:
      return atpu_lzma_decompress(in, n, out, cap);
    case ATPU_ZSTD:
      return atpu_zstd_decompress(in, n, out, cap, nullptr, 0);
    default:
      return ATPU_ERR_UNSUPPORTED_METHOD;
  }
}

}  // namespace

extern "C" {

int64_t atpu_llc_setup(atpu_llc_desc* d, atpu_method m) {
  if (!d || m < 0 || m >= ATPU_METHOD_COUNT)
    return ATPU_ERR_UNSUPPORTED_METHOD;
  d->work = nullptr;  // host codecs are stateless; parity slot
  return ATPU_OK;
}

int64_t atpu_llc_compress(atpu_llc_desc* d, atpu_method m) {
  if (!d || !d->in || !d->out) return ATPU_ERR_INVALID_INPUT;
  double t0 = d->measure_stats ? now_ns() : 0;
  int64_t r = run_compress(d, m);
  if (r < 0) return ATPU_ERR_COMPRESSION_FAILED;
  d->out_size = (size_t)r;  // documented contract: bytes written out
  if (d->measure_stats) {
    double dt = now_ns() - t0;
    d->c_time_ns = dt;
    d->c_size = (size_t)r;
    // reference speed definition: bytes * 1000 / ns (api/api.cpp:74)
    d->c_speed_mbps = dt > 0 ? (double)d->in_size * 1000.0 / dt : 0;
  }
  return r;
}

int64_t atpu_llc_decompress(atpu_llc_desc* d, atpu_method m) {
  if (!d || !d->in || !d->out) return ATPU_ERR_INVALID_INPUT;
  double t0 = d->measure_stats ? now_ns() : 0;
  int64_t r = run_decompress(d, m);
  if (r < 0) return ATPU_ERR_DECOMPRESSION_FAILED;
  d->out_size = (size_t)r;  // documented contract: bytes written out
  if (d->measure_stats) {
    double dt = now_ns() - t0;
    d->d_time_ns = dt;
    d->d_size = (size_t)r;
    d->d_speed_mbps = dt > 0 ? (double)r * 1000.0 / dt : 0;
  }
  return r;
}

void atpu_llc_destroy(atpu_llc_desc* d, atpu_method m) {
  (void)m;
  if (d) d->work = nullptr;
}

const char* atpu_llc_version(void) {
  return "aocl-compression-tpu 2.0 (host C runtime)";
}

int64_t atpu_llc_compress_bound(atpu_method m, int64_t n) {
  switch (m) {
    case ATPU_LZ4:
    case ATPU_LZ4HC:
      return atpu_lz4_compress_bound(n);
    case ATPU_SNAPPY:
      return atpu_snappy_max_compressed_length(n);
    case ATPU_ZLIB:
      return atpu_deflate_bound(n);
    case ATPU_BZIP2:
      return n + n / 100 + 600;
    case ATPU_LZMA:
      return n + n / 3 + 256;
    case ATPU_ZSTD:
      return atpu_zstd_compress_bound(n);
    default:
      return -1;
  }
}

}  // extern "C"
