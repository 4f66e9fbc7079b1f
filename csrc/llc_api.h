/* C-level unified compression API — the aocl_llc_* surface
 * (reference: api/aocl_compression.h:170-231) over the native host
 * codecs in this runtime. The Python package layers the TPU device
 * tiers on top; this header serves C/C++ callers that want the host
 * paths directly (drop-in shape: setup/compress/decompress/destroy/
 * version + a descriptor struct).
 */
#ifndef ATPU_LLC_API_H
#define ATPU_LLC_API_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
  ATPU_LZ4 = 0,
  ATPU_LZ4HC = 1,
  ATPU_LZMA = 2,
  ATPU_BZIP2 = 3,
  ATPU_SNAPPY = 4,
  ATPU_ZLIB = 5,
  ATPU_ZSTD = 6,
  ATPU_METHOD_COUNT = 7
} atpu_method;

typedef enum {  /* mirrors aocl_error_type */
  ATPU_OK = 0,
  ATPU_ERR_COMPRESSION_FAILED = -1,
  ATPU_ERR_DECOMPRESSION_FAILED = -2,
  ATPU_ERR_UNSUPPORTED_METHOD = -3,
  ATPU_ERR_INVALID_INPUT = -6
} atpu_error;

/* mirrors aocl_compression_desc (api/aocl_compression.h:125-152);
 * measured stats are filled when measure_stats != 0 */
typedef struct {
  const uint8_t* in;
  size_t in_size;
  uint8_t* out;
  size_t out_size;    /* capacity in; bytes written out */
  int level;
  int opt_var;        /* lz4 acceleration */
  int measure_stats;
  double c_time_ns, d_time_ns;
  double c_speed_mbps, d_speed_mbps;
  size_t c_size, d_size;
  void* work;         /* reserved */
} atpu_llc_desc;

int64_t atpu_llc_setup(atpu_llc_desc* d, atpu_method m);
int64_t atpu_llc_compress(atpu_llc_desc* d, atpu_method m);
int64_t atpu_llc_decompress(atpu_llc_desc* d, atpu_method m);
void atpu_llc_destroy(atpu_llc_desc* d, atpu_method m);
const char* atpu_llc_version(void);
int64_t atpu_llc_compress_bound(atpu_method m, int64_t n);

#ifdef __cplusplus
}
#endif

#endif /* ATPU_LLC_API_H */
