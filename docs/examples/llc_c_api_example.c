#include "llc_api.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int main(void) {
  const char* msg = "the unified C API surface over the native host codecs ";
  size_t n = 64000;
  uint8_t* in = malloc(n);
  for (size_t i = 0; i < n; i++) in[i] = msg[i % strlen(msg)];
  for (int m = 0; m < ATPU_METHOD_COUNT; m++) {
    int64_t bound = atpu_llc_compress_bound((atpu_method)m, (int64_t)n);
    uint8_t* c = malloc((size_t)bound);
    uint8_t* d2 = malloc(n);
    atpu_llc_desc d = {0};
    if (atpu_llc_setup(&d, (atpu_method)m) != ATPU_OK) return 1;
    d.in = in; d.in_size = n; d.out = c; d.out_size = (size_t)bound;
    d.measure_stats = 1;
    int64_t cs = atpu_llc_compress(&d, (atpu_method)m);
    if (cs <= 0) { printf("m=%d compress fail\n", m); return 1; }
    /* documented contract: out_size holds bytes written after the call */
    if (d.out_size != (size_t)cs) { printf("m=%d out_size\n", m); return 1; }
    d.in = c; d.in_size = (size_t)cs; d.out = d2; d.out_size = n;
    int64_t ds = atpu_llc_decompress(&d, (atpu_method)m);
    if (ds != (int64_t)n || memcmp(in, d2, n)) {
      printf("m=%d roundtrip fail\n", m); return 1;
    }
    if (d.out_size != (size_t)ds) { printf("m=%d out_size\n", m); return 1; }
    printf("method %d: %lld -> ratio %.2f, %.0f MB/s\n", m,
           (long long)cs, (double)n / cs, d.c_speed_mbps);
    free(c); free(d2);
    atpu_llc_destroy(&d, (atpu_method)m);
  }
  printf("version: %s\n", atpu_llc_version());
  return 0;
}
