// RAP (Random Access Point) container — byte-compatible with the reference
// format so streams interoperate (spec: /root/reference/threads/threads.h:46-103,
// writer behavior: /root/reference/threads/threads.c:105-110 and
// /root/reference/algos/lz4/lz4.c:2736-2830).
//
// Layout (all little-endian):
//   8B  magic "AOCL_LLC" (0x434C4C5F4C434F41)
//   4B  total RAP frame length (header + metadata, includes these 12 bytes)
//   2B  num main threads
//   2B  num child threads (always 0, reserved — matches the reference)
//   per main thread: 4B absolute offset of its chunk in the stream,
//                    4B compressed chunk length,
//                    4B decompressed chunk length
//
// In the TPU framework, "threads" are device-parallel blocks: the container
// is what makes order-independent sharded decode possible.

#include <cstdint>
#include <cstring>

namespace {
constexpr uint64_t kMagic = 0x434C4C5F4C434F41ull;  // "AOCL_LLC"
constexpr int64_t kHeaderBytes = 8 + 4 + 2 + 2;
constexpr int64_t kEntryBytes = 12;  // offset + len + decomp_len

inline void write_u32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }
inline uint32_t read_u32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}
}  // namespace

extern "C" {

int64_t atpu_rap_frame_len(int32_t n_main) {
    return kHeaderBytes + (int64_t)n_main * kEntryBytes;
}

// Writes the full RAP frame at dst: header plus n_main entries whose
// {offset,len,dlen} come from the three arrays. Offsets are absolute within
// the final stream. Returns frame length, or -1 if cap is too small.
int64_t atpu_rap_write(uint8_t* dst, int64_t cap, int32_t n_main,
                       const uint32_t* offsets, const uint32_t* lens,
                       const uint32_t* dlens) {
    int64_t flen = atpu_rap_frame_len(n_main);
    if (cap < flen || n_main <= 0) return -1;
    std::memcpy(dst, &kMagic, 8);
    write_u32(dst + 8, (uint32_t)flen);
    // u32 = main count in low 16 bits, child count (0) in high 16 bits,
    // matching the reference's single u32 store (threads/threads.c:110).
    write_u32(dst + 12, (uint32_t)n_main & 0xffff);
    uint8_t* p = dst + kHeaderBytes;
    for (int32_t i = 0; i < n_main; i++) {
        write_u32(p, offsets[i]);
        write_u32(p + 4, lens[i]);
        write_u32(p + 8, dlens[i]);
        p += kEntryBytes;
    }
    return flen;
}

// Parses a RAP frame at src. Returns the number of main entries (filling the
// arrays up to max_entries), 0 if no RAP magic at src (legacy stream), or -1
// on a malformed frame.
int64_t atpu_rap_parse(const uint8_t* src, int64_t srcLen, uint32_t* offsets,
                       uint32_t* lens, uint32_t* dlens, int32_t max_entries) {
    if (srcLen < kHeaderBytes) return 0;
    uint64_t magic;
    std::memcpy(&magic, src, 8);
    if (magic != kMagic) return 0;
    uint32_t flen = read_u32(src + 8);
    uint32_t counts = read_u32(src + 12);
    int32_t n_main = (int32_t)(counts & 0xffff);
    if ((int64_t)flen > srcLen || flen != (uint32_t)atpu_rap_frame_len(n_main))
        return -1;
    int32_t n = n_main < max_entries ? n_main : max_entries;
    const uint8_t* p = src + kHeaderBytes;
    for (int32_t i = 0; i < n; i++) {
        offsets[i] = read_u32(p);
        lens[i] = read_u32(p + 4);
        dlens[i] = read_u32(p + 8);
        p += kEntryBytes;
    }
    return n_main;
}

// Number of bytes a legacy single-shot decoder must skip at src to get past
// the RAP frame (0 when there is none). Parity with aocl_skip_rap_frame_mt
// (/root/reference/threads/threads.c:320, api/aocl_threads.h:133).
int64_t atpu_rap_skip(const uint8_t* src, int64_t srcLen) {
    if (srcLen < kHeaderBytes) return 0;
    uint64_t magic;
    std::memcpy(&magic, src, 8);
    if (magic != kMagic) return 0;
    return (int64_t)read_u32(src + 8);
}

// Worst-case RAP frame bound for a given input size and chunking, the analog
// of aocl_get_rap_frame_bound_mt (threads/threads.c:315).
int64_t atpu_rap_frame_bound(int64_t src_size, int64_t chunk_size) {
    if (chunk_size <= 0) return kHeaderBytes;
    int64_t n = src_size / chunk_size + 2;
    return atpu_rap_frame_len((int32_t)n);
}

}  // extern "C"
