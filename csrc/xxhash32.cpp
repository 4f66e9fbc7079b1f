// XXH32 — implemented from the public xxHash spec (32-bit variant).
// Needed by the LZ4 frame format (frame descriptor HC byte, block and
// content checksums). Reference capability: algos/lz4/xxhash.c is the
// upstream dependency of lz4frame; this is an independent implementation.

#include <cstdint>
#include <cstring>

namespace {

constexpr uint32_t P1 = 2654435761u;
constexpr uint32_t P2 = 2246822519u;
constexpr uint32_t P3 = 3266489917u;
constexpr uint32_t P4 = 668265263u;
constexpr uint32_t P5 = 374761393u;

inline uint32_t rotl(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;  // little-endian hosts only (x86-64 / TPU VMs)
}

}  // namespace

extern "C" uint32_t atpu_xxh32(const uint8_t* data, int64_t len,
                               uint32_t seed) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    uint32_t h;

    if (len >= 16) {
        uint32_t v1 = seed + P1 + P2;
        uint32_t v2 = seed + P2;
        uint32_t v3 = seed + 0;
        uint32_t v4 = seed - P1;
        const uint8_t* limit = end - 16;
        do {
            v1 = rotl(v1 + read32(p) * P2, 13) * P1; p += 4;
            v2 = rotl(v2 + read32(p) * P2, 13) * P1; p += 4;
            v3 = rotl(v3 + read32(p) * P2, 13) * P1; p += 4;
            v4 = rotl(v4 + read32(p) * P2, 13) * P1; p += 4;
        } while (p <= limit);
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    } else {
        h = seed + P5;
    }

    h += static_cast<uint32_t>(len);
    while (p + 4 <= end) {
        h = rotl(h + read32(p) * P3, 17) * P4;
        p += 4;
    }
    while (p < end) {
        h = rotl(h + (*p) * P5, 11) * P1;
        ++p;
    }

    h ^= h >> 15;
    h *= P2;
    h ^= h >> 13;
    h *= P3;
    h ^= h >> 16;
    return h;
}

// Streaming XXH32 (same spec, incremental): the LZ4F streaming compressor
// needs the frame content checksum without buffering the whole stream.
// State is an opaque caller-allocated 48-byte buffer.
struct XXH32State {
    uint32_t v1, v2, v3, v4;
    uint64_t total;
    uint32_t memsize;
    uint8_t mem[16];
    uint32_t seed;
};
static_assert(sizeof(XXH32State) <= 48, "opaque state size contract");

extern "C" void atpu_xxh32_init(void* stv, uint32_t seed) {
    XXH32State* st = (XXH32State*)stv;
    st->v1 = seed + P1 + P2;
    st->v2 = seed + P2;
    st->v3 = seed;
    st->v4 = seed - P1;
    st->total = 0;
    st->memsize = 0;
    st->seed = seed;
}

extern "C" void atpu_xxh32_update(void* stv, const uint8_t* p, int64_t len) {
    XXH32State* st = (XXH32State*)stv;
    st->total += (uint64_t)len;
    if (st->memsize + (uint64_t)len < 16) {  // still not a full stripe
        std::memcpy(st->mem + st->memsize, p, (size_t)len);
        st->memsize += (uint32_t)len;
        return;
    }
    const uint8_t* end = p + len;
    if (st->memsize) {  // complete the pending stripe
        uint32_t fill = 16 - st->memsize;
        std::memcpy(st->mem + st->memsize, p, fill);
        p += fill;
        const uint8_t* m = st->mem;
        st->v1 = rotl(st->v1 + read32(m) * P2, 13) * P1;
        st->v2 = rotl(st->v2 + read32(m + 4) * P2, 13) * P1;
        st->v3 = rotl(st->v3 + read32(m + 8) * P2, 13) * P1;
        st->v4 = rotl(st->v4 + read32(m + 12) * P2, 13) * P1;
        st->memsize = 0;
    }
    if (p + 16 <= end) {
        uint32_t v1 = st->v1, v2 = st->v2, v3 = st->v3, v4 = st->v4;
        const uint8_t* limit = end - 16;
        do {
            v1 = rotl(v1 + read32(p) * P2, 13) * P1; p += 4;
            v2 = rotl(v2 + read32(p) * P2, 13) * P1; p += 4;
            v3 = rotl(v3 + read32(p) * P2, 13) * P1; p += 4;
            v4 = rotl(v4 + read32(p) * P2, 13) * P1; p += 4;
        } while (p <= limit);
        st->v1 = v1; st->v2 = v2; st->v3 = v3; st->v4 = v4;
    }
    if (p < end) {
        std::memcpy(st->mem, p, (size_t)(end - p));
        st->memsize = (uint32_t)(end - p);
    }
}

extern "C" uint32_t atpu_xxh32_digest(const void* stv) {
    const XXH32State* st = (const XXH32State*)stv;
    uint32_t h;
    if (st->total >= 16) {
        h = rotl(st->v1, 1) + rotl(st->v2, 7) + rotl(st->v3, 12)
            + rotl(st->v4, 18);
    } else {
        h = st->seed + P5;
    }
    h += (uint32_t)st->total;
    const uint8_t* p = st->mem;
    const uint8_t* end = st->mem + st->memsize;
    while (p + 4 <= end) {
        h = rotl(h + read32(p) * P3, 17) * P4;
        p += 4;
    }
    while (p < end) {
        h = rotl(h + (*p) * P5, 11) * P1;
        ++p;
    }
    h ^= h >> 15;
    h *= P2;
    h ^= h >> 13;
    h *= P3;
    h ^= h >> 16;
    return h;
}
