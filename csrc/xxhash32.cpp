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
