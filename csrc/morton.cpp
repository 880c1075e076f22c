// Batch 64-bit Morton encode/decode (native twin of ops/morton.py;
// reference scalar loop: Assets/Scripts/SVO/RTUtility/MortonUtil.cs).

#include <cstdint>

namespace {

inline uint64_t part1by2(uint64_t v) {
  v &= 0x1FFFFFull;
  v = (v | (v << 32)) & 0x1F00000000FFFFull;
  v = (v | (v << 16)) & 0x1F0000FF0000FFull;
  v = (v | (v << 8)) & 0x100F00F00F00F00Full;
  v = (v | (v << 4)) & 0x10C30C30C30C30C3ull;
  v = (v | (v << 2)) & 0x1249249249249249ull;
  return v;
}

inline uint64_t compact1by2(uint64_t v) {
  v &= 0x1249249249249249ull;
  v = (v | (v >> 2)) & 0x10C30C30C30C30C3ull;
  v = (v | (v >> 4)) & 0x100F00F00F00F00Full;
  v = (v | (v >> 8)) & 0x1F0000FF0000FFull;
  v = (v | (v >> 16)) & 0x1F00000000FFFFull;
  v = (v | (v >> 32)) & 0x1FFFFFull;
  return v;
}

}  // namespace

extern "C" {

void rtt_morton_encode64(const uint32_t* x, const uint32_t* y,
                         const uint32_t* z, uint64_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = part1by2(x[i]) | (part1by2(y[i]) << 1) | (part1by2(z[i]) << 2);
}

void rtt_morton_decode64(const uint64_t* code, uint32_t* x, uint32_t* y,
                         uint32_t* z, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    x[i] = (uint32_t)compact1by2(code[i]);
    y[i] = (uint32_t)compact1by2(code[i] >> 1);
    z[i] = (uint32_t)compact1by2(code[i] >> 2);
  }
}

}  // extern "C"
