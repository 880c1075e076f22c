// Native batch ESVO ray tracer — C++ twin of the traversal
// (reference/traverse.py semantics, csrc analog of the reference's
// Trace.cu / NVIDIAIterativeTracer.cs scalar loop).
//
// Used as (a) a fast golden oracle for large test batches and (b) the
// host-side production fallback when no accelerator is attached (e.g.
// clipmap prefetch culling). Threaded over rays; each ray runs the exact
// PUSH/ADVANCE/POP bit-twiddling loop with absolute child/leaf pointers.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

constexpr int S_MAX = 23;

inline int32_t f2i(float f) {
  int32_t i;
  std::memcpy(&i, &f, 4);
  return i;
}

inline float i2f(int32_t i) {
  float f;
  std::memcpy(&f, &i, 4);
  return f;
}

inline int popc8(uint32_t v) { return __builtin_popcount(v & 0xFFu); }

struct Svo {
  const int32_t* masks;
  const int32_t* child_base;
  const int32_t* leaf_base;
  int depth;
};

void cast_one(const Svo& svo, const float* o3, const float* d3, int32_t root,
              int32_t* hit_leaf, float* hit_t, int32_t* hit_parent,
              int32_t* hit_child, int32_t* iters_out, int max_iters) {
  *hit_leaf = -1;
  *hit_t = 0.f;
  *hit_parent = -1;
  *hit_child = 0;
  *iters_out = 0;

  float o[3] = {o3[0] + 1.0f, o3[1] + 1.0f, o3[2] + 1.0f};
  float d[3] = {d3[0], d3[1], d3[2]};
  const float eps = std::ldexp(1.0f, -S_MAX);
  for (int i = 0; i < 3; ++i)
    if (std::fabs(d[i]) < eps) d[i] = d[i] >= 0 ? eps : -eps;

  float t_coef[3], t_bias[3];
  for (int i = 0; i < 3; ++i) {
    t_coef[i] = -1.0f / std::fabs(d[i]);
    t_bias[i] = t_coef[i] * o[i];
  }
  int octant_mask = 7;
  for (int i = 0; i < 3; ++i)
    if (d[i] > 0.0f) {
      octant_mask ^= 1 << i;
      t_bias[i] = 3.0f * t_coef[i] - t_bias[i];
    }

  float t_min = std::max(std::max(2.0f * t_coef[0] - t_bias[0],
                                  2.0f * t_coef[1] - t_bias[1]),
                         2.0f * t_coef[2] - t_bias[2]);
  float t_max = std::min(std::min(t_coef[0] - t_bias[0],
                                  t_coef[1] - t_bias[1]),
                         t_coef[2] - t_bias[2]);
  t_min = std::max(t_min, 0.0f);
  float h = t_max;
  if (t_min >= t_max) return;

  int32_t parent = root;
  int idx = 0;
  float pos[3] = {1.0f, 1.0f, 1.0f};
  int scale = S_MAX - 1;
  float scale_exp2 = 0.5f;
  for (int i = 0; i < 3; ++i)
    if (1.5f * t_coef[i] - t_bias[i] > t_min) {
      idx ^= 1 << i;
      pos[i] = 1.5f;
    }

  int32_t stack_node[S_MAX];
  float stack_tmax[S_MAX];
  bool stack_set[S_MAX] = {false};

  int iters = 0;
  while (scale < S_MAX && iters < max_iters) {
    ++iters;
    int32_t m = svo.masks[parent];
    uint32_t vm = ((uint32_t)m >> 8) & 0xFFu;
    uint32_t lm = (uint32_t)m & 0xFFu;

    float t_corner[3];
    for (int i = 0; i < 3; ++i) t_corner[i] = pos[i] * t_coef[i] - t_bias[i];
    float tc_max = std::min(std::min(t_corner[0], t_corner[1]), t_corner[2]);

    int child_shift = idx ^ octant_mask ^ 7;
    bool advanced = false;
    if (((vm >> child_shift) & 1u) && t_min <= t_max) {
      float tv_max = std::min(t_max, tc_max);
      float half = scale_exp2 * 0.5f;
      if (t_min <= tv_max) {
        if ((lm >> child_shift) & 1u) {
          *hit_leaf = svo.leaf_base[parent] +
                      popc8(vm & lm & ((1u << child_shift) - 1u));
          *hit_t = t_min;
          *hit_parent = parent;
          *hit_child = child_shift;
          *iters_out = iters;
          return;
        }
        // PUSH
        if (tc_max < h) {
          stack_node[scale] = parent;
          stack_tmax[scale] = t_max;
          stack_set[scale] = true;
        }
        h = tc_max;
        parent = svo.child_base[parent] +
                 popc8(vm & ~lm & ((1u << child_shift) - 1u));
        idx = 0;
        --scale;
        scale_exp2 = half;
        for (int i = 0; i < 3; ++i)
          if (half * t_coef[i] + t_corner[i] > t_min) {
            idx ^= 1 << i;
            pos[i] += scale_exp2;
          }
        t_max = tv_max;
        advanced = true;
      }
    }
    if (advanced) continue;

    // ADVANCE
    int step_mask = 0;
    for (int i = 0; i < 3; ++i)
      if (t_corner[i] <= tc_max) {
        step_mask ^= 1 << i;
        pos[i] -= scale_exp2;
      }
    t_min = std::max(t_min, tc_max);
    idx ^= step_mask;

    if (idx & step_mask) {
      // POP
      int32_t differing = 0;
      for (int i = 0; i < 3; ++i)
        if ((step_mask >> i) & 1)
          differing |= f2i(pos[i]) ^ f2i(pos[i] + scale_exp2);
      scale = (f2i((float)differing) >> 23) - 127;
      if (scale >= S_MAX) break;
      scale_exp2 = i2f((scale - S_MAX + 127) << 23);
      if (!stack_set[scale]) break;
      parent = stack_node[scale];
      t_max = stack_tmax[scale];
      int sh[3];
      for (int i = 0; i < 3; ++i) {
        sh[i] = f2i(pos[i]) >> scale;
        pos[i] = i2f(sh[i] << scale);
      }
      idx = (sh[0] & 1) | ((sh[1] & 1) << 1) | ((sh[2] & 1) << 2);
      h = 0.0f;
    }
  }
  *iters_out = iters;
}

void run_threaded(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  if (n < 1024 || nt == 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// origins/directions: (n,3) row-major float32, octree-local coords.
// roots: per-ray root node index or nullptr for root 0.
void rtt_trace(const int32_t* masks, const int32_t* child_base,
               const int32_t* leaf_base, int depth, const float* origins,
               const float* directions, const int32_t* roots, int64_t n,
               int32_t* hit_leaf, float* hit_t, int32_t* hit_parent,
               int32_t* hit_child, int32_t* iters) {
  Svo svo{masks, child_base, leaf_base, depth};
  int max_iters = 16 * depth + 48;
  run_threaded(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      cast_one(svo, origins + 3 * i, directions + 3 * i,
               roots ? roots[i] : 0, hit_leaf + i, hit_t + i, hit_parent + i,
               hit_child + i, iters + i, max_iters);
    }
  });
}

}  // extern "C"
