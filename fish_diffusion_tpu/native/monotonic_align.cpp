// Monotonic (Viterbi maximum-path) alignment — native host kernel.
//
// Same contract as the reference's numba kernel
// (fish_diffusion/modules/monotonic_align/core.py:14-46), re-implemented in
// C++ for host-side preprocessing where the JAX/XLA version's dispatch
// overhead is unnecessary. Batch-parallel over B with a simple thread pool.
//
// Build: see fish_diffusion_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

constexpr float kNegInf = -1e9f;

void path_one(int32_t* path, float* value, int t_y, int t_x, int T_x) {
  // forward DP, in place on value
  for (int y = 0; y < t_y; ++y) {
    int x_lo = std::max(0, t_x + y - t_y);
    int x_hi = std::min(t_x, y + 1);
    for (int x = x_lo; x < x_hi; ++x) {
      float v_cur = (x == y) ? kNegInf : value[(y - 1) * T_x + x];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : kNegInf;
      } else {
        v_prev = value[(y - 1) * T_x + (x - 1)];
      }
      value[y * T_x + x] += std::max(v_prev, v_cur);
    }
  }

  // backtrack
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[y * T_x + index] = 1;
    if (index != 0 &&
        (index == y ||
         value[(y - 1) * T_x + index] < value[(y - 1) * T_x + (index - 1)])) {
      --index;
    }
  }
}

}  // namespace

extern "C" {

// paths [B, T_y, T_x] int32 (zeroed by caller), values [B, T_y, T_x] f32
// (clobbered), t_ys / t_xs [B] int32.
void maximum_path(int32_t* paths, float* values, const int32_t* t_ys,
                  const int32_t* t_xs, int B, int T_y, int T_x) {
  int n_threads = std::min<int>(B, std::thread::hardware_concurrency());
  if (n_threads <= 1) {
    for (int b = 0; b < B; ++b) {
      path_one(paths + (int64_t)b * T_y * T_x, values + (int64_t)b * T_y * T_x,
               t_ys[b], t_xs[b], T_x);
    }
    return;
  }

  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([=]() {
      for (int b = t; b < B; b += n_threads) {
        path_one(paths + (int64_t)b * T_y * T_x,
                 values + (int64_t)b * T_y * T_x, t_ys[b], t_xs[b], T_x);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
