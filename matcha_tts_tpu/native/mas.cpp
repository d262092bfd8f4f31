// Monotonic Alignment Search — native host kernel.
//
// C++ equivalent of the reference's Numba-JIT DP (reference:
// /root/reference/train_standalone.py:241-277): banded forward DP
// maximizing the Gaussian log-prior along a monotonic path, then a
// backtrack emitting a one-hot path.  Semantics (band limits, boundary
// cases, strict-greater backtrack) match the Python oracle in
// matcha_tts_tpu/ops/mas.py exactly; used for parity testing the on-device
// associative-scan kernel and as a fast host fallback.
//
// Build: see matcha_tts_tpu/native/build.py (g++ -O3 -shared -fPIC
// [-fopenmp]).

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// paths:    (b, t_x, t_y) float32, zero-initialized by caller; overwritten
//           with the one-hot path.
// values:   (b, t_x, t_y) float32 log-prior (const).
// t_xs/t_ys: per-item valid lengths (int32).
void maximum_path_batch(float* paths, const float* values,
                        const int32_t* t_xs, const int32_t* t_ys,
                        int32_t b, int32_t t_x_max, int32_t t_y_max) {
  const int64_t stride_b = (int64_t)t_x_max * t_y_max;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int32_t i = 0; i < b; ++i) {
    float* path = paths + (int64_t)i * stride_b;           // row-major (x, y)
    const float* value = values + (int64_t)i * stride_b;
    const int32_t tx = t_xs[i];
    const int32_t ty = t_ys[i];
    if (tx <= 0 || ty <= 0) continue;

    // forward DP (train_standalone.py:250-267 semantics)
    for (int32_t y = 0; y < ty; ++y) {
      const int32_t x_lo = std::max(0, tx + y - ty);
      const int32_t x_hi = std::min(tx, y + 1);
      for (int32_t x = x_lo; x < x_hi; ++x) {
        float v_prev;
        if (x == 0) {
          v_prev = (y == 0) ? 0.0f : path[(int64_t)x * t_y_max + (y - 1)];
        } else if (y == 0) {
          v_prev = path[(int64_t)(x - 1) * t_y_max + y];
        } else {
          v_prev = std::max(path[(int64_t)(x - 1) * t_y_max + y],
                            path[(int64_t)x * t_y_max + (y - 1)]);
        }
        path[(int64_t)x * t_y_max + y] = v_prev + value[(int64_t)x * t_y_max + y];
      }
    }

    // backtrack (train_standalone.py:269-276): strict '>' steps down
    int32_t index = tx - 1;
    for (int32_t y = ty - 1; y >= 0; --y) {
      for (int32_t x = 0; x < tx; ++x) path[(int64_t)x * t_y_max + y] = 0.0f;
      path[(int64_t)index * t_y_max + y] = 1.0f;
      if (index > 0 && y > 0) {
        const float up = path[(int64_t)(index - 1) * t_y_max + (y - 1)];
        const float stay = path[(int64_t)index * t_y_max + (y - 1)];
        if (up > stay) --index;
      }
    }
  }
}

}  // extern "C"
