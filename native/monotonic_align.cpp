// Monotonic alignment Viterbi kernel (host-side native implementation).
//
// Native equivalent of the reference's external Cython `maximum_path_c`
// (resemble-ai/monotonic_align, wrapped at reference utils.py:14-27):
// dynamic program value[x][y] = neg_cent[x][y] + max(value[x][y-1],
// value[x-1][y-1]) with backtrack from (t_x-1, t_y-1). Used for host
// tooling and as the equivalence oracle for the on-device lax.scan DP
// (styletts2_tpu/ops/align.py). Layout: row-major (B, T_text, T_mel).

#include <cstdint>
#include <cstring>
#include <vector>
#include <limits>

namespace {
constexpr float kNegInf = -1e9f;

void maximum_path_single(int32_t* path, const float* neg_cent, int t_x,
                         int t_y, int T_text, int T_mel) {
  // value DP over two columns; came_from_diag bits for backtrack
  std::vector<float> v_prev(t_x, kNegInf), v_cur(t_x, kNegInf);
  std::vector<uint8_t> diag(static_cast<size_t>(t_x) * t_y, 0);

  for (int y = 0; y < t_y; ++y) {
    int x_lo = t_x + y - t_y;
    if (x_lo < 0) x_lo = 0;
    int x_hi = (y + 1 < t_x) ? y + 1 : t_x;
    for (int x = 0; x < t_x; ++x) v_cur[x] = kNegInf;
    for (int x = x_lo; x < x_hi; ++x) {
      float stay = (x <= y - 1) ? v_prev[x] : kNegInf;
      float d;
      if (x == 0) {
        d = (y == 0) ? 0.0f : kNegInf;
      } else {
        d = v_prev[x - 1];
      }
      bool take_diag = d > stay;
      float best = take_diag ? d : stay;
      v_cur[x] = neg_cent[static_cast<size_t>(x) * T_mel + y] + best;
      diag[static_cast<size_t>(x) * t_y + y] = take_diag ? 1 : 0;
    }
    std::swap(v_prev, v_cur);
  }

  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[static_cast<size_t>(index) * T_mel + y] = 1;
    if (index != 0 && diag[static_cast<size_t>(index) * t_y + y]) {
      --index;
    }
  }
}
}  // namespace

extern "C" {
void maximum_path_batch(int32_t* path, const float* neg_cent, int B,
                        int T_text, int T_mel, const int32_t* t_xs,
                        const int32_t* t_ys) {
  const size_t stride = static_cast<size_t>(T_text) * T_mel;
  std::memset(path, 0, sizeof(int32_t) * B * stride);
  for (int b = 0; b < B; ++b) {
    int t_x = t_xs[b], t_y = t_ys[b];
    if (t_x <= 0 || t_y <= 0) continue;
    maximum_path_single(path + b * stride, neg_cent + b * stride, t_x, t_y,
                        T_text, T_mel);
  }
}
}
