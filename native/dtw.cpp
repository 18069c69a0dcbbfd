// Dynamic time warping kernel (host-side native implementation).
//
// Corpus-level MCD evaluation (styletts2_tpu/eval.py) needs DTW alignment of
// cepstral sequences; the pure-Python O(Ta*Tb) loop is unusable at corpus
// scale (the reference quality-controls by ear and ships no metric tooling,
// SURVEY.md §4 — this is framework-added evaluation machinery). Computes the
// full accumulated-cost DP over a precomputed frame-distance matrix and
// backtracks the optimal path. Layouts are row-major.
//
// Build: g++ -O3 -shared -fPIC -o libdtw.so dtw.cpp
// (auto-built on first use by styletts2_tpu/eval.py, mirroring
// native/monotonic_align.cpp's loader.)

#include <cstdint>
#include <vector>
#include <limits>

namespace {
constexpr float kInf = std::numeric_limits<float>::infinity();
}

extern "C" {

// dist: (Ta, Tb) frame distances. path_a/path_b: caller-allocated buffers of
// capacity Ta+Tb (the maximal path length). Returns the path length, or -1
// on bad input. band: Sakoe-Chiba half-width in frames (<=0 disables).
int32_t dtw_path(const float* dist, int32_t Ta, int32_t Tb, int32_t band,
                 int32_t* path_a, int32_t* path_b) {
  if (Ta <= 0 || Tb <= 0) return -1;
  // acc DP with one rolling row + packed 2-bit backpointers
  // (0=diag, 1=up/skip-a, 2=left/skip-b)
  std::vector<float> prev(static_cast<size_t>(Tb) + 1, kInf);
  std::vector<float> cur(static_cast<size_t>(Tb) + 1, kInf);
  std::vector<uint8_t> bp(static_cast<size_t>(Ta) * Tb);
  prev[0] = 0.0f;
  const double slope = static_cast<double>(Tb) / Ta;
  for (int32_t i = 1; i <= Ta; ++i) {
    int32_t j_lo = 1, j_hi = Tb;
    if (band > 0) {
      const int32_t c = static_cast<int32_t>(i * slope);
      j_lo = c - band > 1 ? c - band : 1;
      j_hi = c + band < Tb ? c + band : Tb;
    }
    cur[0] = kInf;
    for (int32_t j = 0; j < j_lo; ++j) cur[j] = kInf;
    for (int32_t j = j_hi + 1; j <= Tb; ++j) cur[j] = kInf;
    const float* drow = dist + static_cast<size_t>(i - 1) * Tb;
    uint8_t* brow = bp.data() + static_cast<size_t>(i - 1) * Tb;
    for (int32_t j = j_lo; j <= j_hi; ++j) {
      const float diag = prev[j - 1];
      const float up = prev[j];
      const float left = cur[j - 1];
      float best = diag;
      uint8_t dir = 0;
      if (up < best) { best = up; dir = 1; }
      if (left < best) { best = left; dir = 2; }
      cur[j] = drow[j - 1] + best;
      brow[j - 1] = dir;
    }
    std::swap(prev, cur);
  }
  if (!(prev[Tb] < kInf)) return -1;  // band too narrow to connect
  // backtrack
  int32_t i = Ta, j = Tb, n = 0;
  const int32_t cap = Ta + Tb;
  while (i > 0 && j > 0 && n < cap) {
    path_a[n] = i - 1;
    path_b[n] = j - 1;
    ++n;
    const uint8_t dir = bp[static_cast<size_t>(i - 1) * Tb + (j - 1)];
    if (dir == 0) { --i; --j; }
    else if (dir == 1) { --i; }
    else { --j; }
  }
  // reverse in place
  for (int32_t k = 0; k < n / 2; ++k) {
    int32_t t = path_a[k]; path_a[k] = path_a[n - 1 - k]; path_a[n - 1 - k] = t;
    t = path_b[k]; path_b[k] = path_b[n - 1 - k]; path_b[n - 1 - k] = t;
  }
  return n;
}

}  // extern "C"
