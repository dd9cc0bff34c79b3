// Native colorization kernel for the data-to-pics / livesim host pipeline.
//
// C++ re-design of the reference's rayon-parallel colorize stage
// (data-to-pics/src/main.rs:126-144: recursive row split, per pixel
// INFERNO.eval_continuous(AMPLITUDE_SCALE * v)). Exposed through ctypes
// (grayscott_tpu/native/__init__.py); semantics bit-match the NumPy
// fallback in grayscott_tpu/utils/palette.py.
//
// Build: see grayscott_tpu/native/__init__.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

void colorize_range(const float* v, size_t begin, size_t end,
                    const uint8_t* lut, float scale, uint8_t* out) {
  for (size_t i = begin; i < end; ++i) {
    float t = v[i] * scale;
    t = std::min(std::max(t, 0.0f), 1.0f);
    float x = t * 255.0f;
    int lo = static_cast<int>(x);  // x in [0, 255] => trunc == floor
    int hi = std::min(lo + 1, 255);
    float frac = x - static_cast<float>(lo);
    const uint8_t* a = lut + 3 * lo;
    const uint8_t* b = lut + 3 * hi;
    for (int k = 0; k < 3; ++k) {
      float c = static_cast<float>(a[k]) * (1.0f - frac) +
                static_cast<float>(b[k]) * frac;
      out[3 * i + k] = static_cast<uint8_t>(c + 0.5f);
    }
  }
}

}  // namespace

extern "C" {

// values: n float32 concentrations; lut: 256*3 uint8; out: n*3 uint8.
void gs_colorize(const float* values, size_t n, const uint8_t* lut,
                 float scale, uint8_t* out, int num_threads) {
  if (num_threads <= 1 || n < (1u << 16)) {
    colorize_range(values, 0, n, lut, scale, out);
    return;
  }
  size_t chunk = (n + num_threads - 1) / num_threads;
  std::vector<std::thread> workers;
  workers.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    size_t begin = std::min(static_cast<size_t>(t) * chunk, n);
    size_t end = std::min(begin + chunk, n);
    if (begin >= end) break;
    workers.emplace_back(colorize_range, values, begin, end, lut, scale, out);
  }
  for (auto& w : workers) w.join();
}

int gs_native_abi_version(void) { return 1; }

}  // extern "C"
