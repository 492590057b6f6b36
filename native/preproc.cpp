// Native host-side image preprocessing for the data pipeline.
//
// The reference keeps its hot host path inside torch's C++ DataLoader
// workers (SURVEY §2.6); here the equivalent is a small C++ library
// driven from the Python prefetch threads via ctypes. One fused pass
// replaces numpy's convert/subtract/divide chain (3 temporaries) when
// normalizing images, and releases the GIL for true thread parallelism.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpreproc.so preproc.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// uint8 HWC RGB -> f32 HWC, cropped to (out_h, out_w), (x/255 - mean)/std.
// in: [h, w, 3] contiguous; out: [out_h, out_w, 3] contiguous.
void normalize_crop(const uint8_t* in, int h, int w, int out_h, int out_w,
                    const float* mean, const float* stdv, float* out,
                    int n_threads) {
  (void)h;
  const float s0 = 1.0f / (255.0f * stdv[0]);
  const float s1 = 1.0f / (255.0f * stdv[1]);
  const float s2 = 1.0f / (255.0f * stdv[2]);
  const float m0 = mean[0] / stdv[0];
  const float m1 = mean[1] / stdv[1];
  const float m2 = mean[2] / stdv[2];

  auto work = [&](int y0, int y1) {
    for (int y = y0; y < y1; ++y) {
      const uint8_t* src = in + (size_t)y * w * 3;
      float* dst = out + (size_t)y * out_w * 3;
      for (int x = 0; x < out_w; ++x) {
        dst[3 * x + 0] = src[3 * x + 0] * s0 - m0;
        dst[3 * x + 1] = src[3 * x + 1] * s1 - m1;
        dst[3 * x + 2] = src[3 * x + 2] * s2 - m2;
      }
    }
  };

  if (n_threads <= 1 || out_h < 64) {
    work(0, out_h);
    return;
  }
  std::vector<std::thread> threads;
  int per = (out_h + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int y0 = t * per;
    int y1 = y0 + per < out_h ? y0 + per : out_h;
    if (y0 >= y1) break;
    threads.emplace_back(work, y0, y1);
  }
  for (auto& th : threads) th.join();
}

// Batched variant: pack n same-sized images into one output buffer.
void normalize_crop_batch(const uint8_t* const* ins, int n, int h, int w,
                          int out_h, int out_w, const float* mean,
                          const float* stdv, float* out, int n_threads) {
  size_t stride = (size_t)out_h * out_w * 3;
  for (int i = 0; i < n; ++i) {
    normalize_crop(ins[i], h, w, out_h, out_w, mean, stdv, out + i * stride,
                   n_threads);
  }
}

}  // extern "C"
