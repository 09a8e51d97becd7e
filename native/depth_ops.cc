// Native host-side depth preprocessing for the input pipeline.
//
// The reference's per-sample CPU hot loop #1 is the Prewitt depth->3ch
// encoding inside torch DataLoader workers
// (dataset/dataloader/OneVision/CustomSUNRGBDDatasetOneVision.py:64-112).
// This C++ implementation (OpenMP across rows, single pass per stage)
// is bit-exact against the numpy golden version (tests/test_native.py)
// and is loaded via ctypes (no pybind11 in this image).
//
// Build: native/build.sh  ->  native/libdepthops.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <limits>

extern "C" {

static void normalize_f_to_u8(const float* in, uint8_t* out, int64_t n) {
  float mn = std::numeric_limits<float>::infinity();
  float mx = -std::numeric_limits<float>::infinity();
#pragma omp parallel for reduction(min : mn) reduction(max : mx)
  for (int64_t i = 0; i < n; ++i) {
    mn = std::min(mn, in[i]);
    mx = std::max(mx, in[i]);
  }
  if (mx == mn) mx = mn + 1e-6f;
  const float denom = mx - mn;
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    // bit-match numpy's f32 evaluation order: 255*(x-mn) THEN / (mx-mn);
    // a precomputed reciprocal flips last-ulp truncation at the cast
    float v = (255.0f * (in[i] - mn)) / denom;
    // numpy float->uint8 cast truncates toward zero
    out[i] = (uint8_t)(int32_t)v;
  }
}

// 3x3 true convolution with symmetric ('reflect' in scipy.ndimage terms)
// boundary, kernel given in correlation order and flipped here.
static inline int reflect(int i, int n) {
  if (i < 0) return -i - 1;
  if (i >= n) return 2 * n - i - 1;
  return i;
}

static void conv3x3_sym(const float* img, const float* k /*3x3*/, float* out,
                        int h, int w) {
  // true convolution: flip kernel
  float kf[9];
  for (int i = 0; i < 9; ++i) kf[i] = k[8 - i];
#pragma omp parallel for
  for (int y = 0; y < h; ++y) {
    const float* r0 = img + (int64_t)reflect(y - 1, h) * w;
    const float* r1 = img + (int64_t)y * w;
    const float* r2 = img + (int64_t)reflect(y + 1, h) * w;
    float* o = out + (int64_t)y * w;
    // interior: branch-free, auto-vectorizable
    for (int x = 1; x < w - 1; ++x) {
      o[x] = kf[0] * r0[x - 1] + kf[1] * r0[x] + kf[2] * r0[x + 1] +
             kf[3] * r1[x - 1] + kf[4] * r1[x] + kf[5] * r1[x + 1] +
             kf[6] * r2[x - 1] + kf[7] * r2[x] + kf[8] * r2[x + 1];
    }
    for (int x : {0, w - 1}) {
      const int xm = reflect(x - 1, w), xp = reflect(x + 1, w);
      o[x] = kf[0] * r0[xm] + kf[1] * r0[x] + kf[2] * r0[xp] +
             kf[3] * r1[xm] + kf[4] * r1[x] + kf[5] * r1[xp] +
             kf[6] * r2[xm] + kf[7] * r2[x] + kf[8] * r2[xp];
    }
  }
}

// depth [h*w] float32 -> out [h*w*3] uint8 channels-last
// (depth_norm, |grad| norm, atan2(gy,gx) norm)
void depth_to_3ch(const float* depth, int h, int w, uint8_t* out,
                  float* scratch /* >= 4*h*w floats */) {
  const int64_t n = (int64_t)h * w;
  uint8_t* d8 = (uint8_t*)scratch;  // reuse scratch head as bytes
  normalize_f_to_u8(depth, d8, n);

  float* g = scratch + n;      // float copy of d8
  float* gx = scratch + 2 * n;
  float* gy = scratch + 3 * n;
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) g[i] = (float)d8[i];

  const float KX[9] = {-1, 0, 1, -1, 0, 1, -1, 0, 1};
  const float KY[9] = {-1, -1, -1, 0, 0, 0, 1, 1, 1};
  conv3x3_sym(g, KX, gx, h, w);
  conv3x3_sym(g, KY, gy, h, w);

  // magnitudes and angles in-place over g / reuse
  float* gm = g;  // overwrite
#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    const float m = std::sqrt(gx[i] * gx[i] + gy[i] * gy[i]);
    const float th = std::atan2(gy[i], gx[i]);
    gm[i] = m;
    gx[i] = th;  // gx now holds theta
  }
  uint8_t* gm8 = (uint8_t*)gy;  // reuse as byte buffer
  uint8_t* th8 = gm8 + n;
  normalize_f_to_u8(gm, gm8, n);
  normalize_f_to_u8(gx, th8, n);

#pragma omp parallel for
  for (int64_t i = 0; i < n; ++i) {
    out[3 * i + 0] = d8[i];
    out[3 * i + 1] = gm8[i];
    out[3 * i + 2] = th8[i];
  }
}

// depth_to_3ch + the reference's eval-path ImageNet bake
// (evaluate_onevision.py:279-288, reproduced by
// data/depth.py::depth_to_3ch_numpy(imagenet_bake=True)): per channel,
// f = u8/255, t = (f - mean_c) / std_c, then renormalize t to [0,255]
// uint8.  Mathematically the bake is an affine no-op modulo f32
// rounding — but eval parity is defined on the baked bytes, so the
// float evaluation order here bit-matches the numpy version
// (tests/test_native.py).
void depth_to_3ch_bake(const float* depth, int h, int w, uint8_t* out,
                       float* scratch /* >= 4*h*w floats */) {
  depth_to_3ch(depth, h, w, out, scratch);
  const int64_t n = (int64_t)h * w;
  const float MEAN[3] = {0.485f, 0.456f, 0.406f};
  const float STD[3] = {0.229f, 0.224f, 0.225f};
  float* t = scratch;                       // n floats
  uint8_t* b8 = (uint8_t*)(scratch + n);    // n bytes
  for (int c = 0; c < 3; ++c) {
#pragma omp parallel for
    for (int64_t i = 0; i < n; ++i) {
      const float f = (float)out[3 * i + c] / 255.0f;
      t[i] = (f - MEAN[c]) / STD[c];
    }
    normalize_f_to_u8(t, b8, n);
#pragma omp parallel for
    for (int64_t i = 0; i < n; ++i) out[3 * i + c] = b8[i];
  }
}

}  // extern "C"
