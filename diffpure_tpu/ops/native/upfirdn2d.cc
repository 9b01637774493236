// Native host-side upfirdn2d (pad -> zero-insert upsample -> FIR conv ->
// downsample), float32, NHWC.
//
// Counterpart of the reference's CUDA kernel
// (ref: score_sde/op/upfirdn2d_kernel.cu:1-368). On TPU the device-side op
// is one fused XLA conv (diffpure_tpu/ops/upfirdn2d.py); this native build
// serves the host runtime: torch-free oracle for kernel tests and CPU data
// preprocessing (FIR anti-aliased resampling at load time) without paying
// a device round trip.
//
// Built as a plain shared object, called through ctypes (no pybind11).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// x:      (N, H, W, C) float32
// kernel: (kh, kw) float32 (true convolution: kernel is flipped here)
// out:    (N, OH, OW, C) float32 with
//         OH = (H*up + pad0 + pad1 - kh) / down + 1 (caller-allocated)
void upfirdn2d_f32(const float* x, const float* kernel, float* out,
                   int64_t N, int64_t H, int64_t W, int64_t C,
                   int64_t kh, int64_t kw,
                   int64_t up, int64_t down,
                   int64_t pad0, int64_t pad1) {
  const int64_t up_h = H * up;
  const int64_t up_w = W * up;
  const int64_t oh = (up_h + pad0 + pad1 - kh) / down + 1;
  const int64_t ow = (up_w + pad0 + pad1 - kw) / down + 1;

  // flipped kernel (convolution semantics, ref upfirdn2d.py:188-189)
  std::vector<float> kf(kh * kw);
  for (int64_t i = 0; i < kh; ++i)
    for (int64_t j = 0; j < kw; ++j)
      kf[i * kw + j] = kernel[(kh - 1 - i) * kw + (kw - 1 - j)];

  for (int64_t n = 0; n < N; ++n) {
    const float* xn = x + n * H * W * C;
    float* on = out + n * oh * ow * C;
    for (int64_t oy = 0; oy < oh; ++oy) {
      const int64_t base_y = oy * down - pad0;  // position in upsampled grid
      for (int64_t ox = 0; ox < ow; ++ox) {
        const int64_t base_x = ox * down - pad0;
        float* op = on + (oy * ow + ox) * C;
        std::memset(op, 0, sizeof(float) * C);
        for (int64_t ky = 0; ky < kh; ++ky) {
          const int64_t uy = base_y + ky;
          if (uy < 0 || uy >= up_h || uy % up) continue;
          const int64_t iy = uy / up;
          for (int64_t kx = 0; kx < kw; ++kx) {
            const int64_t ux = base_x + kx;
            if (ux < 0 || ux >= up_w || ux % up) continue;
            const int64_t ix = ux / up;
            const float kv = kf[ky * kw + kx];
            const float* ip = xn + (iy * W + ix) * C;
            for (int64_t c = 0; c < C; ++c) op[c] += kv * ip[c];
          }
        }
      }
    }
  }
}

// y = leaky_relu(x + bias) * scale, NHWC, bias per-channel
// (ref: score_sde/op/fused_bias_act_kernel.cu:18-99)
void fused_bias_act_f32(const float* x, const float* bias, float* out,
                        int64_t n_rows, int64_t C,
                        float negative_slope, float scale) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* xp = x + r * C;
    float* op = out + r * C;
    for (int64_t c = 0; c < C; ++c) {
      float v = xp[c] + (bias ? bias[c] : 0.0f);
      op[c] = (v >= 0.0f ? v : v * negative_slope) * scale;
    }
  }
}

// gradient of fused_bias_act w.r.t. input (and bias via row-sum outside)
void fused_bias_act_grad_f32(const float* grad_out, const float* x,
                             const float* bias, float* grad_in,
                             int64_t n_rows, int64_t C,
                             float negative_slope, float scale) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const float* gp = grad_out + r * C;
    const float* xp = x + r * C;
    float* gi = grad_in + r * C;
    for (int64_t c = 0; c < C; ++c) {
      float v = xp[c] + (bias ? bias[c] : 0.0f);
      gi[c] = gp[c] * scale * (v >= 0.0f ? 1.0f : negative_slope);
    }
  }
}

}  // extern "C"
