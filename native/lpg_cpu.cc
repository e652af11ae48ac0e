// Native CPU kernel for Local Planar Guidance, exposed to JAX via the XLA
// FFI. This is the parity equivalent of the reference's C++ CPU op
// (tensorflow/custom_layer/local_planar_guidance.cc:74-115 forward,
// :241-298 backward) — re-derived from the op's math, not transcribed:
// forward writes each output pixel once (cache-friendly row-major sweep,
// hoisting the per-cell plane fetch out of the r-wide inner run), and the
// backward accumulates each input cell's r x r cotangent tile.
//
// Unlike the reference backward (which drops the n4 factor,
// local_planar_guidance.cc:291-293), the gradient here is the analytically
// correct d(n4/den)/dn_i — matching the JAX custom VJP in bts_tpu/ops/lpg.py.
//
// Build: see native/Makefile. Registered as "bts_lpg_fwd" / "bts_lpg_bwd"
// on the "cpu" platform via bts_tpu/ops/lpg_ffi.py.

#include <cstdint>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

// plane_eq: (B, H, W, 4) f32; out: (B, H*r, W*r) f32.
ffi::Error LpgForwardImpl(ffi::Buffer<ffi::F32> plane_eq,
                          ffi::ResultBuffer<ffi::F32> out,
                          std::int64_t upratio) {
  auto dims = plane_eq.dimensions();
  const std::int64_t b = dims[0], h = dims[1], w = dims[2];
  const std::int64_t r = upratio;
  const std::int64_t wr = w * r;
  const float* pe = plane_eq.typed_data();
  float* o = out->typed_data();

  for (std::int64_t bi = 0; bi < b; ++bi) {
    const float* pe_img = pe + bi * h * w * 4;
    float* o_img = o + bi * h * r * wr;
    for (std::int64_t y = 0; y < h * r; ++y) {
      const float* pe_row = pe_img + (y / r) * w * 4;
      const float v =
          (static_cast<float>(y % r) - (r - 1) * 0.5f) / static_cast<float>(r);
      float* o_row = o_img + y * wr;
      for (std::int64_t xc = 0; xc < w; ++xc) {
        const float n1 = pe_row[xc * 4 + 0];
        const float n2 = pe_row[xc * 4 + 1];
        const float n3 = pe_row[xc * 4 + 2];
        const float n4 = pe_row[xc * 4 + 3];
        const float base = n2 * v + n3;
        float* o_run = o_row + xc * r;
        for (std::int64_t dx = 0; dx < r; ++dx) {
          const float u = (static_cast<float>(dx) - (r - 1) * 0.5f) /
                          static_cast<float>(r);
          o_run[dx] = n4 / (n1 * u + base);
        }
      }
    }
  }
  return ffi::Error::Success();
}

// g: (B, H*r, W*r) f32 cotangent; plane_eq: (B, H, W, 4); grad: (B, H, W, 4).
ffi::Error LpgBackwardImpl(ffi::Buffer<ffi::F32> g,
                           ffi::Buffer<ffi::F32> plane_eq,
                           ffi::ResultBuffer<ffi::F32> grad,
                           std::int64_t upratio) {
  auto dims = plane_eq.dimensions();
  const std::int64_t b = dims[0], h = dims[1], w = dims[2];
  const std::int64_t r = upratio;
  const std::int64_t wr = w * r;
  const float* gd = g.typed_data();
  const float* pe = plane_eq.typed_data();
  float* gr = grad->typed_data();

  for (std::int64_t bi = 0; bi < b; ++bi) {
    for (std::int64_t yc = 0; yc < h; ++yc) {
      for (std::int64_t xc = 0; xc < w; ++xc) {
        const std::int64_t cell = ((bi * h + yc) * w + xc) * 4;
        const float n1 = pe[cell + 0];
        const float n2 = pe[cell + 1];
        const float n3 = pe[cell + 2];
        const float n4 = pe[cell + 3];
        float d1 = 0.f, d2 = 0.f, d3 = 0.f, d4 = 0.f;
        for (std::int64_t dy = 0; dy < r; ++dy) {
          const float v = (static_cast<float>(dy) - (r - 1) * 0.5f) /
                          static_cast<float>(r);
          const float* g_row =
              gd + (bi * h * r + yc * r + dy) * wr + xc * r;
          for (std::int64_t dx = 0; dx < r; ++dx) {
            const float u = (static_cast<float>(dx) - (r - 1) * 0.5f) /
                            static_cast<float>(r);
            const float den = n1 * u + n2 * v + n3;
            const float inv = 1.0f / den;
            const float common = g_row[dx] * n4 * inv * inv;
            d1 -= common * u;
            d2 -= common * v;
            d3 -= common;
            d4 += g_row[dx] * inv;
          }
        }
        gr[cell + 0] = d1;
        gr[cell + 1] = d2;
        gr[cell + 2] = d3;
        gr[cell + 3] = d4;
      }
    }
  }
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    BtsLpgForward, LpgForwardImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>()
        .Attr<std::int64_t>("upratio"));

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    BtsLpgBackward, LpgBackwardImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Arg<ffi::Buffer<ffi::F32>>()
        .Ret<ffi::Buffer<ffi::F32>>()
        .Attr<std::int64_t>("upratio"));
