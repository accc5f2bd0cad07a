// Native host-side data-pipeline kernels (C++), the TPU-framework
// equivalent of the reference's native loader path (torch DataLoader's
// C++ workers + torchvision/cv2 conversions; reference
// lib/datasets/make_dataset.py:77-104, lib/networks/enerf/utils.py:605).
//
// The host feeding a TPU chip in this environment has ONE core, so every
// avoidable pass over an image matters. numpy expressions like
// ((img / 255.) * 2 - 1).astype(f32) walk the image 3-4 times and
// allocate float64 temporaries; each kernel here is one fused pass with
// no temporaries. Exposed to Python via ctypes (enerf_tpu/native/__init__.py)
// with a numpy fallback when no compiler is available.
//
// Build: g++ -O3 -shared -fPIC host_ops.cc -o libhost_ops.so

#include <cstdint>
#include <cstddef>
#include <cmath>

extern "C" {

// u8 image -> float32 in [0, 1]; one pass (imageio u8 -> model input).
void u8_to_unit_f32(const uint8_t* src, float* dst, size_t n) {
  constexpr float k = 1.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) dst[i] = src[i] * k;
}

// u8 image -> float32 in [-1, 1]; fused (x/255)*2-1 (the reference's
// src-image preprocessing, lib/datasets/dtu/enerf.py "img*2-1").
void u8_to_pm1_f32(const uint8_t* src, float* dst, size_t n) {
  constexpr float k = 2.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) dst[i] = src[i] * k - 1.0f;
}

// u8 HxWx3 image + u8 HxW mask -> [-1, 1] float32 with masked pixels
// zeroed in ONE pass (zjumocap's img[mask==0]=0 then normalize;
// reference lib/datasets/zjumocap/enerf.py:152).
void u8_to_pm1_masked_f32(const uint8_t* src, const uint8_t* mask,
                          float* dst, size_t h, size_t w, size_t c) {
  constexpr float k = 2.0f / 255.0f;
  for (size_t p = 0; p < h * w; ++p) {
    const uint8_t m = mask[p];
    for (size_t ch = 0; ch < c; ++ch) {
      const size_t i = p * c + ch;
      dst[i] = m ? (src[i] * k - 1.0f) : -1.0f;  // zeroed-u8 then normalized
    }
  }
}

// float32 [0,1] RGB -> u8 with clamp, one pass (GUI texture blit /
// visualizer mp4 frames). Truncating, not rounding — matches the
// reference's (img*255).astype(uint8) / .byte() exactly
// (lib/visualizers/enerf.py, gui_human.py:90-103).
void f32_unit_to_u8(const float* src, uint8_t* dst, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    float v = src[i];
    v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
    dst[i] = static_cast<uint8_t>(v * 255.0f);
  }
}

// u8 HxWx4 RGBA -> f32 HxWx3 alpha-composited onto white in [0,1]
// (NeRF-synthetic images; reference lib/datasets/nerf/enerf.py:127
// img[...,:3]*img[...,-1:] + (1-img[...,-1:])), one fused pass.
void u8_rgba_over_white_f32(const uint8_t* src, float* dst, size_t npix) {
  constexpr float k = 1.0f / 255.0f;
  for (size_t p = 0; p < npix; ++p) {
    const uint8_t* s = src + p * 4;
    float* d = dst + p * 3;
    const float a = s[3] * k;
    const float bg = 1.0f - a;
    d[0] = s[0] * k * a + bg;
    d[1] = s[1] * k * a + bg;
    d[2] = s[2] * k * a + bg;
  }
}

// Fused y = x*scale + offset over f32 (e.g. [0,255] float image ->
// [-1,1]: scale=2/255, offset=-1), one pass, no temporaries.
void f32_scale_offset(const float* src, float* dst, size_t n,
                      float scale, float offset) {
  for (size_t i = 0; i < n; ++i) dst[i] = src[i] * scale + offset;
}

// Copy one f32 sample into row `row` of a preallocated batch buffer
// (collation without np.stack's temporary list walk).
void collate_f32(const float* sample, float* batch, size_t row, size_t n) {
  float* out = batch + row * n;
  for (size_t i = 0; i < n; ++i) out[i] = sample[i];
}

// PFM payload (already frombuffer'd f32, bottom-up scanlines) -> top-down
// with optional 0.5x nearest downsample fused in (the DTU depth path:
// read_pfm + cv2.resize INTER_NEAREST fx=fy=0.5; reference
// lib/datasets/dtu/enerf.py:90-92). scale must be 1 or 2.
void pfm_flip_downsample_f32(const float* src, float* dst,
                             size_t h, size_t w, size_t scale) {
  const size_t oh = h / scale, ow = w / scale;
  for (size_t y = 0; y < oh; ++y) {
    // source row y*scale counted from the BOTTOM (pfm is bottom-up)
    const float* srow = src + (h - 1 - y * scale) * w;
    float* drow = dst + y * ow;
    for (size_t x = 0; x < ow; ++x) drow[x] = srow[x * scale];
  }
}

}  // extern "C"
