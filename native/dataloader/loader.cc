// SqueezeDet-TPU native image loader.
//
// PNG decode (sqdt_read_png) plus an optional fused decode -> float32 RGB
// -> bilinear resize -> whiten pass (sqdt_load_resize_whiten), exposed as
// a C ABI for ctypes; native code runs off the GIL so host loader threads
// genuinely overlap. The production pipeline uses sqdt_read_png through
// data/imageio.py (decode is the host bottleneck; resize/whiten stay in
// the numpy recipe for bit-parity with the reference order,
// src/utils/image.py:9-19,77-88). The fused entry point is kept for
// serving-style pipelines that don't need that parity; parity-tested in
// tests/test_native_loader.py.
//
// Build: make -C native/dataloader   ->  libsqdt_loader.so

#include <png.h>

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

// Decode any 8/16-bit gray/palette/RGB/RGBA PNG into 8-bit RGB rows.
bool DecodePng(const char* path, std::vector<unsigned char>* rgb, int* height,
               int* width) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }

  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // normalize to 8-bit RGB
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  *height = static_cast<int>(h);
  *width = static_cast<int>(w);
  rgb->resize(static_cast<size_t>(h) * w * 3);

  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = rgb->data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// cv2.INTER_LINEAR-compatible bilinear sampling positions:
// src = (dst + 0.5) * scale - 0.5, clamped edges.
void ResizeWhiten(const unsigned char* src, int sh, int sw, float* dst,
                  int dh, int dw, const float* mean, const float* inv_std) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;

  std::vector<int> x0(dw), x1(dw);
  std::vector<float> fx(dw);
  for (int x = 0; x < dw; ++x) {
    double pos = (x + 0.5) * sx - 0.5;
    pos = std::max(0.0, std::min(pos, static_cast<double>(sw - 1)));
    x0[x] = static_cast<int>(pos);
    x1[x] = std::min(x0[x] + 1, sw - 1);
    fx[x] = static_cast<float>(pos - x0[x]);
  }

  for (int y = 0; y < dh; ++y) {
    double pos = (y + 0.5) * sy - 0.5;
    pos = std::max(0.0, std::min(pos, static_cast<double>(sh - 1)));
    const int y0 = static_cast<int>(pos);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float fy = static_cast<float>(pos - y0);

    const unsigned char* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const unsigned char* row1 = src + static_cast<size_t>(y1) * sw * 3;
    float* out = dst + static_cast<size_t>(y) * dw * 3;

    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float wx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = row0[a + c] + wx * (row0[b + c] - row0[a + c]);
        const float bot = row1[a + c] + wx * (row1[b + c] - row1[a + c]);
        const float v = top + fy * (bot - top);
        out[x * 3 + c] = (v - mean[c]) * inv_std[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Return the (height, width) of a PNG without full decode. 0 on success.
int sqdt_png_size(const char* path, int* height, int* width) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *height = static_cast<int>(png_get_image_height(png, info));
  *width = static_cast<int>(png_get_image_width(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode to float32 RGB HWC into caller buffer of h*w*3 floats
// (dimensions must come from sqdt_png_size). 0 on success.
int sqdt_read_png(const char* path, float* out, int expect_h, int expect_w) {
  std::vector<unsigned char> rgb;
  int h, w;
  if (!DecodePng(path, &rgb, &h, &w)) return 1;
  if (h != expect_h || w != expect_w) return 2;
  const size_t n = rgb.size();
  for (size_t i = 0; i < n; ++i) out[i] = static_cast<float>(rgb[i]);
  return 0;
}

// Fused decode + bilinear resize to (out_h, out_w) + whiten.
// mean/std are 3 floats (RGB). Writes orig (h, w) into orig_hw[2].
// 0 on success.
int sqdt_load_resize_whiten(const char* path, float* out, int out_h,
                            int out_w, const float* mean, const float* std,
                            int* orig_hw) {
  std::vector<unsigned char> rgb;
  int h, w;
  if (!DecodePng(path, &rgb, &h, &w)) return 1;
  orig_hw[0] = h;
  orig_hw[1] = w;
  const float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  ResizeWhiten(rgb.data(), h, w, out, out_h, out_w, mean, inv_std);
  return 0;
}

}  // extern "C"
