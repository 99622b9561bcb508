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
#include <csetjmp>
#include <cstddef>
#include <cstdio>
#include <cstring>
#include <vector>

// jpeglib.h uses bare size_t/FILE and must come after the std headers
#include <jpeglib.h>

namespace {

// In-memory source for png_set_read_fn (serving ingest: the request body
// is already in RAM; no temp file, no extra copy).
struct MemReader {
  const unsigned char* data;
  size_t len;
  size_t pos;
};

void MemRead(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) png_error(png, "png: read past end of buffer");
  memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

// Post-io-setup decode body shared by the file and memory entry points:
// normalize any 8/16-bit gray/palette/RGB/RGBA PNG into 8-bit RGB rows.
// Must run inside the caller's setjmp(png_jmpbuf(...)) scope.
void DecodeRows(png_structp png, png_infop info,
                std::vector<unsigned char>* rgb, int* height, int* width) {
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

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
}

// Decode a PNG file into 8-bit RGB rows.
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
  DecodeRows(png, info, rgb, height, width);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// Decode an in-memory PNG (serving request body) into 8-bit RGB rows.
bool DecodePngMem(const unsigned char* data, size_t len,
                  std::vector<unsigned char>* rgb, int* height, int* width) {
  if (len < 8 || png_sig_cmp(data, 0, 8) != 0) return false;

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }

  MemReader reader{data, len, 0};
  png_set_read_fn(png, &reader, MemRead);
  DecodeRows(png, info, rgb, height, width);
  png_destroy_read_struct(&png, &info, nullptr);
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

// libjpeg error handling: the default handler exit()s the process; route
// decode errors through setjmp so bad request bytes return false instead
// of killing the serving daemon.
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void JpegErrExit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

// Decode an in-memory JPEG (serving request body) into 8-bit RGB rows.
bool DecodeJpegMem(const unsigned char* data, size_t len,
                   std::vector<unsigned char>* rgb, int* height, int* width) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrExit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr/CMYK all normalize to RGB
  jpeg_start_decompress(&cinfo);
  *height = static_cast<int>(cinfo.output_height);
  *width = static_cast<int>(cinfo.output_width);
  rgb->resize(static_cast<size_t>(*height) * *width * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

inline bool LooksLikeJpeg(const unsigned char* data, size_t len) {
  return len >= 2 && data[0] == 0xFF && data[1] == 0xD8;
}

// Bilinear resize straight to uint8 (same cv2.INTER_LINEAR-compatible
// sampling as ResizeWhiten). Clamp-then-truncate matches the numpy serving
// path (np.clip(img, 0, 255).astype(np.uint8)); identity sizes reproduce
// the source bytes exactly (fx = fy = 0).
void ResizeU8(const unsigned char* src, int sh, int sw, unsigned char* dst,
              int dh, int dw) {
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
    unsigned char* out = dst + static_cast<size_t>(y) * dw * 3;

    for (int x = 0; x < dw; ++x) {
      const int a = x0[x] * 3, b = x1[x] * 3;
      const float wx = fx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = row0[a + c] + wx * (row0[b + c] - row0[a + c]);
        const float bot = row1[a + c] + wx * (row1[b + c] - row1[a + c]);
        const float v = top + fy * (bot - top);
        out[x * 3 + c] = static_cast<unsigned char>(
            std::max(0.0f, std::min(255.0f, v)));
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

// In-memory PNG header probe: (height, width) without full decode.
// 0 on success.
int sqdt_png_size_mem(const unsigned char* data, size_t len, int* height,
                      int* width) {
  if (len < 8 || png_sig_cmp(data, 0, 8) != 0) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  MemReader reader{data, len, 0};
  png_set_read_fn(png, &reader, MemRead);
  png_read_info(png, info);
  *height = static_cast<int>(png_get_image_height(png, info));
  *width = static_cast<int>(png_get_image_width(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Serving compressed-ingest hot path: decode an in-memory PNG or JPEG
// (sniffed from the magic bytes) + bilinear resize to (out_h, out_w),
// writing uint8 RGB HWC into the caller buffer (feeds the uint8 device
// dispatch with folded whitening). Writes the source (h, w) into
// orig_hw[2]. One C call per request, fully off the GIL. 0 on success,
// 1 on decode failure / unrecognized format.
int sqdt_decode_resize_u8_mem(const unsigned char* data, size_t len,
                              unsigned char* out, int out_h, int out_w,
                              int* orig_hw) {
  std::vector<unsigned char> rgb;
  int h, w;
  bool ok = LooksLikeJpeg(data, len)
                ? DecodeJpegMem(data, len, &rgb, &h, &w)
                : DecodePngMem(data, len, &rgb, &h, &w);
  if (!ok) return 1;
  orig_hw[0] = h;
  orig_hw[1] = w;
  ResizeU8(rgb.data(), h, w, out, out_h, out_w);
  return 0;
}

}  // extern "C"
