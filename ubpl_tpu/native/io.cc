// libubpl_io — native host-side image pipeline for ubpl_tpu.
//
// Replaces the reference's per-sample cv2 decode/resize host loop
// (utils/process.py image_load/image_resize) with a threaded C++ batch
// decoder: PNG/JPEG -> RGB8 -> bilinear resize into a caller-provided
// contiguous [N, res, res, 3] buffer.  Exposed via a C ABI for ctypes
// (ubpl_tpu/native/io_lib.py).
//
// Build: ubpl_tpu/native/build.sh  (g++ -O3 -shared, links png/jpeg/z)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <png.h>
#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

int ubpl_png_size(const char* path, int* w, int* h) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  *w = static_cast<int>(png_get_image_width(png, info));
  *h = static_cast<int>(png_get_image_height(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode a PNG into a caller buffer of exactly w*h*3 (RGB8).
int ubpl_decode_png_rgb(const char* path, unsigned char* out, int w, int h) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  unsigned char header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return 2;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 3;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  if (static_cast<int>(png_get_image_width(png, info)) != w ||
      static_cast<int>(png_get_image_height(png, info)) != h) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 4;
  }
  // normalize every layout to 8-bit RGB
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = out + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

int ubpl_jpeg_size(const char* path, int* w, int* h) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return 2;
  }
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

static int decode_jpeg_rgb(const char* path, std::vector<unsigned char>& buf,
                           int* w, int* h) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  buf.resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = buf.data() +
        static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return 0;
}

static int decode_png_rgb_alloc(const char* path,
                                std::vector<unsigned char>& buf, int* w,
                                int* h) {
  if (ubpl_png_size(path, w, h) != 0) return 1;
  buf.resize(static_cast<size_t>(*w) * *h * 3);
  return ubpl_decode_png_rgb(path, buf.data(), *w, *h);
}

// ---------------------------------------------------------------------------
// Bilinear resize (matches cv2.INTER_LINEAR pixel-center alignment)
// ---------------------------------------------------------------------------

static void resize_bilinear_rgb(const unsigned char* src, int sw, int sh,
                                unsigned char* dst, int dw, int dh) {
  const float sx_ratio = static_cast<float>(sw) / dw;
  const float sy_ratio = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * sy_ratio - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = sy - y0;
    for (int x = 0; x < dw; ++x) {
      float sx = (x + 0.5f) * sx_ratio - 0.5f;
      if (sx < 0) sx = 0;
      int x0 = static_cast<int>(sx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = sx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<unsigned char>(v + 0.5f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Threaded batch decode + resize
// ---------------------------------------------------------------------------

static bool has_png_magic(const char* path) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  unsigned char magic[8] = {0};
  size_t n = fread(magic, 1, 8, fp);
  fclose(fp);
  return n == 8 && png_sig_cmp(magic, 0, 8) == 0;
}

// Decode n images into out[N, res, res, 3] (RGB8).  Returns #failures.
int ubpl_decode_resize_batch(const char** paths, int n, unsigned char* out,
                             int res, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t frame = static_cast<size_t>(res) * res * 3;

  auto worker = [&]() {
    std::vector<unsigned char> buf;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      int rc = has_png_magic(paths[i])
                   ? decode_png_rgb_alloc(paths[i], buf, &w, &h)
                   : decode_jpeg_rgb(paths[i], buf, &w, &h);
      if (rc != 0) {
        failures.fetch_add(1);
        memset(out + frame * i, 0, frame);
        continue;
      }
      if (w == res && h == res) {
        memcpy(out + frame * i, buf.data(), frame);
      } else {
        resize_bilinear_rgb(buf.data(), w, h, out + frame * i, res, res);
      }
    }
  };

  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

int ubpl_image_size(const char* path, int* w, int* h) {
  return has_png_magic(path) ? ubpl_png_size(path, w, h)
                             : ubpl_jpeg_size(path, w, h);
}

}  // extern "C"
