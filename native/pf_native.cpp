// Native IO/runtime library for panoptic_forecasting_tpu.
//
// Reference capability: the reference leans on native code in its deps for
// the data path — OpenCV (resize/IO), PIL's C PNG codec, HDF5 (SURVEY
// §2.13). This library is the TPU-framework equivalent for the host-side
// data plane: libpng-backed image IO with a std::thread batch reader, LUT
// relabeling, and the Cityscapes depth/disparity PNG codecs, exposed over
// a plain C ABI consumed via ctypes (panoptic_forecasting_tpu/native).
//
// All functions return 0 on success, negative error codes otherwise; they
// never throw across the ABI boundary.

#include <png.h>
#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG IO
// ---------------------------------------------------------------------------

// Query image geometry. channels: 1 (gray), 2 (gray+alpha), 3 (rgb),
// 4 (rgba); bit_depth: 8 or 16 after palette expansion.
int pf_png_probe(const char* path, int32_t* height, int32_t* width,
                 int32_t* channels, int32_t* bit_depth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return -2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_set_expand(png);  // palette -> rgb, gray<8 -> 8
  png_read_update_info(png, info);
  *height = static_cast<int32_t>(png_get_image_height(png, info));
  *width = static_cast<int32_t>(png_get_image_width(png, info));
  *channels = static_cast<int32_t>(png_get_channels(png, info));
  *bit_depth = static_cast<int32_t>(png_get_bit_depth(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// Decode into caller-allocated buffer of h*w*c elements (uint8 or uint16
// native-endian according to bit_depth from pf_png_probe).
int pf_png_read(const char* path, uint8_t* out, int32_t height, int32_t width,
                int32_t channels, int32_t bit_depth) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  png_set_expand(png);
  if (png_get_bit_depth(png, info) == 16) png_set_swap(png);  // LE host
  png_read_update_info(png, info);
  if (static_cast<int32_t>(png_get_image_height(png, info)) != height ||
      static_cast<int32_t>(png_get_image_width(png, info)) != width ||
      static_cast<int32_t>(png_get_channels(png, info)) != channels ||
      static_cast<int32_t>(png_get_bit_depth(png, info)) != bit_depth) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return -4;
  }
  const size_t stride =
      static_cast<size_t>(width) * channels * (bit_depth / 8);
  std::vector<png_bytep> rows(height);
  for (int32_t y = 0; y < height; ++y) rows[y] = out + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return 0;
}

// filters: libpng PNG_FILTER_* mask (e.g. 0x08 = NONE-only, cheap and
// near-optimal for flat id/label maps), or -1 for libpng's default
// adaptive per-row selection (best for photographic content).
int pf_png_write(const char* path, const uint8_t* data, int32_t height,
                 int32_t width, int32_t channels, int32_t bit_depth,
                 int32_t compress_level, int32_t filters) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                            nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return -3;
  }
  int color;
  switch (channels) {
    case 1: color = PNG_COLOR_TYPE_GRAY; break;
    case 2: color = PNG_COLOR_TYPE_GRAY_ALPHA; break;
    case 3: color = PNG_COLOR_TYPE_RGB; break;
    case 4: color = PNG_COLOR_TYPE_RGBA; break;
    default:
      png_destroy_write_struct(&png, &info);
      fclose(fp);
      return -5;
  }
  png_init_io(png, fp);
  png_set_compression_level(png, compress_level);
  if (filters >= 0) png_set_filter(png, PNG_FILTER_TYPE_BASE, filters);
  png_set_IHDR(png, info, width, height, bit_depth, color,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  if (bit_depth == 16) png_set_swap(png);
  const size_t stride =
      static_cast<size_t>(width) * channels * (bit_depth / 8);
  std::vector<png_bytep> rows(height);
  for (int32_t y = 0; y < height; ++y)
    rows[y] = const_cast<uint8_t*>(data) + y * stride;
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

// Batch read with a thread pool: n images of identical geometry into one
// contiguous buffer. Returns 0 if every file decoded, else the first
// nonzero error code.
int pf_png_read_batch(const char** paths, int32_t n, uint8_t* out,
                      int32_t height, int32_t width, int32_t channels,
                      int32_t bit_depth, int32_t num_threads) {
  const size_t image_bytes = static_cast<size_t>(height) * width * channels *
                             (bit_depth / 8);
  std::atomic<int32_t> next(0);
  std::atomic<int> err(0);
  auto worker = [&]() {
    while (true) {
      const int32_t i = next.fetch_add(1);
      if (i >= n) return;
      const int rc =
          pf_png_read(paths[i], out + static_cast<size_t>(i) * image_bytes,
                      height, width, channels, bit_depth);
      if (rc != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };
  if (num_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < num_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return err.load();
}

// ---------------------------------------------------------------------------
// Host-side pixel transforms (the reference's OpenCV/PIL fast paths)
// ---------------------------------------------------------------------------

// In-place 256-entry LUT relabel over uint8 ids (trainId<->labelId maps).
int pf_lut_u8(uint8_t* data, int64_t n, const uint8_t* lut) {
  for (int64_t i = 0; i < n; ++i) data[i] = lut[data[i]];
  return 0;
}

// Cityscapes depth PNG codec: p = (depth + 1) * 256, 0 = invalid
// (bg_dataset.py:224-228 decode; export *:111-127 encode).
int pf_decode_depth_png_u16(const uint16_t* png, int64_t n, float* depth,
                            uint8_t* valid) {
  for (int64_t i = 0; i < n; ++i) {
    const uint16_t p = png[i];
    valid[i] = p > 0;
    depth[i] = p > 0 ? (static_cast<float>(p) / 256.0f - 1.0f) : -1.0f;
  }
  return 0;
}

// Cityscapes disparity PNG codec: d = (p - 1) / 256, p = 0 invalid;
// depth = baseline * fx / d  (data_utils missing-fn re-derivation,
// SURVEY §2.10 / export_cityscapes_segmentation_results.py:112-118).
int pf_disparity_to_depth_u16(const uint16_t* png, int64_t n, float baseline_fx,
                              float* depth, uint8_t* valid) {
  for (int64_t i = 0; i < n; ++i) {
    const uint16_t p = png[i];
    const float disp = (static_cast<float>(p) - 1.0f) / 256.0f;
    const bool ok = p > 0 && disp > 0.0f;
    valid[i] = ok;
    depth[i] = ok ? baseline_fx / disp : -1.0f;
  }
  return 0;
}

// Nearest-neighbor resize for label maps (uint8), the NEAREST path of
// transforms.py Resize/RandomSizeAndCropMasks.
int pf_resize_nearest_u8(const uint8_t* src, int32_t sh, int32_t sw,
                         uint8_t* dst, int32_t dh, int32_t dw) {
  for (int32_t y = 0; y < dh; ++y) {
    // PIL NEAREST: src index = floor((y + 0.5) * sh / dh)
    int32_t sy = static_cast<int32_t>((y + 0.5f) * sh / dh);
    if (sy >= sh) sy = sh - 1;
    const uint8_t* srow = src + static_cast<size_t>(sy) * sw;
    uint8_t* drow = dst + static_cast<size_t>(y) * dw;
    for (int32_t x = 0; x < dw; ++x) {
      int32_t sx = static_cast<int32_t>((x + 0.5f) * sw / dw);
      if (sx >= sw) sx = sw - 1;
      drow[x] = srow[sx];
    }
  }
  return 0;
}

int pf_version() { return 1; }

}  // extern "C"
