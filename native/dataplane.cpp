// Native host data plane for dynamo-tpu.
//
// The reference delegates its input pipeline to torch's C++ DataLoader
// workers (SURVEY §2.5); this library is our native equivalent: JPEG/PNG
// decode + antialiased bicubic resize + horizontal flip + float conversion
// in one pass, multithreaded and GIL-free, exposed through a minimal C API
// consumed via ctypes (dynamo_depth_tpu/data/native.py).
//
// The resize implements the same convolution-based resampling PIL uses
// (cubic kernel a = -0.5, kernel support scaled by the downscale ratio), so
// outputs match the PIL fallback path closely.
//
// Build: native/build.sh  (g++ -O3 -shared, links libjpeg + libpng)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <atomic>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, RGB
};

// ---------------------------------------------------------------- decoding

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);

  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  // normalize to 8-bit RGB
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);

  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool decode_image(const char* path, Image* out) {
  size_t n = strlen(path);
  if (n >= 4 && (strcmp(path + n - 4, ".png") == 0 || strcmp(path + n - 4, ".PNG") == 0))
    return decode_png(path, out);
  return decode_jpeg(path, out);
}

// ---------------------------------------------------------------- resizing

// PIL-style cubic kernel (a = -0.5).
inline double cubic_kernel(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct FilterTable {
  int ksize;                 // taps per output pixel
  std::vector<int> bounds;   // (start, size) pairs
  std::vector<float> coef;   // ksize per output pixel, normalized
};

// Precompute contributions for one axis (PIL "support scaled by ratio"
// antialiased resampling).
FilterTable build_filter(int in_size, int out_size) {
  FilterTable ft;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 2.0 * filterscale;  // cubic support = 2
  ft.ksize = int(std::ceil(support)) * 2 + 1;
  ft.bounds.resize(out_size * 2);
  ft.coef.resize(size_t(out_size) * ft.ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;

    float* k = &ft.coef[size_t(xx) * ft.ksize];
    double ww = 0.0;
    std::vector<double> tmp(xmax);
    for (int x = 0; x < xmax; ++x) {
      tmp[x] = cubic_kernel((x + xmin - center + 0.5) / filterscale);
      ww += tmp[x];
    }
    for (int x = 0; x < xmax; ++x) k[x] = float(ww != 0.0 ? tmp[x] / ww : tmp[x]);
    ft.bounds[xx * 2] = xmin;
    ft.bounds[xx * 2 + 1] = xmax;
  }
  return ft;
}

// Separable resize HWC uint8 -> float32 [0, 1], optional horizontal flip of
// the *source* (flip-then-resize, matching the python pipeline's PIL order;
// the flip is folded into the horizontal filter table so the inner loops
// stay branch-free and vectorizable).
void resize_to_float(const Image& img, int out_h, int out_w, bool flip, float* out) {
  const int in_h = img.h, in_w = img.w;

  FilterTable fw = build_filter(in_w, out_w);
  if (flip) {
    // mirror each tap window: source column (xmin + i) becomes
    // (in_w - 1 - xmin - i); store the mirrored start and reverse coeffs.
    for (int x = 0; x < out_w; ++x) {
      int xmin = fw.bounds[x * 2], xmax = fw.bounds[x * 2 + 1];
      fw.bounds[x * 2] = in_w - xmin - xmax;  // new start (window reversed)
      float* k = &fw.coef[size_t(x) * fw.ksize];
      for (int i = 0; i < xmax / 2; ++i) std::swap(k[i], k[xmax - 1 - i]);
    }
  }

  // horizontal pass -> (in_h, out_w, 3); PIL keeps an 8-bit intermediate
  // image between the two passes, so round+clamp here for parity.
  std::vector<uint8_t> tmp(size_t(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* srow = img.data.data() + size_t(y) * in_w * 3;
    uint8_t* drow = &tmp[size_t(y) * out_w * 3];
    for (int x = 0; x < out_w; ++x) {
      const int xmin = fw.bounds[x * 2], xmax = fw.bounds[x * 2 + 1];
      const float* k = &fw.coef[size_t(x) * fw.ksize];
      const uint8_t* p = srow + size_t(xmin) * 3;
      float a0 = 0.5f, a1 = 0.5f, a2 = 0.5f;  // +0.5 for round-to-nearest
      for (int i = 0; i < xmax; ++i) {
        a0 += k[i] * p[3 * i + 0];
        a1 += k[i] * p[3 * i + 1];
        a2 += k[i] * p[3 * i + 2];
      }
      int v0 = int(a0), v1 = int(a1), v2 = int(a2);
      drow[x * 3 + 0] = uint8_t(v0 < 0 ? 0 : (v0 > 255 ? 255 : v0));
      drow[x * 3 + 1] = uint8_t(v1 < 0 ? 0 : (v1 > 255 ? 255 : v1));
      drow[x * 3 + 2] = uint8_t(v2 < 0 ? 0 : (v2 > 255 ? 255 : v2));
    }
  }

  // vertical pass -> (out_h, out_w, 3) float with clamp + /255; row-major
  // accumulation over contiguous rows vectorizes cleanly.
  FilterTable fh = build_filter(in_h, out_h);
  const int row_len = out_w * 3;
  std::vector<float> acc(row_len);
  for (int y = 0; y < out_h; ++y) {
    const int ymin = fh.bounds[y * 2], ymax = fh.bounds[y * 2 + 1];
    const float* k = &fh.coef[size_t(y) * fh.ksize];
    std::fill(acc.begin(), acc.end(), 0.5f);
    for (int i = 0; i < ymax; ++i) {
      const uint8_t* row = &tmp[size_t(ymin + i) * row_len];
      const float ki = k[i];
      for (int x = 0; x < row_len; ++x) acc[x] += ki * row[x];
    }
    float* drow = out + size_t(y) * row_len;
    for (int x = 0; x < row_len; ++x) {
      int v = int(acc[x]);
      drow[x] = float(v < 0 ? 0 : (v > 255 ? 255 : v)) * (1.0f / 255.0f);
    }
  }
}

}  // namespace

extern "C" {

// Decode + resize + flip + normalize a batch of images into a preallocated
// float32 buffer of shape (n, out_h, out_w, 3).
// paths: array of n C strings; flips: n bytes (0/1); n_threads <= 0 uses
// hardware_concurrency. Returns the number of images that FAILED.
int ddt_decode_resize_batch(const char** paths, int n, int out_h, int out_w,
                            const uint8_t* flips, float* out, int n_threads) {
  if (n_threads <= 0) {
    n_threads = int(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n) n_threads = n;

  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      Image img;
      if (!decode_image(paths[i], &img)) {
        failures.fetch_add(1);
        continue;
      }
      resize_to_float(img, out_h, out_w, flips && flips[i],
                      out + size_t(i) * out_h * out_w * 3);
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

// Probe: returns the ABI version.
int ddt_version() { return 1; }

}  // extern "C"
