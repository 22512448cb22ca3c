// flyp_tpu native host data plane: image decode + CLIP transforms.
//
// The reference framework decodes with PIL inside torch DataLoader worker
// processes (/root/reference/src/datasets/laion.py:123-133).  The JAX host
// pipeline uses threads instead of processes; Python-level PIL decode holds
// the GIL, so on multi-core TPU hosts the thread pool serializes.  This
// library provides the GIL-free path: ctypes releases the GIL for the whole
// decode+transform call, so the existing thread pool scales with cores.
//
// Semantics mirror the Python transforms (flyp_tpu/data/transforms.py),
// which themselves mirror /root/reference/clip/clip.py:66-82:
//   * bicubic (a = -0.5) separable resampling with Pillow's coefficient
//     construction: antialias scaling of the filter when downsampling,
//     center-aligned sampling, source window clamped to the IMAGE bounds
//     (so a box-resize reads past the box edge, exactly like PIL
//     Image.resize(..., box=...)).
//   * train: crop box -> resize to (n_px, n_px) -> CLIP normalize
//   * eval: resize shortest side -> center crop -> CLIP normalize
//
// Build: g++ -O3 -shared -fPIC flyp_native.cc -ljpeg -lpng -o libflyp_native.so

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- JPEG ----

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool is_jpeg(const uint8_t* data, size_t len) {
  return len >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF;
}

int jpeg_info(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int jpeg_decode(const uint8_t* data, size_t len, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ----------------------------------------------------------------- PNG ----

bool is_png(const uint8_t* data, size_t len) {
  return len >= 8 && png_sig_cmp(data, 0, 8) == 0;
}

struct PngReader {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReader* r = static_cast<PngReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->len) {
    png_error(png, "read past end");
  }
  std::memcpy(out, r->data + r->pos, n);
  r->pos += n;
}

int png_decode_impl(const uint8_t* data, size_t len, int* w, int* h, uint8_t* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  PngReader reader{data, len, 0};
  png_set_read_fn(png, &reader, png_read_fn);
  png_read_info(png, info);

  png_uint_32 width, height;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &width, &height, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  if (out == nullptr) {  // info-only call
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }

  // Force 8-bit RGB (drop alpha onto black-free composite: PIL converts
  // RGBA->RGB by dropping alpha in `convert("RGB")`, i.e. ignores it).
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<png_bytep> rows(height);
  const size_t stride = static_cast<size_t>(width) * 3;
  for (png_uint_32 y = 0; y < height; ++y) rows[y] = out + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ------------------------------------------------------------- resample ----

// Pillow's bicubic kernel, a = -0.5, support 2.
inline double bicubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  std::vector<int> xmin;       // per output index: first source index
  std::vector<int> xsize;      // per output index: number of taps
  std::vector<double> weights; // ksize doubles per output index
  int ksize = 0;
};

// Pillow precompute_coeffs: box [in0, in1) mapped to out_size samples,
// source window clamped to [0, in_size).
Coeffs precompute(int in_size, double in0, double in1, int out_size) {
  Coeffs c;
  const double scale = (in1 - in0) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.xsize.resize(out_size);
  c.weights.assign(static_cast<size_t>(out_size) * c.ksize, 0.0);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = in0 + (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &c.weights[static_cast<size_t>(xx) * c.ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      const double w = bicubic((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    }
    c.xmin[xx] = xmin;
    c.xsize[xx] = xmax;
  }
  return c;
}

}  // namespace

extern "C" {

// Image header sniff: fills (*w, *h); returns 0 ok, -1 unsupported/corrupt.
int flyp_image_info(const uint8_t* data, size_t len, int* w, int* h) {
  if (is_jpeg(data, len)) return jpeg_info(data, len, w, h);
  if (is_png(data, len)) return png_decode_impl(data, len, w, h, nullptr);
  return -1;
}

// Decode to RGB8 HWC into caller-allocated out[h*w*3].
int flyp_decode_rgb(const uint8_t* data, size_t len, uint8_t* out) {
  if (is_jpeg(data, len)) return jpeg_decode(data, len, out);
  if (is_png(data, len)) {
    int w, h;
    return png_decode_impl(data, len, &w, &h, out);
  }
  return -1;
}

// Bicubic box-resize + optional center crop + CLIP normalize.
//
//   rgb:        source RGB8 HWC [h, w, 3]
//   bx0..by1:   source box (floats; filter window clamps to image bounds)
//   rs_w, rs_h: resize target
//   cx, cy, cs: post-resize crop (left, top, size); cs <= 0 -> whole resize
//   mean, stdv: per-channel normalization constants
//   out:        float32 HWC [cs|rs_h, cs|rs_w, 3]
int flyp_transform(const uint8_t* rgb, int h, int w,
                   double bx0, double by0, double bx1, double by1,
                   int rs_w, int rs_h,
                   int cx, int cy, int cs,
                   const float* mean, const float* stdv,
                   float* out) {
  if (rs_w <= 0 || rs_h <= 0 || w <= 0 || h <= 0) return -1;
  const Coeffs cw_ = precompute(w, bx0, bx1, rs_w);
  const Coeffs ch_ = precompute(h, by0, by1, rs_h);

  // Rows of the source actually referenced by the vertical pass.
  int ymin_used = h, ymax_used = 0;
  for (int yy = 0; yy < rs_h; ++yy) {
    ymin_used = std::min(ymin_used, ch_.xmin[yy]);
    ymax_used = std::max(ymax_used, ch_.xmin[yy] + ch_.xsize[yy]);
  }
  if (ymin_used >= ymax_used) return -1;
  const int used_h = ymax_used - ymin_used;

  // Horizontal pass on the used rows: [used_h, rs_w, 3].  Pillow's 8bpc
  // resample clips + rounds the intermediate image back to uint8 between
  // the two passes; mirror that, or overshoot handling diverges visibly.
  auto clamp8 = [](double v) -> uint8_t {
    v = v < 0.0 ? 0.0 : (v > 255.0 ? 255.0 : v);
    return static_cast<uint8_t>(std::floor(v + 0.5));
  };
  std::vector<uint8_t> tmp(static_cast<size_t>(used_h) * rs_w * 3);
  for (int y = 0; y < used_h; ++y) {
    const uint8_t* src = rgb + static_cast<size_t>(y + ymin_used) * w * 3;
    uint8_t* dst = &tmp[static_cast<size_t>(y) * rs_w * 3];
    for (int xx = 0; xx < rs_w; ++xx) {
      const double* k = &cw_.weights[static_cast<size_t>(xx) * cw_.ksize];
      const int x0 = cw_.xmin[xx], n = cw_.xsize[xx];
      double r = 0, g = 0, b = 0;
      for (int x = 0; x < n; ++x) {
        const uint8_t* p = src + static_cast<size_t>(x0 + x) * 3;
        r += k[x] * p[0];
        g += k[x] * p[1];
        b += k[x] * p[2];
      }
      dst[xx * 3 + 0] = clamp8(r);
      dst[xx * 3 + 1] = clamp8(g);
      dst[xx * 3 + 2] = clamp8(b);
    }
  }

  // Vertical pass fused with crop + normalize.
  const int out_w = cs > 0 ? cs : rs_w;
  const int out_h = cs > 0 ? cs : rs_h;
  const int x_off = cs > 0 ? cx : 0;
  const int y_off = cs > 0 ? cy : 0;
  if (x_off < 0 || y_off < 0 || x_off + out_w > rs_w || y_off + out_h > rs_h) return -1;
  const float inv255 = 1.0f / 255.0f;
  for (int yy = 0; yy < out_h; ++yy) {
    const int src_yy = yy + y_off;
    const double* k = &ch_.weights[static_cast<size_t>(src_yy) * ch_.ksize];
    const int y0 = ch_.xmin[src_yy] - ymin_used, n = ch_.xsize[src_yy];
    float* dst = out + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const int src_xx = xx + x_off;
      double acc[3] = {0, 0, 0};
      for (int y = 0; y < n; ++y) {
        const uint8_t* p = &tmp[(static_cast<size_t>(y0 + y) * rs_w + src_xx) * 3];
        acc[0] += k[y] * p[0];
        acc[1] += k[y] * p[1];
        acc[2] += k[y] * p[2];
      }
      for (int ch = 0; ch < 3; ++ch) {
        // Pillow clips the resampled value back to uint8 range and rounds;
        // mirror that so numerics match the PIL pipeline.
        double v = acc[ch];
        v = v < 0.0 ? 0.0 : (v > 255.0 ? 255.0 : v);
        v = std::floor(v + 0.5);  // Pillow's fixed-point path rounds half-up
        dst[xx * 3 + ch] = (static_cast<float>(v) * inv255 - mean[ch]) / stdv[ch];
      }
    }
  }
  return 0;
}

}  // extern "C"
