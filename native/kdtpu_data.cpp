// Native data-loading runtime for k-diffusion-tpu.
//
// The reference leans on torch's C++ DataLoader + PIL for its input pipeline
// (reference train.py:238-239, utils.py:388-411). This library provides the
// equivalent native path for the TPU build: JPEG/PNG decode (libjpeg/libpng),
// separable bicubic (Catmull-Rom) resize of the short side + center crop, and
// a persistent thread pool that fills whole float32 NHWC batches in [0, 1] —
// one C call per batch from the Python loader (ctypes, zero-copy into a
// caller-provided numpy buffer).
//
// Build: make -C native  (produces libkdtpu_data.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------- thread pool ----------

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { Run(); });
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      work_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !work_.empty(); });
        if (stop_ && work_.empty()) return;
        fn = std::move(work_.front());
        work_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> work_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

// ---------- image decode ----------

struct DecodedImage {
  std::vector<uint8_t> pixels;  // HWC, 8-bit
  int h = 0, w = 0, c = 0;
  bool ok = false;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

DecodedImage DecodeJpeg(const uint8_t* data, size_t size) {
  DecodedImage out;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.c = 3;
  out.pixels.resize(size_t(out.h) * out.w * out.c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.pixels.data() + size_t(cinfo.output_scanline) * out.w * out.c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void PngReadFn(png_structp png, png_bytep dst, png_size_t len) {
  auto* ctx = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (ctx->pos + len > ctx->size) png_error(png, "eof");
  memcpy(dst, ctx->data + ctx->pos, len);
  ctx->pos += len;
}

DecodedImage DecodePng(const uint8_t* data, size_t size) {
  DecodedImage out;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return out;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return out;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
  }
  PngReadCtx ctx{data, size, 0};
  png_set_read_fn(png, &ctx, PngReadFn);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out.w = w;
  out.h = h;
  out.c = 3;
  out.pixels.resize(size_t(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 i = 0; i < h; i++)
    rows[i] = out.pixels.data() + size_t(i) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out.ok = true;
  return out;
}

DecodedImage DecodeAny(const uint8_t* data, size_t size) {
  if (size >= 2 && data[0] == 0xFF && data[1] == 0xD8) return DecodeJpeg(data, size);
  if (size >= 8 && !memcmp(data, "\x89PNG\r\n\x1a\n", 8)) return DecodePng(data, size);
  return {};
}

// ---------- bicubic (Catmull-Rom) resize + center crop ----------

inline float CubicKernel(float t) {
  // Catmull-Rom (a = -0.5), the same family PIL's BICUBIC uses
  const float a = -0.5f;
  t = std::fabs(t);
  if (t < 1.0f) return ((a + 2) * t - (a + 3)) * t * t + 1;
  if (t < 2.0f) return (((t - 5) * t + 8) * t - 4) * a;
  return 0.0f;
}

inline int ClampI(int x, int lo, int hi) { return x < lo ? lo : (x > hi ? hi : x); }

// Precomputed antialiased resample coefficients for one axis (PIL-style:
// kernel support scaled by 1/scale when downscaling).
struct ResampleCoeffs {
  int taps;
  std::vector<int> idx;     // [out * taps]
  std::vector<float> wgt;   // [out * taps]
};

ResampleCoeffs MakeCoeffs(int in_size, int out_size, int out_off, int out_n) {
  ResampleCoeffs rc;
  const float scale = float(in_size) / out_size;
  const float filterscale = std::max(1.0f, scale);
  const float support = 2.0f * filterscale;  // cubic radius 2
  rc.taps = int(std::ceil(support)) * 2 + 1;
  rc.idx.resize(size_t(out_n) * rc.taps);
  rc.wgt.assign(size_t(out_n) * rc.taps, 0.0f);
  for (int o = 0; o < out_n; o++) {
    float center = (o + out_off + 0.5f) * scale - 0.5f;
    int lo = int(std::floor(center - support));
    float total = 0.0f;
    for (int k = 0; k < rc.taps; k++) {
      int src = lo + k;
      float wv = CubicKernel((src - center) / filterscale);
      rc.idx[size_t(o) * rc.taps + k] = ClampI(src, 0, in_size - 1);
      rc.wgt[size_t(o) * rc.taps + k] = wv;
      total += wv;
    }
    if (total != 0.0f)
      for (int k = 0; k < rc.taps; k++) rc.wgt[size_t(o) * rc.taps + k] /= total;
  }
  return rc;
}

// resize short side to `size` (antialiased bicubic, separable) then
// center-crop to size x size; output float32 HWC in [0, 1]
void ResizeCenterCrop(const DecodedImage& img, int size, float* out) {
  const int c = img.c;
  const float scale = float(size) / std::min(img.w, img.h);
  const int rw = std::max(size, int(std::lround(img.w * scale)));
  const int rh = std::max(size, int(std::lround(img.h * scale)));
  const int x_off = (rw - size) / 2;
  const int y_off = (rh - size) / 2;

  // horizontal pass restricted to the cropped column range:
  // (h, w, c) -> (h, size, c)
  ResampleCoeffs cx = MakeCoeffs(img.w, rw, x_off, size);
  std::vector<float> tmp(size_t(img.h) * size * c);
  for (int y = 0; y < img.h; y++) {
    const uint8_t* row = img.pixels.data() + size_t(y) * img.w * c;
    float* trow = tmp.data() + size_t(y) * size * c;
    for (int x = 0; x < size; x++) {
      const int* xi = cx.idx.data() + size_t(x) * cx.taps;
      const float* xw = cx.wgt.data() + size_t(x) * cx.taps;
      float acc0 = 0, acc1 = 0, acc2 = 0;
      if (c == 3) {
        for (int k = 0; k < cx.taps; k++) {
          const uint8_t* p = row + xi[k] * 3;
          acc0 += xw[k] * p[0];
          acc1 += xw[k] * p[1];
          acc2 += xw[k] * p[2];
        }
        trow[x * 3 + 0] = acc0;
        trow[x * 3 + 1] = acc1;
        trow[x * 3 + 2] = acc2;
      } else {
        for (int ch = 0; ch < c; ch++) {
          float acc = 0;
          for (int k = 0; k < cx.taps; k++)
            acc += xw[k] * row[xi[k] * c + ch];
          trow[x * c + ch] = acc;
        }
      }
    }
  }

  // vertical pass with fused crop: (h, size, c) -> (size, size, c)
  ResampleCoeffs cy = MakeCoeffs(img.h, rh, y_off, size);
  const int rowlen = size * c;
  for (int y = 0; y < size; y++) {
    const int* yi = cy.idx.data() + size_t(y) * cy.taps;
    const float* yw = cy.wgt.data() + size_t(y) * cy.taps;
    float* orow = out + size_t(y) * rowlen;
    for (int i = 0; i < rowlen; i++) orow[i] = 0.0f;
    for (int k = 0; k < cy.taps; k++) {
      const float wv = yw[k];
      if (wv == 0.0f) continue;
      const float* srow = tmp.data() + size_t(yi[k]) * rowlen;
      for (int i = 0; i < rowlen; i++) orow[i] += wv * srow[i];
    }
    for (int i = 0; i < rowlen; i++)
      orow[i] = std::min(1.0f, std::max(0.0f, orow[i] / 255.0f));
  }
}

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* GetPool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (!g_pool || g_pool_size != n_threads) {
    delete g_pool;
    g_pool = new ThreadPool(n_threads);
    g_pool_size = n_threads;
  }
  return g_pool;
}

bool LoadOne(const char* path, int size, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(len);
  if (fread(buf.data(), 1, len, f) != size_t(len)) {
    fclose(f);
    return false;
  }
  fclose(f);
  DecodedImage img = DecodeAny(buf.data(), buf.size());
  if (!img.ok || img.w < 4 || img.h < 4) return false;
  ResizeCenterCrop(img, size, out);
  return true;
}

}  // namespace

extern "C" {

// Fills out[batch, size, size, 3] (float32, [0,1]) by decoding+resizing the
// given files in parallel. Returns the number of failures (failed slots are
// zero-filled).
int kdtpu_load_batch(const char** paths, int n, int size, int n_threads,
                     float* out) {
  ThreadPool* pool = GetPool(n_threads);
  std::atomic<int> failures{0};
  std::atomic<int> remaining{n};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; i++) {
    const char* path = paths[i];
    float* dst = out + size_t(i) * size * size * 3;
    pool->Submit([path, size, dst, &failures, &remaining, &mu, &cv] {
      if (!LoadOne(path, size, dst)) {
        memset(dst, 0, sizeof(float) * size_t(size) * size * 3);
        failures.fetch_add(1);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_all();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

// Single-image variant; returns 0 on success.
int kdtpu_load_image(const char* path, int size, float* out) {
  return LoadOne(path, size, out) ? 0 : 1;
}

// Bicubic resize+crop of an already-decoded uint8 HWC image.
void kdtpu_resize_u8(const uint8_t* pixels, int h, int w, int c, int size,
                     float* out) {
  DecodedImage img;
  img.pixels.assign(pixels, pixels + size_t(h) * w * c);
  img.h = h;
  img.w = w;
  img.c = c;
  img.ok = true;
  ResizeCenterCrop(img, size, out);
}

}  // extern "C"
