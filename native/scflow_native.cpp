// scflow_native: C++ data-path kernels for the host side of the TPU
// framework — image decode (libjpeg/libpng), fused crop+resize+pad+normalize,
// and a pooled batch API. The reference's data path leans on mmcv/cv2 C++
// through Python per-op calls (datasets/pipelines/geometry_transform.py);
// here the whole per-object patch pipeline is one native call, so a 2-vCPU
// host can keep a TPU fed without Python/GIL overhead per op.
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this
// environment).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
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
#include <csetjmp>

namespace {

// ---------------------------------------------------------------------------
// Thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Run(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* GlobalPool(int threads) {
  static ThreadPool* pool = new ThreadPool(threads > 0 ? threads : 2);
  return pool;
}

// ---------------------------------------------------------------------------
// Decoders
// ---------------------------------------------------------------------------
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void JpegErrExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode JPEG from file into RGB uint8. Returns 0 on success.
int DecodeJpeg(const char* path, std::vector<uint8_t>* out, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrExit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode PNG from file into RGB (or gray) uint8. channels: 3 or 1.
int DecodePng(const char* path, std::vector<uint8_t>* out, int* h, int* w,
              int channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return -2;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (channels == 3 && (color == PNG_COLOR_TYPE_GRAY ||
                        color == PNG_COLOR_TYPE_GRAY_ALPHA))
    png_set_gray_to_rgb(png);
  if (channels == 1 && (color == PNG_COLOR_TYPE_RGB ||
                        color == PNG_COLOR_TYPE_RGB_ALPHA ||
                        color == PNG_COLOR_TYPE_PALETTE))
    png_set_rgb_to_gray(png, 1, -1, -1);
  png_read_update_info(png, info);
  out->resize(size_t(*h) * *w * channels);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = out->data() + size_t(y) * *w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return 0;
}

bool EndsWith(const char* s, const char* suf) {
  size_t ls = strlen(s), lf = strlen(suf);
  if (lf > ls) return false;
  for (size_t i = 0; i < lf; ++i)
    if (tolower(s[ls - lf + i]) != suf[i]) return false;
  return true;
}

// ---------------------------------------------------------------------------
// Fused crop + keep-ratio resize + center pad + normalize
// (semantics of scflow_tpu.data.pipeline.crop_resize_pad)
// ---------------------------------------------------------------------------
void CropResizePadNormalize(const uint8_t* img, int h, int w, int channels,
                            float cx1, float cy1, float cx2, float cy2,
                            int out_size, float pad_val, const float* mean,
                            const float* stdv, float* out, float* transform) {
  int icx1 = int(cx1), icy1 = int(cy1), icx2 = int(cx2), icy2 = int(cy2);
  int ch = icy2 - icy1, cw = icx2 - icx1;
  if (ch <= 0 || cw <= 0) {
    for (int i = 0; i < out_size * out_size * channels; ++i)
      out[i] = (pad_val - mean[i % channels]) / stdv[i % channels];
    return;
  }
  float scale = float(out_size) / float(std::max(ch, cw));
  int rh = int(std::lround(ch * scale)), rw = int(std::lround(cw * scale));
  rh = std::min(rh, out_size);
  rw = std::min(rw, out_size);
  int top = out_size / 2 - rh / 2;
  int left = out_size / 2 - rw / 2;

  // fill with normalized pad value
  for (int c = 0; c < channels; ++c) {
    float pv = (pad_val - mean[c]) / stdv[c];
    for (int i = 0; i < out_size * out_size; ++i)
      out[i * channels + c] = pv;
  }

  // bilinear resize from the crop window, sampling the source image with
  // out-of-bounds → pad_val (crop may extend past the frame)
  float inv = 1.0f / scale;
  for (int oy = 0; oy < rh; ++oy) {
    float sy = (oy + 0.5f) * inv - 0.5f + icy1;
    int y0 = int(std::floor(sy));
    float fy = sy - y0;
    for (int ox = 0; ox < rw; ++ox) {
      float sx = (ox + 0.5f) * inv - 0.5f + icx1;
      int x0 = int(std::floor(sx));
      float fx = sx - x0;
      for (int c = 0; c < channels; ++c) {
        auto at = [&](int yy, int xx) -> float {
          if (yy < 0 || yy >= h || xx < 0 || xx >= w) return pad_val;
          return float(img[(size_t(yy) * w + xx) * channels + c]);
        };
        float v00 = at(y0, x0), v01 = at(y0, x0 + 1);
        float v10 = at(y0 + 1, x0), v11 = at(y0 + 1, x0 + 1);
        float v = (1 - fy) * ((1 - fx) * v00 + fx * v01) +
                  fy * ((1 - fx) * v10 + fx * v11);
        out[((top + oy) * out_size + (left + ox)) * channels + c] =
            (v - mean[c]) / stdv[c];
      }
    }
  }

  if (transform) {
    // accumulated affine: pad ∘ resize ∘ crop
    transform[0] = scale; transform[1] = 0;     transform[2] = -icx1 * scale + left;
    transform[3] = 0;     transform[4] = scale; transform[5] = -icy1 * scale + top;
    transform[6] = 0;     transform[7] = 0;     transform[8] = 1;
  }
}

}  // namespace

extern "C" {

// Header-only probe of image dimensions (no pixel decode) — lets callers
// allocate the exact output buffer and decode ONCE (the original
// probe-then-decode pattern decoded every image twice).
int scflow_image_dims(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (EndsWith(path, ".png")) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
  }
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = JpegErrExit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// Decode an image file (jpg/png by extension) to RGB uint8.
// out_buf must hold max_bytes; returns needed byte count, or <0 on error.
// If the image doesn't fit, nothing is written (call again with a larger buf).
long long scflow_decode_image(const char* path, uint8_t* out_buf,
                              long long max_bytes, int* h, int* w,
                              int channels) {
  std::vector<uint8_t> data;
  int rc;
  if (EndsWith(path, ".png"))
    rc = DecodePng(path, &data, h, w, channels);
  else
    rc = DecodeJpeg(path, &data, h, w);
  if (rc != 0) return rc;
  long long need = (long long)data.size();
  if (need <= max_bytes) memcpy(out_buf, data.data(), data.size());
  return need;
}

// Fused batch: for each of n objects, decode nothing (images passed in),
// crop box i, resize+pad to out_size, normalize. Parallel over objects.
void scflow_crop_resize_pad_batch(
    const uint8_t** images, const int* heights, const int* widths,
    int channels, const float* boxes /* n×4 xyxy */, int n, int out_size,
    float pad_val, const float* mean, const float* stdv,
    float* out /* n×S×S×C */, float* transforms /* n×9 or null */,
    int num_threads) {
  ThreadPool* pool = GlobalPool(num_threads);
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  for (int i = 0; i < n; ++i) {
    pool->Run([&, i] {
      CropResizePadNormalize(
          images[i], heights[i], widths[i], channels, boxes[i * 4 + 0],
          boxes[i * 4 + 1], boxes[i * 4 + 2], boxes[i * 4 + 3], out_size,
          pad_val, mean, stdv,
          out + size_t(i) * out_size * out_size * channels,
          transforms ? transforms + i * 9 : nullptr);
      if (++done == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

// End-to-end loader: decode file + crop/resize/pad/normalize in one call.
// Returns 0 on success.
int scflow_load_patch(const char* path, const float* box, int out_size,
                      float pad_val, const float* mean, const float* stdv,
                      float* out, float* transform, int* src_h, int* src_w) {
  std::vector<uint8_t> data;
  int h = 0, w = 0;
  int rc;
  if (EndsWith(path, ".png"))
    rc = DecodePng(path, &data, &h, &w, 3);
  else
    rc = DecodeJpeg(path, &data, &h, &w);
  if (rc != 0) return rc;
  if (src_h) *src_h = h;
  if (src_w) *src_w = w;
  CropResizePadNormalize(data.data(), h, w, 3, box[0], box[1], box[2], box[3],
                         out_size, pad_val, mean, stdv, out, transform);
  return 0;
}

}  // extern "C"
