// Native (C++) data-loader runtime for mfnerf_tpu.
//
// The reference framework's data path is Python/cv2 with the heavy lifting
// hidden inside torch DataLoader worker processes (reference train.py:146-151,
// 16 workers) — its native layer (models/csrc) only covers GPU compute. On
// TPU the compute kernels are XLA/Pallas programs, so the native-runtime
// surface moves here: image decode (libpng/libjpeg), alpha compositing,
// bilinear resize and COLMAP sparse-reconstruction parsing run in C++ with an
// internal thread pool, exposed through a minimal C ABI consumed via ctypes
// (mfnerf_tpu/native.py). Replaces, feature-for-feature:
//   * datasets/color_utils.py:read_image  (imageio + cv2.resize path)
//   * datasets/colmap_utils.py:read_{cameras,images,points3d}_binary
//     (Python struct loops; the points3D file of a large COLMAP scene holds
//     millions of records and dominates load time in the reference).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC nativeloader.cc -lpng -ljpeg
//        -pthread -o _nativeloader.so   (done on demand by native.py)

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------- image I/O

struct ImageU8 {
  int w = 0, h = 0, c = 0;  // c in {1, 3, 4}
  std::vector<uint8_t> data;  // h*w*c, row-major
};

bool read_png(const char* path, ImageU8* out) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return false;
  // Preserve the channel story the Python path sees from imageio: gray
  // stays 1ch, rgb 3ch, anything with alpha 4ch (16-bit inputs downshift).
  int c;
  if (image.format & PNG_FORMAT_FLAG_ALPHA) {
    image.format = PNG_FORMAT_RGBA;
    c = 4;
  } else if (image.format & PNG_FORMAT_FLAG_COLOR) {
    image.format = PNG_FORMAT_RGB;
    c = 3;
  } else {
    image.format = PNG_FORMAT_GRAY;
    c = 1;
  }
  out->w = image.width;
  out->h = image.height;
  out->c = c;
  out->data.resize(size_t(image.width) * image.height * c);
  if (!png_image_finish_read(&image, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool read_jpeg(const char* path, ImageU8* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
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
  std::fclose(f);
  return true;
}

bool read_any(const char* path, ImageU8* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  size_t got = std::fread(magic, 1, 4, f);
  std::fclose(f);
  if (got < 4) return false;
  if (magic[0] == 0x89 && magic[1] == 'P') return read_png(path, out);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return read_jpeg(path, out);
  return false;
}

// uint8 (H,W,C) -> float32 RGB in [0,1] with the reference's alpha story
// (color_utils.py:34-40): blend_a ? rgb*a + (1-a) : rgb*a; gray replicates.
void to_float_rgb(const ImageU8& img, int blend_a, std::vector<float>* out) {
  const size_t n = size_t(img.w) * img.h;
  out->resize(n * 3);
  const uint8_t* src = img.data.data();
  float* dst = out->data();
  constexpr float k = 1.0f / 255.0f;
  if (img.c == 1) {
    for (size_t i = 0; i < n; ++i) {
      float v = src[i] * k;
      dst[3 * i] = dst[3 * i + 1] = dst[3 * i + 2] = v;
    }
  } else if (img.c == 3) {
    for (size_t i = 0; i < n * 3; ++i) dst[i] = src[i] * k;
  } else {  // RGBA
    for (size_t i = 0; i < n; ++i) {
      float a = src[4 * i + 3] * k;
      float bg = blend_a ? (1.0f - a) : 0.0f;
      dst[3 * i + 0] = src[4 * i + 0] * k * a + bg;
      dst[3 * i + 1] = src[4 * i + 1] * k * a + bg;
      dst[3 * i + 2] = src[4 * i + 2] * k * a + bg;
    }
  }
}

// Bilinear resize, cv2.INTER_LINEAR semantics: src = (dst+0.5)*scale - 0.5,
// edge-clamped. Matches the float path of cv2.resize (color_utils.py:43).
void resize_bilinear(const float* src, int sw, int sh, float* dst, int dw,
                     int dh) {
  const float sx = float(sw) / dw, sy = float(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = int(std::floor(fy));
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.0f; }
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    if (y0 >= sh - 1) { y0 = sh - 1; wy = 0.0f; }
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = int(std::floor(fx));
      float wx = fx - x0;
      if (x0 < 0) { x0 = 0; wx = 0.0f; }
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      if (x0 >= sw - 1) { x0 = sw - 1; wx = 0.0f; }
      const float* p00 = src + (size_t(y0) * sw + x0) * 3;
      const float* p01 = src + (size_t(y0) * sw + x1) * 3;
      const float* p10 = src + (size_t(y1) * sw + x0) * 3;
      const float* p11 = src + (size_t(y1) * sw + x1) * 3;
      float* d = dst + (size_t(y) * dw + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float top = p00[ch] + (p01[ch] - p00[ch]) * wx;
        float bot = p10[ch] + (p11[ch] - p10[ch]) * wx;
        d[ch] = top + (bot - top) * wy;
      }
    }
  }
}

bool load_one(const char* path, int out_w, int out_h, int blend_a,
              float* dst) {
  ImageU8 raw;
  if (!read_any(path, &raw)) return false;
  std::vector<float> rgb;
  to_float_rgb(raw, blend_a, &rgb);
  if (raw.w == out_w && raw.h == out_h) {
    std::memcpy(dst, rgb.data(), rgb.size() * sizeof(float));
  } else {
    resize_bilinear(rgb.data(), raw.w, raw.h, dst, out_w, out_h);
  }
  return true;
}

// ------------------------------------------------------------- binary files

struct Reader {
  FILE* f = nullptr;
  bool ok = true;
  explicit Reader(const char* path) { f = std::fopen(path, "rb"); ok = f; }
  ~Reader() { if (f) std::fclose(f); }
  template <typename T>
  T get() {
    T v{};
    if (std::fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;  // COLMAP files are little-endian; so are our targets
  }
  bool skip(long n) { return std::fseek(f, n, SEEK_CUR) == 0; }
  std::string cstring() {
    std::string s;
    int ch;
    while ((ch = std::fgetc(f)) > 0) s.push_back(char(ch));
    if (ch < 0) ok = false;
    return s;
  }
};

int camera_num_params(int model_id) {
  // COLMAP camera models 0..10 (colmap.github.io/format.html)
  static const int n[] = {3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};
  return (model_id >= 0 && model_id <= 10) ? n[model_id] : -1;
}

}  // namespace

extern "C" {

// ---- batch image loading -------------------------------------------------
// dst: (n, out_h*out_w*3) float32, caller-allocated. Returns 0 on success or
// -(i+1) for the first image that failed to load.
int nl_load_images(const char** paths, int n, int out_w, int out_h,
                   int blend_a, int n_threads, float* dst) {
  if (n_threads <= 0) {
    n_threads = int(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::atomic<int> next(0), failed(0);
  const size_t stride = size_t(out_w) * out_h * 3;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      if (!load_one(paths[i], out_w, out_h, blend_a, dst + stride * i)) {
        int expect = 0;
        failed.compare_exchange_strong(expect, -(i + 1));
      }
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return failed.load();
}

// Single image probe: returns 0 and fills w/h/c, or -1.
int nl_image_size(const char* path, int* w, int* h, int* c) {
  ImageU8 raw;  // full decode — used only by tests/tools
  if (!read_any(path, &raw)) return -1;
  *w = raw.w; *h = raw.h; *c = raw.c;
  return 0;
}

// ---- COLMAP cameras.bin --------------------------------------------------
int nl_colmap_cameras_sizes(const char* path, int64_t* n_cams,
                            int64_t* n_params) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  int64_t total = 0;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    r.get<int32_t>();
    int np = camera_num_params(r.get<int32_t>());
    if (np < 0) return -2;
    r.get<uint64_t>(); r.get<uint64_t>();
    if (!r.skip(8 * np)) return -3;
    total += np;
  }
  if (!r.ok) return -3;
  *n_cams = int64_t(n);
  *n_params = total;
  return 0;
}

int nl_colmap_cameras_read(const char* path, int32_t* ids, int32_t* model_ids,
                           int64_t* wh, int64_t* param_offsets,
                           double* params) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  int64_t off = 0;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    ids[i] = r.get<int32_t>();
    model_ids[i] = r.get<int32_t>();
    wh[2 * i] = int64_t(r.get<uint64_t>());
    wh[2 * i + 1] = int64_t(r.get<uint64_t>());
    int np = camera_num_params(model_ids[i]);
    param_offsets[i] = off;
    for (int p = 0; p < np; ++p) params[off + p] = r.get<double>();
    off += np;
  }
  param_offsets[n] = off;
  return r.ok ? 0 : -3;
}

// ---- COLMAP images.bin ---------------------------------------------------
int nl_colmap_images_sizes(const char* path, int64_t* n_images,
                           int64_t* n_pts, int64_t* name_bytes) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  int64_t pts = 0, nb = 0;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    r.get<int32_t>();
    if (!r.skip(8 * 7)) return -3;   // qvec + tvec
    r.get<int32_t>();
    nb += int64_t(r.cstring().size()) + 1;
    uint64_t np = r.get<uint64_t>();
    if (!r.skip(long(24 * np))) return -3;
    pts += int64_t(np);
  }
  if (!r.ok) return -3;
  *n_images = int64_t(n);
  *n_pts = pts;
  *name_bytes = nb;
  return 0;
}

// names: '\0'-joined in file order (name_bytes total). xys: (n_pts,2).
int nl_colmap_images_read(const char* path, int32_t* ids, double* qvecs,
                          double* tvecs, int32_t* cam_ids, char* names,
                          int64_t* pt_offsets, double* xys,
                          int64_t* p3d_ids) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  int64_t off = 0;
  char* name_dst = names;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    ids[i] = r.get<int32_t>();
    for (int k = 0; k < 4; ++k) qvecs[4 * i + k] = r.get<double>();
    for (int k = 0; k < 3; ++k) tvecs[3 * i + k] = r.get<double>();
    cam_ids[i] = r.get<int32_t>();
    std::string name = r.cstring();
    std::memcpy(name_dst, name.c_str(), name.size() + 1);
    name_dst += name.size() + 1;
    uint64_t np = r.get<uint64_t>();
    pt_offsets[i] = off;
    for (uint64_t p = 0; p < np; ++p) {
      xys[2 * (off + p)] = r.get<double>();
      xys[2 * (off + p) + 1] = r.get<double>();
      p3d_ids[off + p] = r.get<int64_t>();
    }
    off += int64_t(np);
  }
  pt_offsets[n] = off;
  return r.ok ? 0 : -3;
}

// ---- COLMAP points3D.bin -------------------------------------------------
int nl_colmap_points3d_sizes(const char* path, int64_t* n_points,
                             int64_t* n_track) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  int64_t track = 0;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    if (!r.skip(8 + 24 + 3 + 8)) return -3;  // id + xyz + rgb + error
    uint64_t t = r.get<uint64_t>();
    if (!r.skip(long(8 * t))) return -3;
    track += int64_t(t);
  }
  if (!r.ok) return -3;
  *n_points = int64_t(n);
  *n_track = track;
  return 0;
}

int nl_colmap_points3d_read(const char* path, int64_t* ids, double* xyz,
                            uint8_t* rgb, double* err, int64_t* track_offsets,
                            int32_t* track_img_ids, int32_t* track_p2d) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  int64_t off = 0;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    ids[i] = r.get<int64_t>();
    for (int k = 0; k < 3; ++k) xyz[3 * i + k] = r.get<double>();
    for (int k = 0; k < 3; ++k) rgb[3 * i + k] = r.get<uint8_t>();
    err[i] = r.get<double>();
    uint64_t t = r.get<uint64_t>();
    track_offsets[i] = off;
    for (uint64_t k = 0; k < t; ++k) {
      track_img_ids[off + k] = r.get<int32_t>();
      track_p2d[off + k] = r.get<int32_t>();
    }
    off += int64_t(t);
  }
  track_offsets[n] = off;
  return r.ok ? 0 : -3;
}

}  // extern "C"
