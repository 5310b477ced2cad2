// cfn_data — native data-plane runtime for the TPU framework.
//
// The reference's input pipeline is 8 Python DataLoader workers doing
// PIL/accimage decode of per-frame JPEG directories (charades_fine.py:22-84,
// train_fine.py:84-85).  This library replaces that host bottleneck with:
//
//   * a pthread pool decoding JPEG batches straight into one contiguous
//     caller-owned uint8 buffer (zero Python-side copies, GIL never held),
//   * optional centre-crop + bilinear resize fused into the decode pass,
//   * a packed-video container (.cfnpack): all frames of a video
//     concatenated with an offset index, so a whole clip is read with one
//     open() + pread()s instead of thousands of tiny file opens.
//
// Exposed as a plain C ABI consumed via ctypes (coarse_fine_networks_tpu/
// data/native.py).  Build: `make -C native` → libcfn_data.so.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Fast-decode mode (default on): decode at the smallest libjpeg m/8 DCT
// scale at which the crop box still covers the output size, and only the
// scanline/column range the crop needs (jpeg_crop_scanline /
// jpeg_skip_scanlines — libjpeg-turbo partial decode).  The IDCT + color
// conversion work then tracks the *output* pixel count instead of the source
// frame size (~3-5× less at Charades shapes: 480p source → 224² crop).
// Numerics differ from the exact path only by the resample chain
// (scaled-decode + bilinear vs full-decode + bilinear), well inside the
// augmentation noise the random crop itself injects.  CFN_EXACT_DECODE=1
// restores the full-resolution decode path.
std::atomic<int> g_fast_decode{-1};  // -1 = read env on first use

bool fast_decode_enabled() {
  int v = g_fast_decode.load(std::memory_order_relaxed);
  if (v < 0) {
    v = getenv("CFN_EXACT_DECODE") == nullptr ? 1 : 0;
    g_fast_decode.store(v, std::memory_order_relaxed);
  }
  return v != 0;
}

// Decode one JPEG from memory into RGB uint8 (caller-sized). Returns 0 on
// success; fills width/height.
int decode_rgb(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
               int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(static_cast<size_t>(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() +
                   static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear resize RGB uint8 (PIL-free; used for the centre-crop-scaled val
// path where exact PIL filter parity is not required).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Crop a box out of a decoded frame then bilinear-resize it to (out, out)
// without materialising the crop: the resize samples the source through the
// box offset.
void crop_resize(const uint8_t* src, int sw, int x1, int y1, int cw, int ch,
                 uint8_t* dst, int out) {
  const float sx = static_cast<float>(cw) / out;
  const float sy = static_cast<float>(ch) / out;
  for (int y = 0; y < out; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int yb = y0 + 1 < ch ? y0 + 1 : ch - 1;
    float wy = fy - y0;
    const uint8_t* row0 = src + ((static_cast<size_t>(y1) + y0) * sw + x1) * 3;
    const uint8_t* row1 = src + ((static_cast<size_t>(y1) + yb) * sw + x1) * 3;
    for (int x = 0; x < out; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int xb = x0 + 1 < cw ? x0 + 1 : cw - 1;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = row0[x0 * 3 + c];
        float v01 = row0[xb * 3 + c];
        float v10 = row1[x0 * 3 + c];
        float v11 = row1[xb * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(static_cast<size_t>(y) * out + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Fast path: decode ONLY the crop box, at a reduced m/8 DCT scale, straight
// into the (out, out) destination.  `crop_mode` 0 = centre-crop-to-min-side
// (CenterCropScaled, spatial_transforms.py:201-233), 1 = random
// scale+position crop (MultiScaleRandomCropMultigrid,
// spatial_transforms.py:480-509) — crop geometry is computed in FULL-RES
// coordinates (identical to the exact path / the PIL reference) and then
// mapped onto the scaled decode grid.  Returns 0 on success.
int decode_crop_scaled(const uint8_t* data, size_t size, int crop_mode,
                       double scale, double tl_x, double tl_y, uint8_t* dst,
                       int out_size) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  const int w = cinfo.image_width, h = cinfo.image_height;
  const int m = w < h ? w : h;
  int crop, x1, y1;
  if (crop_mode == 1) {
    crop = static_cast<int>(m * scale);
    if (crop < 1) crop = 1;
    if (crop > m) crop = m;
    x1 = static_cast<int>(tl_x * (w - crop));
    y1 = static_cast<int>(tl_y * (h - crop));
  } else {
    crop = m;
    x1 = (w - crop + 1) / 2;
    y1 = (h - crop + 1) / 2;
  }

  // smallest power-of-two num/8 scale that keeps the scaled crop >=
  // out_size (never upsample information away).  Only 8/8, 4/8, 2/8, 1/8
  // are considered: libjpeg-turbo's SIMD IDCT covers exactly those — the
  // intermediate m/8 scales fall back to scalar IDCT and are *slower* than
  // full-scale SIMD decode of the trimmed region.
  int num = 8;
  while (num > 1 && (static_cast<int64_t>(crop) * (num / 2)) / 8 >= out_size)
    num /= 2;
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  if (num < 8) cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width, sh = cinfo.output_height;

  // crop box on the scaled grid (floor origin, ceil extent, clamped)
  int sx1 = static_cast<int>((static_cast<int64_t>(x1) * num) / 8);
  int sy1 = static_cast<int>((static_cast<int64_t>(y1) * num) / 8);
  int scw = static_cast<int>((static_cast<int64_t>(crop) * num + 7) / 8);
  int sch = scw;
  if (sx1 >= sw) sx1 = sw - 1;
  if (sy1 >= sh) sy1 = sh - 1;
  if (sx1 + scw > sw) scw = sw - sx1;
  if (sy1 + sch > sh) sch = sh - sy1;
  if (scw < 1) scw = 1;
  if (sch < 1) sch = 1;

  // trim to an iMCU-aligned window with a 4 px margin around the crop box:
  // the fancy chroma upsampler needs neighbour context, so pixels adjacent
  // to a trimmed/skipped boundary can differ from a full decode — with the
  // margin, any contaminated pixels fall outside the sampled region
  const int kMargin = 4;
  int mx0 = sx1 - kMargin > 0 ? sx1 - kMargin : 0;
  int mx1 = sx1 + scw + kMargin < sw ? sx1 + scw + kMargin : sw;
  int my0 = sy1 - kMargin > 0 ? sy1 - kMargin : 0;
  int my1 = sy1 + sch + kMargin < sh ? sy1 + sch + kMargin : sh;
  JDIMENSION xoff = mx0, xwidth = mx1 - mx0;
  jpeg_crop_scanline(&cinfo, &xoff, &xwidth);
  const int row_w = cinfo.output_width;  // == xwidth after alignment

  if (my0 > 0) jpeg_skip_scanlines(&cinfo, my0);
  const int n_rows = my1 - my0;
  std::vector<uint8_t> rows(static_cast<size_t>(row_w) * n_rows * 3);
  while (cinfo.output_scanline < static_cast<JDIMENSION>(my1)) {
    uint8_t* row =
        rows.data() +
        (static_cast<size_t>(cinfo.output_scanline) - my0) * row_w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  // remaining rows are never decoded
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  crop_resize(rows.data(), row_w, sx1 - static_cast<int>(xoff), sy1 - my0,
              scw, sch, dst, out_size);
  return 0;
}

// Centre-crop to min side then resize to (out, out) — CenterCropScaled
// (spatial_transforms.py:201-233).
void center_crop_scale(const uint8_t* src, int sw, int sh, uint8_t* dst,
                       int out) {
  int crop = sw < sh ? sw : sh;
  int x1 = (sw - crop + 1) / 2;  // round like int(round(.../2))
  int y1 = (sh - crop + 1) / 2;
  std::vector<uint8_t> cropped(static_cast<size_t>(crop) * crop * 3);
  for (int y = 0; y < crop; ++y) {
    memcpy(cropped.data() + static_cast<size_t>(y) * crop * 3,
           src + ((static_cast<size_t>(y1) + y) * sw + x1) * 3,
           static_cast<size_t>(crop) * 3);
  }
  resize_bilinear(cropped.data(), crop, crop, dst, out, out);
}

struct DecodeTask {
  const char* path;     // file path (or nullptr for packed)
  const uint8_t* mem;   // in-memory JPEG (packed path)
  size_t mem_size;
  uint8_t* out;         // destination (out_size*out_size*3)
  int out_size;
  int* status;
  // crop mode: 0 = centre-crop-scaled; 1 = random scale+position crop
  // (MultiScaleRandomCropMultigrid, spatial_transforms.py:480-509):
  // crop = int(min(w,h)*scale), x1 = int(tl_x*(w-crop)), y1 = int(tl_y*(h-crop))
  int crop_mode = 0;
  double scale = 1.0, tl_x = 0.0, tl_y = 0.0;
};

struct Pool {
  std::vector<DecodeTask>* tasks;
  std::atomic<size_t> next{0};
};

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  buf->resize(st.st_size);
  ssize_t got = read(fd, buf->data(), st.st_size);
  close(fd);
  return got == st.st_size;
}

void run_task(const DecodeTask& t) {
  std::vector<uint8_t> file;
  const uint8_t* data = t.mem;
  size_t size = t.mem_size;
  if (t.path != nullptr) {
    if (!read_file(t.path, &file)) {
      *t.status = -2;
      return;
    }
    data = file.data();
    size = file.size();
  }
  if (t.out_size > 0 && fast_decode_enabled()) {
    *t.status = decode_crop_scaled(data, size, t.crop_mode, t.scale, t.tl_x,
                                   t.tl_y, t.out, t.out_size);
    return;
  }
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (decode_rgb(data, size, &rgb, &w, &h) != 0) {
    *t.status = -1;
    return;
  }
  if (t.out_size > 0 && t.crop_mode == 1) {
    int m = w < h ? w : h;
    int crop = static_cast<int>(m * t.scale);
    if (crop < 1) crop = 1;
    if (crop > m) crop = m;
    int x1 = static_cast<int>(t.tl_x * (w - crop));
    int y1 = static_cast<int>(t.tl_y * (h - crop));
    crop_resize(rgb.data(), w, x1, y1, crop, crop, t.out, t.out_size);
  } else if (t.out_size > 0) {
    center_crop_scale(rgb.data(), w, h, t.out, t.out_size);
  } else {
    // raw copy expects caller buffer sized w*h*3 (query first)
    memcpy(t.out, rgb.data(), rgb.size());
  }
  *t.status = 0;
}

void* worker(void* arg) {
  Pool* pool = static_cast<Pool*>(arg);
  for (;;) {
    size_t i = pool->next.fetch_add(1);
    if (i >= pool->tasks->size()) return nullptr;
    run_task((*pool->tasks)[i]);
  }
}

void run_pool(std::vector<DecodeTask>* tasks, int num_threads) {
  Pool pool;
  pool.tasks = tasks;
  if (num_threads <= 1 || tasks->size() <= 1) {
    for (auto& t : *tasks) run_task(t);
    return;
  }
  std::vector<pthread_t> threads(num_threads);
  for (auto& th : threads) pthread_create(&th, nullptr, worker, &pool);
  for (auto& th : threads) pthread_join(th, nullptr);
}

}  // namespace

extern "C" {

// Toggle the DCT-scaled partial-decode fast path at runtime (overrides the
// CFN_EXACT_DECODE env default).  Returns the previous setting.
int cfn_set_fast_decode(int enabled) {
  int prev = fast_decode_enabled() ? 1 : 0;
  g_fast_decode.store(enabled ? 1 : 0, std::memory_order_relaxed);
  return prev;
}

int cfn_get_fast_decode() { return fast_decode_enabled() ? 1 : 0; }

// Decode `n` JPEG files, centre-crop-scale each to (out_size, out_size, 3)
// uint8, into `out` (n*out_size*out_size*3, frame-major).  `status[i]` < 0 on
// per-frame failure.  Returns count of failures.
int cfn_decode_batch(const char** paths, int n, int out_size, uint8_t* out,
                     int* status, int num_threads) {
  std::vector<DecodeTask> tasks(n);
  size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    tasks[i] = DecodeTask{paths[i], nullptr, 0, out + i * stride, out_size,
                          &status[i]};
  }
  run_pool(&tasks, num_threads);
  int failures = 0;
  for (int i = 0; i < n; ++i)
    if (status[i] != 0) ++failures;
  return failures;
}

// Train-path decode: random scale+position crop (one per *clip* — the
// reference randomises once per clip then applies to every frame,
// charades_fine.py:170-173) resized to out_size.  Same contract as
// cfn_decode_batch otherwise.
int cfn_decode_batch_rc(const char** paths, int n, int out_size, double scale,
                        double tl_x, double tl_y, uint8_t* out, int* status,
                        int num_threads) {
  std::vector<DecodeTask> tasks(n);
  size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  for (int i = 0; i < n; ++i) {
    tasks[i] = DecodeTask{paths[i], nullptr,    0,    out + i * stride,
                          out_size, &status[i], 1,    scale,
                          tl_x,     tl_y};
  }
  run_pool(&tasks, num_threads);
  int failures = 0;
  for (int i = 0; i < n; ++i)
    if (status[i] != 0) ++failures;
  return failures;
}

// ---- packed-video container ------------------------------------------------
// Layout: [int64 magic][int64 n][int64 offsets[n+1]][frame bytes...]

static const int64_t kMagic = 0x43464e50414b3143;  // "CFNPAK1C"

int cfn_pack_video(const char** paths, int n, const char* out_path) {
  FILE* f = fopen(out_path, "wb");
  if (!f) return -1;
  std::vector<int64_t> offsets(n + 1);
  int64_t header = (2 + n + 1) * static_cast<int64_t>(sizeof(int64_t));
  fwrite(&kMagic, sizeof(kMagic), 1, f);
  int64_t n64 = n;
  fwrite(&n64, sizeof(n64), 1, f);
  // placeholder offsets
  long off_pos = ftell(f);
  fwrite(offsets.data(), sizeof(int64_t), n + 1, f);
  int64_t cur = header;
  for (int i = 0; i < n; ++i) {
    offsets[i] = cur;
    std::vector<uint8_t> buf;
    if (!read_file(paths[i], &buf)) {
      fclose(f);
      return -2;
    }
    fwrite(buf.data(), 1, buf.size(), f);
    cur += static_cast<int64_t>(buf.size());
  }
  offsets[n] = cur;
  fseek(f, off_pos, SEEK_SET);
  fwrite(offsets.data(), sizeof(int64_t), n + 1, f);
  fclose(f);
  return 0;
}

int cfn_pack_num_frames(const char* pack_path) {
  FILE* f = fopen(pack_path, "rb");
  if (!f) return -1;
  int64_t magic = 0, n = 0;
  if (fread(&magic, sizeof(magic), 1, f) != 1 || magic != kMagic) {
    fclose(f);
    return -2;
  }
  if (fread(&n, sizeof(n), 1, f) != 1) {
    fclose(f);
    return -3;
  }
  fclose(f);
  return static_cast<int>(n);
}

static int decode_packed_impl(const char* pack_path, const int* indices,
                              int n_idx, int out_size, uint8_t* out,
                              int* status, int num_threads, int crop_mode,
                              double scale, double tl_x, double tl_y) {
  int fd = open(pack_path, O_RDONLY);
  if (fd < 0) return -1;
  int64_t magic = 0, n = 0;
  if (pread(fd, &magic, sizeof(magic), 0) != sizeof(magic) || magic != kMagic) {
    close(fd);
    return -2;
  }
  pread(fd, &n, sizeof(n), sizeof(int64_t));
  std::vector<int64_t> offsets(n + 1);
  pread(fd, offsets.data(), sizeof(int64_t) * (n + 1), 2 * sizeof(int64_t));

  // read all requested frames' bytes first (sequential-ish IO), then decode
  // in the thread pool
  std::vector<std::vector<uint8_t>> blobs(n_idx);
  for (int i = 0; i < n_idx; ++i) {
    int idx = indices[i];
    if (idx < 0 || idx >= n) {
      close(fd);
      return -3;
    }
    size_t sz = offsets[idx + 1] - offsets[idx];
    blobs[i].resize(sz);
    if (pread(fd, blobs[i].data(), sz, offsets[idx]) !=
        static_cast<ssize_t>(sz)) {
      close(fd);
      return -4;
    }
  }
  close(fd);

  std::vector<DecodeTask> tasks(n_idx);
  size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  for (int i = 0; i < n_idx; ++i) {
    tasks[i] = DecodeTask{nullptr,  blobs[i].data(), blobs[i].size(),
                          out + i * stride, out_size, &status[i],
                          crop_mode, scale, tl_x, tl_y};
  }
  run_pool(&tasks, num_threads);
  int failures = 0;
  for (int i = 0; i < n_idx; ++i)
    if (status[i] != 0) ++failures;
  return failures;
}

// Decode frames [indices] (0-based) from a pack, centre-crop-scaled to
// out_size.  Returns failure count, or <0 on container error.
int cfn_decode_packed(const char* pack_path, const int* indices, int n_idx,
                      int out_size, uint8_t* out, int* status,
                      int num_threads) {
  return decode_packed_impl(pack_path, indices, n_idx, out_size, out, status,
                            num_threads, 0, 1.0, 0.0, 0.0);
}

// Packed-container train-path decode with the random scale+position crop.
int cfn_decode_packed_rc(const char* pack_path, const int* indices, int n_idx,
                         int out_size, double scale, double tl_x, double tl_y,
                         uint8_t* out, int* status, int num_threads) {
  return decode_packed_impl(pack_path, indices, n_idx, out_size, out, status,
                            num_threads, 1, scale, tl_x, tl_y);
}

}  // extern "C"
