// Native data-IO: threaded JPEG batch decode + resize into a collated
// NHWC float32 batch buffer.
//
// TPU-native equivalent of the reference's C++ data path (torch DataLoader
// worker processes + cv2 decode; reference tools/scripts.py uses
// DataLoader(num_workers=...)). Instead of per-image Python round-trips,
// one call decodes a whole batch with a std::thread pool and writes
// directly into the final collated buffer the host->device transfer reads
// from, eliminating per-sample numpy allocation + copy.
//
// Fast path: libjpeg DCT scaling (decode at 1/1, 1/2, 1/4, 1/8 of native
// resolution) picks the smallest scale >= the resize target before IDCT,
// so a 4000x3000 photo headed for 224x224 is decoded at 500x375, ~8x
// cheaper than a full decode. Bilinear resize + optional mean/std
// normalize happen in the same pass.
//
// C ABI (ctypes; see simpleaicv_tpu/data/native_io.py):
//   nio_decode_resize_f32(buf, len, out, H, W, pad_value) -> 0 ok
//   nio_batch_decode_files(paths, n, out, H, W, n_threads, mode) -> #ok
//   nio_version() -> int

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG byte buffer to RGB u8, DCT-scaled so that
// min(h, w) >= target (when possible). Returns true on success.
bool decode_jpeg(const uint8_t* data, size_t len, int target_h, int target_w,
                 std::vector<uint8_t>* pixels, int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  // Pick the largest DCT downscale (1/2^k, k<=3) that keeps both dims
  // at or above the resize target: cheap IDCT-domain decimation.
  int num = 8;
  while (num > 1) {
    int next = num / 2;
    if ((int)cinfo.image_height * next / 8 >= target_h &&
        (int)cinfo.image_width * next / 8 >= target_w) {
      num = next;
    } else {
      break;
    }
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  cinfo.dct_method = JDCT_ISLOW;
  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height, w = cinfo.output_width;
  const int ch = cinfo.output_components;  // 3 after JCS_RGB
  if (ch != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  pixels->resize((size_t)h * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return true;
}

// Bilinear resize RGB u8 -> f32 HWC [0,255]. letterbox=1: aspect-preserving
// scale-to-fit with bottom/right pad_value (the reference detection
// YoloStyleResize semantics). letterbox=0: plain stretch to (H, W) (the
// reference classification Resize, simpleAICV/classification/common.py:543
// cv2.resize to a square).
void resize_f32(const uint8_t* src, int sh, int sw, float* dst, int H, int W,
                float pad_value, int letterbox) {
  int rh = H, rw = W;
  if (letterbox) {
    const float scale = std::min((float)H / sh, (float)W / sw);
    rh = std::max(1, (int)std::round(sh * scale));
    rw = std::max(1, (int)std::round(sw * scale));
  }
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      float* px = dst + ((size_t)y * W + x) * 3;
      if (y >= rh || x >= rw) {
        px[0] = px[1] = px[2] = pad_value;
        continue;
      }
      // align-corners=false bilinear sample of the source
      float fy = ((y + 0.5f) / rh) * sh - 0.5f;
      float fx = ((x + 0.5f) / rw) * sw - 0.5f;
      fy = std::max(0.0f, std::min(fy, (float)sh - 1));
      fx = std::max(0.0f, std::min(fx, (float)sw - 1));
      const int y0 = (int)fy, x0 = (int)fx;
      const int y1 = std::min(y0 + 1, sh - 1), x1 = std::min(x0 + 1, sw - 1);
      const float wy = fy - y0, wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float v00 = src[((size_t)y0 * sw + x0) * 3 + c];
        const float v01 = src[((size_t)y0 * sw + x1) * 3 + c];
        const float v10 = src[((size_t)y1 * sw + x0) * 3 + c];
        const float v11 = src[((size_t)y1 * sw + x1) * 3 + c];
        px[c] = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                wy * ((1 - wx) * v10 + wx * v11);
      }
    }
  }
}

// Bilinear resize RGB u8 -> u8 HWC (rounded), same sampling/letterbox
// semantics as resize_f32. Used by the packed-cache writer: records store
// the uint8 lattice the device-augmentation transport ships.
void resize_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int H, int W,
               float pad_value, int letterbox) {
  int rh = H, rw = W;
  if (letterbox) {
    const float scale = std::min((float)H / sh, (float)W / sw);
    rh = std::max(1, (int)std::round(sh * scale));
    rw = std::max(1, (int)std::round(sw * scale));
  }
  const uint8_t pad =
      (uint8_t)std::max(0.0f, std::min(255.0f, std::round(pad_value)));
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      uint8_t* px = dst + ((size_t)y * W + x) * 3;
      if (y >= rh || x >= rw) {
        px[0] = px[1] = px[2] = pad;
        continue;
      }
      float fy = ((y + 0.5f) / rh) * sh - 0.5f;
      float fx = ((x + 0.5f) / rw) * sw - 0.5f;
      fy = std::max(0.0f, std::min(fy, (float)sh - 1));
      fx = std::max(0.0f, std::min(fx, (float)sw - 1));
      const int y0 = (int)fy, x0 = (int)fx;
      const int y1 = std::min(y0 + 1, sh - 1), x1 = std::min(x0 + 1, sw - 1);
      const float wy = fy - y0, wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        const float v00 = src[((size_t)y0 * sw + x0) * 3 + c];
        const float v01 = src[((size_t)y0 * sw + x1) * 3 + c];
        const float v10 = src[((size_t)y1 * sw + x0) * 3 + c];
        const float v11 = src[((size_t)y1 * sw + x1) * 3 + c];
        const float v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                        wy * ((1 - wx) * v10 + wx * v11);
        px[c] = (uint8_t)std::max(0.0f, std::min(255.0f, std::round(v)));
      }
    }
  }
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize((size_t)n);
  size_t got = std::fread(out->data(), 1, (size_t)n, f);
  std::fclose(f);
  return got == (size_t)n;
}

}  // namespace

extern "C" {

int nio_version() { return 2; }

// Decode one JPEG buffer into out[H*W*3] f32 (letterboxed, [0,255]).
int nio_decode_resize_f32(const uint8_t* data, long len, float* out, int H,
                          int W, float pad_value, int letterbox) {
  std::vector<uint8_t> pixels;
  int sh = 0, sw = 0;
  if (!decode_jpeg(data, (size_t)len, H, W, &pixels, &sh, &sw)) return -1;
  resize_f32(pixels.data(), sh, sw, out, H, W, pad_value, letterbox);
  return 0;
}

// Decode n files into out[n, H, W, 3] f32 with a thread pool.
// Failed items are filled with pad_value; returns the number decoded ok.
int nio_batch_decode_files(const char* const* paths, int n, float* out, int H,
                           int W, int n_threads, float pad_value,
                           int letterbox) {
  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    std::vector<uint8_t> filebuf, pixels;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + (size_t)i * H * W * 3;
      int sh = 0, sw = 0;
      if (read_file(paths[i], &filebuf) &&
          decode_jpeg(filebuf.data(), filebuf.size(), H, W, &pixels, &sh,
                      &sw)) {
        resize_f32(pixels.data(), sh, sw, dst, H, W, pad_value, letterbox);
        ok.fetch_add(1);
      } else {
        std::fill(dst, dst + (size_t)H * W * 3, pad_value);
      }
    }
  };
  const int t = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

// Decode one JPEG buffer into out[H*W*3] u8 (letterboxed). Packed-cache
// writer path (tools/prepare_dataset.py pack): records store uint8.
int nio_decode_resize_u8(const uint8_t* data, long len, uint8_t* out, int H,
                         int W, float pad_value, int letterbox) {
  std::vector<uint8_t> pixels;
  int sh = 0, sw = 0;
  if (!decode_jpeg(data, (size_t)len, H, W, &pixels, &sh, &sw)) return -1;
  resize_u8(pixels.data(), sh, sw, out, H, W, pad_value, letterbox);
  return 0;
}

// Decode n files into out[n, H, W, 3] u8 with a thread pool.
int nio_batch_decode_files_u8(const char* const* paths, int n, uint8_t* out,
                              int H, int W, int n_threads, float pad_value,
                              int letterbox) {
  std::atomic<int> next(0), ok(0);
  const uint8_t pad =
      (uint8_t)std::max(0.0f, std::min(255.0f, std::round(pad_value)));
  auto worker = [&]() {
    std::vector<uint8_t> filebuf, pixels;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + (size_t)i * H * W * 3;
      int sh = 0, sw = 0;
      if (read_file(paths[i], &filebuf) &&
          decode_jpeg(filebuf.data(), filebuf.size(), H, W, &pixels, &sh,
                      &sw)) {
        resize_u8(pixels.data(), sh, sw, dst, H, W, pad_value, letterbox);
        ok.fetch_add(1);
      } else {
        std::fill(dst, dst + (size_t)H * W * 3, pad);
      }
    }
  };
  const int t = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok.load();
}

// Gather n fixed-stride records (record_bytes each) from a base pointer
// (typically an mmap'd packed-cache region) into a contiguous out buffer.
// The memcpy loop runs in C with the GIL released (ctypes), so a Python
// prefetch thread can collate the next batch while the main thread
// dispatches device work. Threaded: page-fault latency on cold (disk)
// reads overlaps across workers.
int nio_gather_records(const uint8_t* base, long record_bytes,
                       const long* indices, int n, uint8_t* out,
                       int n_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      std::memcpy(out + (size_t)i * record_bytes,
                  base + (size_t)indices[i] * record_bytes,
                  (size_t)record_bytes);
    }
  };
  const int t = std::max(1, std::min(n_threads, n));
  if (t == 1) {
    worker();
    return n;
  }
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return n;
}

}  // extern "C"
