// ticjpeg: native JPEG decode + resize for the host input pipeline.
//
// The reference's input hot loop is PIL decode + torchvision transforms in
// DataLoader worker processes (SURVEY §3.1). This library is the TPU build's
// native replacement for the decode half: libjpeg with DCT-domain scaling
// (decode at the smallest 1/8..8/8 scale >= target, like PIL's draft mode)
// followed by a box-filtered bilinear resize to the fixed canvas, plus a
// pthread pool batch API so one call fills a whole uint8 batch.
//
// Exposed C ABI (consumed via ctypes from
// touhouimageclassification_tpu/data/native_loader.py):
//   tic_decode_file(path, out_h, out_w, out)        -> 0 on success
//   tic_decode_batch(paths, n, out_h, out_w, out, nthreads) -> #failures
//
// Build: g++ -O3 -march=native -shared -fPIC -o libticjpeg.so ticjpeg.cpp
//        -ljpeg -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cstdlib>
#include <vector>
#include <thread>
#include <atomic>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Antialiased separable triangle-filter resize (PIL BILINEAR semantics:
// kernel support widens to the scale factor on downsampling). Weights are
// precomputed per output coordinate, rows renormalized at the edges.
struct FilterTaps {
  std::vector<int> start;    // first source index per output index
  std::vector<int> count;    // taps per output index
  std::vector<float> weight; // flattened taps, max_taps stride
  int max_taps;
};

FilterTaps build_taps(int src_size, int dst_size) {
  FilterTaps t;
  const float scale = static_cast<float>(src_size) / dst_size;
  const float support = scale > 1.0f ? scale : 1.0f;
  t.max_taps = static_cast<int>(2 * support + 2);
  t.start.resize(dst_size);
  t.count.resize(dst_size);
  t.weight.assign(static_cast<size_t>(dst_size) * t.max_taps, 0.0f);
  for (int o = 0; o < dst_size; ++o) {
    const float center = (o + 0.5f) * scale - 0.5f;
    int lo = static_cast<int>(center - support) ;
    if (lo < 0) lo = 0;
    int hi = static_cast<int>(center + support) + 1;
    if (hi > src_size - 1) hi = src_size - 1;
    float total = 0.0f;
    int cnt = 0;
    for (int i = lo; i <= hi && cnt < t.max_taps; ++i, ++cnt) {
      float d = (i - center) / support;
      float w = 1.0f - (d < 0 ? -d : d);
      if (w < 0) w = 0;
      t.weight[static_cast<size_t>(o) * t.max_taps + cnt] = w;
      total += w;
    }
    t.start[o] = lo;
    t.count[o] = cnt;
    if (total > 0) {
      for (int k = 0; k < cnt; ++k)
        t.weight[static_cast<size_t>(o) * t.max_taps + k] /= total;
    }
  }
  return t;
}

void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  FilterTaps tx = build_taps(sw, dw);
  FilterTaps ty = build_taps(sh, dh);
  // horizontal pass: (sh, sw, 3) -> (sh, dw, 3) in float
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    float* out = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0, 0, 0};
      const int s = tx.start[x];
      const float* w = &tx.weight[static_cast<size_t>(x) * tx.max_taps];
      for (int k = 0; k < tx.count[x]; ++k) {
        const uint8_t* p = row + (s + k) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      out[x * 3] = acc[0];
      out[x * 3 + 1] = acc[1];
      out[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass: (sh, dw, 3) -> (dh, dw, 3)
  for (int y = 0; y < dh; ++y) {
    uint8_t* out = dst + static_cast<size_t>(y) * dw * 3;
    const int s = ty.start[y];
    const float* w = &ty.weight[static_cast<size_t>(y) * ty.max_taps];
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < ty.count[y]; ++k) {
        acc += w[k] * tmp[static_cast<size_t>(s + k) * dw * 3 + x];
      }
      float v = acc + 0.5f;
      out[x] = v <= 0 ? 0 : (v >= 255 ? 255 : static_cast<uint8_t>(v));
    }
  }
}

int decode_buffer(const uint8_t* data, size_t len, int out_h, int out_w,
                  uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  // Constructed BEFORE setjmp: after a longjmp out of jpeg_read_scanlines the
  // early-return path still runs these destructors, so corrupt JPEGs can't
  // leak the decode buffers in a long-running training loader.
  std::vector<uint8_t> decoded;
  std::vector<uint8_t> row;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain downscale: smallest power-of-two num/8 scale (1/8, 2/8,
  // 4/8, 8/8) whose output still covers the target — exactly PIL's
  // draft-mode scale set, so the subsequent triangle resize sees the same
  // source resolution as the PIL path.
  unsigned int best_num = 8;
  for (unsigned int num : {1u, 2u, 4u, 8u}) {
    unsigned long sh = (cinfo.image_height * num + 7) / 8;
    unsigned long sw = (cinfo.image_width * num + 7) / 8;
    if (sh >= static_cast<unsigned long>(out_h) &&
        sw >= static_cast<unsigned long>(out_w)) {
      best_num = num;
      break;
    }
  }
  cinfo.scale_num = best_num;
  cinfo.scale_denom = 8;
  // ISLOW + fancy upsampling: the perf ledger measured IFAST at ZERO
  // throughput gain on this corpus (entropy decode dominates), so keep the
  // highest-fidelity settings — with the canvas cache, whatever is decoded
  // here is baked permanently into training pixels.
  cinfo.dct_method = JDCT_ISLOW;
  cinfo.do_fancy_upsampling = TRUE;
  jpeg_start_decompress(&cinfo);

  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  const int comps = cinfo.output_components;
  decoded.resize(static_cast<size_t>(sw) * sh * 3);
  row.resize(static_cast<size_t>(sw) * comps);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < sh; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    uint8_t* dst = decoded.data() + static_cast<size_t>(y) * sw * 3;
    if (comps == 3) {
      memcpy(dst, row.data(), static_cast<size_t>(sw) * 3);
    } else if (comps == 1) {  // grayscale -> RGB
      for (int x = 0; x < sw; ++x) {
        dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = row[x];
      }
    } else {  // CMYK etc. unsupported
      jpeg_abort_decompress(&cinfo);
      jpeg_destroy_decompress(&cinfo);
      return 3;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  resize_bilinear(decoded.data(), sh, sw, out, out_h, out_w);
  return 0;
}

int decode_one_file(const char* path, int out_h, int out_w, uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 4;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return 5;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  size_t got = fread(buf.data(), 1, static_cast<size_t>(len), f);
  fclose(f);
  if (got != static_cast<size_t>(len)) return 6;
  return decode_buffer(buf.data(), buf.size(), out_h, out_w, out);
}

}  // namespace

extern "C" {

int tic_decode_file(const char* path, int out_h, int out_w, uint8_t* out) {
  return decode_one_file(path, out_h, out_w, out);
}

int tic_decode_mem(const uint8_t* data, long len, int out_h, int out_w,
                   uint8_t* out) {
  return decode_buffer(data, static_cast<size_t>(len), out_h, out_w, out);
}

// Decode n files into a contiguous (n, out_h, out_w, 3) uint8 buffer using
// nthreads workers. Returns the number of failures; failed slots are zeroed
// and, when `failed` is non-NULL, flagged 1 in failed[i] (an n-byte array) —
// callers need per-slot identity to retry or skip corrupt files rather than
// guessing from all-zero pixels (a legitimately black image is all-zero too).
int tic_decode_batch2(const char** paths, int n, int out_h, int out_w,
                      uint8_t* out, int nthreads, uint8_t* failed) {
  if (nthreads < 1) nthreads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* slot = out + stride * i;
      int rc = decode_one_file(paths[i], out_h, out_w, slot);
      if (failed) failed[i] = rc != 0;
      if (rc != 0) {
        memset(slot, 0, stride);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  int nt = nthreads < n ? nthreads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failures.load();
}

int tic_decode_batch(const char** paths, int n, int out_h, int out_w,
                     uint8_t* out, int nthreads) {
  return tic_decode_batch2(paths, n, out_h, out_w, out, nthreads, nullptr);
}

}  // extern "C"
