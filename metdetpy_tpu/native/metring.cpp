// Native host runtime for MetDetPy-TPU: shared frame ring buffer and
// uint8 merge kernels.
//
// Role parity: the reference stages decoded frames through Python queues
// and a multiprocessing RawArray ring (reference MetLib/videoloader.py:
// 497-631, :634-793). This C++ ring removes the Python-object overhead
// from the decode -> block-assembly path: the producer (decode thread)
// writes frames into fixed slots, the consumer assembles [T, H, W] blocks
// for one device_put each; max-merge across exposure frames runs here too
// (autovectorized), so the hot loop never copies through Python objects.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <new>
#include <vector>

namespace {

struct Ring {
  std::vector<uint8_t> data;   // n_slots * slot_bytes
  size_t slot_bytes;
  size_t n_slots;
  std::atomic<uint64_t> head;  // next slot to write
  std::atomic<uint64_t> tail;  // next slot to read
  std::atomic<bool> closed;
  std::mutex mu;
  std::condition_variable cv_put;
  std::condition_variable cv_get;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// Ring buffer
// ---------------------------------------------------------------------

void* metring_create(size_t n_slots, size_t slot_bytes) {
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->slot_bytes = slot_bytes;
  r->n_slots = n_slots;
  r->head.store(0);
  r->tail.store(0);
  r->closed.store(false);
  try {
    r->data.resize(n_slots * slot_bytes);
  } catch (...) {
    delete r;
    return nullptr;
  }
  return r;
}

void metring_destroy(void* handle) { delete static_cast<Ring*>(handle); }

void metring_close(void* handle) {
  Ring* r = static_cast<Ring*>(handle);
  {
    std::lock_guard<std::mutex> lk(r->mu);
    r->closed.store(true);
  }
  r->cv_put.notify_all();
  r->cv_get.notify_all();
}

// Blocking write of one slot. Returns 0 on success, -1 if closed/timeout.
int metring_put(void* handle, const uint8_t* src, int timeout_ms) {
  Ring* r = static_cast<Ring*>(handle);
  std::unique_lock<std::mutex> lk(r->mu);
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::milliseconds(timeout_ms);
  while (r->head.load() - r->tail.load() >= r->n_slots) {
    if (r->closed.load()) return -1;
    if (r->cv_put.wait_until(lk, deadline) == std::cv_status::timeout)
      return -1;
  }
  uint64_t h = r->head.load();
  std::memcpy(r->data.data() + (h % r->n_slots) * r->slot_bytes, src,
              r->slot_bytes);
  r->head.store(h + 1);
  lk.unlock();
  r->cv_get.notify_one();
  return 0;
}

// Blocking read of one slot into dst. Returns 0 on success, -1 on
// closed-and-empty or timeout.
int metring_get(void* handle, uint8_t* dst, int timeout_ms) {
  Ring* r = static_cast<Ring*>(handle);
  std::unique_lock<std::mutex> lk(r->mu);
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::milliseconds(timeout_ms);
  while (r->tail.load() >= r->head.load()) {
    if (r->closed.load()) return -1;
    if (r->cv_get.wait_until(lk, deadline) == std::cv_status::timeout)
      return -1;
  }
  uint64_t t = r->tail.load();
  std::memcpy(dst, r->data.data() + (t % r->n_slots) * r->slot_bytes,
              r->slot_bytes);
  r->tail.store(t + 1);
  lk.unlock();
  r->cv_put.notify_one();
  return 0;
}

size_t metring_size(void* handle) {
  Ring* r = static_cast<Ring*>(handle);
  return static_cast<size_t>(r->head.load() - r->tail.load());
}

// ---------------------------------------------------------------------
// uint8 kernels (autovectorized)
// ---------------------------------------------------------------------

// dst = max(dst, src) elementwise.
void metring_u8_max_inplace(uint8_t* dst, const uint8_t* src, size_t n) {
  for (size_t i = 0; i < n; ++i) dst[i] = dst[i] > src[i] ? dst[i] : src[i];
}

// out[j] = max over t of frames[t*stride + j], for t in [0, t_count).
void metring_u8_block_max(const uint8_t* frames, size_t t_count,
                          size_t stride, uint8_t* out) {
  std::memcpy(out, frames, stride);
  for (size_t t = 1; t < t_count; ++t) {
    const uint8_t* f = frames + t * stride;
    for (size_t j = 0; j < stride; ++j)
      out[j] = out[j] > f[j] ? out[j] : f[j];
  }
}

// BT.601 BGR -> gray, rounding like cv2 (y = 0.299R + 0.587G + 0.114B).
// Uses the same fixed-point weights as OpenCV (14-bit).
void metring_bgr2gray(const uint8_t* bgr, size_t n_pixels, uint8_t* gray) {
  constexpr uint32_t kB = 1868, kG = 9617, kR = 4899;  // 0.114/0.587/0.299
  constexpr uint32_t kHalf = 1 << 13;
  for (size_t i = 0; i < n_pixels; ++i) {
    const uint8_t* p = bgr + 3 * i;
    gray[i] = static_cast<uint8_t>(
        (kB * p[0] + kG * p[1] + kR * p[2] + kHalf) >> 14);
  }
}

// ---------------------------------------------------------------------
// Bilinear u8 grayscale resize, bit-exact with cv2 INTER_LINEAR
// ---------------------------------------------------------------------
//
// Replicates OpenCV's fixed-point bilinear path for 8u (imgproc
// resize.cpp): 11-bit coefficients (INTER_RESIZE_COEF_SCALE = 2048),
// horizontal pass accumulating int rows, vertical combine
//   dst = uchar((((b0*(r0>>4)) >> 16) + ((b1*(r1>>4)) >> 16) + 2) >> 2)
// with the same src-coordinate mapping and border clamping. Exactness is
// asserted against cv2 in tests/test_native_resize.py.

namespace {

struct ResizePlan {
  std::vector<int> xofs;       // src column index per dst column
  std::vector<short> xcoef;    // 2 coefficients per dst column
  std::vector<int> yofs;       // src row index per dst row
  std::vector<short> ycoef;    // 2 coefficients per dst row
};

inline short sat_short(float v) {
  // cv::saturate_cast<short>(float) = cvRound = round-half-to-EVEN
  long iv = std::lrintf(v);  // FE_TONEAREST (ties to even), like cvRound
  if (iv < -32768) return -32768;
  if (iv > 32767) return 32767;
  return static_cast<short>(iv);
}

void build_axis(int ssize, int dsize, std::vector<int>& ofs,
                std::vector<short>& coef) {
  ofs.resize(dsize);
  coef.resize(2 * dsize);
  const double scale = static_cast<double>(ssize) / dsize;
  for (int d = 0; d < dsize; ++d) {
    float f = static_cast<float>((d + 0.5) * scale - 0.5);
    int s = static_cast<int>(std::floor(f));
    f -= s;
    // OpenCV border clamp (resize.cpp): the LAST source column carries
    // full weight, fx forced to 0 (not sx=ssize-2 with fx=1)
    if (s < 0) { s = 0; f = 0.f; }
    if (s >= ssize - 1) { s = ssize - 1; f = 0.f; }
    ofs[d] = s;
    coef[2 * d] = sat_short((1.f - f) * 2048.f);
    coef[2 * d + 1] = sat_short(f * 2048.f);
  }
}

}  // namespace

// Resize one u8 gray image src[sh, sw] -> dst[dh, dw], cv2-INTER_LINEAR
// bit-exact.
void metring_resize_linear_u8(const uint8_t* src, int sh, int sw,
                              uint8_t* dst, int dh, int dw) {
  ResizePlan p;
  build_axis(sw, dw, p.xofs, p.xcoef);
  build_axis(sh, dh, p.yofs, p.ycoef);
  std::vector<int> row0(dw), row1(dw);
  int cached_sy0 = -1, cached_sy1 = -1;
  for (int dy = 0; dy < dh; ++dy) {
    const int sy = p.yofs[dy];
    const int b0 = p.ycoef[2 * dy], b1 = p.ycoef[2 * dy + 1];
    const int sy1 = (sy + 1 < sh) ? sy + 1 : sh - 1;
    // horizontal pass for the two source rows (reuse across dst rows)
    auto hresize = [&](int srow, std::vector<int>& out) {
      const uint8_t* s = src + static_cast<size_t>(srow) * sw;
      for (int dx = 0; dx < dw; ++dx) {
        const int sx = p.xofs[dx];
        const int sx1 = (sx + 1 < sw) ? sx + 1 : sw - 1;
        out[dx] = s[sx] * p.xcoef[2 * dx] + s[sx1] * p.xcoef[2 * dx + 1];
      }
    };
    if (sy == cached_sy1) {
      row0.swap(row1);
      cached_sy0 = sy;
      cached_sy1 = -1;
    }
    if (cached_sy0 != sy) { hresize(sy, row0); cached_sy0 = sy; }
    if (cached_sy1 != sy1) { hresize(sy1, row1); cached_sy1 = sy1; }
    uint8_t* d = dst + static_cast<size_t>(dy) * dw;
    for (int dx = 0; dx < dw; ++dx) {
      d[dx] = static_cast<uint8_t>(
          (((b0 * (row0[dx] >> 4)) >> 16) +
           ((b1 * (row1[dx] >> 4)) >> 16) + 2) >> 2);
    }
  }
}

// Batched GIL-free block assembly: resize+assemble n gray frames into
// consecutive slots of a [*, dh, dw] u8 block, max-merging every
// exp_frame inputs into one slot. srcs: array of n frame pointers (each
// [sh, sw] u8 contiguous); writes n/exp_frame slots starting at
// dst_block. Called once per decode chunk with the GIL released
// (ctypes), so the Python interpreter never blocks on per-frame work.
void metring_resize_assemble_u8(const uint8_t** srcs, int n, int sh, int sw,
                                uint8_t* dst_block, int dh, int dw,
                                int exp_frame, uint8_t* scratch) {
  const size_t slot = static_cast<size_t>(dh) * dw;
  int out_idx = 0;
  for (int i = 0; i < n; ++i) {
    const int in_group = i % exp_frame;
    uint8_t* target = dst_block + static_cast<size_t>(out_idx) * slot;
    if (in_group == 0) {
      metring_resize_linear_u8(srcs[i], sh, sw, target, dh, dw);
    } else {
      metring_resize_linear_u8(srcs[i], sh, sw, scratch, dh, dw);
      metring_u8_max_inplace(target, scratch, slot);
    }
    if (in_group == exp_frame - 1) ++out_idx;
  }
}

}  // extern "C"
