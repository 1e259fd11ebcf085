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

}  // extern "C"
