// vfd_host: native host-side data runtime for the TPU training pipeline.
//
// The reference delegates all host data work to Python + third-party
// binaries (SURVEY.md §2.2: "there are no native components").  This library
// provides the TPU-native framework's host runtime pieces in C++:
//
//   * clip window table  — the dataset's cumulative window arithmetic,
//     including the reference's off-by-one boundary behaviour
//     (lib/data.py:28-33,84-89), as a bulk native computation;
//   * batch packing      — multi-threaded gather of K decoded clip buffers
//     into one contiguous batch tensor (the hot np.stack in the loader),
//     with optional bitwise-not (mask prep, lib/data.py:104);
//   * a SPSC prefetch ring — slot-based single-producer/single-consumer
//     ring buffer used by the loader's decode thread to hand batches to
//     the training loop without Python-level locking.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Window table: for each dataset index, the (video, first_frame) pair.
// frames_per_video: n_videos entries; nfr: window length.
// out_video / out_first: n_total entries (n_total = sum(frames//nfr)).
// Returns n_total.
// ---------------------------------------------------------------------------
int64_t vfd_window_table(const int64_t* frames_per_video, int64_t n_videos,
                         int64_t nfr, int64_t* out_video,
                         int64_t* out_first) {
  std::vector<int64_t> cum(n_videos);
  int64_t total = 0;
  for (int64_t i = 0; i < n_videos; ++i) {
    total += frames_per_video[i] / nfr;
    cum[i] = total;
  }
  for (int64_t index = 0; index < total; ++index) {
    int64_t v = 0;
    while (cum[v] < index) ++v;  // first video with cum >= index
    const int64_t prev = v > 0 ? cum[v - 1] : 0;
    int64_t first = (index - prev - 1) * nfr;  // reference off-by-one
    if (first < 0) first = 0;                  // cv2 clamps negative seeks
    out_video[index] = v;
    out_first[index] = first;
  }
  return total;
}

// ---------------------------------------------------------------------------
// Batch packing: copy K equally-sized clip buffers into one contiguous
// batch, optionally inverting bytes (mask prep).  Parallel over clips.
// ---------------------------------------------------------------------------
void vfd_pack_clips(const uint8_t** clips, int64_t n_clips,
                    int64_t clip_bytes, uint8_t* out, int32_t invert,
                    int32_t n_threads) {
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      uint8_t* dst = out + i * clip_bytes;
      const uint8_t* src = clips[i];
      if (!invert) {
        std::memcpy(dst, src, static_cast<size_t>(clip_bytes));
      } else {
        for (int64_t b = 0; b < clip_bytes; ++b) dst[b] = ~src[b];
      }
    }
  };
  if (n_threads == 1 || n_clips == 1) {
    work(0, n_clips);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t per = (n_clips + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t b = t * per, e = std::min(n_clips, b + per);
    if (b >= e) break;
    pool.emplace_back(work, b, e);
  }
  for (auto& th : pool) th.join();
}

// ---------------------------------------------------------------------------
// SPSC prefetch ring: fixed slot count, slot state tracked with atomics.
// The producer claims a slot, fills the user-owned buffer, publishes; the
// consumer polls, consumes, releases.  Buffers themselves live in Python
// (numpy arrays) — the ring only sequences ownership.
// ---------------------------------------------------------------------------
struct VfdRing {
  std::vector<std::atomic<int32_t>> state;  // 0 empty, 1 full
  int64_t n_slots;
  std::atomic<int64_t> head{0};  // next slot producer fills
  std::atomic<int64_t> tail{0};  // next slot consumer reads
  explicit VfdRing(int64_t n) : state(n), n_slots(n) {
    for (auto& s : state) s.store(0);
  }
};

void* vfd_ring_create(int64_t n_slots) { return new VfdRing(n_slots); }

void vfd_ring_destroy(void* ring) { delete static_cast<VfdRing*>(ring); }

// Returns a claimed slot id, or -1 if the ring is full.
int64_t vfd_ring_acquire_produce(void* ring) {
  auto* r = static_cast<VfdRing*>(ring);
  const int64_t slot = r->head.load() % r->n_slots;
  if (r->state[slot].load(std::memory_order_acquire) != 0) return -1;
  return slot;
}

void vfd_ring_publish(void* ring, int64_t slot) {
  auto* r = static_cast<VfdRing*>(ring);
  r->state[slot].store(1, std::memory_order_release);
  r->head.fetch_add(1);
}

// Returns the next full slot id, or -1 if none ready.
int64_t vfd_ring_acquire_consume(void* ring) {
  auto* r = static_cast<VfdRing*>(ring);
  const int64_t slot = r->tail.load() % r->n_slots;
  if (r->state[slot].load(std::memory_order_acquire) != 1) return -1;
  return slot;
}

void vfd_ring_release(void* ring, int64_t slot) {
  auto* r = static_cast<VfdRing*>(ring);
  r->state[slot].store(0, std::memory_order_release);
  r->tail.fetch_add(1);
}

}  // extern "C"
