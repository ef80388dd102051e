// Native token-store runtime: index construction + multithreaded batch gather.
//
// The reference delegates its data hot path to torch DataLoader worker
// processes (train.py:447, SURVEY.md §3.1); this is the TPU-native framework's
// C++ equivalent: the sliding-window index build, the greedy overlap filter
// (reference data.py:62-87 — O(N·W) Python there), and the batched
// memmap->int32 window gather that feeds device_put, all in native code with
// a thread pool. Exposed via a C ABI consumed through ctypes
// (tpu1x/data/native.py).
//
// Build: make -C native   (produces libtoken_store.so)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Windows whose endpoints have different segment ids are dropped
// (reference data.py:66-71). Returns the number of valid starts written.
int64_t build_window_index(const int32_t* segment_ids,  // may be null
                           int64_t num_frames, int64_t video_len,
                           int64_t* out_starts) {
  int64_t n = 0;
  const int64_t limit = num_frames - video_len;
  if (segment_ids == nullptr) {
    for (int64_t s = 0; s < limit; ++s) out_starts[n++] = s;
    return n;
  }
  for (int64_t s = 0; s < limit; ++s) {
    if (segment_ids[s] == segment_ids[s + video_len]) out_starts[n++] = s;
  }
  return n;
}

// Greedy overlap filter: keep a window iff none of the windows that would
// share a frame with it was already kept (reference data.py:73-87).
// `starts` must be ascending. Returns number of kept starts.
int64_t filter_overlaps(const int64_t* starts, int64_t n, int64_t window_size,
                        int64_t stride, int64_t num_frames,
                        int64_t* out_starts) {
  std::vector<uint8_t> kept(num_frames, 0);
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t s = starts[i];
    bool conflict = false;
    for (int64_t j = 1; j < window_size; ++j) {
      const int64_t prev = s - j * stride;
      if (prev < 0) break;
      if (kept[prev]) {
        conflict = true;
        break;
      }
    }
    if (!conflict) {
      kept[s] = 1;
      out_starts[m++] = s;
    }
  }
  return m;
}

// Gather B windows of T strided frames (H*W tokens each) from the raw
// token file mapping into an int32 batch buffer, parallelized over windows.
// token_dtype_size: 2 (uint16) or 4 (uint32).
void gather_windows(const void* data, int64_t frame_elems, int64_t stride,
                    int64_t T, const int64_t* starts, int64_t B,
                    int32_t token_dtype_size, int32_t num_threads,
                    int32_t* out) {
  if (num_threads <= 0) num_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t b = next.fetch_add(1);
      if (b >= B) return;
      int32_t* dst = out + b * T * frame_elems;
      for (int64_t t = 0; t < T; ++t) {
        const int64_t frame = starts[b] + t * stride;
        if (token_dtype_size == 4) {
          const uint32_t* src =
              static_cast<const uint32_t*>(data) + frame * frame_elems;
          for (int64_t i = 0; i < frame_elems; ++i)
            dst[t * frame_elems + i] = static_cast<int32_t>(src[i]);
        } else {
          const uint16_t* src =
              static_cast<const uint16_t*>(data) + frame * frame_elems;
          for (int64_t i = 0; i < frame_elems; ++i)
            dst[t * frame_elems + i] = static_cast<int32_t>(src[i]);
        }
      }
    }
  };
  std::vector<std::thread> threads;
  const int32_t nt = std::min<int64_t>(num_threads, B);
  threads.reserve(nt);
  for (int32_t i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
