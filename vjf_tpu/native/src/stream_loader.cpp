// Native streaming data loader for online filtering.
//
// The reference has no IO path at all (data arrives as an in-memory torch
// tensor); a production online filter consumes an unbounded stream. This
// loader decouples disk/FIFO ingest from the TPU step loop with a
// single-producer single-consumer ring buffer and a reader thread, so host
// IO overlaps device compute (the Python side adds device-put
// double-buffering on top).
//
// C ABI (ctypes-friendly), no dependencies beyond pthread:
//   vjf_stream_open(path, step_bytes, capacity_steps) -> handle (or -1)
//   vjf_stream_read(handle, dst, n_steps) -> steps copied (0 on EOF+drained)
//   vjf_stream_close(handle)
//
// Build: make -C vjf_tpu/native  (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct RingStream {
  std::vector<uint8_t> buf;
  size_t step_bytes = 0;
  size_t capacity = 0;          // in steps
  size_t head = 0;              // producer position (steps, monotonically inc)
  size_t tail = 0;              // consumer position
  std::mutex mu;
  std::condition_variable cv_nonfull;
  std::condition_variable cv_nonempty;
  std::atomic<bool> eof{false};
  std::atomic<bool> closed{false};
  std::thread reader;
  FILE* fp = nullptr;

  ~RingStream() { stop(); }

  void stop() {
    closed.store(true);
    cv_nonfull.notify_all();
    cv_nonempty.notify_all();
    if (reader.joinable()) reader.join();
    if (fp) {
      fclose(fp);
      fp = nullptr;
    }
  }

  void reader_loop() {
    std::vector<uint8_t> step(step_bytes);
    while (!closed.load()) {
      size_t got = fread(step.data(), 1, step_bytes, fp);
      if (got < step_bytes) {  // EOF or short read: stop producing
        eof.store(true);
        cv_nonempty.notify_all();
        return;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_nonfull.wait(lk, [&] { return closed.load() || head - tail < capacity; });
      if (closed.load()) return;
      size_t slot = head % capacity;
      memcpy(buf.data() + slot * step_bytes, step.data(), step_bytes);
      ++head;
      lk.unlock();
      cv_nonempty.notify_one();
    }
  }

  // Copy up to n steps into dst; blocks until at least 1 step or EOF.
  size_t read(uint8_t* dst, size_t n) {
    size_t copied = 0;
    while (copied < n) {
      std::unique_lock<std::mutex> lk(mu);
      cv_nonempty.wait(lk, [&] {
        return closed.load() || eof.load() || head > tail;
      });
      if (closed.load()) break;
      if (head == tail) {  // drained
        if (eof.load()) break;
        continue;
      }
      while (copied < n && head > tail) {
        size_t slot = tail % capacity;
        memcpy(dst + copied * step_bytes, buf.data() + slot * step_bytes,
               step_bytes);
        ++tail;
        ++copied;
      }
      lk.unlock();
      cv_nonfull.notify_one();
    }
    return copied;
  }
};

std::mutex g_mu;
std::map<int64_t, RingStream*> g_streams;
int64_t g_next = 1;

}  // namespace

extern "C" {

int64_t vjf_stream_open(const char* path, int64_t step_bytes,
                        int64_t capacity_steps) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return -1;
  auto* s = new RingStream();
  s->fp = fp;
  s->step_bytes = static_cast<size_t>(step_bytes);
  s->capacity = static_cast<size_t>(capacity_steps);
  s->buf.resize(s->step_bytes * s->capacity);
  s->reader = std::thread([s] { s->reader_loop(); });
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t h = g_next++;
  g_streams[h] = s;
  return h;
}

int64_t vjf_stream_read(int64_t handle, uint8_t* dst, int64_t n_steps) {
  RingStream* s;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_streams.find(handle);
    if (it == g_streams.end()) return -1;
    s = it->second;
  }
  return static_cast<int64_t>(s->read(dst, static_cast<size_t>(n_steps)));
}

void vjf_stream_close(int64_t handle) {
  RingStream* s = nullptr;
  {
    std::lock_guard<std::mutex> lk(g_mu);
    auto it = g_streams.find(handle);
    if (it == g_streams.end()) return;
    s = it->second;
    g_streams.erase(it);
  }
  delete s;  // ~RingStream stops thread + closes file
}

}  // extern "C"
