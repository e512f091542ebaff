// Threaded Velodyne .bin scan loader/writer.
//
// The offline datagen pipeline is host-IO bound between device steps: each
// batch needs `batch` scans read, padded to a fixed capacity, and the previous
// batch's outputs compacted and written. This pool overlaps that IO with TPU
// compute (the reference reads/writes serially on the main thread,
// precompute.py:78,106).
//
// C ABI for ctypes; jobs are identified by caller-provided slots.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Pool {
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> jobs;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int64_t> pending{0};
  std::condition_variable done_cv;
  std::mutex done_mu;
  bool stop = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      workers.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu);
            cv.wait(lk, [this] { return stop || !jobs.empty(); });
            if (stop && jobs.empty()) return;
            job = std::move(jobs.front());
            jobs.pop();
          }
          job();
          if (--pending == 0) {
            std::lock_guard<std::mutex> lk(done_mu);
            done_cv.notify_all();
          }
        }
      });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  void submit(std::function<void()> job) {
    ++pending;
    {
      std::lock_guard<std::mutex> lk(mu);
      jobs.push(std::move(job));
    }
    cv.notify_one();
  }

  void wait_all() {
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [this] { return pending.load() == 0; });
  }
};

}  // namespace

extern "C" {

void* scan_pool_create(int n_threads) { return new Pool(n_threads); }

void scan_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Read a float32 .bin scan of `cols` columns into out (capacity rows),
// zero-padding (x set to pad_x) beyond the scan length; writes the true row
// count to n_out (-1 on IO error). Asynchronous via the pool.
void scan_pool_load(void* pool, const char* path, float* out, int64_t* n_out,
                    int64_t capacity, int64_t cols, float pad_x) {
  std::string p(path);
  static_cast<Pool*>(pool)->submit([p, out, n_out, capacity, cols, pad_x] {
    FILE* f = std::fopen(p.c_str(), "rb");
    if (!f) {
      *n_out = -1;
      return;
    }
    const int64_t max_vals = capacity * cols;
    const int64_t got =
        static_cast<int64_t>(std::fread(out, sizeof(float), max_vals, f));
    std::fclose(f);
    const int64_t rows = got / cols;
    for (int64_t i = rows; i < capacity; ++i) {
      out[i * cols] = pad_x;
      std::memset(out + i * cols + 1, 0, (cols - 1) * sizeof(float));
    }
    *n_out = rows;
  });
}

// Compact rows where keep[i] != 0 and write them to path as float32.
// Writes the number of rows written to n_out (-1 on IO error).
void scan_pool_write_compact(void* pool, const char* path, const float* data,
                             const uint8_t* keep, int64_t rows, int64_t cols,
                             int64_t* n_out) {
  std::string p(path);
  static_cast<Pool*>(pool)->submit([p, data, keep, rows, cols, n_out] {
    std::vector<float> buf;
    buf.reserve(static_cast<size_t>(rows) * cols / 2);
    for (int64_t i = 0; i < rows; ++i) {
      if (!keep[i]) continue;
      buf.insert(buf.end(), data + i * cols, data + (i + 1) * cols);
    }
    FILE* f = std::fopen(p.c_str(), "wb");
    if (!f) {
      *n_out = -1;
      return;
    }
    std::fwrite(buf.data(), sizeof(float), buf.size(), f);
    std::fclose(f);
    *n_out = static_cast<int64_t>(buf.size()) / cols;
  });
}

void scan_pool_wait(void* pool) { static_cast<Pool*>(pool)->wait_all(); }

}  // extern "C"
