// Async file writer — TPU-host analogue of the reference's TensorNVMe
// AsyncFileWriter (behavioral reference: opensora/utils/ckpt.py:19,335-458,
// which funnels checkpoint bytes through a C++ background writer so the
// training loop never blocks on disk).
//
// Design: one writer owns one file descriptor and a background thread
// draining a bounded queue of (buffer, offset) chunks. submit() copies the
// caller's bytes (the training step may reuse/donate the source buffer
// immediately); flush() blocks until the queue drains and fsyncs.
//
// Build:  g++ -O2 -shared -fPIC -o libasync_writer.so async_writer.cpp -lpthread
// Python binding: ctypes (opensora_tpu/utils/native_io.py).

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct Chunk {
  std::vector<uint8_t> data;
  uint64_t offset;
};

class AsyncWriter {
 public:
  AsyncWriter(const char* path, uint64_t max_queue_bytes)
      : max_queue_bytes_(max_queue_bytes ? max_queue_bytes : (1ull << 30)) {
    fd_ = ::open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd_ >= 0) {
      thread_ = std::thread([this] { Run(); });
    }
  }

  ~AsyncWriter() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
      cv_.notify_all();
    }
    if (thread_.joinable()) thread_.join();
    if (fd_ >= 0) ::close(fd_);
  }

  bool ok() const { return fd_ >= 0; }

  // Copies [ptr, ptr+size) and schedules a pwrite at `offset`.
  // Blocks only if the queue exceeds max_queue_bytes (backpressure).
  int Submit(const void* ptr, uint64_t size, uint64_t offset) {
    if (fd_ < 0 || error_) return -1;
    Chunk c;
    c.data.assign(static_cast<const uint8_t*>(ptr),
                  static_cast<const uint8_t*>(ptr) + size);
    c.offset = offset;
    std::unique_lock<std::mutex> lk(mu_);
    cv_space_.wait(lk, [this, size] {
      return queued_bytes_ + size <= max_queue_bytes_ || stop_;
    });
    if (stop_) return -1;
    queued_bytes_ += size;
    queue_.push_back(std::move(c));
    cv_.notify_one();
    return 0;
  }

  // Drain + fsync. Returns 0 on success.
  int Flush() {
    std::unique_lock<std::mutex> lk(mu_);
    cv_drained_.wait(lk, [this] { return queue_.empty() && !writing_; });
    if (error_) return -1;
    return ::fsync(fd_) == 0 ? 0 : -1;
  }

  uint64_t pending() {
    std::unique_lock<std::mutex> lk(mu_);
    return queued_bytes_;
  }

 private:
  void Run() {
    for (;;) {
      Chunk c;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (queue_.empty()) {
          if (stop_) return;
          continue;
        }
        c = std::move(queue_.front());
        queue_.pop_front();
        writing_ = true;
      }
      const uint8_t* p = c.data.data();
      uint64_t left = c.data.size();
      uint64_t off = c.offset;
      while (left > 0) {
        ssize_t n = ::pwrite(fd_, p, left, static_cast<off_t>(off));
        if (n <= 0) {
          std::unique_lock<std::mutex> lk(mu_);
          error_ = true;
          writing_ = false;
          queued_bytes_ = 0;
          queue_.clear();
          cv_drained_.notify_all();
          cv_space_.notify_all();
          return;
        }
        p += n;
        off += static_cast<uint64_t>(n);
        left -= static_cast<uint64_t>(n);
      }
      {
        std::unique_lock<std::mutex> lk(mu_);
        queued_bytes_ -= c.data.size();
        writing_ = false;
        cv_space_.notify_all();
        if (queue_.empty()) cv_drained_.notify_all();
      }
    }
  }

  int fd_ = -1;
  uint64_t max_queue_bytes_;
  std::mutex mu_;
  std::condition_variable cv_, cv_space_, cv_drained_;
  std::deque<Chunk> queue_;
  uint64_t queued_bytes_ = 0;
  bool writing_ = false;
  bool stop_ = false;
  bool error_ = false;
  std::thread thread_;
};

}  // namespace

extern "C" {

void* aw_create(const char* path, uint64_t max_queue_bytes) {
  auto* w = new AsyncWriter(path, max_queue_bytes);
  if (!w->ok()) {
    delete w;
    return nullptr;
  }
  return w;
}

int aw_submit(void* handle, const void* ptr, uint64_t size, uint64_t offset) {
  return static_cast<AsyncWriter*>(handle)->Submit(ptr, size, offset);
}

int aw_flush(void* handle) { return static_cast<AsyncWriter*>(handle)->Flush(); }

uint64_t aw_pending(void* handle) {
  return static_cast<AsyncWriter*>(handle)->pending();
}

void aw_destroy(void* handle) { delete static_cast<AsyncWriter*>(handle); }

}  // extern "C"
