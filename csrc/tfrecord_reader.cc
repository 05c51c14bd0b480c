// Multithreaded TFRecord reader (native data-loader component).
//
// Replaces the input-pipeline role of TF1's C++ TFRecordReader +
// queue-runner threads in the reference (reference nsynth/reader.py:52-60,
// tf.train.shuffle_batch with 4 threads at reader.py:93-98): a reader pool
// decodes record frames (length | masked-crc32c | payload | masked-crc32c)
// off the hot path and hands payload bytes to Python through a simple
// C ABI consumed via ctypes (audio_style_transfer_tpu/data/native.py).
//
// Build: see csrc/Makefile (g++ -O3 -shared -fPIC).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// CRC32C (Castagnoli), table-driven; masked variant per TFRecord framing.
// ---------------------------------------------------------------------

uint32_t kCrcTable[256];
bool InitCrcTable() {
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c >> 1) ^ ((c & 1) ? poly : 0);
    kCrcTable[i] = c;
  }
  return true;
}
const bool kCrcInit = InitCrcTable();

uint32_t Crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i)
    crc = kCrcTable[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t MaskedCrc32c(const uint8_t* data, size_t n) {
  uint32_t crc = Crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---------------------------------------------------------------------
// Reader: background thread pool filling a bounded record queue.
// ---------------------------------------------------------------------

struct Record {
  std::vector<uint8_t> payload;
};

class TFRecordReader {
 public:
  TFRecordReader(std::vector<std::string> paths, int num_threads,
                 int capacity, bool verify_crc, bool repeat)
      : paths_(std::move(paths)),
        capacity_(capacity),
        verify_crc_(verify_crc),
        repeat_(repeat),
        next_file_(0) {
    if (num_threads < 1) num_threads = 1;
    // Count workers as active BEFORE any thread starts: otherwise an early
    // Next() can observe active_workers_ == 0 + empty queue and report EOF
    // while the pool is still spinning up.
    active_workers_ = num_threads;
    for (int i = 0; i < num_threads; ++i)
      workers_.emplace_back([this] { WorkerLoop(); });
  }

  ~TFRecordReader() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    not_full_.notify_all();
    not_empty_.notify_all();
    for (auto& t : workers_) t.join();
  }

  // Pops one record. Returns payload size, 0 on end-of-data, -1 on error,
  // -2 for a zero-length record (valid framing, empty payload — distinct
  // from end-of-data, which a bare 0 would be mistaken for).
  // Caller provides a buffer; if too small, returns -(needed size).
  // (-1/-2 cannot collide with -(needed): "too small" is only returned
  // when needed exceeds the caller's >=1 MB buffer.)
  int64_t Next(uint8_t* buf, int64_t buf_len) {
    std::unique_lock<std::mutex> lock(mu_);
    not_empty_.wait(lock, [this] {
      return !queue_.empty() || (active_workers_ == 0) || stop_;
    });
    if (queue_.empty()) return error_ ? -1 : 0;
    Record& rec = queue_.front();
    int64_t n = static_cast<int64_t>(rec.payload.size());
    if (n > buf_len) return -n;  // caller retries with a bigger buffer
    std::memcpy(buf, rec.payload.data(), n);
    queue_.pop_front();
    lock.unlock();
    not_full_.notify_one();
    return n == 0 ? -2 : n;
  }

 private:
  void WorkerLoop() {
    while (true) {
      std::string path;
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (stop_ || (!repeat_ && next_file_ >= paths_.size())) break;
        path = paths_[next_file_ % paths_.size()];
        ++next_file_;
      }
      if (!ReadFile(path)) break;
    }
    std::lock_guard<std::mutex> lock(mu_);
    if (--active_workers_ == 0) not_empty_.notify_all();
  }

  bool ReadFile(const std::string& path) {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) {
      SetError();
      return false;
    }
    std::vector<uint8_t> header(12);
    while (true) {
      if (std::fread(header.data(), 1, 12, f) != 12) break;  // EOF
      uint64_t length;
      std::memcpy(&length, header.data(), 8);
      if (verify_crc_) {
        uint32_t crc;
        std::memcpy(&crc, header.data() + 8, 4);
        if (MaskedCrc32c(header.data(), 8) != crc) {
          std::fclose(f);
          SetError();
          return false;
        }
      }
      Record rec;
      rec.payload.resize(length);
      if (std::fread(rec.payload.data(), 1, length, f) != length) {
        std::fclose(f);
        SetError();
        return false;
      }
      uint8_t footer[4];
      if (std::fread(footer, 1, 4, f) != 4) {
        std::fclose(f);
        SetError();
        return false;
      }
      if (verify_crc_) {
        uint32_t crc;
        std::memcpy(&crc, footer, 4);
        if (MaskedCrc32c(rec.payload.data(), length) != crc) {
          std::fclose(f);
          SetError();
          return false;
        }
      }
      std::unique_lock<std::mutex> lock(mu_);
      not_full_.wait(lock, [this] {
        return static_cast<int>(queue_.size()) < capacity_ || stop_;
      });
      if (stop_) {
        std::fclose(f);
        return false;
      }
      queue_.push_back(std::move(rec));
      lock.unlock();
      not_empty_.notify_one();
    }
    std::fclose(f);
    return true;
  }

  void SetError() {
    std::lock_guard<std::mutex> lock(mu_);
    error_ = true;
    not_empty_.notify_all();
  }

  std::vector<std::string> paths_;
  const int capacity_;
  const bool verify_crc_;
  const bool repeat_;

  std::mutex mu_;
  std::condition_variable not_empty_, not_full_;
  std::deque<Record> queue_;
  std::vector<std::thread> workers_;
  size_t next_file_;
  int active_workers_ = 0;
  bool stop_ = false;
  bool error_ = false;
};

}  // namespace

// ------------------------------------------------------------------- //
// C ABI for ctypes
// ------------------------------------------------------------------- //

extern "C" {

void* tfrec_open(const char** paths, int num_paths, int num_threads,
                 int capacity, int verify_crc, int repeat) {
  std::vector<std::string> p(paths, paths + num_paths);
  return new TFRecordReader(std::move(p), num_threads, capacity,
                            verify_crc != 0, repeat != 0);
}

int64_t tfrec_next(void* handle, uint8_t* buf, int64_t buf_len) {
  return static_cast<TFRecordReader*>(handle)->Next(buf, buf_len);
}

void tfrec_close(void* handle) { delete static_cast<TFRecordReader*>(handle); }

uint32_t tfrec_masked_crc32c(const uint8_t* data, int64_t n) {
  return MaskedCrc32c(data, static_cast<size_t>(n));
}

}  // extern "C"
