// framepump: multithreaded host-side frame preparation for the TPU pipeline.
//
// The reference preps frames inline on the decode thread
// (resize + cvtColor per frame, RipCurrents_main/main.cpp:142-144). At TPU
// throughput (>=1000 fps of 1080p) that serial prep becomes the bottleneck,
// so this native component runs an ordered multi-worker pipeline:
//
//   push(raw BGR frame) -> [N worker threads: fixed-point bilinear resize +
//   BGR->gray, OpenCV-compatible arithmetic] -> pop_batch(resized, gray)
//
// Exposed as a C ABI for ctypes (io/native.py). No external dependencies.
//
// Build: make -C native   (produces libframepump.so)

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct Plan {
  // per-output-pixel source index + 11-bit fixed-point weights (OpenCV
  // INTER_LINEAR convention: src = (dst + 0.5) * scale - 0.5)
  std::vector<int32_t> idx0, idx1;
  std::vector<int32_t> w0, w1;  // w0 + w1 == 2048
};

Plan make_plan(int src, int dst) {
  Plan p;
  p.idx0.resize(dst); p.idx1.resize(dst); p.w0.resize(dst); p.w1.resize(dst);
  const double scale = static_cast<double>(src) / dst;
  for (int x = 0; x < dst; ++x) {
    double fx = (x + 0.5) * scale - 0.5;
    int ix = static_cast<int>(std::floor(fx));
    double frac = fx - ix;
    if (ix < 0) { ix = 0; frac = 0.0; }
    if (ix >= src - 1) { ix = src - 2 >= 0 ? src - 2 : 0; frac = 1.0; }
    int w1 = static_cast<int>(frac * 2048.0 + 0.5);
    p.idx0[x] = ix;
    p.idx1[x] = ix + 1 < src ? ix + 1 : ix;
    p.w1[x] = w1;
    p.w0[x] = 2048 - w1;
  }
  return p;
}

struct Job {
  int64_t seq;
  std::vector<uint8_t> raw;   // src_h * src_w * 3
};

struct Result {
  int64_t seq;
  std::vector<uint8_t> resized;  // dst_h * dst_w * 3
  std::vector<uint8_t> gray;     // dst_h * dst_w
};

struct ResultCmp {
  bool operator()(const Result& a, const Result& b) const {
    return a.seq > b.seq;  // min-heap on seq
  }
};

class FramePump {
 public:
  FramePump(int n_threads, int src_h, int src_w, int dst_h, int dst_w,
            int capacity)
      : src_h_(src_h), src_w_(src_w), dst_h_(dst_h), dst_w_(dst_w),
        capacity_(capacity), plan_y_(make_plan(src_h, dst_h)),
        plan_x_(make_plan(src_w, dst_w)) {
    for (int i = 0; i < n_threads; ++i)
      workers_.emplace_back([this] { worker(); });
  }

  ~FramePump() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      closed_ = true;
    }
    cv_in_.notify_all();
    cv_out_.notify_all();
    for (auto& t : workers_) t.join();
  }

  bool push(const uint8_t* data) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_space_.wait(lk, [this] {
      return closed_ || static_cast<int>(in_.size()) < capacity_;
    });
    if (closed_) return false;
    Job j;
    j.seq = next_seq_++;
    j.raw.assign(data, data + static_cast<size_t>(src_h_) * src_w_ * 3);
    in_.push(std::move(j));
    cv_in_.notify_one();
    return true;
  }

  // Pops exactly `batch` prepared frames in push order. Returns the number
  // delivered (< batch only after close()).
  int pop_batch(uint8_t* resized_out, uint8_t* gray_out, int batch) {
    int delivered = 0;
    while (delivered < batch) {
      std::unique_lock<std::mutex> lk(mu_);
      cv_out_.wait(lk, [this] {
        return (!out_.empty() && out_.top().seq == next_deliver_) ||
               (closed_ && in_.empty() && active_ == 0 &&
                (out_.empty() || out_.top().seq != next_deliver_));
      });
      if (out_.empty() || out_.top().seq != next_deliver_) break;
      const Result& r = out_.top();
      std::memcpy(resized_out + static_cast<size_t>(delivered) * dst_h_ *
                      dst_w_ * 3,
                  r.resized.data(), r.resized.size());
      std::memcpy(gray_out + static_cast<size_t>(delivered) * dst_h_ * dst_w_,
                  r.gray.data(), r.gray.size());
      out_.pop();
      ++next_deliver_;
      ++delivered;
    }
    return delivered;
  }

  void close() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      closed_ = true;
    }
    cv_in_.notify_all();
    cv_out_.notify_all();
    cv_space_.notify_all();
  }

 private:
  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_in_.wait(lk, [this] { return closed_ || !in_.empty(); });
        if (in_.empty()) {
          if (closed_) return;
          continue;
        }
        job = std::move(in_.front());
        in_.pop();
        ++active_;
        cv_space_.notify_one();
      }
      Result r;
      r.seq = job.seq;
      prep(job.raw.data(), r);
      {
        std::lock_guard<std::mutex> lk(mu_);
        out_.push(std::move(r));
        --active_;
      }
      cv_out_.notify_all();
    }
  }

  void prep(const uint8_t* raw, Result& r) {
    r.resized.resize(static_cast<size_t>(dst_h_) * dst_w_ * 3);
    r.gray.resize(static_cast<size_t>(dst_h_) * dst_w_);
    // horizontal pass into a row-pair buffer, then vertical blend —
    // row-cached separable bilinear in 11-bit fixed point (OpenCV-style).
    std::vector<int32_t> row0(dst_w_ * 3), row1(dst_w_ * 3);
    int cached0 = -1, cached1 = -1;
    auto hresize = [&](int sy, std::vector<int32_t>& dst) {
      const uint8_t* src = raw + static_cast<size_t>(sy) * src_w_ * 3;
      for (int x = 0; x < dst_w_; ++x) {
        const int i0 = plan_x_.idx0[x] * 3, i1 = plan_x_.idx1[x] * 3;
        const int w0 = plan_x_.w0[x], w1 = plan_x_.w1[x];
        dst[x * 3 + 0] = src[i0 + 0] * w0 + src[i1 + 0] * w1;
        dst[x * 3 + 1] = src[i0 + 1] * w0 + src[i1 + 1] * w1;
        dst[x * 3 + 2] = src[i0 + 2] * w0 + src[i1 + 2] * w1;
      }
    };
    for (int y = 0; y < dst_h_; ++y) {
      const int sy0 = plan_y_.idx0[y], sy1 = plan_y_.idx1[y];
      const int wy0 = plan_y_.w0[y], wy1 = plan_y_.w1[y];
      if (cached0 != sy0) { hresize(sy0, row0); cached0 = sy0; }
      if (cached1 != sy1) { hresize(sy1, row1); cached1 = sy1; }
      uint8_t* orow = r.resized.data() + static_cast<size_t>(y) * dst_w_ * 3;
      uint8_t* grow = r.gray.data() + static_cast<size_t>(y) * dst_w_;
      for (int x = 0; x < dst_w_; ++x) {
        int b = (row0[x * 3 + 0] * wy0 + row1[x * 3 + 0] * wy1 +
                 (1 << 21)) >> 22;
        int g = (row0[x * 3 + 1] * wy0 + row1[x * 3 + 1] * wy1 +
                 (1 << 21)) >> 22;
        int rr = (row0[x * 3 + 2] * wy0 + row1[x * 3 + 2] * wy1 +
                  (1 << 21)) >> 22;
        orow[x * 3 + 0] = static_cast<uint8_t>(b);
        orow[x * 3 + 1] = static_cast<uint8_t>(g);
        orow[x * 3 + 2] = static_cast<uint8_t>(rr);
        // OpenCV BGR2GRAY fixed point: (B*1868 + G*9617 + R*4899 + 2^13)>>14
        grow[x] = static_cast<uint8_t>(
            (b * 1868 + g * 9617 + rr * 4899 + (1 << 13)) >> 14);
      }
    }
  }

  const int src_h_, src_w_, dst_h_, dst_w_, capacity_;
  const Plan plan_y_, plan_x_;
  std::vector<std::thread> workers_;
  std::mutex mu_;
  std::condition_variable cv_in_, cv_out_, cv_space_;
  std::queue<Job> in_;
  std::priority_queue<Result, std::vector<Result>, ResultCmp> out_;
  int64_t next_seq_ = 0;
  int64_t next_deliver_ = 0;
  int active_ = 0;
  bool closed_ = false;
};

}  // namespace

extern "C" {

void* fp_create(int n_threads, int src_h, int src_w, int dst_h, int dst_w,
                int capacity) {
  return new FramePump(n_threads, src_h, src_w, dst_h, dst_w, capacity);
}

int fp_push(void* h, const uint8_t* bgr) {
  return static_cast<FramePump*>(h)->push(bgr) ? 1 : 0;
}

int fp_pop_batch(void* h, uint8_t* resized, uint8_t* gray, int batch) {
  return static_cast<FramePump*>(h)->pop_batch(resized, gray, batch);
}

void fp_close(void* h) { static_cast<FramePump*>(h)->close(); }

void fp_destroy(void* h) { delete static_cast<FramePump*>(h); }

}  // extern "C"
