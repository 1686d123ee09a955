// Native prefetching clip loader — the TPU-host replacement for the
// reference's decord (C++ video decoder, animatediff/data/dataset.py:4) plus
// the torch DataLoader worker pool that drives it.
//
// Design: a fixed thread pool decodes clip requests (video path + frame
// indices, or a single image) with OpenCV, resizes the short side and
// center-crops to (out_h, out_w) — the WebVid10M preprocessing
// (dataset.py:168-178) — and hands finished RGB uint8 buffers to the
// consumer through a bounded completion queue. The Python side (ctypes, see
// followyourclick_tpu/data/native_loader.py) owns request submission and
// feeds the returned buffers straight into jax.device_put.
//
// C API only (no pybind11 in this image); all exported symbols are
// fyc_loader_*.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

namespace {

struct Request {
  int64_t id = 0;
  std::string path;
  std::vector<int> frame_indices;  // empty => single image
  int out_h = 0;
  int out_w = 0;
  // 0 = short-side resize + center crop (WebVid semantics),
  // 1 = plain resize to (out_h, out_w)
  int crop_mode = 0;
};

struct Result {
  int64_t id = 0;
  int status = 0;  // 0 ok, <0 error
  int frames = 0;
  int h = 0;
  int w = 0;
  std::vector<uint8_t> data;  // (frames, h, w, 3) RGB
};

cv::Mat preprocess(const cv::Mat& bgr, int out_h, int out_w, int crop_mode) {
  cv::Mat resized;
  if (crop_mode == 1) {
    cv::resize(bgr, resized, cv::Size(out_w, out_h), 0, 0, cv::INTER_LINEAR);
  } else {
    const double scale =
        std::max(static_cast<double>(out_h) / bgr.rows,
                 static_cast<double>(out_w) / bgr.cols);
    cv::Mat scaled;
    cv::resize(bgr, scaled,
               cv::Size(std::max(out_w, static_cast<int>(bgr.cols * scale + 0.5)),
                        std::max(out_h, static_cast<int>(bgr.rows * scale + 0.5))),
               0, 0, cv::INTER_LINEAR);
    const int x = (scaled.cols - out_w) / 2;
    const int y = (scaled.rows - out_h) / 2;
    resized = scaled(cv::Rect(x, y, out_w, out_h)).clone();
  }
  cv::Mat rgb;
  cv::cvtColor(resized, rgb, cv::COLOR_BGR2RGB);
  return rgb;
}

class Loader {
 public:
  Loader(int num_workers, int capacity) : capacity_(capacity) {
    for (int i = 0; i < num_workers; ++i) {
      workers_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    work_cv_.notify_all();
    done_cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(Request req) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      pending_.push_back(std::move(req));
      ++inflight_;
    }
    work_cv_.notify_one();
  }

  // Blocks until a result is ready (or timeout). Returns nullptr on timeout.
  std::unique_ptr<Result> Next(int timeout_ms) {
    std::unique_lock<std::mutex> lk(mu_);
    if (!done_cv_.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                           [this] { return !done_.empty() || stop_; })) {
      return nullptr;
    }
    if (done_.empty()) return nullptr;
    auto out = std::move(done_.front());
    done_.pop_front();
    --inflight_;
    work_cv_.notify_one();  // completion queue freed a slot
    return out;
  }

 private:
  void WorkerLoop() {
    for (;;) {
      Request req;
      {
        std::unique_lock<std::mutex> lk(mu_);
        // count in-flight decodes toward capacity: a slot is reserved here
        // (under the lock) and released when the result lands in done_, so
        // done_ + in-progress never exceeds capacity_ even with N workers
        work_cv_.wait(lk, [this] {
          return stop_ ||
                 (!pending_.empty() &&
                  done_.size() + decoding_ < static_cast<size_t>(capacity_));
        });
        if (stop_) return;
        req = std::move(pending_.front());
        pending_.pop_front();
        ++decoding_;
      }
      auto res = Process(req);
      {
        std::lock_guard<std::mutex> lk(mu_);
        done_.push_back(std::move(res));
        --decoding_;
      }
      done_cv_.notify_one();
    }
  }

  std::unique_ptr<Result> Process(const Request& req) {
    auto res = std::make_unique<Result>();
    res->id = req.id;
    res->h = req.out_h;
    res->w = req.out_w;
    const size_t frame_bytes =
        static_cast<size_t>(req.out_h) * req.out_w * 3;
    try {
      if (req.frame_indices.empty()) {
        cv::Mat img = cv::imread(req.path, cv::IMREAD_COLOR);
        if (img.empty()) {
          res->status = -1;
          return res;
        }
        cv::Mat rgb = preprocess(img, req.out_h, req.out_w, req.crop_mode);
        res->frames = 1;
        res->data.resize(frame_bytes);
        std::memcpy(res->data.data(), rgb.data, frame_bytes);
        return res;
      }
      cv::VideoCapture cap(req.path);
      if (!cap.isOpened()) {
        res->status = -1;
        return res;
      }
      res->frames = static_cast<int>(req.frame_indices.size());
      res->data.resize(frame_bytes * res->frames);
      // sequential decode with skip — frame indices are sorted ascending by
      // the caller; random seeks on long-GOP video are slower than skipping
      int cur = 0;
      cv::Mat frame;
      for (size_t i = 0; i < req.frame_indices.size(); ++i) {
        const int target = req.frame_indices[i];
        while (cur <= target) {
          if (!cap.grab()) {
            res->status = -2;  // frame out of range
            return res;
          }
          ++cur;
        }
        if (!cap.retrieve(frame) || frame.empty()) {
          res->status = -2;
          return res;
        }
        cv::Mat rgb = preprocess(frame, req.out_h, req.out_w, req.crop_mode);
        std::memcpy(res->data.data() + i * frame_bytes, rgb.data,
                    frame_bytes);
      }
      return res;
    } catch (...) {
      res->status = -3;
      return res;
    }
  }

  const int capacity_;
  std::mutex mu_;
  std::condition_variable work_cv_;
  std::condition_variable done_cv_;
  std::deque<Request> pending_;
  std::deque<std::unique_ptr<Result>> done_;
  size_t decoding_ = 0;  // decodes started but not yet in done_
  int inflight_ = 0;
  bool stop_ = false;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* fyc_loader_create(int num_workers, int capacity) {
  return new Loader(num_workers, capacity);
}

void fyc_loader_destroy(void* handle) {
  delete static_cast<Loader*>(handle);
}

void fyc_loader_submit(void* handle, int64_t id, const char* path,
                       const int* frame_indices, int n_frames, int out_h,
                       int out_w, int crop_mode) {
  Request req;
  req.id = id;
  req.path = path;
  if (frame_indices != nullptr && n_frames > 0) {
    req.frame_indices.assign(frame_indices, frame_indices + n_frames);
  }
  req.out_h = out_h;
  req.out_w = out_w;
  req.crop_mode = crop_mode;
  static_cast<Loader*>(handle)->Submit(std::move(req));
}

// Pops one finished clip. Returns status (0 ok, <0 decode error, 1 timeout).
// On success writes id/frames and copies at most buf_capacity bytes of RGB
// uint8 (frames, h, w, 3) into buf.
int fyc_loader_next(void* handle, int timeout_ms, int64_t* id,
                    int* frames, uint8_t* buf, int64_t buf_capacity) {
  auto res = static_cast<Loader*>(handle)->Next(timeout_ms);
  if (res == nullptr) return 1;
  *id = res->id;
  *frames = res->frames;
  if (res->status != 0) return res->status;
  const int64_t n = static_cast<int64_t>(res->data.size());
  if (n > buf_capacity) return -4;
  std::memcpy(buf, res->data.data(), n);
  return 0;
}

}  // extern "C"
