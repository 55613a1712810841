// Native batch image loader.
//
// C++ replacement for the host-side hot loop of the reference's input
// pipeline (imdb.read_batch / read_image_batch, imdb.py:63-193): PNG/JPEG
// decode, float conversion, BGR mean subtraction, the drift crop and
// horizontal-flip augmentation, and the bilinear resize — all executed on
// a real thread pool with no GIL.  Augmentation *decisions* (dx, dy,
// flip) stay in Python so the RNG sequence matches the reference
// bit-for-bit; this library only moves pixels.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image).  Uses the
// same OpenCV the Python path uses, so outputs are bit-identical to
// cv2.imread/convert/resize.

#include <atomic>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Job {
  const char* path;
  float dx = 0, dy = 0;     // drift (train only)
  bool flip = false;        // horizontal flip (train only)
  bool augment = false;
};

// Decode + preprocess one image into out (out_h*out_w*3 f32, BGR).
// Returns 0 on success; fills scale_xy[2] with (x_scale, y_scale)
// relative to the post-drift source size (imdb.py:189-190 semantics).
int ProcessOne(const Job& job, int out_w, int out_h, const float* means,
               float* out, float* scale_xy) {
  cv::Mat raw = cv::imread(job.path, cv::IMREAD_COLOR);
  if (raw.empty()) return 1;

  cv::Mat f;
  raw.convertTo(f, CV_32FC3);
  f -= cv::Scalar(means[0], means[1], means[2]);

  if (job.augment && (job.dx != 0 || job.dy != 0)) {
    // zero-padded drift crop (imdb.py:164-177): the new canvas is
    // (orig_h - dy, orig_w - dx); source region starts at
    // (max(dy,0), max(dx,0)) and lands at (max(-dy,0), max(-dx,0)).
    const int dx = static_cast<int>(job.dx);
    const int dy = static_cast<int>(job.dy);
    const int new_h = f.rows - dy;
    const int new_w = f.cols - dx;
    if (new_h <= 0 || new_w <= 0) return 2;
    cv::Mat canvas = cv::Mat::zeros(new_h, new_w, CV_32FC3);
    const int src_y = std::max(dy, 0), dst_y = std::max(-dy, 0);
    const int src_x = std::max(dx, 0), dst_x = std::max(-dx, 0);
    const int copy_h = std::min(f.rows - src_y, new_h - dst_y);
    const int copy_w = std::min(f.cols - src_x, new_w - dst_x);
    if (copy_h > 0 && copy_w > 0) {
      f(cv::Rect(src_x, src_y, copy_w, copy_h))
          .copyTo(canvas(cv::Rect(dst_x, dst_y, copy_w, copy_h)));
    }
    f = canvas;
  }
  if (job.augment && job.flip) {
    cv::flip(f, f, 1);
  }

  scale_xy[0] = static_cast<float>(out_w) / f.cols;
  scale_xy[1] = static_cast<float>(out_h) / f.rows;

  cv::Mat dst(out_h, out_w, CV_32FC3, out);
  cv::resize(f, dst, cv::Size(out_w, out_h), 0, 0, cv::INTER_LINEAR);
  if (dst.data != reinterpret_cast<uchar*>(out)) {
    // cv::resize reallocated (shouldn't for matching type); copy back
    std::memcpy(out, dst.data,
                sizeof(float) * 3 * out_w * out_h);
  }
  return 0;
}

int RunBatch(const std::vector<Job>& jobs, int out_w, int out_h,
             const float* means, int num_threads, float* out_images,
             float* out_scales) {
  const int n = static_cast<int>(jobs.size());
  std::atomic<int> next(0);
  std::atomic<int> status(0);
  const size_t stride = static_cast<size_t>(out_w) * out_h * 3;

  // cv::setNumThreads is process-global, not per-thread.  Disable
  // OpenCV-internal parallelism ONCE per process so the pool scales
  // with images, not within one image.  A save/restore around each
  // batch would race when PrefetchLoader calls RunBatch from several
  // producer threads (one batch's restore re-enables intra-image
  // threading mid-flight for another, and an interleaved save can
  // capture 0 as the value to "restore").  The trade-off — OpenCV
  // intra-op threading stays off for later cv2 users in this process —
  // is deterministic and documented in PARITY.md.
  static std::once_flag cv_threads_once;
  std::call_once(cv_threads_once, []() { cv::setNumThreads(0); });

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const int rc = ProcessOne(jobs[i], out_w, out_h, means,
                                out_images + stride * i,
                                out_scales + 2 * i);
      if (rc != 0) status.store(rc);
    }
  };

  const int t = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return status.load();
}

}  // namespace

extern "C" {

// Eval path (imdb.read_image_batch): decode, -means, resize.
int sdl_load_image_batch(const char** paths, int n, int out_w, int out_h,
                         const float* bgr_means, int num_threads,
                         float* out_images, float* out_scales) {
  std::vector<Job> jobs(n);
  for (int i = 0; i < n; ++i) jobs[i].path = paths[i];
  return RunBatch(jobs, out_w, out_h, bgr_means, num_threads, out_images,
                  out_scales);
}

// Train path: same + per-image drift crop and flip, with the decisions
// (drift[2*i], drift[2*i+1], flip[i]) made by the caller.
int sdl_load_train_batch(const char** paths, int n, int out_w, int out_h,
                         const float* bgr_means, const float* drift,
                         const unsigned char* flip, int num_threads,
                         float* out_images, float* out_scales) {
  std::vector<Job> jobs(n);
  for (int i = 0; i < n; ++i) {
    jobs[i].path = paths[i];
    jobs[i].dx = drift[2 * i];
    jobs[i].dy = drift[2 * i + 1];
    jobs[i].flip = flip[i] != 0;
    jobs[i].augment = true;
  }
  return RunBatch(jobs, out_w, out_h, bgr_means, num_threads, out_images,
                  out_scales);
}

}  // extern "C"
