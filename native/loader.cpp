// Native frame loader: threaded decode + prefetch for the SLAM frontend.
//
// Host-runtime equivalent of the reference's DatasetLoader + parallel
// reader thread (reference: Include/DatasetLoader.h:61-119,374-434): a
// worker pool decodes frames ahead of the consumer so image decode never
// stalls the device pipeline. Exposes a C ABI consumed via ctypes
// (hslam_tpu/io/native_loader.py).
//
// The Python side enumerates file paths/timestamps (layout parsing is not
// perf-critical); this library owns decode (OpenCV imread, grayscale),
// optional photometric LUT + inverse vignette application, and the
// prefetch scheduling.

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> data;
  int width = 0;
  int height = 0;
  bool ok = false;
};

struct Loader {
  std::vector<std::string> paths;
  int n_frames = 0;       // == paths.size() in path mode; explicit in mem mode
  bool mem_mode = false;  // frames arrive as compressed blobs (loader_push)
  std::map<int, std::vector<uint8_t>> blobs;
  int n_prefetch;
  // Correction tables, installed once from Python and snapshotted by the
  // workers under the mutex (shared_ptr: an install racing a decode can
  // never invalidate the worker's view).
  // photometric (optional): 256-entry inverse response, full-res 1/V
  std::shared_ptr<const std::vector<float>> inv_response;  // null = identity
  std::shared_ptr<const std::vector<float>> inv_vignette;  // null = none
  int vig_w = 0, vig_h = 0;
  // geometric undistortion remap (optional): (out_h*out_w*2) of (x, y)
  // source coordinates, -1 marks invalid (output 0) — the same table the
  // device path consumes (ops/undistort.remap_image); applying it here
  // ships fully-corrected frames out of the worker pool (reference
  // GeometricUndistorter::undistort, GeometricUndistorter.cpp:458-475)
  std::shared_ptr<const std::vector<float>> remap_uv;      // null = none
  int out_w = 0, out_h = 0;

  std::mutex mu;
  std::condition_variable cv_ready;
  std::condition_variable cv_work;
  std::map<int, Frame> cache;
  std::set<int> decoding;  // popped from queue, not yet cached (mem mode)
  std::deque<int> queue;
  std::atomic<int> next_consumer{0};
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  Frame decode(int idx) {
    Frame f;
    cv::Mat img;
    if (mem_mode) {
      std::vector<uint8_t> blob;
      {
        std::lock_guard<std::mutex> lk(mu);
        auto it = blobs.find(idx);
        if (it == blobs.end()) return f;
        blob = std::move(it->second);
        blobs.erase(it);
      }
      img = cv::imdecode(blob, cv::IMREAD_GRAYSCALE);
    } else {
      img = cv::imread(paths[idx], cv::IMREAD_GRAYSCALE);
    }
    if (img.empty()) return f;
    const int iw = img.cols, ih = img.rows;
    // snapshot the correction tables under the mutex
    std::shared_ptr<const std::vector<float>> resp, vig, remap;
    int r_w = 0, r_h = 0, v_w = 0, v_h = 0;
    {
      std::lock_guard<std::mutex> lk(mu);
      resp = inv_response;
      vig = inv_vignette;
      remap = remap_uv;
      r_w = out_w;
      r_h = out_h;
      v_w = vig_w;
      v_h = vig_h;
    }
    // photometric first, geometric second (HaveCalib order,
    // DatasetLoader.h:436-506)
    std::vector<float> corrected(static_cast<size_t>(iw) * ih);
    const bool use_resp = resp && resp->size() == 256;
    const bool use_vig = vig && v_w == iw && v_h == ih;
    for (int y = 0; y < ih; ++y) {
      const uint8_t* row = img.ptr<uint8_t>(y);
      float* out = corrected.data() + static_cast<size_t>(y) * iw;
      for (int x = 0; x < iw; ++x) {
        float v = use_resp ? (*resp)[row[x]] : static_cast<float>(row[x]);
        if (use_vig) v *= (*vig)[static_cast<size_t>(y) * iw + x];
        out[x] = v;
      }
    }
    if (remap) {
      // bilinear remap with the device path's exact conventions
      // (utils/interp.bilinear: clamp coords, clamp cell to W-2/H-2 so
      // edge samples stay exact; x<0 in the table -> 0)
      f.width = r_w;
      f.height = r_h;
      f.data.resize(static_cast<size_t>(r_w) * r_h);
      for (int y = 0; y < r_h; ++y) {
        float* out = f.data.data() + static_cast<size_t>(y) * r_w;
        const float* uv = remap->data() + static_cast<size_t>(y) * r_w * 2;
        for (int x = 0; x < r_w; ++x) {
          float sx = uv[2 * x], sy = uv[2 * x + 1];
          if (sx < 0.f) {
            out[x] = 0.f;
            continue;
          }
          sx = std::min(std::max(sx, 0.f), static_cast<float>(iw - 1));
          sy = std::min(std::max(sy, 0.f), static_cast<float>(ih - 1));
          int ix = std::min(static_cast<int>(sx), iw - 2);
          int iy = std::min(static_cast<int>(sy), ih - 2);
          if (ix < 0) ix = 0;
          if (iy < 0) iy = 0;
          const float dx = sx - ix, dy = sy - iy;
          const float* p = corrected.data() + static_cast<size_t>(iy) * iw + ix;
          out[x] = p[0] * (1.f - dx) * (1.f - dy) + p[1] * dx * (1.f - dy) +
                   p[iw] * (1.f - dx) * dy + p[iw + 1] * dx * dy;
        }
      }
    } else {
      f.width = iw;
      f.height = ih;
      f.data = std::move(corrected);
    }
    f.ok = true;
    return f;
  }

  void worker() {
    for (;;) {
      int idx = -1;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (stop.load()) return;
        idx = queue.front();
        queue.pop_front();
        decoding.insert(idx);
      }
      Frame f = decode(idx);
      {
        std::lock_guard<std::mutex> lk(mu);
        cache[idx] = std::move(f);
        decoding.erase(idx);
      }
      cv_ready.notify_all();
    }
  }

  void schedule_ahead(int from) {
    // enqueue [from, from + n_prefetch) not yet cached/queued. In mem mode
    // the producer (loader_push) drives the queue instead.
    std::lock_guard<std::mutex> lk(mu);
    if (mem_mode) {
      for (auto it = cache.begin(); it != cache.end();) {
        if (it->first < from - 2)
          it = cache.erase(it);
        else
          ++it;
      }
      return;
    }
    for (int i = from; i < from + n_prefetch && i < (int)paths.size(); ++i) {
      if (cache.count(i)) continue;
      bool queued = false;
      for (int q : queue)
        if (q == i) { queued = true; break; }
      if (!queued) queue.push_back(i);
    }
    // drop stale frames well behind the consumer
    for (auto it = cache.begin(); it != cache.end();) {
      if (it->first < from - 2)
        it = cache.erase(it);
      else
        ++it;
    }
    cv_work.notify_all();
  }
};

}  // namespace

extern "C" {

void* loader_open(const char** paths, int n, int n_prefetch, int n_threads) {
  auto* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->n_frames = n;
  L->n_prefetch = n_prefetch;
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  // no eager schedule_ahead(0): Python installs the correction tables
  // between loader_open and the first loader_get — decoding before they
  // land would cache frame 0 uncorrected (and at the wrong resolution
  // when a remap is configured)
  return L;
}

// Memory-fed variant for archive datasets (reference reads zips through
// libzip, DatasetLoader.h:410-434): the producer reads compressed blobs
// (cheap, sequential IO) and pushes them here; the worker pool owns the
// expensive image decode + photometric correction off the consumer thread.
void* loader_open_mem(int n, int n_threads) {
  auto* L = new Loader();
  L->mem_mode = true;
  L->n_frames = n;
  L->n_prefetch = 0;
  for (int i = 0; i < n_threads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Hand frame idx's compressed bytes to the decode pool (copies `data`).
void loader_push(void* h, int idx, const uint8_t* data, long len) {
  auto* L = static_cast<Loader*>(h);
  if (idx < 0 || idx >= L->n_frames) return;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    if (L->cache.count(idx) || L->blobs.count(idx)) return;
    L->blobs[idx].assign(data, data + len);
    L->queue.push_back(idx);
  }
  L->cv_work.notify_all();
}

// Install a geometric remap table: map_uv is (out_h*out_w*2) floats of
// (x, y) source coordinates, -1 = invalid (output 0). Workers then ship
// fully geometry+photometry corrected frames.
void loader_set_remap(void* h, const float* map_uv, int out_w, int out_h) {
  auto* L = static_cast<Loader*>(h);
  auto tab = std::make_shared<std::vector<float>>(
      map_uv, map_uv + static_cast<size_t>(out_w) * out_h * 2);
  std::lock_guard<std::mutex> lk(L->mu);
  L->remap_uv = std::move(tab);
  L->out_w = out_w;
  L->out_h = out_h;
}

void loader_set_photometric(void* h, const float* inv_response,
                            const float* inv_vignette, int vw, int vh) {
  auto* L = static_cast<Loader*>(h);
  std::shared_ptr<std::vector<float>> resp, vig;
  if (inv_response)
    resp = std::make_shared<std::vector<float>>(inv_response,
                                                inv_response + 256);
  if (inv_vignette)
    vig = std::make_shared<std::vector<float>>(
        inv_vignette, inv_vignette + static_cast<size_t>(vw) * vh);
  std::lock_guard<std::mutex> lk(L->mu);
  if (resp) L->inv_response = std::move(resp);
  if (vig) {
    L->inv_vignette = std::move(vig);
    L->vig_w = vw;
    L->vig_h = vh;
  }
}

// Blocking fetch of frame idx into out (size cap floats). Returns 0 on
// success; fills *w, *h. Prefetches ahead of idx.
int loader_get(void* h, int idx, float* out, long cap, int* w, int* hh) {
  auto* L = static_cast<Loader*>(h);
  if (idx < 0 || idx >= L->n_frames) return -1;
  L->schedule_ahead(idx);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_ready.wait(lk, [&] {
    if (L->cache.count(idx)) return true;
    if (!L->mem_mode) return false;
    // mem mode: give up (rather than block forever) once the frame is
    // neither pending, queued, nor mid-decode — i.e. it was never pushed,
    // or its cache entry was already consumed and evicted
    bool queued = false;
    for (int q : L->queue)
      if (q == idx) { queued = true; break; }
    return !(L->blobs.count(idx) || queued || L->decoding.count(idx));
  });
  if (!L->cache.count(idx)) return -4;
  Frame& f = L->cache[idx];
  if (!f.ok) return -2;
  if ((long)f.data.size() > cap) return -3;
  *w = f.width;
  *hh = f.height;
  std::memcpy(out, f.data.data(), f.data.size() * sizeof(float));
  return 0;
}

int loader_count(void* h) {
  return static_cast<Loader*>(h)->n_frames;
}

void loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  L->stop.store(true);
  L->cv_work.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"
