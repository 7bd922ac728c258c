// emmax_tpu native frame store: mmap'd JPEG shard + multithreaded decode.
//
// The TPU-host counterpart of the reference's C++-backed data plane
// (tf.data runtime + the /dev/shm mmap variant in
// /root/reference/prismatic/vla/datasets/datasets_low_memory.py:464-483):
// trajectories of JPEG frames are packed into one shard file, mmap'd
// (zero-copy page cache sharing across data workers), indexed by
// "file_path|episode_id" keys, and decoded to RGB by a std::thread pool so
// a whole training batch decodes in parallel without Python in the loop.
//
// File format "EFS1" (little endian):
//   [magic u32 = 0x31534645]["EFS1"]
//   [num_trajs u64]
//   per traj: [key_len u32][key bytes][num_frames u32]
//             per frame: [offset u64][size u64][width u32][height u32]
//   ... frame payloads (JPEG) at their offsets ...
//
// C ABI (ctypes): efs_open / efs_close / efs_num_trajs / efs_lookup /
// efs_frame_info / efs_decode_frame / efs_decode_batch / efs_read_raw.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <csetjmp>
#include <jpeglib.h>

namespace {

struct Frame {
  uint64_t offset;
  uint64_t size;
  uint32_t width;
  uint32_t height;
};

struct Traj {
  std::string key;
  std::vector<Frame> frames;
};

struct Store {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<Traj> trajs;
  std::unordered_map<std::string, int64_t> index;
};

template <typename T>
T read_le(const uint8_t*& p) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  p += sizeof(T);
  return v;
}

// ---- thread pool ------------------------------------------------------------

class ThreadPool {
 public:
  explicit ThreadPool(size_t n) {
    for (size_t i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

  static ThreadPool& instance() {
    static ThreadPool pool(
        std::max(2u, std::thread::hardware_concurrency()));
    return pool;
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

// ---- jpeg decode ------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// Decode `size` bytes of JPEG at `src` into out (RGB, row-major). Returns 0
// on success, nonzero on decode error.
int decode_jpeg_rgb(const uint8_t* src, size_t size, uint8_t* out,
                    uint32_t expect_w, uint32_t expect_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(src),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_width != expect_w || cinfo.output_height != expect_h ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t stride = static_cast<size_t>(cinfo.output_width) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

void* efs_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  madvise(mem, st.st_size, MADV_WILLNEED);

  auto* store = new Store();
  store->fd = fd;
  store->data = static_cast<const uint8_t*>(mem);
  store->size = static_cast<size_t>(st.st_size);

  const uint8_t* p = store->data;
  uint32_t magic = read_le<uint32_t>(p);
  if (magic != 0x31534645u) {  // "EFS1"
    delete store;
    munmap(mem, st.st_size);
    ::close(fd);
    return nullptr;
  }
  uint64_t num_trajs = read_le<uint64_t>(p);
  store->trajs.resize(num_trajs);
  for (uint64_t t = 0; t < num_trajs; ++t) {
    uint32_t key_len = read_le<uint32_t>(p);
    store->trajs[t].key.assign(reinterpret_cast<const char*>(p), key_len);
    p += key_len;
    uint32_t num_frames = read_le<uint32_t>(p);
    store->trajs[t].frames.resize(num_frames);
    for (uint32_t f = 0; f < num_frames; ++f) {
      Frame& fr = store->trajs[t].frames[f];
      fr.offset = read_le<uint64_t>(p);
      fr.size = read_le<uint64_t>(p);
      fr.width = read_le<uint32_t>(p);
      fr.height = read_le<uint32_t>(p);
    }
    store->index.emplace(store->trajs[t].key, static_cast<int64_t>(t));
  }
  return store;
}

void efs_close(void* handle) {
  auto* store = static_cast<Store*>(handle);
  if (!store) return;
  munmap(const_cast<uint8_t*>(store->data), store->size);
  ::close(store->fd);
  delete store;
}

int64_t efs_num_trajs(void* handle) {
  return static_cast<Store*>(handle)->trajs.size();
}

int64_t efs_lookup(void* handle, const char* key) {
  auto* store = static_cast<Store*>(handle);
  auto it = store->index.find(key);
  return it == store->index.end() ? -1 : it->second;
}

int32_t efs_traj_key(void* handle, int64_t traj, char* out, int32_t cap) {
  auto* store = static_cast<Store*>(handle);
  if (traj < 0 || traj >= static_cast<int64_t>(store->trajs.size())) return -1;
  const std::string& k = store->trajs[traj].key;
  int32_t n = static_cast<int32_t>(k.size());
  if (n >= cap) return -1;
  std::memcpy(out, k.data(), n);
  out[n] = 0;
  return n;
}

// Returns num_frames; fills w/h of frame 0 (stores are uniform per traj).
int32_t efs_frame_info(void* handle, int64_t traj, uint32_t* w, uint32_t* h) {
  auto* store = static_cast<Store*>(handle);
  if (traj < 0 || traj >= static_cast<int64_t>(store->trajs.size())) return -1;
  const Traj& t = store->trajs[traj];
  if (!t.frames.empty()) {
    *w = t.frames[0].width;
    *h = t.frames[0].height;
  }
  return static_cast<int32_t>(t.frames.size());
}

int32_t efs_decode_frame(void* handle, int64_t traj, int32_t frame,
                         uint8_t* out) {
  auto* store = static_cast<Store*>(handle);
  if (traj < 0 || traj >= static_cast<int64_t>(store->trajs.size())) return 1;
  const Traj& t = store->trajs[traj];
  if (frame < 0 || frame >= static_cast<int32_t>(t.frames.size())) return 1;
  const Frame& fr = t.frames[frame];
  return decode_jpeg_rgb(store->data + fr.offset, fr.size, out, fr.width,
                         fr.height);
}

// Parallel batch decode: n frames into out[n, h, w, 3] (uniform dims).
int32_t efs_decode_batch(void* handle, const int64_t* trajs,
                         const int32_t* frames, int32_t n, uint8_t* out,
                         uint32_t w, uint32_t h) {
  auto* store = static_cast<Store*>(handle);
  std::atomic<int32_t> failures{0};
  std::atomic<int32_t> remaining{n};
  std::mutex done_mu;
  std::condition_variable done_cv;
  const size_t frame_bytes = static_cast<size_t>(w) * h * 3;
  for (int32_t i = 0; i < n; ++i) {
    ThreadPool::instance().submit([=, &failures, &remaining, &done_mu,
                                   &done_cv] {
      const Traj& t = store->trajs[trajs[i]];
      const Frame& fr = t.frames[frames[i]];
      if (fr.width != w || fr.height != h ||
          decode_jpeg_rgb(store->data + fr.offset, fr.size,
                          out + frame_bytes * i, w, h) != 0) {
        failures.fetch_add(1);
      }
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return failures.load();
}

// Raw (undecoded) access for tooling.
int64_t efs_read_raw(void* handle, int64_t traj, int32_t frame, uint8_t* out,
                     int64_t cap) {
  auto* store = static_cast<Store*>(handle);
  const Frame& fr = store->trajs[traj].frames[frame];
  if (static_cast<int64_t>(fr.size) > cap) return -1;
  std::memcpy(out, store->data + fr.offset, fr.size);
  return static_cast<int64_t>(fr.size);
}

}  // extern "C"
