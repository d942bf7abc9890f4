// Streaming capture pipeline: bounded ring buffer fed by a reader pool.
//
// The native runtime piece the reference implements with per-file Python
// threads + futures (/root/reference/usrpRoutines.py:88 multiBinReadThreaded,
// FolderReader.get(prefetch=) :246): a producer pool reads interleaved-int16
// capture files ahead of the consumer, converts to float32 I/Q in ring slots,
// and the consumer pops frames IN CAPTURE ORDER with `halo` samples of the
// previous frame prepended — exactly the delay-line warm-up a streaming
// filter/channelizer needs (reference Channeliser delay semantics,
// filterRoutines.py:663-675).
//
// Concurrency model: workers claim file indices from an atomic counter and
// block until the target ring slot is free (slot seq = file index, slot
// reuse after `capacity` pops). The consumer blocks until slot `next_seq` is
// ready. All waits use one mutex + two condvars (slots are small in number;
// contention is negligible next to disk I/O).
//
// C ABI for ctypes. Build: see native/Makefile (libdspstream.so).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Slot {
  std::vector<float> data;   // samps_per_file * 2 floats
  int status = 0;
  bool ready = false;
};

struct Pipeline {
  std::vector<std::string> paths;
  long samps_per_file = 0;
  long halo = 0;
  int capacity = 0;
  std::vector<Slot> ring;
  std::vector<float> tail;   // last halo*2 floats of the previous frame
  std::atomic<int> next_claim{0};
  int next_pop = 0;          // consumer sequence
  int popped_floor = 0;      // slots with seq < floor may be overwritten
  bool closing = false;
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for slot ready
  std::condition_variable cv_free;   // producers wait for slot free
  std::vector<std::thread> workers;
};

int read_file(const std::string& path, long samps, float* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (f == nullptr) return -1;
  const size_t total = static_cast<size_t>(samps) * 2;
  constexpr size_t CHUNK = 1 << 16;
  std::vector<int16_t> buf(CHUNK);
  size_t done = 0;
  while (done < total) {
    size_t want = total - done < CHUNK ? total - done : CHUNK;
    size_t got = std::fread(buf.data(), sizeof(int16_t), want, f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i) {
      out[done + i] = static_cast<float>(buf[i]);
    }
    done += got;
  }
  std::fclose(f);
  if (done < total) {
    std::memset(out + done, 0, (total - done) * sizeof(float));
    return -3;
  }
  return 0;
}

void worker_loop(Pipeline* p) {
  const int nfiles = static_cast<int>(p->paths.size());
  for (;;) {
    int seq = p->next_claim.fetch_add(1);
    if (seq >= nfiles) return;
    Slot& slot = p->ring[seq % p->capacity];
    {
      std::unique_lock<std::mutex> lk(p->mu);
      // wait until the previous occupant of this slot has been consumed
      p->cv_free.wait(lk, [&] {
        return p->closing || seq - p->popped_floor < p->capacity;
      });
      if (p->closing) return;
    }
    int rc = read_file(p->paths[seq], p->samps_per_file, slot.data.data());
    {
      std::lock_guard<std::mutex> lk(p->mu);
      slot.status = rc;
      slot.ready = true;
    }
    p->cv_ready.notify_all();
  }
}

}  // namespace

extern "C" {

// Open a pipeline over num_files capture files of samps_per_file complex
// samples each. halo_samps of the previous frame are prepended to every pop
// (zeros for the first). Returns an opaque handle, or nullptr on bad args.
void* stream_open(const char** paths, int num_files, long samps_per_file,
                  long halo_samps, int num_workers, int ring_capacity) {
  if (num_files <= 0 || samps_per_file <= 0 || halo_samps < 0 ||
      halo_samps > samps_per_file || ring_capacity < 2) {
    return nullptr;
  }
  auto* p = new Pipeline();
  p->paths.assign(paths, paths + num_files);
  p->samps_per_file = samps_per_file;
  p->halo = halo_samps;
  p->capacity = ring_capacity;
  p->ring.resize(ring_capacity);
  for (auto& s : p->ring) {
    s.data.resize(static_cast<size_t>(samps_per_file) * 2);
  }
  p->tail.assign(static_cast<size_t>(halo_samps) * 2, 0.0f);
  if (num_workers < 1) num_workers = 1;
  if (num_workers > num_files) num_workers = num_files;
  p->workers.reserve(num_workers);
  for (int t = 0; t < num_workers; ++t) {
    p->workers.emplace_back(worker_loop, p);
  }
  return p;
}

// Pop the next frame in order: writes (halo + samps_per_file) * 2 floats to
// `out` (halo of previous-frame history first). Returns the frame index, -1
// when the file list is exhausted, or the file's negative read status.
int stream_next(void* handle, float* out) {
  auto* p = static_cast<Pipeline*>(handle);
  if (p->next_pop >= static_cast<int>(p->paths.size())) return -1;
  const int seq = p->next_pop;
  Slot& slot = p->ring[seq % p->capacity];
  int rc;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_ready.wait(lk, [&] { return slot.ready; });
    rc = slot.status;
  }
  const size_t halo_f = static_cast<size_t>(p->halo) * 2;
  const size_t frame_f = static_cast<size_t>(p->samps_per_file) * 2;
  std::memcpy(out, p->tail.data(), halo_f * sizeof(float));
  std::memcpy(out + halo_f, slot.data.data(), frame_f * sizeof(float));
  if (halo_f > 0) {
    std::memcpy(p->tail.data(), slot.data.data() + (frame_f - halo_f),
                halo_f * sizeof(float));
  }
  {
    std::lock_guard<std::mutex> lk(p->mu);
    slot.ready = false;
    p->next_pop = seq + 1;
    p->popped_floor = seq + 1;
  }
  p->cv_free.notify_all();
  return rc == 0 ? seq : rc;
}

void stream_close(void* handle) {
  auto* p = static_cast<Pipeline*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->closing = true;
  }
  p->cv_free.notify_all();
  for (auto& w : p->workers) w.join();
  delete p;
}

}  // extern "C"
