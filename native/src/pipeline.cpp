// Async staged pipeline executor (host runtime).
//
// Parity: the reference's H13 multithreaded pipeline design
// (SURVEY.md row 25): N pipeline stages, each a dedicated worker
// thread with a priority hint, connected by bounded lock-free SPSC
// queues; frame-skip backpressure when a queue backs up. In the TPU
// framework the stages are host-side (decode -> device dispatch ->
// result handling); device compute itself is one XLA program, so the
// executor's job is keeping the input queue full and the output queue
// drained while the chip runs asynchronously.
//
// C ABI for ctypes. Items are opaque uint64 handles owned by Python.

#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

#include "spsc_queue.hpp"

extern "C" {

typedef void (*stage_fn)(uint64_t item, void* user);

struct Stage {
  stage_fn fn = nullptr;
  void* user = nullptr;
  ariaslam::SpscQueue* in = nullptr;   // owned by pipeline
  std::thread worker;
  std::atomic<uint64_t> processed{0};
  std::atomic<uint64_t> dropped{0};
};

struct Pipeline {
  std::vector<Stage*> stages;
  std::vector<ariaslam::SpscQueue*> queues;
  std::atomic<bool> running{false};
  int drop_threshold = 0;  // >0: drop incoming when first queue deeper
};

static void worker_loop(Pipeline* p, size_t idx) {
  Stage* s = p->stages[idx];
  ariaslam::SpscQueue* out =
      idx + 1 < p->stages.size() ? p->stages[idx + 1]->in : nullptr;
  void* item = nullptr;
  while (p->running.load(std::memory_order_acquire) || s->in->size() > 0) {
    if (s->in->pop(&item)) {
      s->fn(reinterpret_cast<uint64_t>(item), s->user);
      s->processed.fetch_add(1, std::memory_order_relaxed);
      if (out != nullptr) {
        // block until downstream has room (bounded queues give natural
        // backpressure between stages)
        while (!out->push(item) &&
               p->running.load(std::memory_order_acquire)) {
          std::this_thread::sleep_for(std::chrono::microseconds(50));
        }
      }
    } else {
      std::this_thread::sleep_for(std::chrono::microseconds(100));
    }
  }
}

Pipeline* pipeline_create(int num_stages, const int* queue_capacities,
                          int drop_threshold) {
  auto* p = new Pipeline();
  p->drop_threshold = drop_threshold;
  for (int i = 0; i < num_stages; ++i) {
    auto* s = new Stage();
    s->in = new ariaslam::SpscQueue(
        static_cast<size_t>(queue_capacities[i] > 0 ? queue_capacities[i] : 8));
    p->stages.push_back(s);
  }
  return p;
}

void pipeline_set_stage(Pipeline* p, int idx, stage_fn fn, void* user) {
  p->stages[idx]->fn = fn;
  p->stages[idx]->user = user;
}

void pipeline_start(Pipeline* p) {
  p->running.store(true, std::memory_order_release);
  for (size_t i = 0; i < p->stages.size(); ++i) {
    p->stages[i]->worker = std::thread(worker_loop, p, i);
  }
}

// Returns 1 if accepted, 0 if dropped by backpressure policy
// (parity: H13 frame skipping — queue depth > threshold -> drop).
int pipeline_submit(Pipeline* p, uint64_t item) {
  ariaslam::SpscQueue* q = p->stages[0]->in;
  if (p->drop_threshold > 0 &&
      q->size() >= static_cast<size_t>(p->drop_threshold)) {
    p->stages[0]->dropped.fetch_add(1, std::memory_order_relaxed);
    return 0;
  }
  while (!q->push(reinterpret_cast<void*>(item))) {
    if (!p->running.load(std::memory_order_acquire)) return 0;
    std::this_thread::sleep_for(std::chrono::microseconds(50));
  }
  return 1;
}

void pipeline_stop(Pipeline* p) {
  // drain: workers exit once running=false AND their queue is empty
  bool busy = true;
  while (busy) {
    busy = false;
    for (auto* s : p->stages) busy = busy || s->in->size() > 0;
    if (busy) std::this_thread::sleep_for(std::chrono::milliseconds(1));
  }
  p->running.store(false, std::memory_order_release);
  for (auto* s : p->stages) {
    if (s->worker.joinable()) s->worker.join();
  }
}

void pipeline_stats(Pipeline* p, uint64_t* processed, uint64_t* dropped,
                    uint64_t* depths) {
  for (size_t i = 0; i < p->stages.size(); ++i) {
    processed[i] = p->stages[i]->processed.load(std::memory_order_relaxed);
    dropped[i] = p->stages[i]->dropped.load(std::memory_order_relaxed);
    depths[i] = p->stages[i]->in->size();
  }
}

void pipeline_destroy(Pipeline* p) {
  if (p->running.load(std::memory_order_acquire)) pipeline_stop(p);
  for (auto* s : p->stages) {
    delete s->in;
    delete s;
  }
  delete p;
}

}  // extern "C"
