// Lock-free single-producer single-consumer ring queue.
//
// Parity: the reference's H13 async-pipeline design (SURVEY.md row 25):
// tracking/loop-closure/mapping threads connected by lock-free SPSC
// ring queues with acquire/release atomics and bounded capacities.
// Here it is the host-side runtime that feeds the TPU step: stages own
// opaque item handles (void*), so the queue never touches Python or
// device memory.
#pragma once

#include <atomic>
#include <cstddef>
#include <vector>

namespace ariaslam {

class SpscQueue {
 public:
  explicit SpscQueue(size_t capacity)
      : buf_(capacity + 1), cap_(capacity + 1), head_(0), tail_(0) {}

  // Returns false when full (caller decides: block, retry, or drop —
  // the H13 backpressure policy lives in the executor).
  bool push(void* item) {
    const size_t head = head_.load(std::memory_order_relaxed);
    const size_t next = (head + 1) % cap_;
    if (next == tail_.load(std::memory_order_acquire)) return false;
    buf_[head] = item;
    head_.store(next, std::memory_order_release);
    return true;
  }

  bool pop(void** item) {
    const size_t tail = tail_.load(std::memory_order_relaxed);
    if (tail == head_.load(std::memory_order_acquire)) return false;
    *item = buf_[tail];
    tail_.store((tail + 1) % cap_, std::memory_order_release);
    return true;
  }

  size_t size() const {
    const size_t h = head_.load(std::memory_order_acquire);
    const size_t t = tail_.load(std::memory_order_acquire);
    return (h + cap_ - t) % cap_;
  }

 private:
  std::vector<void*> buf_;
  const size_t cap_;
  std::atomic<size_t> head_;
  std::atomic<size_t> tail_;
};

}  // namespace ariaslam
