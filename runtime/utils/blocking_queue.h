// Bounded thread-safe queue (parity: reference runtime/utils/blocking_queue.h).
#ifndef ASV_TPU_RUNTIME_UTILS_BLOCKING_QUEUE_H_
#define ASV_TPU_RUNTIME_UTILS_BLOCKING_QUEUE_H_

#include <condition_variable>
#include <deque>
#include <limits>
#include <mutex>
#include <optional>
#include <utility>

namespace asvtpu {

template <typename T>
class BlockingQueue {
 public:
  explicit BlockingQueue(size_t capacity = std::numeric_limits<size_t>::max())
      : capacity_(capacity) {}

  void Push(T value) {
    std::unique_lock<std::mutex> lock(mu_);
    not_full_.wait(lock, [this] { return queue_.size() < capacity_ || done_; });
    if (done_) return;
    queue_.push_back(std::move(value));
    not_empty_.notify_one();
  }

  // Blocks until an item is available or Finish() was called and the queue
  // drained; returns nullopt in the latter case.
  std::optional<T> Pop() {
    std::unique_lock<std::mutex> lock(mu_);
    not_empty_.wait(lock, [this] { return !queue_.empty() || done_; });
    if (queue_.empty()) return std::nullopt;
    T value = std::move(queue_.front());
    queue_.pop_front();
    not_full_.notify_one();
    return value;
  }

  void Finish() {
    std::lock_guard<std::mutex> lock(mu_);
    done_ = true;
    not_empty_.notify_all();
    not_full_.notify_all();
  }

  size_t Size() const {
    std::lock_guard<std::mutex> lock(mu_);
    return queue_.size();
  }

 private:
  mutable std::mutex mu_;
  std::condition_variable not_empty_, not_full_;
  std::deque<T> queue_;
  size_t capacity_;
  bool done_ = false;
};

}  // namespace asvtpu

#endif  // ASV_TPU_RUNTIME_UTILS_BLOCKING_QUEUE_H_
