// Streaming feature pipeline: producer pushes waveform blocks, consumer
// reads completed feature frames (parity: reference
// runtime/frontend/feature_pipeline.{h,cc}).
#ifndef ASV_TPU_RUNTIME_FRONTEND_FEATURE_PIPELINE_H_
#define ASV_TPU_RUNTIME_FRONTEND_FEATURE_PIPELINE_H_

#include <mutex>
#include <vector>

#include "frontend/feature.h"
#include "utils/blocking_queue.h"

namespace asvtpu {

class FeaturePipeline {
 public:
  explicit FeaturePipeline(const FbankOptions& opts)
      : computer_(opts), opts_(opts) {}

  // Accept a waveform block; computes all frames completed by the new
  // samples and queues them. Carries the remainder (window overlap).
  void AcceptWaveform(const std::vector<float>& wav) {
    std::lock_guard<std::mutex> lock(mu_);
    remained_.insert(remained_.end(), wav.begin(), wav.end());
    const auto& fo = opts_.frame_opts;
    int nf = fo.NumFrames(remained_.size());
    if (nf <= 0) return;
    std::vector<float> feats = computer_.Compute(remained_);
    int dim = computer_.Dim();
    for (int t = 0; t < nf; ++t)
      queue_.Push(std::vector<float>(feats.begin() + size_t(t) * dim,
                                     feats.begin() + size_t(t + 1) * dim));
    num_frames_ += nf;
    // keep the un-consumed tail: samples from the first incomplete frame on
    int64_t consumed = int64_t(nf) * fo.WindowShift();
    remained_.erase(remained_.begin(), remained_.begin() + consumed);
  }

  void InputFinished() { queue_.Finish(); }

  // Pop one frame; false at end of stream.
  bool ReadOne(std::vector<float>* frame) {
    auto v = queue_.Pop();
    if (!v) return false;
    *frame = std::move(*v);
    return true;
  }

  int Dim() const { return computer_.Dim(); }
  int NumFramesReady() const { return num_frames_; }

 private:
  FbankComputer computer_;
  FbankOptions opts_;
  std::vector<float> remained_;
  BlockingQueue<std::vector<float>> queue_;
  std::mutex mu_;
  int num_frames_ = 0;
};

}  // namespace asvtpu

#endif  // ASV_TPU_RUNTIME_FRONTEND_FEATURE_PIPELINE_H_
