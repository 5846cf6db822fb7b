// Kaldi-compatible feature computation, dependency-free C++17.
// Parity target: reference runtime/kaldifeat/csrc/{feature-window,
// mel-computations, feature-fbank, feature-mfcc}.{h,cc} — re-implemented
// from the on-disk semantics, golden-checked against the JAX front-end.
#ifndef ASV_TPU_RUNTIME_FRONTEND_FEATURE_H_
#define ASV_TPU_RUNTIME_FRONTEND_FEATURE_H_

#include <cmath>
#include <complex>
#include <cstdint>
#include <random>
#include <string>
#include <vector>

namespace asvtpu {

struct FrameOptions {
  float samp_freq = 16000.0f;
  float frame_shift_ms = 10.0f;
  float frame_length_ms = 25.0f;
  float dither = 0.0f;
  float preemph_coeff = 0.97f;
  bool remove_dc_offset = true;
  std::string window_type = "povey";
  bool round_to_power_of_two = true;
  float blackman_coeff = 0.42f;
  bool snip_edges = true;

  int WindowShift() const { return int(samp_freq * 0.001f * frame_shift_ms); }
  int WindowSize() const { return int(samp_freq * 0.001f * frame_length_ms); }
  int PaddedWindowSize() const;
  int NumFrames(int64_t num_samples) const;
};

struct MelOptions {
  int num_bins = 23;
  float low_freq = 20.0f;
  float high_freq = 0.0f;
};

struct FbankOptions {
  FrameOptions frame_opts;
  MelOptions mel_opts;
  bool use_energy = false;
  float energy_floor = 0.0f;
  bool raw_energy = true;
  bool htk_compat = false;
  bool use_log_fbank = true;
  bool use_power = true;
  int Dim() const { return mel_opts.num_bins + (use_energy ? 1 : 0); }
};

struct MfccOptions {
  FrameOptions frame_opts;
  MelOptions mel_opts;
  int num_ceps = 13;
  bool use_energy = true;
  float energy_floor = 0.0f;
  bool raw_energy = true;
  float cepstral_lifter = 22.0f;
  int Dim() const { return num_ceps; }
};

// In-place iterative radix-2 FFT (padded window sizes are powers of two).
void Rfft(const std::vector<float>& in, std::vector<float>* power_out);

class FeatureWindow {
 public:
  explicit FeatureWindow(const FrameOptions& opts);
  // Extract + process frame t of wave into out[PaddedWindowSize()];
  // returns raw log energy (pre-window) of the frame.
  float Extract(const std::vector<float>& wave, int t, std::vector<float>* out,
                std::mt19937* rng = nullptr) const;

 private:
  FrameOptions opts_;
  std::vector<float> window_;
};

class MelBanks {
 public:
  MelBanks(const MelOptions& mel, const FrameOptions& frame);
  // power spectrum [num_fft_bins] -> mel energies [num_bins]
  void Compute(const std::vector<float>& power, std::vector<float>* mel) const;
  int NumBins() const { return static_cast<int>(bins_.size()); }

 private:
  // per-bin (first_index, weights)
  std::vector<std::pair<int, std::vector<float>>> bins_;
};

class FbankComputer {
 public:
  explicit FbankComputer(const FbankOptions& opts);
  int Dim() const { return opts_.Dim(); }
  // wave -> [num_frames * Dim()] row-major features
  std::vector<float> Compute(const std::vector<float>& wave) const;
  const FbankOptions& opts() const { return opts_; }

 private:
  FbankOptions opts_;
  FeatureWindow window_;
  MelBanks mel_;
};

class MfccComputer {
 public:
  explicit MfccComputer(const MfccOptions& opts);
  int Dim() const { return opts_.Dim(); }
  std::vector<float> Compute(const std::vector<float>& wave) const;

 private:
  MfccOptions opts_;
  FeatureWindow window_;
  MelBanks mel_;
  std::vector<float> dct_;     // [num_ceps, num_bins] row-major
  std::vector<float> lifter_;  // [num_ceps]
};

struct SpectrogramOptions {
  FrameOptions frame_opts;
  float energy_floor = 0.0f;
  bool raw_energy = true;
  int Dim() const { return frame_opts.PaddedWindowSize() / 2 + 1; }
};

// Log power spectrogram with raw log-energy in column 0
// (parity: reference runtime/kaldifeat/csrc/feature-spectrogram.cc:22-66).
class SpectrogramComputer {
 public:
  explicit SpectrogramComputer(const SpectrogramOptions& opts);
  int Dim() const { return opts_.Dim(); }
  std::vector<float> Compute(const std::vector<float>& wave) const;

 private:
  SpectrogramOptions opts_;
  FeatureWindow window_;
};

struct PlpOptions {
  FrameOptions frame_opts;
  MelOptions mel_opts;
  int lpc_order = 12;
  int num_ceps = 13;
  bool use_energy = true;
  float energy_floor = 0.0f;
  bool raw_energy = true;
  float compress_factor = 0.33333f;
  float cepstral_lifter = 22.0f;
  float cepstral_scale = 1.0f;
  bool htk_compat = false;
  int Dim() const { return num_ceps; }
};

// PLP features: mel -> equal loudness -> power compression -> IDFT
// autocorrelation -> Levinson-Durbin LPC -> cepstrum
// (parity: reference runtime/kaldifeat/csrc/feature-plp.cc:80-175,
// mel-computations.cc Durbin :235-277 / Lpc2CepstrumInternal :313).
class PlpComputer {
 public:
  explicit PlpComputer(const PlpOptions& opts);
  int Dim() const { return opts_.Dim(); }
  std::vector<float> Compute(const std::vector<float>& wave) const;

 private:
  PlpOptions opts_;
  FeatureWindow window_;
  MelBanks mel_;
  std::vector<float> equal_loudness_;  // [num_bins]
  std::vector<float> idft_;            // [num_bins+2, lpc_order+1] row-major
  std::vector<float> lifter_;          // [num_ceps]
};

// Kaldi pitch (NCCF + lag interpolation + Viterbi + POV), mirroring the
// python implementation (asv_subtools_tpu/features/pitch.py; option
// semantics from the reference's pitch-functions.h:27-125 — the
// reference ships the struct only). Output = the processed 3-dim pitch
// feature [pov_scale*pov_feat, pitch_scale*normalized_log_pitch,
// delta_pitch_scale*delta], frame-aligned with fbank.
struct PitchOptions {
  float samp_freq = 16000.0f;
  float frame_shift_ms = 10.0f;
  float frame_length_ms = 25.0f;
  float min_f0 = 50.0f;
  float max_f0 = 400.0f;
  float soft_min_f0 = 10.0f;
  float penalty_factor = 0.1f;
  float lowpass_cutoff = 1000.0f;
  float resample_freq = 4000.0f;
  float delta_pitch = 0.005f;
  float nccf_ballast = 7000.0f;
  int lowpass_filter_width = 1;
  int upsample_filter_width = 5;
  // process-pitch-feats defaults
  float pitch_scale = 2.0f;
  float pov_scale = 2.0f;
  float delta_pitch_scale = 10.0f;
  int delta_window = 2;
  int normalization_left_context = 75;
  int normalization_right_context = 75;
  int Dim() const { return 3; }
};

class PitchComputer {
 public:
  explicit PitchComputer(const PitchOptions& opts) : opts_(opts) {}
  int Dim() const { return opts_.Dim(); }
  // wave at samp_freq -> [num_frames * 3] row-major processed features
  std::vector<float> Compute(const std::vector<float>& wave) const;

 private:
  PitchOptions opts_;
};

// fbank_pitch (reference makeFeatures.sh fbank_pitch config /
// steps/make_fbank_pitch.sh): per-frame [fbank | 3-dim pitch].
std::vector<float> ComputeFbankPitch(const FbankComputer& fbank,
                                     const PitchComputer& pitch,
                                     const std::vector<float>& wave,
                                     int* dim_out);

// Frame-level energy VAD (parity: runtime/extractor/torch_asv_extractor.cc:14-62).
struct VadOptions {
  float energy_threshold = 5.5f;
  float energy_mean_scale = 0.5f;
  int frames_context = 0;
  float proportion_threshold = 0.6f;
};

std::vector<uint8_t> ComputeVadEnergy(const VadOptions& opts,
                                      const std::vector<float>& log_energy);

}  // namespace asvtpu

#endif  // ASV_TPU_RUNTIME_FRONTEND_FEATURE_H_
