// C API for the native front-end (ctypes binding surface).
// Python binds this for parity tests against the JAX front-end and to use
// the native decoder in input pipelines without pybind11.
#include <cstring>
#include <vector>

#include "frontend/feature.h"
#include "frontend/wav.h"

using namespace asvtpu;

extern "C" {

// Compute fbank for a mono waveform. Returns num_frames (or -1 on error);
// writes at most max_out floats into out (row-major [num_frames, dim]).
int asvtpu_fbank(const float* wave, int num_samples, int num_bins,
                 float samp_freq, int use_energy, int use_power, int use_log,
                 float* out, int max_out) {
  try {
    FbankOptions opts;
    opts.frame_opts.samp_freq = samp_freq;
    opts.mel_opts.num_bins = num_bins;
    opts.use_energy = use_energy;
    opts.use_power = use_power;
    opts.use_log_fbank = use_log;
    FbankComputer computer(opts);
    std::vector<float> w(wave, wave + num_samples);
    std::vector<float> feats = computer.Compute(w);
    int n = int(feats.size());
    if (n > max_out) return -1;
    std::memcpy(out, feats.data(), sizeof(float) * n);
    return n / computer.Dim();
  } catch (...) {
    return -1;
  }
}

int asvtpu_mfcc(const float* wave, int num_samples, int num_bins, int num_ceps,
                float samp_freq, int use_energy, float* out, int max_out) {
  try {
    MfccOptions opts;
    opts.frame_opts.samp_freq = samp_freq;
    opts.mel_opts.num_bins = num_bins;
    opts.num_ceps = num_ceps;
    opts.use_energy = use_energy;
    MfccComputer computer(opts);
    std::vector<float> w(wave, wave + num_samples);
    std::vector<float> feats = computer.Compute(w);
    int n = int(feats.size());
    if (n > max_out) return -1;
    std::memcpy(out, feats.data(), sizeof(float) * n);
    return n / computer.Dim();
  } catch (...) {
    return -1;
  }
}

// Read a wav file; returns num_samples (or -1), writes samples + sample rate.
int asvtpu_read_wav(const char* path, float* out, int max_out, int* sample_rate) {
  try {
    WavReader reader(path);
    std::vector<float> mono = reader.Channel(0);
    if (int(mono.size()) > max_out) return -1;
    std::memcpy(out, mono.data(), sizeof(float) * mono.size());
    *sample_rate = reader.sample_rate();
    return int(mono.size());
  } catch (...) {
    return -1;
  }
}

// Energy VAD over per-frame log energies (1 = voiced).
int asvtpu_vad(const float* log_energy, int num_frames, float threshold,
               float mean_scale, int context, float proportion, uint8_t* out) {
  VadOptions opts;
  opts.energy_threshold = threshold;
  opts.energy_mean_scale = mean_scale;
  opts.frames_context = context;
  opts.proportion_threshold = proportion;
  std::vector<float> e(log_energy, log_energy + num_frames);
  std::vector<uint8_t> v = ComputeVadEnergy(opts, e);
  std::memcpy(out, v.data(), num_frames);
  return num_frames;
}


int asvtpu_spectrogram(const float* wave, int num_samples, float samp_freq,
                       int raw_energy, float* out, int max_out) {
  try {
    SpectrogramOptions opts;
    opts.frame_opts.samp_freq = samp_freq;
    opts.raw_energy = raw_energy;
    SpectrogramComputer computer(opts);
    std::vector<float> w(wave, wave + num_samples);
    std::vector<float> feats = computer.Compute(w);
    int n = int(feats.size());
    if (n > max_out) return -1;
    std::memcpy(out, feats.data(), sizeof(float) * n);
    return n / computer.Dim();
  } catch (...) {
    return -1;
  }
}

int asvtpu_plp(const float* wave, int num_samples, int num_bins, int num_ceps,
               int lpc_order, float samp_freq, int use_energy, float* out,
               int max_out) {
  try {
    PlpOptions opts;
    opts.frame_opts.samp_freq = samp_freq;
    opts.mel_opts.num_bins = num_bins;
    opts.num_ceps = num_ceps;
    opts.lpc_order = lpc_order;
    opts.use_energy = use_energy;
    PlpComputer computer(opts);
    std::vector<float> w(wave, wave + num_samples);
    std::vector<float> feats = computer.Compute(w);
    int n = int(feats.size());
    if (n > max_out) return -1;
    std::memcpy(out, feats.data(), sizeof(float) * n);
    return n / computer.Dim();
  } catch (...) {
    return -1;
  }
}

// 3-dim processed Kaldi pitch ([pov_feat, norm_log_pitch, delta]);
// returns num_frames or -1.
int asvtpu_pitch(const float* wave, int num_samples, float samp_freq,
                 float* out, int max_out) {
  try {
    PitchOptions opts;
    opts.samp_freq = samp_freq;
    PitchComputer computer(opts);
    std::vector<float> w(wave, wave + num_samples);
    std::vector<float> feats = computer.Compute(w);
    int n = int(feats.size());
    if (n > max_out) return -1;
    std::memcpy(out, feats.data(), sizeof(float) * n);
    return n / 3;
  } catch (...) {
    return -1;
  }
}

// fbank_pitch (per-frame [fbank | pitch], the makeFeatures.sh
// fbank_pitch family); writes dim into *dim_out, returns num_frames.
int asvtpu_fbank_pitch(const float* wave, int num_samples, int num_bins,
                       float samp_freq, float* out, int max_out,
                       int* dim_out) {
  try {
    FbankOptions fopts;
    fopts.frame_opts.samp_freq = samp_freq;
    fopts.mel_opts.num_bins = num_bins;
    FbankComputer fbank(fopts);
    PitchOptions popts;
    popts.samp_freq = samp_freq;
    PitchComputer pitch(popts);
    std::vector<float> w(wave, wave + num_samples);
    int dim = 0;
    std::vector<float> feats = ComputeFbankPitch(fbank, pitch, w, &dim);
    int n = int(feats.size());
    if (n > max_out) return -1;
    std::memcpy(out, feats.data(), sizeof(float) * n);
    if (dim_out) *dim_out = dim;
    return dim > 0 ? n / dim : 0;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
