#include "frontend/feature.h"

#include <algorithm>
#include <cassert>
#include <stdexcept>

namespace asvtpu {

namespace {
constexpr float kEps = 1.1920928955078125e-07f;  // float32 epsilon
constexpr double kPi = 3.14159265358979323846;

inline double MelScale(double freq) { return 1127.0 * std::log(1.0 + freq / 700.0); }
}  // namespace

int FrameOptions::PaddedWindowSize() const {
  int n = WindowSize();
  if (!round_to_power_of_two) return n;
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

int FrameOptions::NumFrames(int64_t num_samples) const {
  int shift = WindowShift(), length = WindowSize();
  if (snip_edges) {
    if (num_samples < length) return 0;
    return 1 + int((num_samples - length) / shift);
  }
  return int((num_samples + shift / 2) / shift);
}

// --------------------------------------------------------------------------
// FFT: iterative radix-2, real input via complex transform.
// --------------------------------------------------------------------------

void Rfft(const std::vector<float>& in, std::vector<float>* power_out) {
  const size_t n = in.size();
  assert((n & (n - 1)) == 0 && "FFT size must be a power of two");
  std::vector<std::complex<double>> a(n);
  for (size_t i = 0; i < n; ++i) a[i] = in[i];
  // bit reversal
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = -2.0 * kPi / double(len);
    std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0);
      for (size_t j = 0; j < len / 2; ++j) {
        auto u = a[i + j];
        auto v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  power_out->resize(n / 2 + 1);
  for (size_t k = 0; k <= n / 2; ++k) {
    double re = a[k].real(), im = a[k].imag();
    (*power_out)[k] = float(re * re + im * im);
  }
}

// --------------------------------------------------------------------------
// FeatureWindow
// --------------------------------------------------------------------------

FeatureWindow::FeatureWindow(const FrameOptions& opts) : opts_(opts) {
  int n = opts.WindowSize();
  window_.resize(n);
  double a = 2.0 * kPi / (n - 1);
  for (int i = 0; i < n; ++i) {
    double w;
    if (opts.window_type == "hanning") {
      w = 0.5 - 0.5 * std::cos(a * i);
    } else if (opts.window_type == "sine") {
      w = std::sin(0.5 * a * i);
    } else if (opts.window_type == "hamming") {
      w = 0.54 - 0.46 * std::cos(a * i);
    } else if (opts.window_type == "povey") {
      w = std::pow(0.5 - 0.5 * std::cos(a * i), 0.85);
    } else if (opts.window_type == "rectangular") {
      w = 1.0;
    } else if (opts.window_type == "blackman") {
      w = opts.blackman_coeff - 0.5 * std::cos(a * i) +
          (0.5 - opts.blackman_coeff) * std::cos(2 * a * i);
    } else {
      throw std::runtime_error("unknown window type " + opts.window_type);
    }
    window_[i] = float(w);
  }
}

float FeatureWindow::Extract(const std::vector<float>& wave, int t,
                             std::vector<float>* out, std::mt19937* rng) const {
  int length = opts_.WindowSize(), shift = opts_.WindowShift();
  int padded = opts_.PaddedWindowSize();
  out->assign(padded, 0.0f);
  int64_t start;
  if (opts_.snip_edges) {
    start = int64_t(t) * shift;
    for (int i = 0; i < length; ++i) (*out)[i] = wave[start + i];
  } else {
    start = int64_t(shift) * t + shift / 2 - length / 2;
    int64_t n = int64_t(wave.size());
    for (int i = 0; i < length; ++i) {
      int64_t s = start + i;
      if (s < 0) s = -s - 1;                      // reflect
      if (s >= n) s = 2 * n - 1 - s;              // reflect
      (*out)[i] = wave[s];
    }
  }
  if (opts_.dither != 0.0f && rng != nullptr) {
    std::normal_distribution<float> d(0.0f, 1.0f);
    for (int i = 0; i < length; ++i) (*out)[i] += opts_.dither * d(*rng);
  }
  if (opts_.remove_dc_offset) {
    double mean = 0;
    for (int i = 0; i < length; ++i) mean += (*out)[i];
    mean /= length;
    for (int i = 0; i < length; ++i) (*out)[i] -= float(mean);
  }
  double energy = 0;
  for (int i = 0; i < length; ++i) energy += double((*out)[i]) * (*out)[i];
  float raw_log_energy = std::log(std::max(float(energy), kEps));
  if (opts_.preemph_coeff != 0.0f) {
    for (int i = length - 1; i > 0; --i)
      (*out)[i] -= opts_.preemph_coeff * (*out)[i - 1];
    (*out)[0] *= (1.0f - opts_.preemph_coeff);
  }
  for (int i = 0; i < length; ++i) (*out)[i] *= window_[i];
  return raw_log_energy;
}

// --------------------------------------------------------------------------
// MelBanks
// --------------------------------------------------------------------------

MelBanks::MelBanks(const MelOptions& mel, const FrameOptions& frame) {
  int padded = frame.PaddedWindowSize();
  int num_fft_bins = padded / 2;
  double nyquist = 0.5 * frame.samp_freq;
  double high = mel.high_freq > 0 ? mel.high_freq : nyquist + mel.high_freq;
  double mel_low = MelScale(mel.low_freq), mel_high = MelScale(high);
  double mel_delta = (mel_high - mel_low) / (mel.num_bins + 1);
  double fft_bin_width = frame.samp_freq / padded;
  bins_.resize(mel.num_bins);
  for (int b = 0; b < mel.num_bins; ++b) {
    double left = mel_low + b * mel_delta;
    double center = left + mel_delta;
    double right = center + mel_delta;
    int first = -1;
    std::vector<float> w;
    for (int i = 0; i < num_fft_bins; ++i) {
      double m = MelScale(fft_bin_width * i);
      if (m > left && m < right) {
        double v = m <= center ? (m - left) / (center - left)
                               : (right - m) / (right - center);
        if (first < 0) first = i;
        w.push_back(float(v));
      } else if (first >= 0) {
        break;
      }
    }
    bins_[b] = {first < 0 ? 0 : first, std::move(w)};
  }
}

void MelBanks::Compute(const std::vector<float>& power,
                       std::vector<float>* mel) const {
  mel->resize(bins_.size());
  for (size_t b = 0; b < bins_.size(); ++b) {
    double sum = 0;
    int first = bins_[b].first;
    const auto& w = bins_[b].second;
    for (size_t i = 0; i < w.size(); ++i) sum += double(w[i]) * power[first + i];
    (*mel)[b] = float(sum);
  }
}

// --------------------------------------------------------------------------
// Fbank / Mfcc
// --------------------------------------------------------------------------

FbankComputer::FbankComputer(const FbankOptions& opts)
    : opts_(opts), window_(opts.frame_opts), mel_(opts.mel_opts, opts.frame_opts) {}

std::vector<float> FbankComputer::Compute(const std::vector<float>& wave) const {
  const auto& fo = opts_.frame_opts;
  int nf = fo.NumFrames(wave.size());
  int dim = Dim(), nb = opts_.mel_opts.num_bins;
  std::vector<float> out(size_t(nf) * dim);
  std::vector<float> frame, power, mel;
  std::mt19937 rng(0);
  for (int t = 0; t < nf; ++t) {
    float log_e = window_.Extract(wave, t, &frame, fo.dither != 0 ? &rng : nullptr);
    Rfft(frame, &power);
    power.resize(fo.PaddedWindowSize() / 2);  // drop highest bin
    if (!opts_.use_power)
      for (auto& p : power) p = std::sqrt(p);
    mel.clear();
    mel_.Compute(power, &mel);
    float* row = &out[size_t(t) * dim];
    int off = (opts_.use_energy && !opts_.htk_compat) ? 1 : 0;
    for (int b = 0; b < nb; ++b) {
      float v = mel[b];
      if (opts_.use_log_fbank) v = std::log(std::max(v, kEps));
      row[off + b] = v;
    }
    if (opts_.use_energy) {
      if (opts_.energy_floor > 0)
        log_e = std::max(log_e, std::log(opts_.energy_floor));
      row[opts_.htk_compat ? nb : 0] = log_e;
    }
  }
  return out;
}

MfccComputer::MfccComputer(const MfccOptions& opts)
    : opts_(opts), window_(opts.frame_opts), mel_(opts.mel_opts, opts.frame_opts) {
  int n = opts.mel_opts.num_bins, k = opts.num_ceps;
  dct_.resize(size_t(k) * n);
  for (int j = 0; j < n; ++j) dct_[j] = float(std::sqrt(1.0 / n));
  for (int i = 1; i < k; ++i)
    for (int j = 0; j < n; ++j)
      dct_[size_t(i) * n + j] =
          float(std::sqrt(2.0 / n) * std::cos(kPi / n * i * (j + 0.5)));
  lifter_.resize(k);
  for (int i = 0; i < k; ++i)
    lifter_[i] = opts.cepstral_lifter != 0
                     ? float(1.0 + 0.5 * opts.cepstral_lifter *
                                       std::sin(kPi * i / opts.cepstral_lifter))
                     : 1.0f;
}

std::vector<float> MfccComputer::Compute(const std::vector<float>& wave) const {
  const auto& fo = opts_.frame_opts;
  int nf = fo.NumFrames(wave.size());
  int k = opts_.num_ceps, nb = opts_.mel_opts.num_bins;
  std::vector<float> out(size_t(nf) * k);
  std::vector<float> frame, power, mel(nb);
  for (int t = 0; t < nf; ++t) {
    float log_e = window_.Extract(wave, t, &frame);
    Rfft(frame, &power);
    power.resize(fo.PaddedWindowSize() / 2);
    mel.clear();
    mel_.Compute(power, &mel);
    for (auto& m : mel) m = std::log(std::max(m, kEps));
    float* row = &out[size_t(t) * k];
    for (int i = 0; i < k; ++i) {
      double s = 0;
      for (int j = 0; j < nb; ++j) s += double(dct_[size_t(i) * nb + j]) * mel[j];
      row[i] = float(s) * lifter_[i];
    }
    if (opts_.use_energy) {
      if (opts_.energy_floor > 0)
        log_e = std::max(log_e, std::log(opts_.energy_floor));
      row[0] = log_e;
    }
  }
  return out;
}

// --------------------------------------------------------------------------
// VAD
// --------------------------------------------------------------------------

std::vector<uint8_t> ComputeVadEnergy(const VadOptions& opts,
                                      const std::vector<float>& log_energy) {
  size_t t = log_energy.size();
  std::vector<uint8_t> out(t, 0);
  if (t == 0) return out;
  double threshold = opts.energy_threshold;
  if (opts.energy_mean_scale != 0.0f) {
    double mean = 0;
    for (float e : log_energy) mean += e;
    mean /= double(t);
    threshold += opts.energy_mean_scale * mean;
  }
  int ctx = opts.frames_context;
  for (size_t i = 0; i < t; ++i) {
    int num = 0, den = 0;
    for (int j = -ctx; j <= ctx; ++j) {
      int64_t k = int64_t(i) + j;
      if (k < 0 || k >= int64_t(t)) continue;
      ++den;
      if (log_energy[k] > threshold) ++num;
    }
    out[i] = (den > 0 && num >= den * opts.proportion_threshold) ? 1 : 0;
  }
  return out;
}


// --------------------------------------------------------------------------
// Spectrogram
// --------------------------------------------------------------------------

SpectrogramComputer::SpectrogramComputer(const SpectrogramOptions& opts)
    : opts_(opts), window_(opts.frame_opts) {}

std::vector<float> SpectrogramComputer::Compute(
    const std::vector<float>& wave) const {
  const auto& fo = opts_.frame_opts;
  int nf = fo.NumFrames(wave.size());
  int dim = Dim();
  std::vector<float> out(size_t(nf) * dim);
  std::vector<float> frame, power;
  std::mt19937 rng(0);
  for (int t = 0; t < nf; ++t) {
    float log_e =
        window_.Extract(wave, t, &frame, fo.dither != 0 ? &rng : nullptr);
    if (!opts_.raw_energy) {
      double e = 0;
      for (float v : frame) e += double(v) * v;
      log_e = std::log(std::max(float(e), kEps));
    }
    Rfft(frame, &power);  // n/2 + 1 bins
    float* row = &out[size_t(t) * dim];
    for (int k = 0; k < dim; ++k) row[k] = std::log(std::max(power[k], kEps));
    if (opts_.energy_floor > 0)
      log_e = std::max(log_e, std::log(opts_.energy_floor));
    row[0] = log_e;
  }
  return out;
}

// --------------------------------------------------------------------------
// PLP
// --------------------------------------------------------------------------

PlpComputer::PlpComputer(const PlpOptions& opts)
    : opts_(opts), window_(opts.frame_opts),
      mel_(opts.mel_opts, opts.frame_opts) {
  int nb = opts.mel_opts.num_bins;
  // Equal-loudness per mel-bin center frequency
  // (GetEqualLoudnessVector, mel-computations.cc:214-227).
  double nyquist = 0.5 * opts.frame_opts.samp_freq;
  double high = opts.mel_opts.high_freq > 0 ? opts.mel_opts.high_freq
                                            : nyquist + opts.mel_opts.high_freq;
  double mel_low = MelScale(opts.mel_opts.low_freq);
  double mel_delta = (MelScale(high) - mel_low) / (nb + 1);
  equal_loudness_.resize(nb);
  for (int b = 0; b < nb; ++b) {
    double center_mel = mel_low + (b + 1) * mel_delta;
    double f0 = 700.0 * (std::exp(center_mel / 1127.0) - 1.0);
    double fsq = f0 * f0;
    double fsub = fsq / (fsq + 1.6e5);
    equal_loudness_[b] = float(fsub * fsub * ((fsq + 1.44e6) / (fsq + 9.61e6)));
  }
  // IDFT bases [dimension, n_bases] with dimension = nb + 2
  // (InitIdftBases, feature-functions.cc:13-30).
  int dimension = nb + 2, n_bases = opts.lpc_order + 1;
  double angle = kPi / (dimension - 1);
  double scale = 1.0 / (2.0 * (dimension - 1));
  idft_.assign(size_t(dimension) * n_bases, 0.0f);
  for (int i = 0; i < n_bases; ++i) {
    idft_[size_t(0) * n_bases + i] = float(scale);
    for (int j = 1; j < dimension; ++j)
      idft_[size_t(j) * n_bases + i] = float(2 * scale * std::cos(angle * i * j));
    idft_[size_t(dimension - 1) * n_bases + i] =
        float(scale * std::cos(angle * i * (dimension - 1)));
  }
  lifter_.resize(opts.num_ceps);
  for (int i = 0; i < opts.num_ceps; ++i)
    lifter_[i] = opts.cepstral_lifter != 0.0f
                     ? float(1.0 + 0.5 * opts.cepstral_lifter *
                                       std::sin(kPi * i / opts.cepstral_lifter))
                     : 1.0f;
}

std::vector<float> PlpComputer::Compute(const std::vector<float>& wave) const {
  const auto& fo = opts_.frame_opts;
  int nf = fo.NumFrames(wave.size());
  int nb = opts_.mel_opts.num_bins;
  int order = opts_.lpc_order, k = opts_.num_ceps;
  int dim = Dim();
  std::vector<float> out(size_t(nf) * dim);
  std::vector<float> frame, power, mel;
  std::vector<double> dup(nb + 2), autocorr(order + 1), lpc(order), ceps(order);
  std::mt19937 rng(0);
  for (int t = 0; t < nf; ++t) {
    float log_e =
        window_.Extract(wave, t, &frame, fo.dither != 0 ? &rng : nullptr);
    if (opts_.use_energy && !opts_.raw_energy) {
      double e = 0;
      for (float v : frame) e += double(v) * v;
      log_e = std::log(std::max(float(e), kEps));
    }
    Rfft(frame, &power);
    power.resize(fo.PaddedWindowSize() / 2);  // drop highest bin
    mel.clear();
    mel_.Compute(power, &mel);
    for (int b = 0; b < nb; ++b) {
      double v = double(mel[b]) * equal_loudness_[b];
      dup[b + 1] = std::pow(std::max(v, double(kEps)),
                            double(opts_.compress_factor));
    }
    dup[0] = dup[1];
    dup[nb + 1] = dup[nb];
    // autocorr = dup @ idft  ([nb+2] x [nb+2, order+1])
    for (int i = 0; i <= order; ++i) {
      double sum = 0;
      for (int j = 0; j < nb + 2; ++j)
        sum += dup[j] * idft_[size_t(j) * (order + 1) + i];
      autocorr[i] = sum;
    }
    // Levinson-Durbin (Durbin, mel-computations.cc:235-277)
    double e = autocorr[0];
    std::fill(lpc.begin(), lpc.end(), 0.0);
    for (int i = 0; i < order; ++i) {
      double ki = autocorr[i + 1];
      for (int j = 0; j < i; ++j) ki += lpc[j] * autocorr[i - j];
      ki /= e;
      double c = std::max(1.0 - ki * ki, 1.0e-5);
      e *= c;
      std::vector<double> nl(i + 1);
      for (int j = 0; j < i; ++j) nl[j] = lpc[j] - ki * lpc[i - j - 1];
      nl[i] = -ki;
      for (int j = 0; j <= i; ++j) lpc[j] = nl[j];
    }
    double c0 = std::log(std::max(e, double(kEps)));
    // LPC -> cepstrum (Lpc2CepstrumInternal, mel-computations.cc:313)
    for (int i = 0; i < order; ++i) {
      double s = 0;
      for (int j = 0; j < i; ++j) s += (i - j) * lpc[j] * ceps[i - j - 1];
      ceps[i] = -lpc[i] - s / (i + 1);
    }
    float* row = &out[size_t(t) * dim];
    row[0] = float(c0);
    for (int i = 1; i < k; ++i) row[i] = float(ceps[i - 1]);
    for (int i = 0; i < k; ++i) row[i] *= lifter_[i] * opts_.cepstral_scale;
    if (opts_.use_energy) {
      if (opts_.energy_floor > 0)
        log_e = std::max(log_e, std::log(opts_.energy_floor));
      row[0] = log_e;
    }
    if (opts_.htk_compat) {
      float energy = row[0];
      for (int i = 0; i + 1 < k; ++i) row[i] = row[i + 1];
      row[k - 1] = energy;
    }
  }
  return out;
}

// ---------------------------------------------------------------------------
// Kaldi pitch. Mirrors asv_subtools_tpu/features/pitch.py stage by stage
// (double precision internally so the two implementations golden-match):
// lowpass+resample -> integer-lag NCCF -> sinc lag interpolation ->
// Viterbi -> POV + normalization + delta.
// ---------------------------------------------------------------------------

namespace {

// Kaldi resample.h FilterFunc: Hanning-windowed sinc, support
// |t| < num_zeros/(2 cutoff).
double FilterFunc(double t, double cutoff, int num_zeros) {
  double half_support = num_zeros / (2.0 * cutoff);
  if (std::abs(t) >= half_support) return 0.0;
  double window = 0.5 * (1.0 + std::cos(2.0 * M_PI * cutoff / num_zeros * t));
  if (t == 0.0) return window * 2.0 * cutoff;
  return window * std::sin(2.0 * M_PI * cutoff * t) / (M_PI * t);
}

std::vector<double> LowpassResample(const std::vector<float>& wave,
                                    double sr_in, double sr_out,
                                    double cutoff, int num_zeros) {
  int64_t n_in = int64_t(wave.size());
  int64_t n_out = int64_t(n_in * sr_out / sr_in);
  std::vector<double> out(size_t(std::max<int64_t>(n_out, 0)), 0.0);
  double half_support = num_zeros / (2.0 * cutoff);
  int hw = int(std::ceil(half_support * sr_in)) + 1;
  for (int64_t j = 0; j < n_out; ++j) {
    double t_out = j / sr_out;
    int64_t center = int64_t(std::llround(t_out * sr_in));
    double acc = 0.0;
    for (int64_t i = center - hw; i <= center + hw; ++i) {
      if (i < 0 || i >= n_in) continue;
      acc += double(wave[size_t(i)]) *
             FilterFunc(i / sr_in - t_out, cutoff, num_zeros);
    }
    out[size_t(j)] = acc / sr_in;
  }
  return out;
}

}  // namespace

std::vector<float> PitchComputer::Compute(
    const std::vector<float>& wave) const {
  const double sr = opts_.resample_freq;
  std::vector<double> down = LowpassResample(
      wave, opts_.samp_freq, sr, opts_.lowpass_cutoff,
      opts_.lowpass_filter_width);

  // geometric candidate lags
  std::vector<double> lags_sec;
  {
    double lag = 1.0 / opts_.max_f0, max_lag = 1.0 / opts_.min_f0;
    lags_sec.push_back(lag);
    while (lags_sec.back() < max_lag)
      lags_sec.push_back(lags_sec.back() * (1.0 + opts_.delta_pitch));
  }
  int first_lag = int(std::floor(lags_sec.front() * sr));
  int last_lag = int(std::ceil(lags_sec.back() * sr));
  int n_int = last_lag - first_lag + 1;
  int n_lags = int(lags_sec.size());

  int shift = int(sr * opts_.frame_shift_ms / 1000.0);
  int window = int(sr * opts_.frame_length_ms / 1000.0);
  int64_t n = int64_t(down.size());
  int t_frames =
      std::max<int64_t>(0, 1 + (n - (window + last_lag)) / shift);

  // output frame count aligned with fbank at the ORIGINAL rate
  int shift0 = int(opts_.samp_freq * opts_.frame_shift_ms / 1000.0);
  int window0 = int(opts_.samp_freq * opts_.frame_length_ms / 1000.0);
  int t_target = std::max<int64_t>(
      0, 1 + (int64_t(wave.size()) - window0) / shift0);
  std::vector<float> out(size_t(t_target) * 3, 0.0f);
  if (t_frames == 0 || t_target == 0) return out;

  double mean_sq = 1e-10;
  for (double v : down) mean_sq += v * v;
  mean_sq = mean_sq / std::max<int64_t>(n, 1);
  double ballast = opts_.nccf_ballast * mean_sq * mean_sq;

  // NCCF at integer lags (with/without ballast), then sinc-interpolated
  // onto the exact geometric grid (sub-sample lag resolution)
  std::vector<double> nccf_b(size_t(t_frames) * n_lags);
  std::vector<double> nccf_nb(size_t(t_frames) * n_lags);
  const double up_cutoff = 0.5 * sr;
  const int up_zeros = opts_.upsample_filter_width;
  int up_hw = int(std::ceil(up_zeros / (2.0 * up_cutoff) * sr)) + 1;
  std::vector<double> row_b(n_int), row_nb(n_int);
  for (int t = 0; t < t_frames; ++t) {
    int64_t start = int64_t(t) * shift;
    double e0 = 0.0;
    for (int j = 0; j < window; ++j) {
      double v = down[size_t(start + j)];
      e0 += v * v;
    }
    for (int li = 0; li < n_int; ++li) {
      int lag = first_lag + li;
      double cross = 0.0, e1 = 0.0;
      for (int j = 0; j < window; ++j) {
        double a = down[size_t(start + j)];
        double b = down[size_t(start + j + lag)];
        cross += a * b;
        e1 += b * b;
      }
      row_b[size_t(li)] = cross / (std::sqrt(e0 * e1 + ballast) + 1e-10);
      row_nb[size_t(li)] = cross / (std::sqrt(e0 * e1) + 1e-10);
    }
    for (int li = 0; li < n_lags; ++li) {
      double pos = lags_sec[size_t(li)] * sr - first_lag;
      int center = int(std::llround(pos));
      double acc_b = 0.0, acc_nb = 0.0;
      for (int i = center - up_hw; i <= center + up_hw; ++i) {
        if (i < 0 || i >= n_int) continue;
        double w = FilterFunc((i - pos) / sr, up_cutoff, up_zeros) / sr;
        acc_b += row_b[size_t(i)] * w;
        acc_nb += row_nb[size_t(i)] * w;
      }
      nccf_b[size_t(t) * n_lags + li] = acc_b;
      nccf_nb[size_t(t) * n_lags + li] = acc_nb;
    }
  }

  // Viterbi over lag states: local 1 - nccf*(1 - soft_min_f0*lag),
  // transition penalty_factor * log(lag_i/lag_j)^2
  std::vector<double> log_lag(n_lags);
  for (int l = 0; l < n_lags; ++l) log_lag[size_t(l)] = std::log(lags_sec[size_t(l)]);
  std::vector<double> acc(n_lags), nacc(n_lags);
  std::vector<int> back(size_t(t_frames) * n_lags, 0);
  for (int l = 0; l < n_lags; ++l)
    acc[size_t(l)] = 1.0 - nccf_b[size_t(l)] *
                               (1.0 - opts_.soft_min_f0 * lags_sec[size_t(l)]);
  for (int t = 1; t < t_frames; ++t) {
    for (int l = 0; l < n_lags; ++l) {
      double best = 1e300;
      int bj = 0;
      for (int j = 0; j < n_lags; ++j) {
        double d = log_lag[size_t(l)] - log_lag[size_t(j)];
        double c = acc[size_t(j)] + opts_.penalty_factor * d * d;
        if (c < best) { best = c; bj = j; }
      }
      back[size_t(t) * n_lags + l] = bj;
      nacc[size_t(l)] =
          best + 1.0 - nccf_b[size_t(t) * n_lags + l] *
                           (1.0 - opts_.soft_min_f0 * lags_sec[size_t(l)]);
    }
    acc.swap(nacc);
  }
  std::vector<int> path(t_frames, 0);
  {
    int best = 0;
    for (int l = 1; l < n_lags; ++l)
      if (acc[size_t(l)] < acc[size_t(best)]) best = l;
    path[size_t(t_frames - 1)] = best;
    for (int t = t_frames - 2; t >= 0; --t)
      path[size_t(t)] = back[size_t(t + 1) * n_lags + path[size_t(t + 1)]];
  }

  // raw (nccf_no_ballast, pitch) aligned/edge-padded to t_target
  std::vector<double> nccf(t_target), pitch(t_target);
  int n_copy = std::min(t_frames, t_target);
  for (int t = 0; t < n_copy; ++t) {
    nccf[size_t(t)] = nccf_nb[size_t(t) * n_lags + path[size_t(t)]];
    pitch[size_t(t)] = 1.0 / lags_sec[size_t(path[size_t(t)])];
  }
  for (int t = n_copy; t < t_target; ++t) {
    nccf[size_t(t)] = nccf[size_t(n_copy - 1)];
    pitch[size_t(t)] = pitch[size_t(n_copy - 1)];
  }

  // process: POV feature, POV-weighted normalized log pitch, delta
  std::vector<double> pov(t_target), pov_feat(t_target), log_pitch(t_target);
  for (int t = 0; t < t_target; ++t) {
    // sinc interpolation can overshoot |nccf| past 1 (ringing): clip
    // before the fractional power goes NaN
    double c = std::min(1.0, std::max(-1.0, nccf[size_t(t)]));
    pov_feat[size_t(t)] = 2.0 * (std::pow(1.0001 - c, 0.15) - 1.0);
    double cc = std::abs(c);
    double ndash = -5.2 + 5.4 * std::exp(7.5 * (cc - 1.0)) + 4.8 * cc -
                   2.0 * std::exp(-10.0 * cc) +
                   4.2 * std::exp(20.0 * (cc - 1.0));
    pov[size_t(t)] = 1.0 / (1.0 + std::exp(-ndash));
    log_pitch[size_t(t)] = std::log(std::max(pitch[size_t(t)], 1.0));
  }
  int left = opts_.normalization_left_context;
  int right = opts_.normalization_right_context;
  for (int i = 0; i < t_target; ++i) {
    int a = std::max(0, i - left), b = std::min(t_target, i + right + 1);
    double w = 0.0, wl = 0.0;
    for (int j = a; j < b; ++j) {
      w += pov[size_t(j)];
      wl += pov[size_t(j)] * log_pitch[size_t(j)];
    }
    double norm_log = log_pitch[size_t(i)] - wl / std::max(w, 1e-10);
    double denom = 0.0;
    for (int j = 1; j <= opts_.delta_window; ++j) denom += 2.0 * j * j;
    double delta = 0.0;
    for (int j = 1; j <= opts_.delta_window; ++j) {
      double up = log_pitch[size_t(std::min(i + j, t_target - 1))];
      double lo = log_pitch[size_t(std::max(i - j, 0))];
      delta += j * (up - lo);
    }
    delta /= denom;
    float* row = &out[size_t(i) * 3];
    row[0] = float(pov_feat[size_t(i)] * opts_.pov_scale);
    row[1] = float(norm_log * opts_.pitch_scale);
    row[2] = float(delta * opts_.delta_pitch_scale);
  }
  return out;
}

std::vector<float> ComputeFbankPitch(const FbankComputer& fbank,
                                     const PitchComputer& pitch,
                                     const std::vector<float>& wave,
                                     int* dim_out) {
  std::vector<float> fb = fbank.Compute(wave);
  std::vector<float> pf = pitch.Compute(wave);
  int d_fb = fbank.Dim();
  int t_fb = int(fb.size()) / std::max(d_fb, 1);
  int t_pf = int(pf.size()) / 3;
  int t = std::min(t_fb, t_pf);
  int dim = d_fb + 3;
  if (dim_out) *dim_out = dim;
  std::vector<float> out(size_t(t) * dim);
  for (int i = 0; i < t; ++i) {
    std::copy(fb.begin() + size_t(i) * d_fb,
              fb.begin() + size_t(i + 1) * d_fb,
              out.begin() + size_t(i) * dim);
    std::copy(pf.begin() + size_t(i) * 3, pf.begin() + size_t(i + 1) * 3,
              out.begin() + size_t(i) * dim + d_fb);
  }
  return out;
}

}  // namespace asvtpu
