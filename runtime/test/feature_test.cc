// C++ unit tests (assert-based, no gtest dependency): frame math, FFT
// correctness vs a naive DFT, windowing invariants, VAD, blocking queue,
// streaming pipeline == batch computation.
#include <cassert>
#include <cmath>
#include <complex>
#include <cstdio>
#include <random>
#include <thread>
#include <vector>

#include "frontend/feature.h"
#include "frontend/feature_pipeline.h"
#include "utils/blocking_queue.h"

using namespace asvtpu;

static void TestNumFrames() {
  FrameOptions fo;
  // 16k, 25ms window (400), 10ms shift (160), snip_edges
  assert(fo.NumFrames(400) == 1);
  assert(fo.NumFrames(399) == 0);
  assert(fo.NumFrames(560) == 2);
  assert(fo.NumFrames(16000) == 1 + (16000 - 400) / 160);
  fo.snip_edges = false;
  assert(fo.NumFrames(16000) == (16000 + 80) / 160);
  std::printf("TestNumFrames OK\n");
}

static void TestFftMatchesNaiveDft() {
  std::mt19937 rng(1);
  std::normal_distribution<float> d(0, 1);
  std::vector<float> x(512);
  for (auto& v : x) v = d(rng);
  std::vector<float> power;
  Rfft(x, &power);
  for (int k = 0; k <= 256; k += 37) {
    std::complex<double> s(0, 0);
    for (int t = 0; t < 512; ++t)
      s += std::complex<double>(x[t], 0) *
           std::exp(std::complex<double>(0, -2.0 * M_PI * k * t / 512));
    double ref = std::norm(s);
    assert(std::abs(power[k] - ref) <= 1e-3 * std::max(1.0, ref));
  }
  std::printf("TestFftMatchesNaiveDft OK\n");
}

static void TestFbankShapesAndFiniteness() {
  FbankOptions opts;
  opts.mel_opts.num_bins = 40;
  FbankComputer c(opts);
  std::mt19937 rng(2);
  std::normal_distribution<float> d(0, 1000);
  std::vector<float> wav(16000);
  for (auto& v : wav) v = d(rng);
  auto feats = c.Compute(wav);
  int nf = opts.frame_opts.NumFrames(wav.size());
  assert(int(feats.size()) == nf * 40);
  for (float f : feats) assert(std::isfinite(f));
  std::printf("TestFbankShapesAndFiniteness OK\n");
}

static void TestVad() {
  VadOptions opts;  // threshold 5.5 + 0.5*mean
  std::vector<float> e = {10, 10, 0, 0, 10, 10};
  auto v = ComputeVadEnergy(opts, e);
  // mean = 6.67 -> threshold = 8.83: frames with e=10 voiced
  assert(v[0] == 1 && v[1] == 1 && v[2] == 0 && v[3] == 0 && v[4] == 1);
  std::printf("TestVad OK\n");
}

static void TestBlockingQueue() {
  BlockingQueue<int> q(4);
  std::thread producer([&] {
    for (int i = 0; i < 100; ++i) q.Push(i);
    q.Finish();
  });
  int expect = 0;
  while (auto v = q.Pop()) {
    assert(*v == expect);
    ++expect;
  }
  assert(expect == 100);
  producer.join();
  std::printf("TestBlockingQueue OK\n");
}

static void TestStreamingMatchesBatch() {
  FbankOptions opts;
  opts.mel_opts.num_bins = 23;
  FbankComputer batch(opts);
  std::mt19937 rng(3);
  std::normal_distribution<float> d(0, 1000);
  std::vector<float> wav(8000);
  for (auto& v : wav) v = d(rng);

  auto ref = batch.Compute(wav);

  FeaturePipeline pipe(opts);
  // feed in uneven blocks
  size_t pos = 0;
  for (size_t block : {1000ul, 333ul, 4000ul, 2667ul}) {
    std::vector<float> chunk(wav.begin() + pos, wav.begin() + pos + block);
    pipe.AcceptWaveform(chunk);
    pos += block;
  }
  pipe.InputFinished();
  std::vector<float> frame;
  size_t t = 0;
  while (pipe.ReadOne(&frame)) {
    for (int dd = 0; dd < pipe.Dim(); ++dd) {
      float a = frame[dd], b = ref[t * pipe.Dim() + dd];
      assert(std::abs(a - b) <= 1e-4f * std::max(1.0f, std::abs(b)));
    }
    ++t;
  }
  assert(int(t) == opts.frame_opts.NumFrames(wav.size()));
  std::printf("TestStreamingMatchesBatch OK (%zu frames)\n", t);
}

static void TestConcurrentPipelines() {
  // The extractor's --streams N mode (asv_extractor_main.cc) runs one
  // FeaturePipeline + drain thread PER STREAM, concurrently — the
  // reference's per-stream threading model
  // (/root/reference/runtime/frontend/feature_pipeline.h). Assert N
  // simultaneous pipelines each reproduce their own serial batch
  // computation exactly (no shared mutable state between instances).
  FbankOptions opts;
  opts.mel_opts.num_bins = 23;
  const int kStreams = 8;
  std::vector<std::vector<float>> wavs(kStreams), refs(kStreams);
  for (int s = 0; s < kStreams; ++s) {
    std::mt19937 rng(100 + s);
    std::normal_distribution<float> d(0, 1000);
    wavs[s].resize(6000 + 400 * s);
    for (auto& v : wavs[s]) v = d(rng);
    FbankComputer batch(opts);
    refs[s] = batch.Compute(wavs[s]);
  }
  std::vector<int> ok(kStreams, 0);
  std::vector<std::thread> workers;
  for (int s = 0; s < kStreams; ++s) {
    workers.emplace_back([&, s]() {
      FeaturePipeline pipe(opts);
      std::vector<float> feats;
      std::thread drain([&]() {
        std::vector<float> fr;
        while (pipe.ReadOne(&fr)) feats.insert(feats.end(), fr.begin(), fr.end());
      });
      size_t block = 777;
      for (size_t off = 0; off < wavs[s].size(); off += block) {
        size_t end = std::min(wavs[s].size(), off + block);
        pipe.AcceptWaveform(
            std::vector<float>(wavs[s].begin() + off, wavs[s].begin() + end));
      }
      pipe.InputFinished();
      drain.join();
      if (feats.size() != refs[s].size()) return;
      for (size_t i = 0; i < feats.size(); ++i)
        if (std::abs(feats[i] - refs[s][i]) >
            1e-4f * std::max(1.0f, std::abs(refs[s][i])))
          return;
      ok[s] = 1;
    });
  }
  for (auto& w : workers) w.join();
  for (int s = 0; s < kStreams; ++s) assert(ok[s] == 1);
  std::printf("TestConcurrentPipelines OK (%d streams)\n", kStreams);
}

static void TestPitchTracksTone() {
  // 137 Hz harmonic tone: the tracker's normalized-log-pitch must be
  // near zero (steady pitch) and the POV feature clearly voiced; the
  // fbank_pitch concat must be [T, bins+3] and finite.
  const int sr = 16000;
  std::vector<float> wav(sr);
  for (int i = 0; i < sr; ++i) {
    double t = double(i) / sr;
    double v = 0;
    for (int h = 1; h <= 3; ++h)
      v += std::sin(2.0 * 3.14159265358979 * 137.0 * h * t) / h;
    wav[i] = float(v * 6000.0);
  }
  PitchOptions popts;
  PitchComputer pitch(popts);
  std::vector<float> pf = pitch.Compute(wav);
  int t_frames = int(pf.size()) / 3;
  assert(t_frames > 50);
  double pov_sum = 0, nlp_sum = 0;
  for (int t = 10; t < t_frames - 10; ++t) {
    assert(std::isfinite(pf[size_t(t) * 3 + 0]));
    pov_sum += pf[size_t(t) * 3 + 0];
    nlp_sum += std::abs(pf[size_t(t) * 3 + 1]);
  }
  int mid = t_frames - 20;
  // voiced frames: nccf ~ 1 -> pov_feature = 2*2*((1.0001-1)^0.15 - 1)
  // ~ -3; unvoiced ~ 0. Strongly negative mean = voiced.
  assert(pov_sum / mid < -1.5);
  assert(nlp_sum / mid < 0.3);    // steady tone: normalized log pitch ~ 0
  FbankOptions fopts;
  fopts.mel_opts.num_bins = 40;
  FbankComputer fbank(fopts);
  int dim = 0;
  std::vector<float> fp = ComputeFbankPitch(fbank, pitch, wav, &dim);
  assert(dim == 43);
  assert(int(fp.size()) % dim == 0);
  for (float v : fp) assert(std::isfinite(v));
  std::printf("TestPitchTracksTone OK (%d frames)\n", t_frames);
}

int main() {
  TestNumFrames();
  TestFftMatchesNaiveDft();
  TestFbankShapesAndFiniteness();
  TestVad();
  TestBlockingQueue();
  TestStreamingMatchesBatch();
  TestConcurrentPipelines();
  TestPitchTracksTone();
  std::printf("ALL C++ TESTS PASSED\n");
  return 0;
}
