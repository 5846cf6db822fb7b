// CLI: wav.scp -> fbank features, with RTF accounting.
// Parity target: reference runtime/bin/extractor_main.cc:15-121 (the
// embedding model itself runs on TPU via the python service; this native
// tool covers the host-side decode + feature + VAD path and benchmarks it).
#include <chrono>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "frontend/feature.h"
#include "frontend/feature_pipeline.h"
#include "frontend/wav.h"

using namespace asvtpu;
using Clock = std::chrono::steady_clock;

int main(int argc, char** argv) {
  std::string wav_scp, out_path;
  int num_bins = 80, warmup = 1;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--wav_scp") wav_scp = next();
    else if (a == "--output") out_path = next();
    else if (a == "--num_bins") num_bins = std::stoi(next());
    else if (a == "--warmup") warmup = std::stoi(next());
    else {
      std::cerr << "usage: frontend_main --wav_scp scp [--output feats.txt]"
                << " [--num_bins N]\n";
      return 1;
    }
  }
  if (wav_scp.empty()) {
    std::cerr << "--wav_scp is required\n";
    return 1;
  }

  FbankOptions opts;
  opts.mel_opts.num_bins = num_bins;
  FbankComputer computer(opts);

  std::ifstream scp(wav_scp);
  std::ofstream out;
  if (!out_path.empty()) out.open(out_path);

  double total_wav_s = 0, total_compute_s = 0;
  std::string line;
  int n = 0;
  while (std::getline(scp, line)) {
    std::istringstream iss(line);
    std::string key, path;
    if (!(iss >> key >> path)) continue;
    WavReader reader(path);
    std::vector<float> wav = reader.Channel(0);
    double wav_s = double(wav.size()) / reader.sample_rate();
    for (int w = 0; w < warmup && n == 0; ++w) computer.Compute(wav);
    auto t0 = Clock::now();
    std::vector<float> feats = computer.Compute(wav);
    double dt = std::chrono::duration<double>(Clock::now() - t0).count();
    total_wav_s += wav_s;
    total_compute_s += dt;
    int nf = int(feats.size()) / computer.Dim();
    std::cout << key << " frames=" << nf << " wav_s=" << wav_s
              << " compute_s=" << dt << " rtf=" << dt / wav_s << "\n";
    if (out.is_open()) {
      out << key << " [\n";
      for (int t = 0; t < nf; ++t) {
        for (int d = 0; d < computer.Dim(); ++d)
          out << " " << feats[size_t(t) * computer.Dim() + d];
        out << "\n";
      }
      out << "]\n";
    }
    ++n;
  }
  std::cout << "TOTAL utts=" << n << " wav_s=" << total_wav_s
            << " compute_s=" << total_compute_s
            << " RTF=" << (total_wav_s > 0 ? total_compute_s / total_wav_s : 0)
            << "\n";
  return 0;
}
