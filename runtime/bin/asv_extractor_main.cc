// End-to-end native extractor: wav.scp -> fbank (C++) -> energy VAD ->
// submean over voiced frames -> TPU embedding service (socket) -> text
// embeddings + RTF accounting.
// Parity: reference runtime/bin/extractor_main.cc + torch_asv_extractor.cc
// (VAD :14-62, submean :100-101, voiced select :103-107), with the jit
// model call replaced by the TPU serving protocol (serving.py).
#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "frontend/feature.h"
#include "frontend/wav.h"

using namespace asvtpu;
using Clock = std::chrono::steady_clock;

constexpr uint32_t kMagic = 0x41535631;

static bool SendAll(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t w = ::send(fd, p, n, 0);
    if (w <= 0) return false;
    p += w;
    n -= size_t(w);
  }
  return true;
}

static bool RecvAll(int fd, void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n > 0) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= size_t(r);
  }
  return true;
}

static std::vector<float> RemoteEmbed(int fd, const std::vector<float>& feats,
                                      uint32_t t, uint32_t d) {
  uint32_t header[3] = {kMagic, t, d};
  if (!SendAll(fd, header, sizeof(header))) return {};
  if (!SendAll(fd, feats.data(), feats.size() * 4)) return {};
  uint32_t resp[2];
  if (!RecvAll(fd, resp, sizeof(resp))) return {};
  if (resp[0] != kMagic || resp[1] == 0) return {};
  std::vector<float> emb(resp[1]);
  if (!RecvAll(fd, emb.data(), emb.size() * 4)) return {};
  return emb;
}

int main(int argc, char** argv) {
  std::string wav_scp, out_path, host = "127.0.0.1";
  int port = 0, num_bins = 80;
  bool do_vad = true, do_submean = true;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--wav_scp") wav_scp = next();
    else if (a == "--output") out_path = next();
    else if (a == "--host") host = next();
    else if (a == "--port") port = std::stoi(next());
    else if (a == "--num_bins") num_bins = std::stoi(next());
    else if (a == "--no_vad") do_vad = false;
    else if (a == "--no_submean") do_submean = false;
    else {
      std::cerr << "usage: asv_extractor_main --wav_scp scp --port P"
                << " [--output emb.txt] [--num_bins N] [--no_vad]\n";
      return 1;
    }
  }
  if (wav_scp.empty() || port == 0) {
    std::cerr << "--wav_scp and --port are required\n";
    return 1;
  }

  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(uint16_t(port));
  ::inet_pton(AF_INET, host.c_str(), &addr.sin_addr);
  if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    std::cerr << "cannot connect to embedding service " << host << ":" << port
              << "\n";
    return 1;
  }

  // fbank with energy in column 0 so the VAD can use raw energies
  FbankOptions opts;
  opts.mel_opts.num_bins = num_bins;
  opts.use_energy = true;  // column 0 = raw log-energy
  FbankComputer computer(opts);
  VadOptions vad_opts;

  std::ifstream scp(wav_scp);
  std::ofstream out;
  if (!out_path.empty()) out.open(out_path);

  double total_wav_s = 0, total_s = 0;
  std::string line;
  int n = 0, failures = 0;
  while (std::getline(scp, line)) {
    std::istringstream iss(line);
    std::string key, path;
    if (!(iss >> key >> path)) continue;
    auto t0 = Clock::now();
    WavReader reader(path);
    std::vector<float> wav = reader.Channel(0);
    double wav_s = double(wav.size()) / reader.sample_rate();
    std::vector<float> feats = computer.Compute(wav);  // [T, 1+bins]
    int dim = computer.Dim();
    int t_frames = int(feats.size()) / dim;

    // energy VAD on column 0, then drop the energy column
    std::vector<float> log_e(t_frames);
    for (int t = 0; t < t_frames; ++t) log_e[t] = feats[size_t(t) * dim];
    std::vector<uint8_t> voiced =
        do_vad ? ComputeVadEnergy(vad_opts, log_e)
               : std::vector<uint8_t>(t_frames, 1);
    int kept = 0;
    std::vector<float> selected;
    selected.reserve(feats.size());
    for (int t = 0; t < t_frames; ++t) {
      if (!voiced[t]) continue;
      for (int dd = 1; dd < dim; ++dd)
        selected.push_back(feats[size_t(t) * dim + dd]);
      ++kept;
    }
    int fdim = dim - 1;
    if (kept == 0) {  // fall back to all frames
      for (int t = 0; t < t_frames; ++t)
        for (int dd = 1; dd < dim; ++dd)
          selected.push_back(feats[size_t(t) * dim + dd]);
      kept = t_frames;
    }
    if (do_submean && kept > 0) {
      for (int dd = 0; dd < fdim; ++dd) {
        double mean = 0;
        for (int t = 0; t < kept; ++t) mean += selected[size_t(t) * fdim + dd];
        mean /= kept;
        for (int t = 0; t < kept; ++t)
          selected[size_t(t) * fdim + dd] -= float(mean);
      }
    }

    std::vector<float> emb = RemoteEmbed(fd, selected, kept, fdim);
    double dt = std::chrono::duration<double>(Clock::now() - t0).count();
    total_wav_s += wav_s;
    total_s += dt;
    if (emb.empty()) {
      std::cerr << key << " FAILED\n";
      ++failures;
      continue;
    }
    std::cout << key << " frames=" << kept << "/" << t_frames
              << " rtf=" << dt / wav_s << "\n";
    if (out.is_open()) {
      out << key;
      for (float v : emb) out << " " << v;
      out << "\n";
    }
    ++n;
  }
  ::close(fd);
  std::cout << "TOTAL utts=" << n << " failures=" << failures
            << " wav_s=" << total_wav_s << " elapsed_s=" << total_s
            << " RTF=" << (total_wav_s > 0 ? total_s / total_wav_s : 0) << "\n";
  return failures == 0 ? 0 : 2;
}
