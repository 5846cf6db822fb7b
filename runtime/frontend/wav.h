// RIFF wav reader (parity target: reference runtime/frontend/wav.h:1-205).
// Header-walking parser: accepts PCM16/PCM8/PCM32 and float32, skips
// non-data chunks, returns samples in Kaldi int16 scale.
#ifndef ASV_TPU_RUNTIME_FRONTEND_WAV_H_
#define ASV_TPU_RUNTIME_FRONTEND_WAV_H_

#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace asvtpu {

class WavReader {
 public:
  explicit WavReader(const std::string& path) { Load(path); }

  int sample_rate() const { return sample_rate_; }
  int num_channels() const { return num_channels_; }
  size_t num_samples() const { return data_.size() / num_channels_; }
  // Mono view: channel 0.
  std::vector<float> Channel(int c = 0) const {
    std::vector<float> out(num_samples());
    for (size_t i = 0; i < out.size(); ++i) out[i] = data_[i * num_channels_ + c];
    return out;
  }
  const std::vector<float>& interleaved() const { return data_; }

 private:
  struct ChunkHeader {
    char id[4];
    uint32_t size;
  };

  void Load(const std::string& path) {
    std::ifstream in(path, std::ios::binary);
    if (!in) throw std::runtime_error("cannot open " + path);
    char riff[4], wave[4];
    uint32_t riff_size;
    in.read(riff, 4);
    in.read(reinterpret_cast<char*>(&riff_size), 4);
    in.read(wave, 4);
    if (std::strncmp(riff, "RIFF", 4) || std::strncmp(wave, "WAVE", 4))
      throw std::runtime_error("not a RIFF/WAVE file: " + path);

    uint16_t format = 0, bits = 0;
    ChunkHeader ch;
    bool got_fmt = false;
    while (in.read(reinterpret_cast<char*>(&ch), sizeof(ch))) {
      if (!std::strncmp(ch.id, "fmt ", 4)) {
        std::vector<char> fmt(ch.size);
        in.read(fmt.data(), ch.size);
        format = *reinterpret_cast<uint16_t*>(&fmt[0]);
        num_channels_ = *reinterpret_cast<uint16_t*>(&fmt[2]);
        sample_rate_ = *reinterpret_cast<uint32_t*>(&fmt[4]);
        bits = *reinterpret_cast<uint16_t*>(&fmt[14]);
        got_fmt = true;
      } else if (!std::strncmp(ch.id, "data", 4)) {
        if (!got_fmt) throw std::runtime_error("data before fmt in " + path);
        ReadData(in, ch.size, format, bits, path);
        return;
      } else {
        in.seekg(ch.size + (ch.size & 1), std::ios::cur);  // chunks are padded
      }
    }
    throw std::runtime_error("no data chunk in " + path);
  }

  void ReadData(std::ifstream& in, uint32_t size, uint16_t format, uint16_t bits,
                const std::string& path) {
    std::vector<char> raw(size);
    in.read(raw.data(), size);
    if (format == 1 && bits == 16) {
      size_t n = size / 2;
      data_.resize(n);
      const int16_t* p = reinterpret_cast<const int16_t*>(raw.data());
      for (size_t i = 0; i < n; ++i) data_[i] = static_cast<float>(p[i]);
    } else if (format == 1 && bits == 32) {
      size_t n = size / 4;
      data_.resize(n);
      const int32_t* p = reinterpret_cast<const int32_t*>(raw.data());
      for (size_t i = 0; i < n; ++i) data_[i] = p[i] / 65536.0f;
    } else if (format == 1 && bits == 8) {
      data_.resize(size);
      const uint8_t* p = reinterpret_cast<const uint8_t*>(raw.data());
      for (size_t i = 0; i < size; ++i) data_[i] = (p[i] - 128.0f) * 256.0f;
    } else if (format == 3 && bits == 32) {  // IEEE float
      size_t n = size / 4;
      data_.resize(n);
      const float* p = reinterpret_cast<const float*>(raw.data());
      for (size_t i = 0; i < n; ++i) data_[i] = p[i] * 32768.0f;
    } else {
      throw std::runtime_error("unsupported wav format in " + path);
    }
  }

  int sample_rate_ = 0;
  int num_channels_ = 1;
  std::vector<float> data_;
};

}  // namespace asvtpu

#endif  // ASV_TPU_RUNTIME_FRONTEND_WAV_H_
