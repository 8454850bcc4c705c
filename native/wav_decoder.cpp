// Native host-side audio ingest for bpm_analysis_tpu.
//
// The reference's data path is scipy.io.wavfile + pydub on the Python side
// (bpm_analysis.py:1014, 989); in this framework host ingest is the feeder
// for the TPU batch pipeline, so it is native: a small RIFF/WAVE decoder
// (PCM 8/16/24/32 and IEEE float, arbitrary channel counts mixed to mono)
// plus a std::thread batch loader that decodes many recordings in parallel
// into one contiguous (batch, max_samples) float32 buffer ready for
// jax.device_put.  Exposed over a plain C ABI for ctypes (no pybind11 in
// this environment).
//
// Build: make -C native   (produces libbpmwav.so; Python falls back to the
// pure-numpy decoder in io/wav.py when the library is absent).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <mutex>

namespace {

struct FmtInfo {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

bool read_exact(FILE* f, void* dst, size_t n) {
  return std::fread(dst, 1, n, f) == n;
}

// Decode one WAV file into mono float32.  Returns 0 on success.
int decode_one(const char* path, float* out, int64_t max_samples,
               int32_t* sample_rate, int64_t* n_samples) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (!read_exact(f, riff, 4) || !read_exact(f, &riff_size, 4) ||
      !read_exact(f, wave, 4) || std::memcmp(riff, "RIFF", 4) ||
      std::memcmp(wave, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }
  FmtInfo fmt;
  std::vector<uint8_t> data;
  while (true) {
    char id[4];
    uint32_t size;
    if (!read_exact(f, id, 4) || !read_exact(f, &size, 4)) break;
    if (!std::memcmp(id, "fmt ", 4)) {
      std::vector<uint8_t> buf(size);
      if (!read_exact(f, buf.data(), size)) break;
      std::memcpy(&fmt.format, buf.data(), 2);
      std::memcpy(&fmt.channels, buf.data() + 2, 2);
      std::memcpy(&fmt.sample_rate, buf.data() + 4, 4);
      std::memcpy(&fmt.bits, buf.data() + 14, 2);
      if (fmt.format == 0xFFFE && size >= 26)  // WAVE_FORMAT_EXTENSIBLE
        std::memcpy(&fmt.format, buf.data() + 24, 2);
    } else if (!std::memcmp(id, "data", 4)) {
      data.resize(size);
      if (!read_exact(f, data.data(), size)) break;
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
      continue;
    }
    if (size & 1) std::fseek(f, 1, SEEK_CUR);
    if (fmt.channels && !data.empty()) break;
  }
  std::fclose(f);
  if (!fmt.channels || data.empty()) return -3;

  const int ch = fmt.channels;
  const size_t bytes_per = fmt.bits / 8;
  const int64_t frames =
      static_cast<int64_t>(data.size() / (bytes_per * ch));
  const int64_t n = frames < max_samples ? frames : max_samples;
  const uint8_t* p = data.data();

  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* s = p + (i * ch + c) * bytes_per;
      double v = 0.0;
      if (fmt.format == 1) {  // PCM
        switch (fmt.bits) {
          case 8:
            v = static_cast<double>(*s);  // scipy convention: unsigned
            break;
          case 16: {
            int16_t x;
            std::memcpy(&x, s, 2);
            v = x;
            break;
          }
          case 24: {
            int32_t x = (s[0] | (s[1] << 8) | (s[2] << 16));
            x = (x << 8) >> 8;  // sign-extend
            v = x;
            break;
          }
          case 32: {
            int32_t x;
            std::memcpy(&x, s, 4);
            v = x;
            break;
          }
          default:
            return -4;
        }
      } else if (fmt.format == 3) {  // IEEE float
        if (fmt.bits == 32) {
          float x;
          std::memcpy(&x, s, 4);
          v = x;
        } else if (fmt.bits == 64) {
          double x;
          std::memcpy(&x, s, 8);
          v = x;
        } else {
          return -4;
        }
      } else {
        return -5;
      }
      acc += v;
    }
    out[i] = static_cast<float>(acc / ch);
  }
  *sample_rate = static_cast<int32_t>(fmt.sample_rate);
  *n_samples = n;
  return 0;
}

}  // namespace

extern "C" {

int bpmwav_decode(const char* path, float* out, int64_t max_samples,
                  int32_t* sample_rate, int64_t* n_samples) {
  return decode_one(path, out, max_samples, sample_rate, n_samples);
}

// Parallel batch decode into a contiguous (batch, max_samples) buffer.
// Unused tails are zero-filled (the device pipeline is shape-static).
// errors[i] receives the per-file status.
int bpmwav_decode_batch(const char** paths, int32_t batch, float* out,
                        int64_t max_samples, int32_t* sample_rates,
                        int64_t* n_samples, int32_t* errors,
                        int32_t num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::vector<std::thread> pool;
  std::vector<int32_t> next(1, 0);
  std::mutex m;

  auto worker = [&]() {
    while (true) {
      int32_t i;
      {
        std::lock_guard<std::mutex> g(m);
        if (next[0] >= batch) return;
        i = next[0]++;
      }
      float* row = out + static_cast<int64_t>(i) * max_samples;
      std::memset(row, 0, sizeof(float) * max_samples);
      errors[i] =
          decode_one(paths[i], row, max_samples, &sample_rates[i], &n_samples[i]);
    }
  };
  const int32_t nt = num_threads < batch ? num_threads : batch;
  for (int32_t t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}
}
