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
// Decoding is *strided*: the caller passes a per-file decimation stride and
// the decoder emits only every stride-th mono frame, streaming the data
// chunk through a small block buffer.  For the batch front-end's compat
// path (pure stride decimation, bpm_analysis.py:1031-1045) this collapses
// host staging from "decode 100 MB/file to float32, then slice" to "emit
// the ~180k samples the device program actually consumes" — the skipped
// frames are never converted at all.
//
// Build: make -C native   (produces libbpmwav.so; Python falls back to the
// pure-numpy decoder in io/wav.py when the library is absent).

#include <algorithm>
#include <cmath>
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

// Convert one frame at `s` (interleaved `ch` channels) to a mono float via
// the channel mean (scipy value conventions).  Returns false on an
// unsupported format.
inline bool frame_to_mono(const uint8_t* s, const FmtInfo& fmt, size_t bytes_per,
                          float* out) {
  double acc = 0.0;
  for (int c = 0; c < fmt.channels; ++c, s += bytes_per) {
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
          return false;
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
        return false;
      }
    } else {
      return false;
    }
    acc += v;
  }
  *out = static_cast<float>(acc / fmt.channels);
  return true;
}

// Decode one WAV file into mono float32, emitting every `stride`-th frame.
// Returns 0 on success; *n_samples receives the emitted (post-stride) count.
int decode_one(const char* path, float* out, int64_t max_samples,
               int64_t stride, int32_t* sample_rate, int64_t* n_samples) {
  if (stride < 1) stride = 1;
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

  // Chunk scan: note the data chunk's position/size, read fmt.  (fmt almost
  // always precedes data; if not, we seek back to the noted position.)
  FmtInfo fmt;
  long data_pos = -1;
  uint32_t data_size = 0;
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
      if (size & 1) std::fseek(f, 1, SEEK_CUR);
    } else if (!std::memcmp(id, "data", 4)) {
      data_pos = std::ftell(f);
      data_size = size;
      std::fseek(f, size + (size & 1), SEEK_CUR);
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (fmt.channels && data_pos >= 0) break;
  }
  if (!fmt.channels || data_pos < 0 || fmt.bits < 8) {
    std::fclose(f);
    return -3;
  }
  const size_t bytes_per = fmt.bits / 8;
  const size_t frame_bytes = bytes_per * fmt.channels;
  const int64_t frames = static_cast<int64_t>(data_size / frame_bytes);
  int64_t n_out = (frames + stride - 1) / stride;
  if (n_out > max_samples) n_out = max_samples;

  // Format support check up-front (so unsupported files error rather than
  // silently emitting zeros).
  const bool supported =
      (fmt.format == 1 && (fmt.bits == 8 || fmt.bits == 16 || fmt.bits == 24 ||
                           fmt.bits == 32)) ||
      (fmt.format == 3 && (fmt.bits == 32 || fmt.bits == 64));
  if (!supported) {
    std::fclose(f);
    return fmt.format == 1 || fmt.format == 3 ? -4 : -5;
  }

  std::fseek(f, data_pos, SEEK_SET);
  const bool fast16 = (fmt.channels == 1 && fmt.format == 1 && fmt.bits == 16);

  // Stream the data chunk through a block buffer (multiple of frame_bytes).
  const int64_t block_frames =
      std::max<int64_t>(1, (int64_t{1} << 20) / frame_bytes);
  std::vector<uint8_t> buf(block_frames * frame_bytes);
  const int64_t hop_bytes = stride * static_cast<int64_t>(frame_bytes);

  int64_t out_i = 0;
  int64_t frame_base = 0;  // absolute index of the first frame in the buffer
  int rc = 0;
  while (out_i < n_out) {
    int64_t need = out_i * stride;  // next absolute frame to emit
    if (need >= frame_base + block_frames || need > frame_base) {
      // When the hop exceeds the block, seek instead of reading dead bytes.
      if (hop_bytes > static_cast<int64_t>(buf.size()) || out_i == 0) {
        std::fseek(f, data_pos + need * static_cast<int64_t>(frame_bytes),
                   SEEK_SET);
        frame_base = need;
      }
    }
    const int64_t blk = std::min(block_frames, frames - frame_base);
    if (blk <= 0) break;
    if (!read_exact(f, buf.data(), blk * frame_bytes)) {
      rc = out_i > 0 ? 0 : -6;  // truncated file: keep what we decoded
      break;
    }
    if (fast16) {
      const int16_t* s16 = reinterpret_cast<const int16_t*>(buf.data());
      while (need < frame_base + blk && out_i < n_out) {
        out[out_i++] = static_cast<float>(s16[need - frame_base]);
        need += stride;
      }
    } else {
      while (need < frame_base + blk && out_i < n_out) {
        float v;
        if (!frame_to_mono(buf.data() + (need - frame_base) * frame_bytes, fmt,
                           bytes_per, &v)) {
          std::fclose(f);
          return -4;
        }
        out[out_i++] = v;
        need += stride;
      }
    }
    frame_base += blk;
  }
  std::fclose(f);
  if (rc) return rc;
  *sample_rate = static_cast<int32_t>(fmt.sample_rate);
  *n_samples = out_i;
  return 0;
}

// Strided decode of a mono 16-bit PCM WAV straight to int16 — the staging
// fast path.  Device programs take the int16 rows and cast to float on-chip
// (exact: every int16 is representable in f32), halving the host->device
// transfer volume vs the float32 path — on tunneled TPU devices that link
// runs at tens of MB/s and dominates end-to-end latency.  Returns -4 when
// the file is not mono PCM16 (caller falls back to the float path).
int decode_one_i16(const char* path, int16_t* out, int64_t max_samples,
                   int64_t stride, int32_t* sample_rate, int64_t* n_samples) {
  if (stride < 1) stride = 1;
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
  long data_pos = -1;
  uint32_t data_size = 0;
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
      if (fmt.format == 0xFFFE && size >= 26)
        std::memcpy(&fmt.format, buf.data() + 24, 2);
      if (size & 1) std::fseek(f, 1, SEEK_CUR);
    } else if (!std::memcmp(id, "data", 4)) {
      data_pos = std::ftell(f);
      data_size = size;
      std::fseek(f, size + (size & 1), SEEK_CUR);
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (fmt.channels && data_pos >= 0) break;
  }
  if (!fmt.channels || data_pos < 0) {
    std::fclose(f);
    return -3;
  }
  if (!(fmt.format == 1 && fmt.bits == 16 && fmt.channels == 1)) {
    std::fclose(f);
    return -4;
  }
  const int64_t frames = static_cast<int64_t>(data_size / 2);
  int64_t n_out = (frames + stride - 1) / stride;
  if (n_out > max_samples) n_out = max_samples;

  std::fseek(f, data_pos, SEEK_SET);
  const int64_t block_frames = int64_t{1} << 19;  // 1 MB of int16
  std::vector<int16_t> buf(block_frames);
  const int64_t hop_bytes = stride * 2;

  int64_t out_i = 0;
  int64_t frame_base = 0;
  int rc = 0;
  while (out_i < n_out) {
    int64_t need = out_i * stride;
    if (need >= frame_base + block_frames || need > frame_base) {
      if (hop_bytes > static_cast<int64_t>(buf.size() * 2) || out_i == 0) {
        std::fseek(f, data_pos + need * 2, SEEK_SET);
        frame_base = need;
      }
    }
    const int64_t blk = std::min(block_frames, frames - frame_base);
    if (blk <= 0) break;
    if (!read_exact(f, buf.data(), blk * 2)) {
      rc = out_i > 0 ? 0 : -6;
      break;
    }
    while (need < frame_base + blk && out_i < n_out) {
      out[out_i++] = buf[need - frame_base];
      need += stride;
    }
    frame_base += blk;
  }
  std::fclose(f);
  if (rc) return rc;
  *sample_rate = static_cast<int32_t>(fmt.sample_rate);
  *n_samples = out_i;
  return 0;
}

// Anti-aliased FIR decimation during decode — the host half of the
// *antialias* preprocessing path (ops/filter.py:fir_decimate; the robust
// alternative to the reference's bare stride slice, bpm_analysis.py:
// 1031-1045).  Shipping full native-rate PCM through a tunneled ~30 MB/s
// H2D link measured 5 vs 156 audio-min/s against the compat path
// (ANTIALIAS_r04); running the same Hann-windowed-sinc polyphase low-pass
// here, inside the streaming decode loop, emits the ~180k decimated
// samples/file the device program consumes — identical semantics to the
// device FIR (y[m] = sum_k h[k] * x[m*factor + k - half], zeros outside the
// signal), float32 taps/accumulation so values match the on-device float32
// matmul to rounding.
int decode_one_fir(const char* path, float* out, int64_t max_samples,
                   int64_t factor, int32_t taps_per_phase,
                   int32_t* sample_rate, int64_t* n_samples) {
  if (factor <= 1 || taps_per_phase < 1)
    return decode_one(path, out, max_samples, factor < 1 ? 1 : factor,
                      sample_rate, n_samples);
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
  long data_pos = -1;
  uint32_t data_size = 0;
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
      if (fmt.format == 0xFFFE && size >= 26)
        std::memcpy(&fmt.format, buf.data() + 24, 2);
      if (size & 1) std::fseek(f, 1, SEEK_CUR);
    } else if (!std::memcmp(id, "data", 4)) {
      data_pos = std::ftell(f);
      data_size = size;
      std::fseek(f, size + (size & 1), SEEK_CUR);
    } else {
      std::fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (fmt.channels && data_pos >= 0) break;
  }
  if (!fmt.channels || data_pos < 0 || fmt.bits < 8) {
    std::fclose(f);
    return -3;
  }
  const bool supported =
      (fmt.format == 1 && (fmt.bits == 8 || fmt.bits == 16 || fmt.bits == 24 ||
                           fmt.bits == 32)) ||
      (fmt.format == 3 && (fmt.bits == 32 || fmt.bits == 64));
  if (!supported) {
    std::fclose(f);
    return fmt.format == 1 || fmt.format == 3 ? -4 : -5;
  }
  const size_t bytes_per = fmt.bits / 8;
  const size_t frame_bytes = bytes_per * fmt.channels;
  const int64_t frames = static_cast<int64_t>(data_size / frame_bytes);
  int64_t n_out = (frames + factor - 1) / factor;
  if (n_out > max_samples) n_out = max_samples;

  // Hann-windowed sinc, cutoff 0.9 of the decimated Nyquist — EXACTLY the
  // tap formula of ops/filter.py:fir_decimate (double-precision design,
  // float32 application, like the device path's float64 numpy -> f32 cast).
  const int64_t half = static_cast<int64_t>(taps_per_phase) * factor / 2;
  const int64_t n_taps = 2 * half + 1;
  std::vector<float> taps(n_taps);
  {
    const double cutoff = 0.9 / static_cast<double>(factor);
    const double pi = 3.14159265358979323846;
    std::vector<double> hd(n_taps);
    double sum = 0.0;
    for (int64_t k = 0; k < n_taps; ++k) {
      const double t = static_cast<double>(k - half);
      double v = (t == 0.0) ? cutoff : std::sin(pi * cutoff * t) / (pi * t);
      // np.hanning(M): 0.5 - 0.5*cos(2*pi*k/(M-1))
      v *= 0.5 - 0.5 * std::cos(2.0 * pi * static_cast<double>(k) /
                                static_cast<double>(n_taps - 1));
      hd[k] = v;
      sum += v;
    }
    for (int64_t k = 0; k < n_taps; ++k)
      taps[k] = static_cast<float>(hd[k] / sum);
  }

  std::fseek(f, data_pos, SEEK_SET);
  const bool fast16 = (fmt.channels == 1 && fmt.format == 1 && fmt.bits == 16);

  // Streaming overlap-save: `work` holds mono samples for absolute input
  // indices [wbase, wbase + filled), seeded with the `half` zeros the
  // window of output 0 reads before the signal; a trailing zero block
  // covers windows that run past the end.
  const int64_t block_frames =
      std::max<int64_t>(n_taps, (int64_t{1} << 20) / frame_bytes);
  std::vector<uint8_t> raw(block_frames * frame_bytes);
  std::vector<float> work;
  work.reserve(block_frames + n_taps + half);
  work.assign(static_cast<size_t>(half), 0.0f);
  int64_t wbase = -half;
  int64_t read_frames = 0;  // input frames consumed so far
  int64_t out_i = 0;
  bool tail_done = false;

  while (out_i < n_out) {
    // Drop samples no longer reachable by any remaining window.
    const int64_t keep_from = out_i * factor - half;
    if (keep_from > wbase) {
      work.erase(work.begin(),
                 work.begin() + static_cast<size_t>(keep_from - wbase));
      wbase = keep_from;
    }
    // Refill.
    if (read_frames < frames) {
      const int64_t blk = std::min(block_frames, frames - read_frames);
      if (!read_exact(f, raw.data(), blk * frame_bytes)) {
        std::fclose(f);
        return out_i > 0 ? 0 : -6;
      }
      const size_t old = work.size();
      work.resize(old + static_cast<size_t>(blk));
      if (fast16) {
        const int16_t* s16 = reinterpret_cast<const int16_t*>(raw.data());
        for (int64_t i = 0; i < blk; ++i)
          work[old + i] = static_cast<float>(s16[i]);
      } else {
        for (int64_t i = 0; i < blk; ++i) {
          if (!frame_to_mono(raw.data() + i * frame_bytes, fmt, bytes_per,
                             &work[old + i])) {
            std::fclose(f);
            return -4;
          }
        }
      }
      read_frames += blk;
    } else if (!tail_done) {
      work.insert(work.end(), static_cast<size_t>(n_taps), 0.0f);
      tail_done = true;
    } else {
      break;  // defensive: nothing left to read and tail already appended
    }
    // Emit every output whose window is fully resident.
    const int64_t avail_end = wbase + static_cast<int64_t>(work.size());
    while (out_i < n_out && out_i * factor - half + n_taps <= avail_end) {
      const float* x = work.data() + (out_i * factor - half - wbase);
      float acc = 0.0f;
      for (int64_t k = 0; k < n_taps; ++k) acc += taps[k] * x[k];
      out[out_i++] = acc;
    }
  }
  std::fclose(f);
  *sample_rate = static_cast<int32_t>(fmt.sample_rate);
  *n_samples = out_i;
  return 0;
}

}  // namespace

extern "C" {

int bpmwav_decode(const char* path, float* out, int64_t max_samples,
                  int64_t stride, int32_t* sample_rate, int64_t* n_samples) {
  return decode_one(path, out, max_samples, stride, sample_rate, n_samples);
}

// Parallel batch decode into a contiguous (batch, max_samples) buffer, each
// file decimated by its own strides[i].  Unused tails are zero-filled (the
// device pipeline is shape-static).  errors[i] receives the per-file status.
int bpmwav_decode_batch(const char** paths, int32_t batch, float* out,
                        int64_t max_samples, const int64_t* strides,
                        int32_t* sample_rates, int64_t* n_samples,
                        int32_t* errors, int32_t num_threads) {
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
      n_samples[i] = 0;
      errors[i] = decode_one(paths[i], row, max_samples,
                             strides ? strides[i] : 1, &sample_rates[i],
                             &n_samples[i]);
      // Zero only the unwritten tail (rows can be large; a full memset of
      // the whole buffer costs more than the decode itself).
      std::memset(row + n_samples[i], 0,
                  sizeof(float) * static_cast<size_t>(max_samples - n_samples[i]));
    }
  };
  const int32_t nt = num_threads < batch ? num_threads : batch;
  for (int32_t t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// FIR-decimating batch decode: same contract as bpmwav_decode_batch but
// each file is anti-alias low-passed (Hann-windowed sinc, the device FIR's
// taps) and decimated by factors[i] inside the streaming decode loop — the
// host half of the antialias preprocessing path.  taps_per_phase matches
// ops/filter.py:fir_decimate (8 at the production config).
int bpmwav_decode_batch_fir(const char** paths, int32_t batch, float* out,
                            int64_t max_samples, const int64_t* factors,
                            int32_t taps_per_phase, int32_t* sample_rates,
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
      n_samples[i] = 0;
      errors[i] = decode_one_fir(paths[i], row, max_samples,
                                 factors ? factors[i] : 1, taps_per_phase,
                                 &sample_rates[i], &n_samples[i]);
      std::memset(row + n_samples[i], 0,
                  sizeof(float) *
                      static_cast<size_t>(max_samples - n_samples[i]));
    }
  };
  const int32_t nt = num_threads < batch ? num_threads : batch;
  for (int32_t t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// int16 batch decode (mono PCM16 fast path): same contract as
// bpmwav_decode_batch but emits raw int16 samples.  errors[i] = -4 marks a
// file that is not mono PCM16; the Python layer falls back to the float
// decoder for those rows (the caller pre-screens with a header probe, so
// this is rare).
int bpmwav_decode_batch_i16(const char** paths, int32_t batch, int16_t* out,
                            int64_t max_samples, const int64_t* strides,
                            int32_t* sample_rates, int64_t* n_samples,
                            int32_t* errors, int32_t num_threads) {
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
      int16_t* row = out + static_cast<int64_t>(i) * max_samples;
      n_samples[i] = 0;
      errors[i] = decode_one_i16(paths[i], row, max_samples,
                                 strides ? strides[i] : 1, &sample_rates[i],
                                 &n_samples[i]);
      std::memset(row + n_samples[i], 0,
                  sizeof(int16_t) *
                      static_cast<size_t>(max_samples - n_samples[i]));
    }
  };
  const int32_t nt = num_threads < batch ? num_threads : batch;
  for (int32_t t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}
}
