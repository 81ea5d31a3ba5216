// nomad_native — native host-side audio ingest for nomad_tpu.
//
// TPU-native replacement for the role torchaudio's C++ layer plays in the
// reference (wav decode + polyphase resample on every file load,
// /root/reference/src/nomad_audio/nomad.py:196-204). The TPU compute path is
// jax/XLA; this library keeps the *host* side off the Python GIL: WAV
// decode, stereo fold, polyphase sinc resample, 10 s trim, and zero-padded
// batch assembly all run in a C++ thread pool.
//
// C ABI (ctypes-friendly). All functions return 0 on success, negative on
// error. Thread-safe.
//
// Build: make -C native  (produces libnomad_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr uint16_t kPcm = 0x0001;
constexpr uint16_t kFloat = 0x0003;
constexpr uint16_t kExtensible = 0xFFFE;

struct WavView {
  const uint8_t* data = nullptr;
  size_t size = 0;
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  const uint8_t* payload = nullptr;
  size_t payload_size = 0;
};

inline uint32_t rd32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
inline uint16_t rd16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

int parse_wav(const uint8_t* buf, size_t n, WavView* out) {
  if (n < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return -1;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= n) {
    const uint8_t* cid = buf + pos;
    uint32_t size = rd32(buf + pos + 4);
    size_t data_off = pos + 8;
    size_t avail = std::min<size_t>(size, n - data_off);
    if (memcmp(cid, "fmt ", 4) == 0 && avail >= 16) {
      out->format = rd16(buf + data_off);
      out->channels = rd16(buf + data_off + 2);
      out->sample_rate = rd32(buf + data_off + 4);
      out->bits = rd16(buf + data_off + 14);
      if (out->format == kExtensible && avail >= 40)
        out->format = rd16(buf + data_off + 24);
      have_fmt = true;
    } else if (memcmp(cid, "data", 4) == 0) {
      out->payload = buf + data_off;
      out->payload_size = avail;
      have_data = true;
    }
    pos = data_off + size + (size & 1);
  }
  return (have_fmt && have_data && out->channels > 0) ? 0 : -2;
}

// Decode interleaved payload to mono float32 ((ch0+ch1)/2 fold — reference
// quirk Q4). Returns frame count or negative error.
int64_t decode_mono(const WavView& w, std::vector<float>* out) {
  const uint16_t ch = w.channels;
  size_t bytes_per_sample = w.bits / 8;
  if (bytes_per_sample == 0) return -3;
  size_t frames = w.payload_size / (bytes_per_sample * ch);
  out->resize(frames);
  const uint8_t* p = w.payload;
  const bool fold = ch > 1;

  auto emit = [&](size_t i, float a, float b) {
    (*out)[i] = fold ? 0.5f * (a + b) : a;
  };

  if (w.format == kPcm && w.bits == 16) {
    for (size_t i = 0; i < frames; ++i) {
      const uint8_t* f = p + i * bytes_per_sample * ch;
      int16_t a = (int16_t)rd16(f);
      int16_t b = fold ? (int16_t)rd16(f + 2) : 0;
      emit(i, a / 32768.0f, b / 32768.0f);
    }
  } else if (w.format == kPcm && w.bits == 24) {
    for (size_t i = 0; i < frames; ++i) {
      const uint8_t* f = p + i * 3 * ch;
      auto s24 = [](const uint8_t* q) {
        int32_t v = q[0] | (q[1] << 8) | (q[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        return (float)v / (float)(1 << 23);
      };
      emit(i, s24(f), fold ? s24(f + 3) : 0.0f);
    }
  } else if (w.format == kPcm && w.bits == 32) {
    for (size_t i = 0; i < frames; ++i) {
      const uint8_t* f = p + i * 4 * ch;
      auto s32 = [](const uint8_t* q) {
        return (float)(int32_t)rd32(q) / 2147483648.0f;
      };
      emit(i, s32(f), fold ? s32(f + 4) : 0.0f);
    }
  } else if (w.format == kPcm && w.bits == 8) {
    for (size_t i = 0; i < frames; ++i) {
      const uint8_t* f = p + i * ch;
      emit(i, (f[0] - 128) / 128.0f, fold ? (f[1] - 128) / 128.0f : 0.0f);
    }
  } else if (w.format == kFloat && w.bits == 32) {
    for (size_t i = 0; i < frames; ++i) {
      const uint8_t* f = p + i * 4 * ch;
      float a, b = 0.0f;
      memcpy(&a, f, 4);
      if (fold) memcpy(&b, f + 4, 4);
      emit(i, a, b);
    }
  } else if (w.format == kFloat && w.bits == 64) {
    for (size_t i = 0; i < frames; ++i) {
      const uint8_t* f = p + i * 8 * ch;
      double a, b = 0.0;
      memcpy(&a, f, 8);
      if (fold) memcpy(&b, f + 8, 8);
      emit(i, (float)a, (float)b);
    }
  } else {
    return -4;
  }
  return (int64_t)frames;
}

// Polyphase resample, identical math to nomad_tpu.io.resample (torchaudio
// defaults). kernels: [new_g, klen] row-major.
void resample_apply(const float* in, int64_t n, float* out, int64_t out_n,
                    const float* kernels, int klen, int width, int orig_g,
                    int new_g) {
  // padded input: width zeros | signal | (width + orig_g) zeros
  std::vector<float> padded((size_t)n + 2 * width + orig_g, 0.0f);
  memcpy(padded.data() + width, in, (size_t)n * sizeof(float));
  int64_t n_steps = ((int64_t)padded.size() - klen) / orig_g + 1;
  for (int64_t s = 0; s < n_steps; ++s) {
    const float* base = padded.data() + s * orig_g;
    for (int p = 0; p < new_g; ++p) {
      int64_t oi = s * new_g + p;
      if (oi >= out_n) break;
      const float* k = kernels + (size_t)p * klen;
      float acc = 0.0f;
      for (int j = 0; j < klen; ++j) acc += base[j] * k[j];
      out[oi] = acc;
    }
  }
}

int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return -10;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize((size_t)sz);
  size_t got = fread(buf->data(), 1, (size_t)sz, f);
  fclose(f);
  return got == (size_t)sz ? 0 : -11;
}

struct LoadResult {
  std::vector<float> samples;
  int64_t length = 0;  // valid samples (post-resample/trim)
  int err = 0;
};

// FLAC twin (flac_decoder.cpp)
extern "C" int nomad_flac_info(const uint8_t* data, size_t n, int32_t* sr,
                               int64_t* frames, int32_t* channels,
                               int32_t* bits);
extern "C" int nomad_flac_decode_mono(const uint8_t* data, size_t n,
                                      float* out, int64_t max_out,
                                      int64_t* out_len, int32_t* sr);

inline bool is_flac(const std::vector<uint8_t>& buf) {
  return buf.size() >= 4 && memcmp(buf.data(), "fLaC", 4) == 0;
}

// decode wav-or-flac payload to mono float; returns sample rate via *sr
int decode_any_mono(const std::vector<uint8_t>& buf, std::vector<float>* mono,
                    uint32_t* sr) {
  if (is_flac(buf)) {
    int32_t fsr = 0, ch = 0, bits = 0;
    int64_t frames = 0;
    int rc = nomad_flac_info(buf.data(), buf.size(), &fsr, &frames, &ch, &bits);
    if (rc) return rc;
    if (frames <= 0) frames = (int64_t)buf.size() * 4;  // upper bound
    mono->resize((size_t)frames);
    int64_t got = 0;
    rc = nomad_flac_decode_mono(buf.data(), buf.size(), mono->data(), frames,
                                &got, &fsr);
    if (rc) return rc;
    mono->resize((size_t)got);
    *sr = (uint32_t)fsr;
    return 0;
  }
  WavView w;
  int rc = parse_wav(buf.data(), buf.size(), &w);
  if (rc) return rc;
  int64_t frames = decode_mono(w, mono);
  if (frames < 0) return (int)frames;
  *sr = w.sample_rate;
  return 0;
}

// Full per-file pipeline: read -> decode/fold -> (resample) -> (trim)
LoadResult load_one(const char* path, int target_sr, int trim_sec,
                    const float* kernels, int klen, int width, int orig_sr_g,
                    int new_sr_g, int expect_sr) {
  LoadResult r;
  std::vector<uint8_t> buf;
  if ((r.err = read_file(path, &buf)) != 0) return r;
  std::vector<float> mono;
  uint32_t sample_rate = 0;
  if ((r.err = decode_any_mono(buf, &mono, &sample_rate)) != 0) return r;
  int64_t frames = (int64_t)mono.size();
  if ((int)sample_rate != target_sr) {
    // caller must have supplied a kernel bank matching this file's rate
    if (!kernels || (int)sample_rate != expect_sr) {
      r.err = -20;  // python fallback handles arbitrary rates
      return r;
    }
    int64_t out_n =
        (int64_t)std::ceil((double)new_sr_g * frames / (double)orig_sr_g);
    r.samples.resize(out_n);
    resample_apply(mono.data(), frames, r.samples.data(), out_n, kernels,
                   klen, width, orig_sr_g, new_sr_g);
  } else {
    r.samples = std::move(mono);
  }
  if (trim_sec > 0 &&
      (int64_t)r.samples.size() > (int64_t)target_sr * trim_sec)
    r.samples.resize((size_t)target_sr * trim_sec);
  r.length = (int64_t)r.samples.size();
  return r;
}

}  // namespace

extern "C" {

// Decode one wav file: fills out[0:max_out] (mono f32), *out_len = valid
// samples (clamped to max_out), *sr = file sample rate.
int nomad_decode_wav(const char* path, float* out, int64_t max_out,
                     int64_t* out_len, int32_t* sr) {
  std::vector<uint8_t> buf;
  int e = read_file(path, &buf);
  if (e) return e;
  std::vector<float> mono;
  uint32_t rate = 0;
  if ((e = decode_any_mono(buf, &mono, &rate)) != 0) return e;
  *sr = (int32_t)rate;
  int64_t ncopy = std::min<int64_t>((int64_t)mono.size(), max_out);
  memcpy(out, mono.data(), (size_t)ncopy * sizeof(float));
  *out_len = ncopy;
  return 0;
}

// Probe a wav/flac header: sample rate + frame count (for bucket planning).
int nomad_wav_info(const char* path, int32_t* sr, int64_t* frames,
                   int32_t* channels) {
  std::vector<uint8_t> buf;
  int e = read_file(path, &buf);
  if (e) return e;
  if (is_flac(buf)) {
    int32_t bits = 0;
    return nomad_flac_info(buf.data(), buf.size(), sr, frames, channels,
                           &bits);
  }
  WavView w;
  if ((e = parse_wav(buf.data(), buf.size(), &w)) != 0) return e;
  *sr = (int32_t)w.sample_rate;
  *channels = (int32_t)w.channels;
  size_t bps = (w.bits / 8) * w.channels;
  *frames = bps ? (int64_t)(w.payload_size / bps) : 0;
  return 0;
}

// Batched loader: n files -> zero-padded [n, pad_len] float32 batch +
// lengths, in a thread pool. Files whose sample rate == expect_sr are
// resampled with the provided torchaudio-parity kernel bank; 16 kHz files
// pass through. Returns number of failed files (their lengths are 0 and
// err_flags[i] != 0 — caller retries those in Python).
int nomad_load_batch(const char** paths, int64_t n, float* batch,
                     int64_t pad_len, int64_t* lengths, int32_t* err_flags,
                     int target_sr, int trim_sec, const float* kernels,
                     int klen, int width, int orig_sr_g, int new_sr_g,
                     int expect_sr, int num_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  int nt = std::max(1, std::min<int>(num_threads, (int)n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        LoadResult r = load_one(paths[i], target_sr, trim_sec, kernels, klen,
                                width, orig_sr_g, new_sr_g, expect_sr);
        float* row = batch + i * pad_len;
        if (r.err != 0) {
          memset(row, 0, (size_t)pad_len * sizeof(float));
          lengths[i] = 0;
          err_flags[i] = r.err;
          failures.fetch_add(1);
          continue;
        }
        int64_t ncopy = std::min<int64_t>(r.length, pad_len);
        memcpy(row, r.samples.data(), (size_t)ncopy * sizeof(float));
        if (ncopy < pad_len)
          memset(row + ncopy, 0, (size_t)(pad_len - ncopy) * sizeof(float));
        lengths[i] = ncopy;
        err_flags[i] = 0;
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

// Batched loader, int16 output: same pipeline as nomad_load_batch but the
// padded batch is quantized to the PCM16 grid (round-half-away, clamped).
// Halves the host->device bytes for resampled/converted files at the cost
// of re-quantization noise (max 1/65536 per sample — the sources were
// 16-bit PCM to begin with). The caller opts in (engine quantize_transfer).
int nomad_load_batch_q16(const char** paths, int64_t n, int16_t* batch,
                         int64_t pad_len, int64_t* lengths,
                         int32_t* err_flags, int target_sr, int trim_sec,
                         const float* kernels, int klen, int width,
                         int orig_sr_g, int new_sr_g, int expect_sr,
                         int num_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  int nt = std::max(1, std::min<int>(num_threads, (int)n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        LoadResult r = load_one(paths[i], target_sr, trim_sec, kernels, klen,
                                width, orig_sr_g, new_sr_g, expect_sr);
        int16_t* row = batch + i * pad_len;
        if (r.err != 0) {
          memset(row, 0, (size_t)pad_len * sizeof(int16_t));
          lengths[i] = 0;
          err_flags[i] = r.err;
          failures.fetch_add(1);
          continue;
        }
        int64_t ncopy = std::min<int64_t>(r.length, pad_len);
        for (int64_t j = 0; j < ncopy; ++j) {
          float v = r.samples[(size_t)j] * 32768.0f;
          v = std::nearbyintf(v);
          if (v > 32767.0f) v = 32767.0f;
          if (v < -32768.0f) v = -32768.0f;
          row[j] = (int16_t)v;
        }
        if (ncopy < pad_len)
          memset(row + ncopy, 0,
                 (size_t)(pad_len - ncopy) * sizeof(int16_t));
        lengths[i] = ncopy;
        err_flags[i] = 0;
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

// Probe with format detail (bits/format/flac) so the caller can route
// mono-PCM16@target files to the int16 fast path.
int nomad_probe(const char* path, int32_t* sr, int64_t* frames,
                int32_t* channels, int32_t* bits, int32_t* is_float,
                int32_t* is_flac_out) {
  std::vector<uint8_t> buf;
  int e = read_file(path, &buf);
  if (e) return e;
  if (is_flac(buf)) {
    *is_flac_out = 1;
    *is_float = 0;
    return nomad_flac_info(buf.data(), buf.size(), sr, frames, channels, bits);
  }
  *is_flac_out = 0;
  WavView w;
  if ((e = parse_wav(buf.data(), buf.size(), &w)) != 0) return e;
  *sr = (int32_t)w.sample_rate;
  *channels = (int32_t)w.channels;
  *bits = (int32_t)w.bits;
  *is_float = w.format == kFloat ? 1 : 0;
  size_t bps = (w.bits / 8) * w.channels;
  *frames = bps ? (int64_t)(w.payload_size / bps) : 0;
  return 0;
}

// int16 batched loader: mono PCM16 files at target_sr only (raw sample
// passthrough — int16/32768 dequantizes on device to exactly the float
// path's values). Any other format gets err_flags[i] != 0 for the caller
// to route through the float path. Threaded like nomad_load_batch.
int nomad_load_batch_i16(const char** paths, int64_t n, int16_t* batch,
                         int64_t pad_len, int64_t* lengths,
                         int32_t* err_flags, int target_sr, int trim_sec,
                         int num_threads) {
  std::atomic<int64_t> next(0);
  std::atomic<int> failures(0);
  int nt = std::max(1, std::min<int>(num_threads, (int)n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&]() {
      std::vector<uint8_t> buf;
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        int16_t* row = batch + i * pad_len;
        auto fail = [&](int code) {
          memset(row, 0, (size_t)pad_len * sizeof(int16_t));
          lengths[i] = 0;
          err_flags[i] = code;
          failures.fetch_add(1);
        };
        buf.clear();
        int e = read_file(paths[i], &buf);
        if (e) { fail(e); continue; }
        if (is_flac(buf)) { fail(-30); continue; }
        WavView w;
        if ((e = parse_wav(buf.data(), buf.size(), &w)) != 0) { fail(e); continue; }
        if (w.format != kPcm || w.bits != 16 || w.channels != 1 ||
            (int)w.sample_rate != target_sr) {
          fail(-31);
          continue;
        }
        int64_t frames = (int64_t)(w.payload_size / 2);
        if (trim_sec > 0 && frames > (int64_t)target_sr * trim_sec)
          frames = (int64_t)target_sr * trim_sec;
        int64_t ncopy = std::min<int64_t>(frames, pad_len);
        memcpy(row, w.payload, (size_t)ncopy * sizeof(int16_t));
        if (ncopy < pad_len)
          memset(row + ncopy, 0, (size_t)(pad_len - ncopy) * sizeof(int16_t));
        lengths[i] = ncopy;
        err_flags[i] = 0;
      }
    });
  }
  for (auto& th : pool) th.join();
  return failures.load();
}

// ---- wire codec encoder: first-order delta + zigzag + per-block bit
// packing of int16 PCM, S = 1024 samples/block. Format consumed by the
// on-device decoder in nomad_tpu/ops/wirecodec.py (the host->device wire
// is the scoring bottleneck; typical speech packs to ~9-12 bits/sample).
// Returns total packed words, or -1 if packed_cap is too small. Output
// ranges per block are disjoint, so the pack pass is embarrassingly
// parallel; every emitted word is written exactly once (no zeroing of
// `packed` required).
int64_t nomad_pack_i16(const int16_t* data, int64_t n_blocks,
                       uint32_t* packed, int64_t packed_cap,
                       int32_t* widths, int32_t* offsets, int32_t* firsts,
                       int num_threads) {
  const int S = 1024;
  int nt = std::max(1, (int)std::min<int64_t>(num_threads, n_blocks));
  {
    // pass 1: per-block max zigzag -> bit width, plus block-first samples
    std::atomic<int64_t> next(0);
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&]() {
        for (;;) {
          int64_t b = next.fetch_add(64);
          if (b >= n_blocks) break;
          int64_t e = std::min(n_blocks, b + 64);
          for (int64_t k = b; k < e; ++k) {
            const int16_t* x = data + k * S;
            firsts[k] = x[0];
            uint32_t mx = 0;
            int32_t prev = x[0];
            for (int i = 1; i < S; ++i) {
              int32_t d = (int32_t)x[i] - prev;
              prev = x[i];
              uint32_t z = (uint32_t)((d << 1) ^ (d >> 31));
              if (z > mx) mx = z;
            }
            widths[k] = mx ? 32 - __builtin_clz(mx) : 0;
          }
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (int64_t k = 0; k < n_blocks; ++k) {  // pass 2: word offsets
    offsets[k] = (int32_t)total;
    total += ((int64_t)widths[k] * S + 31) / 32;
  }
  if (total + 1 > packed_cap) return -1;
  {
    // pass 3: bit-plane layout per 32-sample group — word (g, p) holds
    // bit p of the group's 32 zigzag deltas (bit j = sample j). One
    // element-gather decodes this on the TPU; the LSB-sequential layout
    // needed two (see nomad_tpu/ops/wirecodec.py).
    std::atomic<int64_t> next(0);
    std::vector<std::thread> pool;
    pool.reserve(nt);
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&]() {
        for (;;) {
          int64_t b = next.fetch_add(64);
          if (b >= n_blocks) break;
          int64_t e = std::min(n_blocks, b + 64);
          for (int64_t k = b; k < e; ++k) {
            const int w = widths[k];
            if (w == 0) continue;
            const int16_t* x = data + k * S;
            uint32_t* out = packed + offsets[k];
            int32_t prev = x[0];
            uint32_t a[32];
            for (int g = 0; g < S / 32; ++g) {
              // load reversed so the 32x32 bit transpose (Hacker's
              // Delight 7-3, MSB-first orientation) yields plane p at
              // a[31 - p] with bit j = sample j's bit p
              for (int j = 0; j < 32; ++j) {
                int idx = g * 32 + j;
                uint32_t zj;
                if (idx == 0) {
                  zj = 0;  // sample 0 encodes delta 0
                } else {
                  int32_t d = (int32_t)x[idx] - prev;
                  zj = (uint32_t)((d << 1) ^ (d >> 31));
                }
                prev = x[idx];
                a[31 - j] = zj;
              }
              uint32_t m = 0x0000FFFFu;
              for (int j = 16; j != 0; j >>= 1, m ^= m << j) {
                for (int p = 0; p < 32; p = (p + j + 1) & ~j) {
                  uint32_t t2 = (a[p] ^ (a[p + j] >> j)) & m;
                  a[p] ^= t2;
                  a[p + j] ^= t2 << j;
                }
              }
              uint32_t* gw = out + (int64_t)g * w;
              for (int p = 0; p < w; ++p) gw[p] = a[31 - p];
            }
          }
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  return total;
}

int nomad_native_abi_version() { return 1; }

}  // extern "C"
