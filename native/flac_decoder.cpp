// Native FLAC decoder for nomad_native — C++ twin of
// nomad_tpu/io/flac.py (see that file for the scope: STREAMINFO, all
// subframe types incl. LPC-32, rice/rice2 with escapes, wasted bits, all
// stereo decorrelation modes; CRCs skipped). Exposed via the same C ABI
// and used by the batched loader so LibriSpeech FLAC ingests with zero
// external binaries (the reference requires an offline ffmpeg pass).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace flac {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;
  int bit = 0;
  bool error = false;

  BitReader(const uint8_t* d, size_t n, size_t start) : data(d), size(n), pos(start) {}

  void align() {
    if (bit) {
      ++pos;
      bit = 0;
    }
  }

  uint64_t read_uint(int n) {
    uint64_t out = 0;
    while (n > 0) {
      if (pos >= size) {
        error = true;
        return 0;
      }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      uint8_t byte = data[pos];
      out = (out << take) | ((byte >> (avail - take)) & ((1u << take) - 1));
      bit += take;
      n -= take;
      if (bit == 8) {
        ++pos;
        bit = 0;
      }
    }
    return out;
  }

  int64_t read_int(int n) {
    uint64_t v = read_uint(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  int read_unary() {
    int count = 0;
    for (;;) {
      if (pos >= size) {
        error = true;
        return 0;
      }
      uint8_t rest = data[pos] & ((1u << (8 - bit)) - 1);
      if (rest == 0) {
        count += 8 - bit;
        ++pos;
        bit = 0;
        continue;
      }
      int top = 31 - __builtin_clz((unsigned)rest);  // highest set bit idx
      int zeros = (8 - bit) - (top + 1);
      count += zeros;
      bit += zeros + 1;
      if (bit == 8) {
        ++pos;
        bit = 0;
      }
      return count;
    }
  }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits = 0;
  uint64_t total_samples = 0;
  size_t first_frame = 0;
};

inline uint32_t be24(const uint8_t* p) {
  return ((uint32_t)p[0] << 16) | ((uint32_t)p[1] << 8) | p[2];
}

int parse_stream_info(const uint8_t* data, size_t n, StreamInfo* out) {
  if (n < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  bool have = false;
  for (;;) {
    if (pos + 4 > n) return -2;
    uint8_t hdr = data[pos];
    bool last = hdr & 0x80;
    int type = hdr & 0x7F;
    uint32_t len = be24(data + pos + 1);
    if (type == 0 && len >= 34 && pos + 4 + 34 <= n) {
      BitReader br(data, n, pos + 4);
      br.read_uint(16);
      br.read_uint(16);
      br.read_uint(24);
      br.read_uint(24);
      out->sample_rate = (uint32_t)br.read_uint(20);
      out->channels = (int)br.read_uint(3) + 1;
      out->bits = (int)br.read_uint(5) + 1;
      out->total_samples = br.read_uint(36);
      have = true;
    }
    pos += 4 + len;
    if (last) break;
  }
  if (!have || pos > n) return -3;
  out->first_frame = pos;
  return 0;
}

static const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int blocksize, int order,
                     std::vector<int64_t>* out) {
  int method = (int)br.read_uint(2);
  if (method > 1) return false;
  int plen = method == 1 ? 5 : 4;
  uint32_t escape = (1u << plen) - 1;
  int po = (int)br.read_uint(4);
  int nparts = 1 << po;
  if (blocksize % nparts) return false;
  out->clear();
  out->reserve(blocksize - order);
  for (int p = 0; p < nparts; ++p) {
    int count = (blocksize >> po) - (p == 0 ? order : 0);
    uint32_t param = (uint32_t)br.read_uint(plen);
    if (param == escape) {
      int raw = (int)br.read_uint(5);
      for (int i = 0; i < count; ++i)
        out->push_back(raw ? br.read_int(raw) : 0);
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = (uint64_t)br.read_unary();
        uint64_t r = param ? br.read_uint(param) : 0;
        uint64_t v = (q << param) | r;
        out->push_back((int64_t)(v >> 1) ^ -(int64_t)(v & 1));
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>* out) {
  if (br.read_uint(1) != 0) return false;
  int stype = (int)br.read_uint(6);
  int wasted = 0;
  if (br.read_uint(1)) {
    wasted = 1 + br.read_unary();
    bps -= wasted;
  }
  out->assign(blocksize, 0);
  std::vector<int64_t> resid;

  if (stype == 0) {
    int64_t v = br.read_int(bps);
    for (int i = 0; i < blocksize; ++i) (*out)[i] = v;
  } else if (stype == 1) {
    for (int i = 0; i < blocksize; ++i) (*out)[i] = br.read_int(bps);
  } else if (stype >= 8 && stype <= 12) {
    int order = stype - 8;
    for (int i = 0; i < order; ++i) (*out)[i] = br.read_int(bps);
    if (!decode_residual(br, blocksize, order, &resid)) return false;
    const int* c = kFixedCoeffs[order];
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += (int64_t)c[j] * (*out)[i - 1 - j];
      (*out)[i] = pred + resid[i - order];
    }
  } else if (stype >= 32) {
    int order = stype - 31;
    for (int i = 0; i < order; ++i) (*out)[i] = br.read_int(bps);
    int precision = (int)br.read_uint(4) + 1;
    if (precision == 16) return false;
    int shift = (int)br.read_int(5);
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_int(precision);
    if (!decode_residual(br, blocksize, order, &resid)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * (*out)[i - 1 - j];
      (*out)[i] = (acc >> shift) + resid[i - order];
    }
  } else {
    return false;
  }
  if (wasted)
    for (auto& v : *out) v <<= wasted;
  return !br.error;
}

static const int kBlocksize[16] = {0,    192,  576,   1152,  2304, 4608,
                                   -8,   -16,  256,   512,   1024, 2048,
                                   4096, 8192, 16384, 32768};
static const int kSize[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// Decode whole stream into interleaved-by-channel buffers.
int decode_stream(const uint8_t* data, size_t n, StreamInfo* info,
                  std::vector<std::vector<int32_t>>* channels) {
  int rc = parse_stream_info(data, n, info);
  if (rc) return rc;
  channels->assign(info->channels, {});
  for (auto& c : *channels)
    c.reserve((size_t)info->total_samples);

  BitReader br(data, n, info->first_frame);
  uint64_t total = 0;
  std::vector<std::vector<int64_t>> subs;

  while (br.pos + 2 < n) {
    br.align();
    if (br.read_uint(14) != 0x3FFE) return -10;
    br.read_uint(2);
    int bs_code = (int)br.read_uint(4);
    int sr_code = (int)br.read_uint(4);
    int ch_code = (int)br.read_uint(4);
    int size_code = (int)br.read_uint(3);
    br.read_uint(1);
    // UTF-8 frame number
    uint64_t b0 = br.read_uint(8);
    if (b0 >= 0x80) {
      int nb = 0;
      for (uint64_t m = 0x80; b0 & m; m >>= 1) ++nb;
      for (int i = 0; i < nb - 1; ++i) br.read_uint(8);
    }
    int blocksize;
    if (bs_code == 6)
      blocksize = (int)br.read_uint(8) + 1;
    else if (bs_code == 7)
      blocksize = (int)br.read_uint(16) + 1;
    else if (kBlocksize[bs_code] > 0)
      blocksize = kBlocksize[bs_code];
    else
      return -11;
    if (sr_code == 12)
      br.read_uint(8);
    else if (sr_code == 13 || sr_code == 14)
      br.read_uint(16);
    int bps = size_code ? kSize[size_code] : info->bits;
    if (!bps) bps = info->bits;
    br.read_uint(8);  // crc8

    int nch = info->channels;
    subs.assign(nch, {});
    bool ok = true;
    if (ch_code < 8) {
      for (int c = 0; c < nch && ok; ++c)
        ok = decode_subframe(br, blocksize, bps, &subs[c]);
    } else if (ch_code == 8) {  // left/side
      std::vector<int64_t> left, side;
      ok = decode_subframe(br, blocksize, bps, &left) &&
           decode_subframe(br, blocksize, bps + 1, &side);
      if (ok) {
        subs[0] = left;
        subs[1].resize(blocksize);
        for (int i = 0; i < blocksize; ++i) subs[1][i] = left[i] - side[i];
      }
    } else if (ch_code == 9) {  // right/side
      std::vector<int64_t> side, right;
      ok = decode_subframe(br, blocksize, bps + 1, &side) &&
           decode_subframe(br, blocksize, bps, &right);
      if (ok) {
        subs[1] = right;
        subs[0].resize(blocksize);
        for (int i = 0; i < blocksize; ++i) subs[0][i] = right[i] + side[i];
      }
    } else if (ch_code == 10) {  // mid/side
      std::vector<int64_t> mid, side;
      ok = decode_subframe(br, blocksize, bps, &mid) &&
           decode_subframe(br, blocksize, bps + 1, &side);
      if (ok) {
        subs[0].resize(blocksize);
        subs[1].resize(blocksize);
        for (int i = 0; i < blocksize; ++i) {
          int64_t m2 = (mid[i] << 1) | (side[i] & 1);
          subs[0][i] = (m2 + side[i]) >> 1;
          subs[1][i] = (m2 - side[i]) >> 1;
        }
      }
    } else {
      return -12;
    }
    if (!ok || br.error) return -13;
    br.align();
    br.read_uint(16);  // crc16

    for (int c = 0; c < nch; ++c)
      for (int i = 0; i < blocksize; ++i)
        (*channels)[c].push_back((int32_t)subs[c][i]);
    total += blocksize;
    if (info->total_samples && total >= info->total_samples) break;
  }
  if (info->total_samples)
    for (auto& c : *channels)
      if (c.size() > info->total_samples) c.resize(info->total_samples);
  return 0;
}

}  // namespace flac

// ---- C ABI ----------------------------------------------------------------

extern "C" {

int nomad_flac_info(const uint8_t* data, size_t n, int32_t* sr,
                    int64_t* frames, int32_t* channels, int32_t* bits) {
  flac::StreamInfo info;
  int rc = flac::parse_stream_info(data, n, &info);
  if (rc) return rc;
  *sr = (int32_t)info.sample_rate;
  *frames = (int64_t)info.total_samples;
  *channels = info.channels;
  *bits = info.bits;
  return 0;
}

// Decode to mono float32 ((ch0+ch1)/2 fold like the wav path). Returns 0 ok.
int nomad_flac_decode_mono(const uint8_t* data, size_t n, float* out,
                           int64_t max_out, int64_t* out_len, int32_t* sr) {
  flac::StreamInfo info;
  std::vector<std::vector<int32_t>> ch;
  int rc = flac::decode_stream(data, n, &info, &ch);
  if (rc) return rc;
  *sr = (int32_t)info.sample_rate;
  float scale = 1.0f / (float)(1u << (info.bits - 1));
  int64_t count = (int64_t)ch[0].size();
  if (count > max_out) count = max_out;
  if (info.channels > 1) {
    for (int64_t i = 0; i < count; ++i)
      out[i] = 0.5f * (ch[0][i] + ch[1][i]) * scale;
  } else {
    for (int64_t i = 0; i < count; ++i) out[i] = ch[0][i] * scale;
  }
  *out_len = count;
  return 0;
}

}  // extern "C"
