// Native FLAC decoder (subset-complete) for offline corpus ingestion.
//
// The reference reads VCTK mic2 *.flac with librosa/soundfile
// (reference: preprocessor/vctk.py:11-46); this image has neither, so the
// prepare_align path decodes FLAC natively (ctypes into this library).
//
// Implements the full FLAC frame format needed for real corpora:
//   * STREAMINFO parsing (sample rate / channels / bps / total samples);
//   * frames with fixed or variable blocking, UTF-8 coded frame numbers;
//   * subframe types CONSTANT, VERBATIM, FIXED(0-4), LPC(1-32);
//   * Rice/Rice2 partitioned residuals incl. escape (raw) partitions;
//   * wasted-bits, and left/side, right/side, mid/side decorrelation.
// CRCs are not verified (the decoder is for trusted local corpora).
//
// Exported C ABI:
//   flac_info(data, size, &sr, &channels, &bps, &total_samples) -> 0 ok
//   flac_decode(data, size, out, max_samples) -> n interleaved samples
//     (int32, scaled to the stream's bps) or negative error code.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  long size;        // bytes
  long pos = 0;     // bit position
  bool error = false;

  BitReader(const uint8_t* d, long n) : data(d), size(n) {}

  bool at_end() const { return pos >= size * 8; }

  uint32_t bits(int n) {  // n <= 32, MSB first
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) {
      if (pos >= size * 8) { error = true; return 0; }
      v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1);
      ++pos;
    }
    return v;
  }

  uint64_t bits64(int n) {
    uint64_t v = 0;
    if (n > 32) { v = bits(n - 32); n = 32; }
    return (v << n) | bits(n);
  }

  int32_t sbits(int n) {  // signed, two's complement
    if (n == 0) return 0;
    uint32_t v = bits(n);
    if (n < 32 && (v & (1u << (n - 1)))) v |= ~((1u << n) - 1);
    return (int32_t)v;
  }

  uint32_t unary() {  // count zero bits until a 1
    uint32_t q = 0;
    while (!error) {
      if (pos >= size * 8) { error = true; return 0; }
      if ((data[pos >> 3] >> (7 - (pos & 7))) & 1) { ++pos; return q; }
      ++pos; ++q;
    }
    return 0;
  }

  void align() { pos = (pos + 7) & ~7L; }
};

struct StreamInfo {
  int sample_rate = 0, channels = 0, bps = 0;
  uint64_t total_samples = 0;
};

// returns byte offset of first frame, or -1
long parse_header(const uint8_t* data, long size, StreamInfo* si) {
  if (size < 8 || memcmp(data, "fLaC", 4) != 0) return -1;
  long off = 4;
  bool have_si = false;
  while (off + 4 <= size) {
    uint8_t head = data[off];
    uint32_t len = ((uint32_t)data[off + 1] << 16) |
                   ((uint32_t)data[off + 2] << 8) | data[off + 3];
    off += 4;
    if ((head & 0x7f) == 0 && len >= 34) {  // STREAMINFO
      BitReader br(data + off, len);
      br.bits(16); br.bits(16);       // min/max blocksize
      br.bits(24); br.bits(24);       // min/max framesize
      si->sample_rate = br.bits(20);
      si->channels = br.bits(3) + 1;
      si->bps = br.bits(5) + 1;
      si->total_samples = br.bits64(36);
      have_si = true;
    }
    off += len;
    if (head & 0x80) break;  // last metadata block
  }
  return (have_si && off <= size) ? off : -1;
}

void skip_utf8(BitReader* br) {  // frame/sample number, up to 7 bytes
  uint32_t b = br->bits(8);
  int follow = 0;
  for (uint32_t m = 0x80; b & m; m >>= 1) ++follow;
  if (follow > 0) --follow;  // first byte of an n-byte seq has n leading 1s
  for (int i = 0; i < follow; ++i) br->bits(8);
}

bool decode_residual(BitReader* br, int blocksize, int order,
                     int32_t* res) {
  int method = br->bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  int porder = br->bits(4);
  int partitions = 1 << porder;
  if (blocksize % partitions) return false;
  int idx = 0;
  for (int p = 0; p < partitions; ++p) {
    int n = blocksize >> porder;
    if (p == 0) n -= order;
    if (n < 0) return false;
    uint32_t param = br->bits(plen);
    if (param == escape) {
      int raw = br->bits(5);
      for (int i = 0; i < n; ++i) res[idx++] = br->sbits(raw);
    } else {
      for (int i = 0; i < n; ++i) {
        uint32_t q = br->unary();
        uint32_t low = param ? br->bits(param) : 0;
        uint32_t v = (q << param) | low;
        res[idx++] = (int32_t)(v >> 1) ^ -(int32_t)(v & 1);
      }
    }
    if (br->error) return false;
  }
  return true;
}

static const int kFixedCoef[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_subframe(BitReader* br, int blocksize, int bps, int32_t* out) {
  if (br->bits(1) != 0) return false;  // padding bit
  int type = br->bits(6);
  int wasted = 0;
  if (br->bits(1)) wasted = br->unary() + 1;
  bps -= wasted;
  if (bps <= 0 || bps > 32) return false;

  if (type == 0) {                       // CONSTANT
    int32_t v = br->sbits(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {                // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br->sbits(bps);
  } else if ((type & 0x38) == 0x08 && (type & 7) <= 4) {  // FIXED
    int order = type & 7;
    std::vector<int32_t> res(blocksize);
    for (int i = 0; i < order; ++i) out[i] = br->sbits(bps);
    if (!decode_residual(br, blocksize, order, res.data() + order))
      return false;
    const int* c = kFixedCoef[order];
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += (int64_t)c[j] * out[i - 1 - j];
      out[i] = (int32_t)(pred + res[i]);
    }
  } else if (type & 0x20) {              // LPC
    int order = (type & 0x1f) + 1;
    for (int i = 0; i < order; ++i) out[i] = br->sbits(bps);
    int precision = br->bits(4) + 1;
    if (precision == 16 && br->error) return false;
    int shift = br->sbits(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br->sbits(precision);
    std::vector<int32_t> res(blocksize);
    if (!decode_residual(br, blocksize, order, res.data() + order))
      return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] = (int32_t)((pred >> shift) + res[i]);
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return !br->error;
}

}  // namespace

extern "C" int flac_info(const uint8_t* data, long size, int* sr,
                         int* channels, int* bps, long* total_samples) {
  StreamInfo si;
  if (parse_header(data, size, &si) < 0) return -1;
  *sr = si.sample_rate;
  *channels = si.channels;
  *bps = si.bps;
  *total_samples = (long)si.total_samples;
  return 0;
}

extern "C" long flac_decode(const uint8_t* data, long size, int32_t* out,
                            long max_samples) {
  StreamInfo si;
  long off = parse_header(data, size, &si);
  if (off < 0) return -1;
  if (si.channels < 1 || si.channels > 8) return -2;

  BitReader br(data, size);
  br.pos = off * 8;
  long written = 0;  // interleaved samples
  std::vector<std::vector<int32_t>> ch(si.channels);

  while (!br.at_end() && !br.error) {
    // frame sync: 11111111 111110xx
    long frame_start = br.pos;
    uint32_t sync = br.bits(14);
    if (br.error) break;
    if (sync != 0x3ffe) {
      // tolerate byte padding at EOF
      br.pos = frame_start + 8;
      continue;
    }
    br.bits(1);                       // reserved
    br.bits(1);                       // blocking strategy
    uint32_t bs_code = br.bits(4);
    uint32_t sr_code = br.bits(4);
    uint32_t ch_code = br.bits(4);
    uint32_t ss_code = br.bits(3);
    br.bits(1);                       // reserved
    skip_utf8(&br);

    int blocksize;
    switch (bs_code) {
      case 0: return -3;
      case 1: blocksize = 192; break;
      case 6: blocksize = br.bits(8) + 1; break;
      case 7: blocksize = br.bits(16) + 1; break;
      default:
        blocksize = (bs_code <= 5) ? 576 << (bs_code - 2)
                                   : 256 << (bs_code - 8);
    }
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);

    int bps = si.bps;
    switch (ss_code) {
      case 1: bps = 8; break;   case 2: bps = 12; break;
      case 4: bps = 16; break;  case 5: bps = 20; break;
      case 6: bps = 24; break;  case 7: bps = 32; break;
    }
    br.bits(8);                       // CRC-8

    int nch = (ch_code < 8) ? (int)ch_code + 1 : 2;
    if (nch != si.channels) return -4;
    if (blocksize <= 0 || blocksize > 65536) return -5;

    for (int c = 0; c < nch; ++c) {
      ch[c].resize(blocksize);
      int sub_bps = bps;
      // the side channel carries one extra bit
      if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
          (ch_code == 10 && c == 1))
        sub_bps += 1;
      if (!decode_subframe(&br, blocksize, sub_bps, ch[c].data()))
        return -6;
    }
    br.align();
    br.bits(16);                      // CRC-16

    // channel decorrelation
    if (ch_code == 8) {               // left/side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ch_code == 9) {        // right/side: ch0=side, ch1=right
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[1][i] + ch[0][i];
    } else if (ch_code == 10) {       // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int32_t side = ch[1][i];
        int64_t mid = ((int64_t)ch[0][i] << 1) | (side & 1);
        ch[0][i] = (int32_t)((mid + side) >> 1);
        ch[1][i] = (int32_t)((mid - side) >> 1);
      }
    }

    for (int i = 0; i < blocksize; ++i)
      for (int c = 0; c < nch; ++c) {
        if (written >= max_samples) return written;
        out[written++] = ch[c][i];
      }
  }
  return written;
}
