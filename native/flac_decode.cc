// Native FLAC frame-stream decoder for phaserotate_tpu.
//
// Role: the decode hot path of the file layer (the reference leans on
// libsndfile for this, cli/phase-rotate.cc:33).  The Python codec in
// phaserotate_tpu/io/flac.py stays the reference implementation and the
// error-message surface; this library decodes the frame section of a
// well-formed stream ~two orders of magnitude faster so on-disk fleet
// search is decode-bound on I/O, not on a Python bit reader.
//
// Contract: prt_flac_decode() returns the decoded sample count per
// channel, or a negative error code.  The Python caller falls back to
// its own decoder on ANY negative return, so corrupt streams keep the
// exact pure-Python error semantics (and the fuzz-test contract).
//
// Independent implementation from the public FLAC format spec
// (xiph.org/flac); not derived from libFLAC.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

enum {
  E_TRUNC = -1,   // ran out of bits / bytes
  E_FMT = -2,     // reserved / invalid field
  E_CRC = -3,     // header CRC-8 or frame CRC-16 mismatch
  E_OVER = -4,    // output capacity exceeded
  E_ALLOC = -5,   // scratch allocation failed
};

// ---- CRC tables (FLAC polynomials: CRC-8 0x07, CRC-16 0x8005) -------------

struct CrcTables {
  uint8_t crc8[256];
  uint16_t crc16[256];
  CrcTables() {
    for (int i = 0; i < 256; ++i) {
      unsigned c = i;
      for (int k = 0; k < 8; ++k)
        c = (c & 0x80) ? ((c << 1) ^ 0x07) & 0xFF : (c << 1) & 0xFF;
      crc8[i] = (uint8_t)c;
      unsigned d = i << 8;
      for (int k = 0; k < 8; ++k)
        d = (d & 0x8000) ? ((d << 1) ^ 0x8005) & 0xFFFF : (d << 1) & 0xFFFF;
      crc16[i] = (uint16_t)d;
    }
  }
};
static const CrcTables kCrc;

static uint8_t crc8(const uint8_t* p, size_t n) {
  uint8_t c = 0;
  for (size_t i = 0; i < n; ++i) c = kCrc.crc8[c ^ p[i]];
  return c;
}

static uint16_t crc16(const uint8_t* p, size_t n) {
  uint16_t c = 0;
  for (size_t i = 0; i < n; ++i)
    c = (uint16_t)(((c << 8) & 0xFFFF) ^ kCrc.crc16[((c >> 8) ^ p[i]) & 0xFF]);
  return c;
}

// ---- MSB-first bit reader: stateless 64-bit window per read ----------------
//
// Tracks only an absolute bit position; every read loads 8 bytes at the
// current byte offset (one unaligned load + bswap) and shifts the
// already-consumed bits off the top.  n <= 57 per read (the decoder
// needs at most 36).  The tail of the buffer (< 8 bytes left) takes a
// byte-assembly slow path.

struct Br {
  const uint8_t* data;
  size_t len;     // total bytes
  size_t pos;     // absolute bit position

  explicit Br(const uint8_t* d, size_t n, size_t start_byte)
      : data(d), len(n), pos(start_byte * 8) {}

  inline size_t bitpos() const { return pos; }

  inline uint64_t window_at(size_t byte) const {
    if (byte + 8 <= len) {
      uint64_t w;
      std::memcpy(&w, data + byte, 8);
      return __builtin_bswap64(w);
    }
    uint64_t w = 0;
    for (size_t i = byte; i < len; ++i)
      w |= (uint64_t)data[i] << (8 * (7 - (i - byte)));
    return w;
  }

  inline bool read_uint(int n, uint64_t* v) {
    if (n == 0) { *v = 0; return true; }
    if (pos + (size_t)n > len * 8) return false;
    const uint64_t w = window_at(pos >> 3);
    const int sh = (int)(pos & 7);
    pos += (size_t)n;
    *v = (w << sh) >> (64 - n);
    return true;
  }

  inline bool read_signed(int n, int64_t* v) {
    uint64_t u;
    if (!read_uint(n, &u)) return false;
    if (n > 0 && (u & ((uint64_t)1 << (n - 1))))
      *v = (int64_t)u - ((int64_t)1 << n);
    else
      *v = (int64_t)u;
    return true;
  }

  inline bool read_unary(uint32_t* q) {
    uint32_t count = 0;
    for (;;) {
      const size_t total = len * 8;
      if (pos >= total) return false;
      const uint64_t w = window_at(pos >> 3);
      const int sh = (int)(pos & 7);
      const uint64_t window = w << sh;
      const int avail =
          (int)((total - pos) < (size_t)(64 - sh) ? (total - pos)
                                                  : (size_t)(64 - sh));
      if (window == 0) {
        count += (uint32_t)avail;
        pos += (size_t)avail;
        continue;
      }
      const int lz = __builtin_clzll(window);
      if (lz >= avail) {  // terminating 1 lies beyond this window/buffer
        count += (uint32_t)avail;
        pos += (size_t)avail;
        continue;
      }
      count += (uint32_t)lz;
      pos += (size_t)lz + 1;
      *q = count;
      return true;
    }
  }

  inline void align() { pos = (pos + 7) & ~(size_t)7; }

  // One full Rice code (unary quotient + k remainder bits + zigzag) in
  // a single 64-bit window when it fits — the decoder's hottest path;
  // falls back to the split reads for codes spanning windows.
  inline bool read_rice(int k, int64_t* out) {
    const size_t total = len * 8;
    if (pos < total) {
      const uint64_t w = window_at(pos >> 3);
      const int sh = (int)(pos & 7);
      const uint64_t window = w << sh;
      const int navail =
          (int)((total - pos) < (size_t)(64 - sh) ? (total - pos)
                                                  : (size_t)(64 - sh));
      if (window != 0) {
        const int lz = __builtin_clzll(window);
        const int consumed = lz + 1 + k;
        if (lz < navail && consumed <= navail) {
          uint64_t v = (uint64_t)lz;
          if (k) {
            v = (v << k) | ((window << (lz + 1)) >> (64 - k));
          }
          pos += (size_t)consumed;
          *out = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
          return true;
        }
      }
    }
    uint32_t q;
    if (!read_unary(&q)) return false;
    uint64_t v = (uint64_t)q;
    if (k) {
      uint64_t u;
      if (!read_uint(k, &u)) return false;
      v = (v << k) | u;
    }
    *out = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
    return true;
  }
};

// ---- residual + prediction -------------------------------------------------

static int read_residual(Br& br, int blocksize, int order, int64_t* out) {
  uint64_t method, part_order, param;
  if (!br.read_uint(2, &method)) return E_TRUNC;
  if (method > 1) return E_FMT;
  const int plen = method == 0 ? 4 : 5;
  const uint64_t escape = ((uint64_t)1 << plen) - 1;
  if (!br.read_uint(4, &part_order)) return E_TRUNC;
  const int nparts = 1 << part_order;
  if (blocksize % nparts) return E_FMT;
  int idx = 0;
  for (int p = 0; p < nparts; ++p) {
    int n = (blocksize >> part_order) - (p == 0 ? order : 0);
    if (n < 0) return E_FMT;
    if (!br.read_uint(plen, &param)) return E_TRUNC;
    if (param == escape) {
      uint64_t raw_bits;
      if (!br.read_uint(5, &raw_bits)) return E_TRUNC;
      if (raw_bits == 0) {
        for (int i = 0; i < n; ++i) out[idx + i] = 0;
      } else {
        for (int i = 0; i < n; ++i) {
          int64_t v;
          if (!br.read_signed((int)raw_bits, &v)) return E_TRUNC;
          out[idx + i] = v;
        }
      }
    } else {
      const int k = (int)param;
      for (int i = 0; i < n; ++i)
        if (!br.read_rice(k, &out[idx + i])) return E_TRUNC;
    }
    idx += n;
  }
  return 0;
}

// FIXED subframes: residual decode and prediction FUSED into one pass —
// the predictor state lives in registers across the partition loop, so
// each sample is decoded and reconstructed without a second sweep over
// the int64 buffer (int64 wraparound on corrupt data is fine: the frame
// CRC-16 rejects the garbage right after).
template <int ORDER>
static int decode_fixed_fused(Br& br, int blocksize, int64_t* out) {
  uint64_t method, part_order, param;
  if (!br.read_uint(2, &method)) return E_TRUNC;
  if (method > 1) return E_FMT;
  const int plen = method == 0 ? 4 : 5;
  const uint64_t escape = ((uint64_t)1 << plen) - 1;
  if (!br.read_uint(4, &part_order)) return E_TRUNC;
  const int nparts = 1 << part_order;
  if (blocksize % nparts) return E_FMT;
  int64_t p1 = 0, p2 = 0, p3 = 0, p4 = 0;
  if (ORDER >= 1) p1 = out[ORDER - 1];
  if (ORDER >= 2) p2 = out[ORDER - 2];
  if (ORDER >= 3) p3 = out[ORDER - 3];
  if (ORDER >= 4) p4 = out[ORDER - 4];
  int idx = ORDER;
  for (int p = 0; p < nparts; ++p) {
    int n = (blocksize >> part_order) - (p == 0 ? ORDER : 0);
    if (n < 0) return E_FMT;
    if (!br.read_uint(plen, &param)) return E_TRUNC;
    const bool raw = (param == escape);
    uint64_t raw_bits = 0;
    if (raw && !br.read_uint(5, &raw_bits)) return E_TRUNC;
    const int k = (int)param;
    for (int i = 0; i < n; ++i) {
      int64_t r;
      if (raw) {
        if (raw_bits == 0) r = 0;
        else if (!br.read_signed((int)raw_bits, &r)) return E_TRUNC;
      } else {
        if (!br.read_rice(k, &r)) return E_TRUNC;
      }
      int64_t v;
      if (ORDER == 0) v = r;
      else if (ORDER == 1) v = r + p1;
      else if (ORDER == 2) v = r + 2 * p1 - p2;
      else if (ORDER == 3) v = r + 3 * p1 - 3 * p2 + p3;
      else v = r + 4 * p1 - 6 * p2 + 4 * p3 - p4;
      if (ORDER >= 4) p4 = p3;
      if (ORDER >= 3) p3 = p2;
      if (ORDER >= 2) p2 = p1;
      if (ORDER >= 1) p1 = v;
      out[idx++] = v;
    }
  }
  return 0;
}

static int predict_lpc(int order, const int64_t* coefs, int shift,
                       int64_t* out, int blocksize) {
  const int64_t lim = (int64_t)1 << 40;  // diverging => corruption
  for (int i = order; i < blocksize; ++i) {
    int64_t acc = 0;
    for (int j = 0; j < order; ++j) acc += coefs[j] * out[i - 1 - j];
    int64_t v = out[i] + (acc >> shift);
    if (!(-lim < v && v < lim)) return E_FMT;
    out[i] = v;
  }
  return 0;
}

static int read_subframe(Br& br, int blocksize, int bits, int64_t* out) {
  uint64_t u;
  if (!br.read_uint(1, &u)) return E_TRUNC;
  if (u) return E_FMT;  // padding bit set
  uint64_t ftype;
  if (!br.read_uint(6, &ftype)) return E_TRUNC;
  int wasted = 0;
  if (!br.read_uint(1, &u)) return E_TRUNC;
  if (u) {
    uint32_t q;
    if (!br.read_unary(&q)) return E_TRUNC;
    wasted = (int)q + 1;
    bits -= wasted;
    if (bits <= 0) return E_FMT;
  }
  if (ftype == 0) {  // CONSTANT
    int64_t v;
    if (!br.read_signed(bits, &v)) return E_TRUNC;
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (ftype == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i)
      if (!br.read_signed(bits, &out[i])) return E_TRUNC;
  } else if (ftype >= 8 && ftype <= 12) {  // FIXED order 0-4
    int order = (int)ftype - 8;
    if (order > blocksize) return E_FMT;
    for (int i = 0; i < order; ++i)
      if (!br.read_signed(bits, &out[i])) return E_TRUNC;
    int rc;
    switch (order) {
      case 0: rc = decode_fixed_fused<0>(br, blocksize, out); break;
      case 1: rc = decode_fixed_fused<1>(br, blocksize, out); break;
      case 2: rc = decode_fixed_fused<2>(br, blocksize, out); break;
      case 3: rc = decode_fixed_fused<3>(br, blocksize, out); break;
      default: rc = decode_fixed_fused<4>(br, blocksize, out); break;
    }
    if (rc) return rc;
  } else if (ftype >= 32) {  // LPC order 1-32
    int order = (int)(ftype & 0x1F) + 1;
    if (order > blocksize) return E_FMT;
    for (int i = 0; i < order; ++i)
      if (!br.read_signed(bits, &out[i])) return E_TRUNC;
    uint64_t prec;
    if (!br.read_uint(4, &prec)) return E_TRUNC;
    if (prec == 15) return E_FMT;
    int64_t shift;
    if (!br.read_signed(5, &shift)) return E_TRUNC;
    if (shift < 0) return E_FMT;
    int64_t coefs[32];
    for (int i = 0; i < order; ++i)
      if (!br.read_signed((int)prec + 1, &coefs[i])) return E_TRUNC;
    int rc = read_residual(br, blocksize, order, out + order);
    if (rc) return rc;
    rc = predict_lpc(order, coefs, (int)shift, out, blocksize);
    if (rc) return rc;
  } else {
    return E_FMT;  // reserved subframe type
  }
  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return 0;
}

// ---- frame header ----------------------------------------------------------

static const int kBlocksizeCode[16] = {
    0,   192,  576,  1152, 2304, 4608, -8 /*8-bit+1*/, -16 /*16-bit+1*/,
    256, 512,  1024, 2048, 4096, 8192, 16384,          32768};
static const int kBitsCode[8] = {0, 8, 12, 0 /*reserved: stream bits*/,
                                 16, 20, 24, 32};

static bool read_utf8_number(Br& br, uint64_t* out) {
  uint64_t first;
  if (!br.read_uint(8, &first)) return false;
  if (first < 0x80) { *out = first; return true; }
  int n = 0;
  uint64_t probe = first;
  while (probe & 0x40) { ++n; probe <<= 1; }
  uint64_t v = first & (uint64_t)(0x3F >> n);
  for (int i = 0; i < n; ++i) {
    uint64_t c;
    if (!br.read_uint(8, &c)) return false;
    if ((c & 0xC0) != 0x80) return false;
    v = (v << 6) | (c & 0x3F);
  }
  *out = v;
  return true;
}

}  // namespace

extern "C" {

// Decode every FLAC frame from byte `start` to the end of `data` (or
// until `max_total` samples per channel are decoded, when nonzero).
// Output is planar int32: out[c * out_stride + i].  Returns samples
// decoded per channel (>= 0) or a negative error code; the caller is
// expected to fall back to a reference decoder on error.
int64_t prt_flac_decode(const uint8_t* data, size_t len, size_t start,
                        int32_t channels, int32_t stream_bits,
                        int32_t* out, int64_t out_stride,
                        int64_t max_total) {
  if (channels < 1 || channels > 8 || stream_bits < 4 || stream_bits > 32)
    return E_FMT;
  const int kMaxBlock = 65536;
  int64_t* buf = (int64_t*)std::malloc(
      (size_t)2 * kMaxBlock * sizeof(int64_t));
  if (!buf) return E_ALLOC;
  int64_t* sub0 = buf;             // first decorrelated subframe
  int64_t* sub1 = buf + kMaxBlock; // second (stereo modes)
  int64_t decoded = 0;
  size_t pos = start;
  int rc = 0;

  while (pos < len && (max_total == 0 || decoded < max_total)) {
    Br br(data, len, pos);
    uint64_t sync, u;
    if (!br.read_uint(14, &sync)) { rc = E_TRUNC; break; }
    if (sync != 0x3FFE) { rc = E_FMT; break; }
    if (!br.read_uint(2, &u)) { rc = E_TRUNC; break; }  // reserved+strategy
    uint64_t bs_code, sr_code, ch_code, bits_code;
    if (!br.read_uint(4, &bs_code) || !br.read_uint(4, &sr_code) ||
        !br.read_uint(4, &ch_code) || !br.read_uint(3, &bits_code) ||
        !br.read_uint(1, &u)) { rc = E_TRUNC; break; }
    uint64_t frame_no;
    if (!read_utf8_number(br, &frame_no)) { rc = E_FMT; break; }

    int blocksize;
    if (bs_code == 0) { rc = E_FMT; break; }
    else if (bs_code == 6) {
      if (!br.read_uint(8, &u)) { rc = E_TRUNC; break; }
      blocksize = (int)u + 1;
    } else if (bs_code == 7) {
      if (!br.read_uint(16, &u)) { rc = E_TRUNC; break; }
      blocksize = (int)u + 1;
    } else {
      blocksize = kBlocksizeCode[bs_code];
    }
    if (blocksize > kMaxBlock) { rc = E_FMT; break; }
    if (sr_code == 12) {
      if (!br.read_uint(8, &u)) { rc = E_TRUNC; break; }
    } else if (sr_code == 13 || sr_code == 14) {
      if (!br.read_uint(16, &u)) { rc = E_TRUNC; break; }
    } else if (sr_code == 15) { rc = E_FMT; break; }
    int bits = bits_code ? kBitsCode[bits_code] : stream_bits;
    if (bits == 0) bits = stream_bits;  // reserved code 3: stream bits

    size_t crc_end = br.bitpos() >> 3;
    uint64_t hdr_crc;
    if (!br.read_uint(8, &hdr_crc)) { rc = E_TRUNC; break; }
    if (crc8(data + pos, crc_end - pos) != hdr_crc) { rc = E_CRC; break; }

    if (decoded + blocksize > out_stride) { rc = E_OVER; break; }

    if (ch_code < 8) {
      if ((int)ch_code + 1 != channels) { rc = E_FMT; break; }
      for (int c = 0; c < channels; ++c) {
        rc = read_subframe(br, blocksize, bits, sub0);
        if (rc) break;
        int32_t* dst = out + (size_t)c * out_stride + decoded;
        for (int i = 0; i < blocksize; ++i) dst[i] = (int32_t)sub0[i];
      }
      if (rc) break;
    } else if (ch_code <= 10) {
      if (channels != 2) { rc = E_FMT; break; }
      // side channel carries one extra bit
      if (ch_code == 8) {  // left/side
        rc = read_subframe(br, blocksize, bits, sub0);
        if (!rc) rc = read_subframe(br, blocksize, bits + 1, sub1);
        if (rc) break;
        int32_t* l = out + decoded;
        int32_t* r = out + out_stride + decoded;
        for (int i = 0; i < blocksize; ++i) {
          l[i] = (int32_t)sub0[i];
          r[i] = (int32_t)(sub0[i] - sub1[i]);
        }
      } else if (ch_code == 9) {  // right/side
        rc = read_subframe(br, blocksize, bits + 1, sub0);
        if (!rc) rc = read_subframe(br, blocksize, bits, sub1);
        if (rc) break;
        int32_t* l = out + decoded;
        int32_t* r = out + out_stride + decoded;
        for (int i = 0; i < blocksize; ++i) {
          l[i] = (int32_t)(sub1[i] + sub0[i]);
          r[i] = (int32_t)sub1[i];
        }
      } else {  // mid/side
        rc = read_subframe(br, blocksize, bits, sub0);
        if (!rc) rc = read_subframe(br, blocksize, bits + 1, sub1);
        if (rc) break;
        int32_t* l = out + decoded;
        int32_t* r = out + out_stride + decoded;
        for (int i = 0; i < blocksize; ++i) {
          int64_t left = ((sub0[i] << 1) | (sub1[i] & 1)) + sub1[i];
          l[i] = (int32_t)(left >> 1);
          r[i] = (int32_t)((left >> 1) - sub1[i]);
        }
      }
    } else {
      rc = E_FMT;  // reserved channel assignment
      break;
    }

    br.align();
    size_t frame_end = br.bitpos() >> 3;
    uint64_t fcrc;
    if (!br.read_uint(16, &fcrc)) { rc = E_TRUNC; break; }
    if (crc16(data + pos, frame_end - pos) != fcrc) { rc = E_CRC; break; }
    pos = br.bitpos() >> 3;
    decoded += blocksize;
  }

  std::free(buf);
  return rc ? rc : decoded;
}

}  // extern "C"
