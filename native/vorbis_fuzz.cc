// ASan/UBSan fuzz harness for the native Ogg Vorbis decoder
// (vorbis_decode.cc prt_vorbis_decode) — the C++ code that parses
// untrusted container pages, codebook headers, and entropy-coded
// packets on the fleet ingest path (io/native.py vorbis_decode).
//
// Build + run via `make fuzz-vorbis` (native/Makefile): compiles this
// file together with vorbis_decode.cc under
// -fsanitize=address,undefined, then decodes `trials` mutated copies
// of a valid stream (bit flips, scrambles, truncations — biased into
// the setup header and packet sections) plus hostile call parameters.
// Any sanitizer report fails the run; decode errors (negative return)
// are the expected outcome and are only counted.
//
// Usage: vorbis_fuzz <channels> <rate> <max_frames> <file.ogg>
//            [trials] [seed]
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" int64_t prt_vorbis_decode(const uint8_t* data, int64_t size,
                                     float* out, int64_t stride,
                                     int32_t channels, int32_t rate);

static uint64_t rng_state = 0xD1B54A32D192ED03ull;
static uint64_t rnd() {  // xorshift64*
  uint64_t x = rng_state;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  rng_state = x;
  return x * 0x2545F4914F6CDD1Dull;
}

static int64_t decode(const std::vector<uint8_t>& buf, int channels,
                      int rate, int64_t stride) {
  std::vector<float> out((size_t)stride * (channels > 0 ? channels : 1));
  return prt_vorbis_decode(buf.data(), (int64_t)buf.size(), out.data(),
                           stride, channels, rate);
}

// Recompute every Ogg page CRC so mutated bytes pass the container
// check and reach the Vorbis header/packet parsers — the surface the
// fuzz exists for (naive mutations are all rejected by the CRC).
static void fix_crcs(std::vector<uint8_t>& d) {
  static uint32_t tbl[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i << 24;
      for (int k = 0; k < 8; ++k)
        c = (c & 0x80000000u) ? (c << 1) ^ 0x04C11DB7u : (c << 1);
      tbl[i] = c;
    }
    init = true;
  }
  size_t pos = 0;
  while (pos + 27 <= d.size()) {
    if (memcmp(&d[pos], "OggS", 4)) { ++pos; continue; }
    size_t nsegs = d[pos + 26];
    if (pos + 27 + nsegs > d.size()) break;
    size_t body = 0;
    for (size_t i = 0; i < nsegs; ++i) body += d[pos + 27 + i];
    size_t len = 27 + nsegs + body;
    if (pos + len > d.size()) break;
    memset(&d[pos + 22], 0, 4);
    uint32_t c = 0;
    for (size_t i = 0; i < len; ++i)
      c = (c << 8) ^ tbl[((c >> 24) ^ d[pos + i]) & 0xFF];
    memcpy(&d[pos + 22], &c, 4);
    pos += len;
  }
}

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: vorbis_fuzz <channels> <rate> <max_frames> "
                    "<file.ogg> [trials] [seed]\n");
    return 2;
  }
  int channels = atoi(argv[1]);
  int rate = atoi(argv[2]);
  int64_t stride = strtoll(argv[3], nullptr, 10);
  long trials = argc > 5 ? atol(argv[5]) : 3000;
  if (argc > 6) rng_state ^= strtoull(argv[6], nullptr, 10);

  FILE* f = fopen(argv[4], "rb");
  if (!f) { perror(argv[4]); return 2; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> base(sz > 0 ? sz : 0);
  if (sz > 0 && fread(base.data(), 1, sz, f) != (size_t)sz) {
    fclose(f);
    return 2;
  }
  fclose(f);

  if (decode(base, channels, rate, stride) < 0) {
    fprintf(stderr, "baseline stream does not decode — bad params?\n");
    return 2;
  }

  long ok = 0, err = 0;
  for (long i = 0; i < trials; ++i) {
    std::vector<uint8_t> d = base;
    bool fix = true;  // CRC-valid mutations reach the Vorbis parsers
    switch (i & 3) {
      case 0:  // sparse bit flips anywhere, CRCs repaired: corrupt
               // codebooks / floor configs / packet entropy
        for (unsigned k = 0; k < 1 + rnd() % 8; ++k) {
          size_t j = rnd() % d.size();
          d[j] ^= (uint8_t)(1u << (rnd() % 8));
        }
        break;
      case 1: {  // scramble a run, CRCs repaired
        size_t j = rnd() % d.size();
        size_t n = 1 + rnd() % 64;
        for (size_t k = j; k < d.size() && k < j + n; ++k)
          d[k] = (uint8_t)rnd();
        break;
      }
      case 2:  // truncate anywhere (container-level damage, raw)
        d.resize(rnd() % d.size());
        fix = false;
        break;
      default:  // heavy raw flips: the container CRC/structure path
        for (int k = 0; k < 24; ++k) {
          size_t j = rnd() % d.size();
          d[j] ^= (uint8_t)(1u << (rnd() % 8));
        }
        fix = false;
    }
    if (fix) fix_crcs(d);
    if (decode(d, channels, rate, stride) >= 0) ++ok; else ++err;
  }

  // hostile call parameters against the VALID stream: what a corrupt
  // header probe could make the caller pass
  static const int chans[] = {0, 1, 2, 8, 255};
  static const int rates[] = {0, 1, 8000, 48000, 1 << 30};
  static const int64_t strides[] = {0, 1, 100, 1 << 20};
  for (int c : chans)
    for (int r : rates)
      for (int64_t s : strides) decode(base, c, r, s);

  printf("vorbis_fuzz: %ld trials, decoded_ok=%ld decode_err=%ld, "
         "param grid clean\n", trials, ok, err);
  return 0;
}
