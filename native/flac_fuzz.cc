// ASan/UBSan fuzz harness for the native FLAC frame decoder
// (flac_decode.cc prt_flac_decode) — the C code that parses untrusted
// frame bytes on the fleet ingest path (io/native.py flac_decode).
//
// Build + run via `make fuzz-flac` (native/Makefile): compiles this
// file together with flac_decode.cc under
// -fsanitize=address,undefined, then decodes `trials` mutated copies
// of a valid stream (bit flips, scrambles, truncations — biased into
// the frame section) plus a grid of hostile call parameters (the
// values a corrupt STREAMINFO would make the Python caller pass).
// Any sanitizer report fails the run; decode errors are the expected
// outcome and are only counted.
//
// Usage: flac_fuzz <frame_start> <channels> <total> <file.flac>
//            [trials] [seed]
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" int64_t prt_flac_decode(const uint8_t* data, size_t len,
                                   size_t start, int channels, int bits,
                                   int32_t* out, size_t stride,
                                   size_t total);

static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rnd() {  // xorshift64*
  uint64_t x = rng_state;
  x ^= x >> 12;
  x ^= x << 25;
  x ^= x >> 27;
  rng_state = x;
  return x * 0x2545F4914F6CDD1Dull;
}

static int64_t decode(const std::vector<uint8_t>& buf, size_t start,
                      int channels, size_t total) {
  size_t stride = total + 65536;
  std::vector<int32_t> out(stride * (channels > 0 ? channels : 1));
  return prt_flac_decode(buf.data(), buf.size(), start, channels, 16,
                         out.data(), stride, total);
}

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: flac_fuzz <frame_start> <channels> <total> "
                    "<file.flac> [trials] [seed]\n");
    return 2;
  }
  size_t start = strtoull(argv[1], nullptr, 10);
  int channels = atoi(argv[2]);
  size_t total = strtoull(argv[3], nullptr, 10);
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

  if (decode(base, start, channels, total) < 0) {
    fprintf(stderr, "baseline stream does not decode — bad params?\n");
    return 2;
  }

  long ok = 0, err = 0;
  for (long i = 0; i < trials; ++i) {
    std::vector<uint8_t> d = base;
    switch (i & 3) {
      case 0:  // bit flips in the frame section
        for (unsigned k = 0; k < 1 + rnd() % 8; ++k) {
          size_t j = start + rnd() % (d.size() - start);
          d[j] ^= (uint8_t)(1u << (rnd() % 8));
        }
        break;
      case 1: {  // scramble a run
        size_t j = start + rnd() % (d.size() - start);
        size_t n = 1 + rnd() % 64;
        for (size_t k = j; k < d.size() && k < j + n; ++k)
          d[k] = (uint8_t)rnd();
        break;
      }
      case 2:  // truncate inside the frame section
        d.resize(start + rnd() % (d.size() - start));
        break;
      default:  // flips anywhere, header included
        for (int k = 0; k < 16; ++k) {
          size_t j = rnd() % d.size();
          d[j] ^= (uint8_t)(1u << (rnd() % 8));
        }
    }
    if (decode(d, start, channels, total) >= 0) ++ok; else ++err;
  }

  // hostile call parameters against the VALID stream: what a corrupt
  // STREAMINFO could make the caller pass
  static const size_t starts[] = {0, 1, 4, 1u << 20};
  static const int chans[] = {1, 2, 4, 8};
  static const size_t totals[] = {0, 1, 100, 1000000};
  for (size_t s : starts)
    for (int c : chans)
      for (size_t t : totals) decode(base, s, c, t);

  printf("flac_fuzz: %ld trials, decoded_ok=%ld decode_err=%ld, "
         "param grid clean\n", trials, ok, err);
  return 0;
}
