// prt_bridge — native standalone streamer for the phaserotate_tpu engine.
//
// The role of the reference's JACK standalone app (Makefile:250-257): an
// external native process that pushes audio through the plugin in
// real-time-sized blocks — here over the engine daemon's Unix socket
// (phaserotate_tpu/bridge.py), so no Python is imported in this process.
//
//   prt_bridge [-s socket] [-a angle[,angle2]] [-b block] [-r] in.wav [out.wav]
//   prt_bridge -A [-l] [-S stride] [-f blksiz] in.wav     (min-peak search)
//
// Reads PCM16/24/32 and float32 WAV, streams, latency-compensates the
// write exactly like the offline CLI (skip `latency` frames, flush zero
// blocks), and reports in/out digital peaks via the SIMD peak scan.
// -A runs the offline minimum-peak angle search on the engine (daemon
// ANALYZE protocol) and prints the CLI's result format
// (cli/phase-rotate.cc:931-947) — the full phase-rotate workflow with
// no Python in the client process.
// Fresh implementation; WAV structures per the public RIFF/WAVE layout.

#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <string>
#include <vector>

#include <time.h>
#include <unistd.h>

#include "prt_protocol.h"

// host runtime kernels (peak scan, PCM codecs, interleave)
extern "C" {
float prt_peak(const float*, size_t, float);
void prt_pcm16_to_f32(const int16_t*, float*, size_t);
void prt_f32_to_pcm16(const float*, int16_t*, size_t);
void prt_pcm24_to_f32(const uint8_t*, float*, size_t);
void prt_f32_to_pcm24(const float*, uint8_t*, size_t);
}

namespace {

struct Wav {
  uint32_t rate = 0;
  uint16_t channels = 0;
  uint16_t bits = 0;
  uint16_t format = 0;  // 1 = PCM, 3 = float
  std::vector<float> samples;  // interleaved
  size_t frames() const { return channels ? samples.size() / channels : 0; }
};

bool read_all(FILE* f, void* dst, size_t n) {
  return fread(dst, 1, n, f) == n;
}

bool wav_read(const char* path, Wav* w) {
  FILE* f = fopen(path, "rb");
  if (!f) { perror(path); return false; }
  uint8_t hdr[12];
  if (!read_all(f, hdr, 12) || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fprintf(stderr, "%s: not a RIFF/WAVE file\n", path);
    fclose(f);
    return false;
  }
  // a chunk size can claim up to 4 GB-1; bound every allocation by
  // what the file can actually deliver so a corrupt header errors
  // instead of OOMing (std::bad_alloc would abort the process)
  fseek(f, 0, SEEK_END);
  long file_end = ftell(f);
  fseek(f, 12, SEEK_SET);
  std::vector<uint8_t> data;
  while (true) {
    uint8_t ch[8];
    if (!read_all(f, ch, 8)) break;
    uint32_t size;
    memcpy(&size, ch + 4, 4);
    long here = ftell(f);
    if (here < 0 || (long)size > file_end - here) {
      fprintf(stderr, "%s: chunk overruns file\n", path);
      fclose(f);
      return false;
    }
    if (!memcmp(ch, "fmt ", 4)) {
      std::vector<uint8_t> fmt(size);
      if (!read_all(f, fmt.data(), size) || size < 16) break;
      memcpy(&w->format, fmt.data(), 2);
      memcpy(&w->channels, fmt.data() + 2, 2);
      memcpy(&w->rate, fmt.data() + 4, 4);
      memcpy(&w->bits, fmt.data() + 14, 2);
      if (w->format == 0xFFFE && size >= 40)  // EXTENSIBLE: subformat
        memcpy(&w->format, fmt.data() + 24, 2);
    } else if (!memcmp(ch, "data", 4)) {
      data.resize(size);
      if (!read_all(f, data.data(), size)) {
        fprintf(stderr, "%s: truncated data chunk\n", path);
        fclose(f);
        return false;
      }
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
      continue;
    }
    if (size & 1) fseek(f, 1, SEEK_CUR);
  }
  fclose(f);
  if (!w->rate || !w->channels || data.empty()) {
    fprintf(stderr, "%s: missing fmt/data\n", path);
    return false;
  }
  size_t n;
  if (w->format == 3 && w->bits == 32) {
    n = data.size() / 4;
    w->samples.resize(n);
    memcpy(w->samples.data(), data.data(), n * 4);
  } else if (w->format == 1 && w->bits == 16) {
    n = data.size() / 2;
    w->samples.resize(n);
    prt_pcm16_to_f32(reinterpret_cast<int16_t*>(data.data()),
                     w->samples.data(), n);
  } else if (w->format == 1 && w->bits == 24) {
    n = data.size() / 3;
    w->samples.resize(n);
    prt_pcm24_to_f32(data.data(), w->samples.data(), n);
  } else if (w->format == 1 && w->bits == 32) {
    n = data.size() / 4;
    w->samples.resize(n);
    const int32_t* p = reinterpret_cast<int32_t*>(data.data());
    for (size_t i = 0; i < n; ++i)
      w->samples[i] = static_cast<float>(p[i]) / 2147483648.0f;
  } else {
    fprintf(stderr, "%s: unsupported format %u/%u-bit\n", path, w->format,
            w->bits);
    return false;
  }
  return true;
}

bool wav_write_f32(const char* path, const Wav& w) {
  FILE* f = fopen(path, "wb");
  if (!f) { perror(path); return false; }
  uint32_t dsz = static_cast<uint32_t>(w.samples.size() * 4);
  uint32_t riff = 4 + 8 + 16 + 8 + dsz;
  uint16_t fmt3 = 3, ch = w.channels, bits = 32;
  uint32_t brate = w.rate * ch * 4;
  uint16_t balign = ch * 4;
  fwrite("RIFF", 1, 4, f); fwrite(&riff, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  uint32_t fsz = 16;
  fwrite(&fsz, 4, 1, f); fwrite(&fmt3, 2, 1, f); fwrite(&ch, 2, 1, f);
  fwrite(&w.rate, 4, 1, f); fwrite(&brate, 4, 1, f);
  fwrite(&balign, 2, 1, f); fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f); fwrite(&dsz, 4, 1, f);
  fwrite(w.samples.data(), 4, w.samples.size(), f);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------

void usage() {
  fprintf(stderr,
          "Usage: prt_bridge [options] <in.wav> [out.wav]\n"
          "  -s <path>   engine socket (default /tmp/phaserotate_tpu.sock)\n"
          "  -a <deg[,deg]> rotation angle(s), default 0\n"
          "  -b <n>      block size in frames (default 1024)\n"
          "  -m          print engine meter levels (enabled per "
          "session via CTRL ui_on)\n"
          "  -r          pace at 1x realtime\n"
          "  -k <n>      reply slack: keep n PROCs in flight (spike\n"
          "              absorption on a jittery engine link; output\n"
          "              is identical, replies just overlap requests)\n"
          "  -A          analyze: find the minimum-peak angle(s)\n"
          "  -l          link channels (-A): minimize the downmix peak\n"
          "  -S <n>      coarse stride in half-degree units (-A, def 24)\n"
          "  -f <n>      analysis block size (-A, 0 = from sample rate)\n");
}

float db(float v);  // defined below with the streaming helpers

int run_analyze(prt::Conn& conn, const Wav& in, uint16_t ch, bool link,
                uint32_t stride, uint32_t blksiz) {
  uint32_t begin[5] = {in.rate, ch, link ? 1u : 0u, stride, blksiz};
  if (!conn.send_msg(prt::kAnalyzeBegin, begin, sizeof begin)) return 1;
  const size_t n = in.frames();
  const size_t chunk = 1 << 18;
  std::vector<uint8_t> msg;
  for (size_t pos = 0; pos == 0 || pos < n; pos += chunk) {
    const size_t m = n - pos < chunk ? n - pos : chunk;
    msg.assign(4 + 4 * m * ch, 0);
    uint32_t mu = static_cast<uint32_t>(m);
    memcpy(msg.data(), &mu, 4);
    float* body = reinterpret_cast<float*>(msg.data() + 4);
    for (size_t i = 0; i < m; ++i)
      for (size_t c = 0; c < ch; ++c)
        body[i * ch + c] = in.samples[(pos + i) * in.channels + c];
    if (!conn.send_msg(prt::kAnalyzeData, msg.data(), msg.size()))
      return 1;
    if (m < chunk) break;
  }
  if (!conn.send_msg(prt::kAnalyzeEnd, nullptr, 0)) return 1;
  uint32_t rtype;
  std::vector<uint8_t> reply;
  if (!conn.recv_reply(&rtype, &reply) || rtype != prt::kAnalyzeOk) {
    fprintf(stderr, "ANALYZE failed: %.*s\n",
            static_cast<int>(reply.size()),
            reinterpret_cast<char*>(reply.data()));
    return 1;
  }
  uint32_t rc = 0;
  if (reply.size() < 4) return 1;
  memcpy(&rc, reply.data(), 4);
  if (reply.size() < 4 + 16ull * rc) {
    fprintf(stderr, "ANALYZE reply too short\n");
    return 1;
  }
  // the CLI's result block (cli/phase-rotate.cc:931-947)
  printf("# Result -- Minimize digital peak\n");
  for (uint32_t c = 0; c < rc; ++c) {
    float angle, pz, pm;
    uint32_t found;
    memcpy(&angle, reply.data() + 4 + 16 * c, 4);
    memcpy(&pz, reply.data() + 8 + 16 * c, 4);
    memcpy(&pm, reply.data() + 12 + 16 * c, 4);
    memcpy(&found, reply.data() + 16 + 16 * c, 4);
    if (!found) {
      printf("Channel: %2u Phase:   0 deg # cannot find min.\n", c + 1);
    } else if (angle == 0.0f) {
      printf("Channel: %2u Phase: %5.2f deg\n", c + 1, angle);
    } else {
      // cli.py's result line (mirrors cli/phase-rotate.cc:940-946)
      printf("Channel: %2u Phase: %5.2f deg, gain: %5.2f dB "
             "(att. %4.2f to %4.2f dBFS)\n",
             c + 1, angle, db(pz) - db(pm), db(pz), db(pm));
    }
  }
  return 0;
}

float db(float v) { return v > 1e-10f ? 20.0f * log10f(v) : -200.0f; }

}  // namespace

int main(int argc, char** argv) {
  std::string sock_path = "/tmp/phaserotate_tpu.sock";
  const char* env = getenv("PHASEROTATE_TPU_SOCKET");
  if (env && *env) sock_path = env;
  double angle0 = 0.0, angle1 = 0.0;
  bool have_angle1 = false, realtime = false, meters = false;
  bool analyze = false, link = false;
  long block = 1024, stride = 24, blksiz = 0, slack = 0;
  int opt;
  while ((opt = getopt(argc, argv, "s:a:b:mrAlS:f:k:h")) != -1) {
    switch (opt) {
      case 's': sock_path = optarg; break;
      case 'a': {
        char* comma = strchr(optarg, ',');
        angle0 = atof(optarg);
        if (comma) { angle1 = atof(comma + 1); have_angle1 = true; }
        break;
      }
      case 'b': block = atol(optarg); break;
      case 'm': meters = true; break;
      case 'r': realtime = true; break;
      case 'A': analyze = true; break;
      case 'l': link = true; break;
      case 'S': stride = atol(optarg); break;
      case 'f': blksiz = atol(optarg); break;
      case 'k': slack = atol(optarg); break;
      default: usage(); return opt == 'h' ? 0 : 1;
    }
  }
  if (optind >= argc || block < 1 || block > (1 << 20) ||
      slack < 0 || slack > 64) { usage(); return 1; }
  const char* in_path = argv[optind];
  const char* out_path = optind + 1 < argc ? argv[optind + 1] : nullptr;

  Wav in;
  if (!wav_read(in_path, &in)) return 1;
  uint16_t ch = in.channels > 2 ? 2 : in.channels;
  if (!have_angle1) angle1 = angle0;

  if (analyze) {
    prt::Conn aconn;
    if (!aconn.open_raw(sock_path.c_str())) {
      fprintf(stderr, "cannot connect to engine at %s: %s\n",
              sock_path.c_str(), strerror(errno));
      return 1;
    }
    int rc = run_analyze(aconn, in, in.channels, link,
                         static_cast<uint32_t>(stride),
                         static_cast<uint32_t>(blksiz));
    aconn.bye();
    return rc;
  }

  prt::Conn conn;
  uint32_t latency = 0;
  if (!conn.open(sock_path.c_str(), in.rate, ch, &latency,
                 /*wait_for_compile=*/true)) {
    fprintf(stderr, "cannot connect to engine at %s: %s\n"
            "start it with: python -m phaserotate_tpu.bridge --socket %s\n",
            sock_path.c_str(), strerror(errno), sock_path.c_str());
    return 1;
  }
  uint32_t rtype;
  std::vector<uint8_t> reply;
  fprintf(stderr, "connected: rate %u, %u ch, latency %u frames\n", in.rate,
          ch, latency);
  if (meters) {
    // per-session metering via CTRL ui_on (src/phaserotate.c:808-810):
    // no daemon-wide --meters flag needed
    uint32_t ev = prt::kCtrlUiOn;
    conn.send_msg(prt::kCtrl, &ev, sizeof ev);
  }

  const size_t n = in.frames();
  const size_t total = n + latency;  // flush latency worth of zeros
  std::vector<float> out_stream;
  out_stream.reserve(out_path ? total * ch : 0);
  float angles[2] = {static_cast<float>(angle0), static_cast<float>(angle1)};
  std::vector<uint8_t> msg;
  float peak_in = 0.0f, peak_out = 0.0f;
  timespec t0;
  clock_gettime(CLOCK_MONOTONIC, &t0);

  // reply slack (-k): up to `slack` PROCs stay in flight, so a reply
  // has that many block periods to land before this client needs it —
  // same absorber as the Python client's slack (bridge.py).  Replies
  // arrive in order; the collected output stream is identical.
  std::deque<size_t> inflight;
  auto on_info = [&](uint32_t t, const std::vector<uint8_t>& p) {
    if (!meters || t != prt::kLevels || p.size() < 4) return;
    uint32_t cnt;
    memcpy(&cnt, p.data(), 4);
    for (uint32_t e = 0; e < cnt && 4 + 40 * (e + 1) <= p.size(); ++e) {
      uint32_t chn;
      float lv[9];
      memcpy(&chn, p.data() + 4 + 40 * e, 4);
      memcpy(lv, p.data() + 8 + 40 * e, 36);
      fprintf(stderr,
              "ch%u  in %6.1f dBFS (pk %6.1f)  out %6.1f dBFS "
              "(pk %6.1f)\n",
              chn, db(lv[0]), db(lv[2]), db(lv[3]), db(lv[5]));
    }
  };
  auto recv_one = [&]() -> bool {
    const size_t m = inflight.front();
    inflight.pop_front();
    if (!conn.recv_reply(&rtype, &reply, on_info) ||
        rtype != prt::kProcOk) {
      fprintf(stderr, "PROC failed: %.*s\n",
              static_cast<int>(reply.size()),
              reinterpret_cast<char*>(reply.data()));
      return false;
    }
    if (reply.size() < 4 + 4ull * m * ch) {  // truncated/buggy daemon
      fprintf(stderr, "PROC reply too short (%zu bytes for %zu frames)\n",
              reply.size(), m);
      return false;
    }
    const float* got = reinterpret_cast<float*>(reply.data() + 4);
    peak_out = prt_peak(got, m * ch, peak_out);
    if (out_path)
      out_stream.insert(out_stream.end(), got, got + m * ch);
    return true;
  };

  for (size_t pos = 0; pos < total; pos += block) {
    const size_t m = total - pos < static_cast<size_t>(block)
                         ? total - pos : static_cast<size_t>(block);
    msg.assign(4 + 4 * ch + 4 * m * ch, 0);
    uint32_t mu = static_cast<uint32_t>(m);
    memcpy(msg.data(), &mu, 4);
    memcpy(msg.data() + 4, angles, 4 * ch);
    float* body = reinterpret_cast<float*>(msg.data() + 4 + 4 * ch);
    for (size_t i = 0; i < m; ++i) {
      const size_t fr = pos + i;
      for (size_t c = 0; c < ch; ++c)
        body[i * ch + c] =
            fr < n ? in.samples[fr * in.channels + c] : 0.0f;
    }
    peak_in = prt_peak(body, m * ch, peak_in);
    if (!conn.send_msg(prt::kProc, msg.data(), msg.size())) {
      fprintf(stderr, "engine connection lost\n");
      return 1;
    }
    inflight.push_back(m);
    if (inflight.size() > static_cast<size_t>(slack) && !recv_one())
      return 1;
    if (realtime) {
      timespec now;
      clock_gettime(CLOCK_MONOTONIC, &now);
      double elapsed = (now.tv_sec - t0.tv_sec) +
                       (now.tv_nsec - t0.tv_nsec) * 1e-9;
      double due = static_cast<double>(pos + m) / in.rate;
      if (due > elapsed) {
        timespec ts;
        ts.tv_sec = static_cast<time_t>(due - elapsed);
        ts.tv_nsec = static_cast<long>(((due - elapsed) - ts.tv_sec) * 1e9);
        nanosleep(&ts, nullptr);
      }
    }
  }
  while (!inflight.empty())  // drain the slack window's tail
    if (!recv_one()) return 1;
  conn.bye();

  if (out_path) {
    // latency-compensated trim: drop the first `latency` frames, keep n
    Wav out;
    out.rate = in.rate;
    out.channels = ch;
    out.samples.assign(out_stream.begin() + latency * ch,
                       out_stream.begin() + (latency + n) * ch);
    if (!wav_write_f32(out_path, out)) return 1;
    fprintf(stderr, "wrote %s (%zu frames, latency %u compensated)\n",
            out_path, n, latency);
  }
  fprintf(stderr, "peak in %.6f  peak out %.6f\n", peak_in, peak_out);
  return 0;
}
