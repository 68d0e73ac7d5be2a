// phaserotate_tpu.so — loadable LV2 plugin shim bridging to the TPU engine.
//
// The reference ships its DSP as a host-loadable binary
// (src/phaserotate.c:860-893); a TPU engine cannot run inside the host's
// process, so this shim implements the same LV2 ABI surface and forwards
// audio over the engine daemon's Unix socket (phaserotate_tpu/bridge.py
// documents the wire protocol).  Without a reachable daemon the plugin
// degrades to a clean bypass with zero reported latency, so a host can
// always load the bundle.
//
// Port map matches plugin/descriptors.py (and the reference's TTL):
//   0 control (atom, unused here)   1 notify (atom, unused here)
//   2 latency (control out)
//   3+3c angle (control in, deg)    4+3c audio in    5+3c audio out
//
// The socket round trip makes run() block on the engine; this shim
// targets offline/freewheel rendering and tolerant hosts rather than the
// reference's hardRTCapable contract (that lives in the daemon's own
// engine scheduling).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
#include <string>
#include <vector>

#include <sys/socket.h>
#include <sys/un.h>
#include <unistd.h>

#include "lv2_abi.h"

namespace {

constexpr const char* kUriMono = "urn:phaserotate-tpu:plugin";
constexpr const char* kUriStereo = "urn:phaserotate-tpu:plugin#stereo";
constexpr uint32_t kMagic = 0x50525431;
constexpr uint32_t kInit = 1, kProc = 2, kBye = 3;
constexpr uint32_t kInitOk = 101, kProcOk = 102;

struct Plugin {
  uint32_t channels = 1;
  double rate = 48000.0;
  int fd = -1;
  uint32_t latency = 0;

  float* latency_port = nullptr;
  float* angle[2] = {nullptr, nullptr};
  float* in[2] = {nullptr, nullptr};
  float* out[2] = {nullptr, nullptr};

  std::vector<uint8_t> msg;
  std::vector<uint8_t> reply;

  bool send_exact(const void* p, size_t n) {
    const char* c = static_cast<const char*>(p);
    while (n) {
      ssize_t k = write(fd, c, n);
      if (k <= 0) return false;
      c += k;
      n -= k;
    }
    return true;
  }
  bool recv_exact(void* p, size_t n) {
    char* c = static_cast<char*>(p);
    while (n) {
      ssize_t k = read(fd, c, n);
      if (k <= 0) return false;
      c += k;
      n -= k;
    }
    return true;
  }

  void disconnect() {
    if (fd >= 0) close(fd);
    fd = -1;
    latency = 0;
  }

  void try_connect() {
    const char* path = getenv("PHASEROTATE_TPU_SOCKET");
    if (!path || !*path) path = "/tmp/phaserotate_tpu.sock";
    fd = socket(AF_UNIX, SOCK_STREAM, 0);
    if (fd < 0) return;
    sockaddr_un addr{};
    addr.sun_family = AF_UNIX;
    snprintf(addr.sun_path, sizeof addr.sun_path, "%s", path);
    if (connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof addr)) {
      disconnect();
      return;
    }
    uint32_t init_msg[4] = {kInit, 8, static_cast<uint32_t>(rate), channels};
    uint32_t hdr[2];
    if (!send_exact(&kMagic, 4) || !send_exact(init_msg, 16) ||
        !recv_exact(hdr, 8) || hdr[0] != kInitOk || hdr[1] < 12) {
      disconnect();
      return;
    }
    uint32_t payload[3];
    if (!recv_exact(payload, 12)) {
      disconnect();
      return;
    }
    latency = payload[0];
    // drain any extra payload bytes
    for (uint32_t left = hdr[1] - 12; left;) {
      char sink[64];
      ssize_t k = read(fd, sink, left < sizeof sink ? left : sizeof sink);
      if (k <= 0) { disconnect(); return; }
      left -= k;
    }
  }

  void run(uint32_t n) {
    if (latency_port) *latency_port = static_cast<float>(latency);
    if (fd < 0) {  // bypass
      for (uint32_t c = 0; c < channels; ++c)
        if (in[c] && out[c] && in[c] != out[c])
          memcpy(out[c], in[c], n * sizeof(float));
      return;
    }
    msg.assign(8 + 4 + 4 * channels + 4 * n * channels, 0);
    uint32_t* h = reinterpret_cast<uint32_t*>(msg.data());
    h[0] = kProc;
    h[1] = static_cast<uint32_t>(msg.size() - 8);
    h[2] = n;
    float* body = reinterpret_cast<float*>(msg.data() + 12);
    for (uint32_t c = 0; c < channels; ++c)
      body[c] = angle[c] ? *angle[c] : 0.0f;
    for (uint32_t i = 0; i < n; ++i)
      for (uint32_t c = 0; c < channels; ++c)
        body[channels + i * channels + c] = in[c] ? in[c][i] : 0.0f;
    uint32_t hdr[2];
    if (!send_exact(msg.data(), msg.size()) || !recv_exact(hdr, 8) ||
        hdr[0] != kProcOk) {
      disconnect();
      run(n);  // fall back to bypass for this block
      return;
    }
    reply.resize(hdr[1]);
    if (!recv_exact(reply.data(), hdr[1])) {
      disconnect();
      run(n);
      return;
    }
    const float* got = reinterpret_cast<float*>(reply.data() + 4);
    for (uint32_t i = 0; i < n; ++i)
      for (uint32_t c = 0; c < channels; ++c)
        if (out[c]) out[c][i] = got[i * channels + c];
  }
};

LV2_Handle instantiate(const LV2_Descriptor* desc, double rate,
                       const char*, const LV2_Feature* const*) {
  Plugin* p = new (std::nothrow) Plugin();
  if (!p) return nullptr;
  p->channels = strcmp(desc->URI, kUriStereo) == 0 ? 2 : 1;
  p->rate = rate;
  p->try_connect();
  return p;
}

void connect_port(LV2_Handle h, uint32_t port, void* data) {
  Plugin* p = static_cast<Plugin*>(h);
  if (port == 2) {
    p->latency_port = static_cast<float*>(data);
    return;
  }
  if (port < 3) return;  // atom control/notify unused by the shim
  uint32_t c = (port - 3) / 3;
  if (c >= p->channels) return;
  switch ((port - 3) % 3) {
    case 0: p->angle[c] = static_cast<float*>(data); break;
    case 1: p->in[c] = static_cast<float*>(data); break;
    case 2: p->out[c] = static_cast<float*>(data); break;
  }
}

void activate(LV2_Handle) {}

void run(LV2_Handle h, uint32_t n) { static_cast<Plugin*>(h)->run(n); }

void deactivate(LV2_Handle) {}

void cleanup(LV2_Handle h) {
  Plugin* p = static_cast<Plugin*>(h);
  if (p->fd >= 0) {
    uint32_t bye[2] = {kBye, 0};
    p->send_exact(bye, 8);
    p->disconnect();
  }
  delete p;
}

const void* extension_data(const char*) { return nullptr; }

const LV2_Descriptor kMono = {kUriMono,   instantiate, connect_port,
                              activate,   run,         deactivate,
                              cleanup,    extension_data};
const LV2_Descriptor kStereo = {kUriStereo, instantiate, connect_port,
                                activate,   run,         deactivate,
                                cleanup,    extension_data};

}  // namespace

extern "C" LV2_SYMBOL_EXPORT const LV2_Descriptor* lv2_descriptor(
    uint32_t index) {
  switch (index) {
    case 0: return &kMono;
    case 1: return &kStereo;
    default: return nullptr;
  }
}
