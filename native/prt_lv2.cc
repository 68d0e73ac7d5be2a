// phaserotate_tpu.so — loadable LV2 plugin shim bridging to the TPU engine.
//
// The reference ships its DSP as a host-loadable binary
// (src/phaserotate.c:860-893); a TPU engine cannot run inside the host's
// process, so this shim implements the same LV2 ABI surface and forwards
// audio over the engine daemon's Unix socket (phaserotate_tpu/bridge.py
// documents the wire protocol; native/prt_protocol.h is the shared
// native framing).  Without a reachable daemon the plugin degrades to a
// clean bypass with zero reported latency — and keeps retrying the
// connection every ~kRetryRuns run() calls, so starting the daemon after
// the session loads (or restarting it) picks the plugin back up without
// reloading.
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
#include <vector>

#include "lv2_abi.h"
#include "prt_protocol.h"

namespace {

constexpr const char* kUriMono = "urn:phaserotate-tpu:plugin";
constexpr const char* kUriStereo = "urn:phaserotate-tpu:plugin#stereo";
constexpr uint32_t kRetryRuns = 256;  // reconnect attempt cadence

struct Plugin {
  uint32_t channels = 1;
  double rate = 48000.0;
  prt::Conn conn;
  uint32_t latency = 0;
  uint32_t runs_since_retry = 0;

  float* latency_port = nullptr;
  float* angle[2] = {nullptr, nullptr};
  float* in[2] = {nullptr, nullptr};
  float* out[2] = {nullptr, nullptr};

  std::vector<uint8_t> msg;
  std::vector<uint8_t> reply;

  const char* socket_path() const {
    const char* path = getenv("PHASEROTATE_TPU_SOCKET");
    return (path && *path) ? path : "/tmp/phaserotate_tpu.sock";
  }

  void try_connect() {
    runs_since_retry = 0;
    if (!conn.open(socket_path(), static_cast<uint32_t>(rate), channels,
                   &latency)) {
      latency = 0;
    }
  }

  void bypass(uint32_t n) {
    for (uint32_t c = 0; c < channels; ++c)
      if (in[c] && out[c] && in[c] != out[c])
        memcpy(out[c], in[c], n * sizeof(float));
  }

  void run(uint32_t n) {
    if (conn.fd < 0 && ++runs_since_retry >= kRetryRuns)
      try_connect();  // daemon may have (re)started since
    if (latency_port) *latency_port = static_cast<float>(latency);
    if (conn.fd < 0) {
      bypass(n);
      return;
    }
    msg.assign(4 + 4 * channels + 4 * n * channels, 0);
    uint32_t* h = reinterpret_cast<uint32_t*>(msg.data());
    h[0] = n;
    float* body = reinterpret_cast<float*>(msg.data() + 4);
    for (uint32_t c = 0; c < channels; ++c)
      body[c] = angle[c] ? *angle[c] : 0.0f;
    for (uint32_t i = 0; i < n; ++i)
      for (uint32_t c = 0; c < channels; ++c)
        body[channels + i * channels + c] = in[c] ? in[c][i] : 0.0f;
    uint32_t rtype;
    if (!conn.send_msg(prt::kProc, msg.data(), msg.size()) ||
        !conn.recv_reply(&rtype, &reply) || rtype != prt::kProcOk ||
        reply.size() < 4 + 4ull * n * channels) {
      conn.close_fd();
      latency = 0;
      if (latency_port) *latency_port = 0.0f;
      bypass(n);  // degrade this block; retry cadence applies after
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

void activate(LV2_Handle h) {
  // a host (re)activating is the natural moment to retry the engine
  Plugin* p = static_cast<Plugin*>(h);
  if (p->conn.fd < 0) p->try_connect();
}

void run(LV2_Handle h, uint32_t n) { static_cast<Plugin*>(h)->run(n); }

void deactivate(LV2_Handle) {}

void cleanup(LV2_Handle h) {
  Plugin* p = static_cast<Plugin*>(h);
  p->conn.bye();
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
