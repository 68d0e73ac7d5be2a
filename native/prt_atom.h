// LV2 atom port support for the native shim: spec-layout structures, a
// tiny forge (writer) and reader for the subset of the atom vocabulary
// the phaserotate protocol uses — Sequence, Object, Float, Int, Bool.
//
// The LV2 atom binary layout is frozen by the public specification
// (lv2plug.in/ns/ext/atom, ISC-licensed spec); like lv2_abi.h these are
// independent declarations from the spec, not copied code.  The protocol
// carried over these atoms is the reference's control/notify vocabulary
// (src/phaserotate.h:41-93, src/phaserotate.c:741-771, 795-830): four
// control objects in (ui_on/ui_off/reset_peaks/state) and two notify
// objects out ('levels' with 9 level fields + channel, 'state' with
// uiscale + link).

#ifndef PRT_ATOM_H
#define PRT_ATOM_H

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace prt {

// -- spec-layout structures (all atoms are 8-byte aligned; `size` never
// -- counts the 8-byte {size,type} header itself) ------------------------

struct Atom {
  uint32_t size;
  uint32_t type;
};

struct AtomSequence {  // body: unit, pad, then events
  Atom atom;
  uint32_t unit;
  uint32_t pad;
};

struct AtomEvent {  // header of one sequence event; body follows
  int64_t frames;
  Atom body;
};

struct AtomObject {  // body: id, otype, then properties
  Atom atom;
  uint32_t id;
  uint32_t otype;
};

struct AtomPropertyBody {  // one object property; value body follows
  uint32_t key;
  uint32_t context;
  Atom value;
};

inline uint32_t atom_pad(uint32_t size) { return (size + 7u) & ~7u; }

// -- urid:map (lv2plug.in/ns/ext/urid) -----------------------------------

typedef uint32_t (*UridMapFn)(void* handle, const char* uri);

struct UridMap {
  void* handle;
  UridMapFn map;
};

constexpr const char* kUridMapUri = "http://lv2plug.in/ns/ext/urid#map";

// The URID table the shim needs: atom vocabulary + protocol identifiers.
// Mirrors ProtLV2URIs/map_prot_uris (src/phaserotate.h:41-93) and the
// Python side's plugin/uris.py Prot enum (same URI strings).
struct ProtUrids {
  // atom vocabulary
  uint32_t atom_Sequence = 0, atom_Object = 0, atom_Float = 0,
           atom_Int = 0, atom_Bool = 0, atom_Chunk = 0,
           atom_eventTransfer = 0;
  // control objects (UI -> DSP)
  uint32_t ui_on = 0, ui_off = 0, reset_peaks = 0, state = 0;
  // state properties
  uint32_t s_uiscale = 0, s_link = 0;
  // notify objects (DSP -> UI) + level fields
  uint32_t levels = 0, l_channel = 0, l_in_cur = 0, l_in_mom = 0,
           l_in_peak = 0, l_out_cur = 0, l_out_mom = 0, l_out_peak = 0,
           l_diff_cur = 0, l_diff_min = 0, l_diff_max = 0;
  bool ok = false;

  void map_all(const UridMap* m) {
    if (!m || !m->map) return;
    auto u = [&](const char* uri) { return m->map(m->handle, uri); };
    static constexpr const char* kAtom = "http://lv2plug.in/ns/ext/atom#";
    static constexpr const char* kProt = "urn:phaserotate-tpu:plugin#";
    char buf[96];
    auto a = [&](const char* frag) {
      snprintf(buf, sizeof buf, "%s%s", kAtom, frag);
      return u(buf);
    };
    auto p = [&](const char* frag) {
      snprintf(buf, sizeof buf, "%s%s", kProt, frag);
      return u(buf);
    };
    atom_Sequence = a("Sequence");
    atom_Object = a("Object");
    atom_Float = a("Float");
    atom_Int = a("Int");
    atom_Bool = a("Bool");
    atom_Chunk = a("Chunk");
    atom_eventTransfer = a("eventTransfer");
    ui_on = p("ui_on");
    ui_off = p("ui_off");
    reset_peaks = p("reset_peaks");
    state = p("state");
    s_uiscale = p("uiscale");
    s_link = p("link");
    levels = p("levels");
    l_channel = p("l_channel");
    l_in_cur = p("l_in_cur");
    l_in_mom = p("l_in_mom");
    l_in_peak = p("l_in_peak");
    l_out_cur = p("l_out_cur");
    l_out_mom = p("l_out_mom");
    l_out_peak = p("l_out_peak");
    l_diff_cur = p("l_diff_cur");
    l_diff_min = p("l_diff_min");
    l_diff_max = p("l_diff_max");
    ok = atom_Sequence && atom_Object && atom_Float && ui_on && levels;
  }
};

// -- forge: append-only writer into the notify port buffer ---------------

struct AtomForge {
  uint8_t* buf = nullptr;
  uint32_t cap = 0;  // whole-buffer capacity, including sequence header
  uint32_t off = 0;
  uint32_t obj_start = 0;  // offset of the open object's Atom
  bool overflow = false;

  void begin_sequence(void* port, uint32_t capacity,
                      const ProtUrids& u) {
    buf = static_cast<uint8_t*>(port);
    cap = capacity;
    off = 0;
    overflow = false;
    AtomSequence seq{};
    seq.atom.size = sizeof(AtomSequence) - sizeof(Atom);  // unit + pad
    seq.atom.type = u.atom_Sequence;
    write(&seq, sizeof seq);
  }

  // Open one frames=0 object event; properties follow; close_object()
  // finalizes the event and sequence sizes.
  void open_object(const ProtUrids& u, uint32_t otype) {
    AtomEvent ev{};
    ev.frames = 0;
    ev.body.size = sizeof(AtomObject) - sizeof(Atom);  // id + otype
    ev.body.type = u.atom_Object;
    write(&ev, sizeof ev);
    obj_start = off - sizeof(Atom);  // points at ev.body
    uint32_t id = 0;
    write(&id, 4);
    write(&otype, 4);
  }

  void prop_float(const ProtUrids& u, uint32_t key, float v) {
    prop(key, u.atom_Float, &v, 4);
  }
  void prop_int(const ProtUrids& u, uint32_t key, int32_t v) {
    prop(key, u.atom_Int, &v, 4);
  }
  void prop_bool(const ProtUrids& u, uint32_t key, bool v) {
    int32_t b = v ? 1 : 0;
    prop(key, u.atom_Bool, &b, 4);
  }

  void close_object() {
    if (overflow) return;
    Atom* body = reinterpret_cast<Atom*>(buf + obj_start);
    body->size = off - obj_start - sizeof(Atom);
    Atom* seq = reinterpret_cast<Atom*>(buf);
    seq->size = off - sizeof(Atom);
  }

 private:
  void prop(uint32_t key, uint32_t vtype, const void* v, uint32_t n) {
    AtomPropertyBody pb{};
    pb.key = key;
    pb.context = 0;
    pb.value.size = n;
    pb.value.type = vtype;
    write(&pb, sizeof pb);
    write(v, n);
    pad();
  }

  void write(const void* p, uint32_t n) {
    if (overflow || off + n > cap) {
      overflow = true;
      return;
    }
    memcpy(buf + off, p, n);
    off += n;
  }

  void pad() {
    uint32_t want = atom_pad(off);
    static const uint8_t kZeros[8] = {0};
    if (want > off) write(kZeros, want - off);
  }
};

// Write an empty (but valid) sequence into a notify buffer — what the
// plugin must emit when it has nothing to say.
inline void empty_sequence(void* port, uint32_t capacity,
                           const ProtUrids& u) {
  if (capacity < sizeof(AtomSequence)) return;
  AtomForge f;
  f.begin_sequence(port, capacity, u);
}

// -- reader: iterate a control sequence's object events ------------------

struct AtomObjectView {
  uint32_t otype = 0;
  const uint8_t* props = nullptr;  // first AtomPropertyBody
  uint32_t props_size = 0;

  // Scalar property lookup (Float/Int/Bool all carry 4-byte bodies).
  bool get_f32(uint32_t key, float* out) const {
    const void* v = find(key, 4);
    if (!v) return false;
    memcpy(out, v, 4);
    return true;
  }
  bool get_i32(uint32_t key, int32_t* out) const {
    const void* v = find(key, 4);
    if (!v) return false;
    memcpy(out, v, 4);
    return true;
  }

 private:
  const void* find(uint32_t key, uint32_t want_size) const {
    uint32_t o = 0;
    while (o + sizeof(AtomPropertyBody) <= props_size) {
      const AtomPropertyBody* pb =
          reinterpret_cast<const AtomPropertyBody*>(props + o);
      uint32_t step =
          atom_pad(sizeof(AtomPropertyBody) + pb->value.size);
      if (pb->key == key && pb->value.size == want_size &&
          want_size <= props_size - o - sizeof(AtomPropertyBody))
        return props + o + sizeof(AtomPropertyBody);
      if (step == 0 || o + step <= o) break;  // corrupt: stop
      o += step;
    }
    return nullptr;
  }
};

// Call `fn(AtomObjectView)` for every object event in a control
// sequence buffer.  Tolerates a null/short/foreign-typed buffer.
// `max_size` caps how far the iterator will read: callers that know the
// true buffer length (LV2UI port_event, wire receivers) MUST pass it, so
// a forged `atom.size` larger than the delivered buffer cannot drive
// reads past the allocation.  In-process LV2 atom ports, where the host
// contract guarantees atom.size fits the port, may pass the port's
// declared capacity as a defensive bound.
template <typename F>
inline void each_object(const void* port, const ProtUrids& u, F&& fn,
                        uint32_t max_size = 0xFFFFFFFFu) {
  if (!port || !u.ok || max_size < sizeof(AtomSequence)) return;
  const AtomSequence* seq = static_cast<const AtomSequence*>(port);
  if (seq->atom.type != u.atom_Sequence) return;
  uint32_t body = seq->atom.size;  // unit+pad+events
  if (body < sizeof(AtomSequence) - sizeof(Atom)) return;
  const uint8_t* base = static_cast<const uint8_t*>(port);
  uint32_t off = sizeof(AtomSequence);
  uint64_t end64 = static_cast<uint64_t>(sizeof(Atom)) + body;
  if (end64 > max_size) end64 = max_size;  // clamp to real buffer
  uint32_t end = static_cast<uint32_t>(end64);
  while (off + sizeof(AtomEvent) <= end) {
    const AtomEvent* ev = reinterpret_cast<const AtomEvent*>(base + off);
    uint32_t step = atom_pad(sizeof(AtomEvent) + ev->body.size);
    if (step == 0 || off + step < off) break;  // corrupt: stop
    if (ev->body.type == u.atom_Object &&
        ev->body.size >= sizeof(AtomObject) - sizeof(Atom) &&
        ev->body.size <= end - off - sizeof(AtomEvent)) {
      const AtomObject* obj = reinterpret_cast<const AtomObject*>(
          base + off + sizeof(int64_t));
      AtomObjectView view;
      view.otype = obj->otype;
      view.props = base + off + sizeof(AtomEvent) + 8;
      view.props_size = ev->body.size - 8;  // minus id+otype
      fn(view);
    }
    off += step;
  }
}

}  // namespace prt

#endif  // PRT_ATOM_H
