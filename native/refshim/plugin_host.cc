// Minimal LV2 host for the compiled UNMODIFIED reference plugin
// (/root/reference/src/phaserotate.c, built against refshim's own
// lv2/fftw3 headers).  A test fixture only: tests/test_ref_plugin_binary.py
// uses it to run the real reference binary head-to-head against the
// framework's streaming engine and the RefPlugin numpy oracle.
//
// Usage:
//   ref-plugin-host <rate> <n_chn> <block> [options] < in.f32 > out.f32
//     stdin:  interleaved float32 (host byte order), n_chn channels
//     stdout: processed audio, same shape, same length
//     stderr: "LATENCY <n>" once, then with --ui one line per levels
//             atom: "LVL <run> <chn> <9 floats>" and per state atom:
//             "STATE <uiscale> <link>"
//   --angle C=DEG@FRAME  set channel C's angle port to DEG at the first
//                        run() whose start frame is >= FRAME (repeatable;
//                        port values are per-run, like a host control)
//   --ui                 send ui_on in the first block (enables levels)
//   --reset FRAME        send a reset_peaks atom at the run covering FRAME
//   --state V,L@FRAME    send a state atom (uiscale V, link L) at FRAME
//   --ui-scale F         pass ui:scaleFactor via the options feature
//
// The host forges control atoms and parses notify atoms with the same
// refshim forge/util headers the plugin is compiled against; the wire
// layout is the public LV2 atom spec's.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <lv2/atom/atom.h>
#include <lv2/atom/forge.h>
#include <lv2/atom/util.h>
#include <lv2/core/lv2.h>
#include <lv2/options/options.h>
#include <lv2/urid/urid.h>

extern "C" const LV2_Descriptor* lv2_descriptor (uint32_t index);

// -- urid:map ---------------------------------------------------------------

static std::vector<std::string> g_uris;

static LV2_URID
map_uri (LV2_URID_Map_Handle, const char* uri)
{
  for (size_t i = 0; i < g_uris.size (); ++i) {
    if (g_uris[i] == uri) {
      return (LV2_URID) (i + 1);
    }
  }
  g_uris.push_back (uri);
  return (LV2_URID)g_uris.size ();
}

#define PROT_URI "http://gareus.org/oss/lv2/phaserotate#"

struct CtrlEv {
  uint64_t frame;
  int kind;  // 0 = ui_on, 1 = reset_peaks, 2 = state
  float uiscale;
  int link;
};

struct AngleEv {
  uint64_t frame;
  int chn;
  float deg;
};

static void
die (const char* msg)
{
  fprintf (stderr, "ref-plugin-host: %s\n", msg);
  exit (1);
}

int
main (int argc, char** argv)
{
  if (argc < 4) {
    die ("usage: ref-plugin-host <rate> <n_chn> <block> [options]");
  }
  const double rate = atof (argv[1]);
  const int n_chn = atoi (argv[2]);
  const uint32_t block = (uint32_t)atoi (argv[3]);
  if (rate <= 0 || n_chn < 1 || n_chn > 2 || block < 1 || block > 65536) {
    die ("bad rate/n_chn/block");
  }

  std::vector<AngleEv> angles;
  std::vector<CtrlEv> ctrls;
  bool ui = false;
  float opt_ui_scale = 0;

  for (int i = 4; i < argc; ++i) {
    if (!strcmp (argv[i], "--ui")) {
      ui = true;
    } else if (!strcmp (argv[i], "--angle") && i + 1 < argc) {
      AngleEv ev{};
      unsigned long long fr = 0;
      if (sscanf (argv[++i], "%d=%f@%llu", &ev.chn, &ev.deg, &fr) != 3 ||
          ev.chn < 0 || ev.chn >= n_chn) {
        die ("bad --angle C=DEG@FRAME");
      }
      ev.frame = fr;
      angles.push_back (ev);
    } else if (!strcmp (argv[i], "--reset") && i + 1 < argc) {
      CtrlEv ev{};
      ev.frame = strtoull (argv[++i], nullptr, 10);
      ev.kind = 1;
      ctrls.push_back (ev);
    } else if (!strcmp (argv[i], "--state") && i + 1 < argc) {
      CtrlEv ev{};
      unsigned long long fr = 0;
      if (sscanf (argv[++i], "%f,%d@%llu", &ev.uiscale, &ev.link, &fr)
          != 3) {
        die ("bad --state V,L@FRAME");
      }
      ev.frame = fr;
      ev.kind = 2;
      ctrls.push_back (ev);
    } else if (!strcmp (argv[i], "--ui-scale") && i + 1 < argc) {
      opt_ui_scale = (float)atof (argv[++i]);
    } else {
      die ("unknown option");
    }
  }
  if (ui) {
    CtrlEv ev{};
    ev.frame = 0;
    ev.kind = 0;
    ctrls.push_back (ev);
  }
  // stable order by frame (kind 0 first at equal frames)
  for (size_t i = 1; i < ctrls.size (); ++i) {
    for (size_t j = i; j > 0 &&
         (ctrls[j - 1].frame > ctrls[j].frame ||
          (ctrls[j - 1].frame == ctrls[j].frame &&
           ctrls[j - 1].kind > ctrls[j].kind));
         --j) {
      std::swap (ctrls[j - 1], ctrls[j]);
    }
  }

  // -- read all input ---------------------------------------------------
  std::vector<float> in;
  {
    float buf[4096];
    size_t n;
    while ((n = fread (buf, sizeof (float), 4096, stdin)) > 0) {
      in.insert (in.end (), buf, buf + n);
    }
  }
  if (in.size () % n_chn) {
    die ("input not a whole number of frames");
  }
  const uint64_t n_frames = in.size () / n_chn;

  // -- instantiate --------------------------------------------------------
  const LV2_Descriptor* desc = lv2_descriptor (n_chn == 1 ? 0 : 1);
  if (!desc) {
    die ("no descriptor");
  }

  LV2_URID_Map map = { nullptr, map_uri };
  LV2_Feature f_map = { LV2_URID__map, &map };
  const LV2_URID urid_atom_float = map_uri (nullptr, LV2_ATOM__Float);
  const LV2_URID urid_ui_scale = map_uri (
      nullptr, "http://lv2plug.in/ns/extensions/ui#scaleFactor");
  LV2_Options_Option opts[2] = {
    { LV2_OPTIONS_INSTANCE, 0, urid_ui_scale, sizeof (float),
      urid_atom_float, &opt_ui_scale },
    { LV2_OPTIONS_INSTANCE, 0, 0, 0, 0, nullptr },
  };
  LV2_Feature f_opts = { LV2_OPTIONS__options, opts };
  const LV2_Feature* features[3] = { &f_map, nullptr, nullptr };
  if (opt_ui_scale > 0) {
    features[1] = &f_opts;
  }

  LV2_Handle h = desc->instantiate (desc, rate, ".", features);
  if (!h) {
    die ("instantiate failed");
  }

  // -- port buffers ---------------------------------------------------------
  // PortIndex (src/phaserotate.h:99-111): control 0, notify 1,
  // latency 2, then (angle, in, out) per channel.
  alignas (8) uint8_t control_buf[4096];
  alignas (8) uint8_t notify_buf[8192 + 16];
  float latency_out = -1;
  std::vector<float> angle_port (n_chn, 0.0f);
  std::vector<std::vector<float>> abuf_in (n_chn), abuf_out (n_chn);
  for (int c = 0; c < n_chn; ++c) {
    abuf_in[c].assign (block, 0.0f);
    abuf_out[c].assign (block, 0.0f);
  }
  desc->connect_port (h, 0, control_buf);
  desc->connect_port (h, 1, notify_buf);
  desc->connect_port (h, 2, &latency_out);
  for (int c = 0; c < n_chn; ++c) {
    desc->connect_port (h, 3 + 3 * c, &angle_port[c]);
    desc->connect_port (h, 4 + 3 * c, abuf_in[c].data ());
    desc->connect_port (h, 5 + 3 * c, abuf_out[c].data ());
  }
  desc->activate (h);

  // protocol urids for control forging / notify parsing
  LV2_Atom_Forge forge;
  lv2_atom_forge_init (&forge, &map);
  const LV2_URID u_ui_on = map_uri (nullptr, PROT_URI "ui_on");
  const LV2_URID u_reset = map_uri (nullptr, PROT_URI "reset_peaks");
  const LV2_URID u_state = map_uri (nullptr, PROT_URI "state");
  const LV2_URID u_uiscale = map_uri (nullptr, PROT_URI "uiscale");
  const LV2_URID u_link = map_uri (nullptr, PROT_URI "link");
  const LV2_URID u_levels = map_uri (nullptr, PROT_URI "levels");
  const LV2_URID u_lv[10] = {
    map_uri (nullptr, PROT_URI "l_channel"),
    map_uri (nullptr, PROT_URI "l_in_cur"),
    map_uri (nullptr, PROT_URI "l_in_mom"),
    map_uri (nullptr, PROT_URI "l_in_peak"),
    map_uri (nullptr, PROT_URI "l_out_cur"),
    map_uri (nullptr, PROT_URI "l_out_mom"),
    map_uri (nullptr, PROT_URI "l_out_peak"),
    map_uri (nullptr, PROT_URI "l_diff_cur"),
    map_uri (nullptr, PROT_URI "l_diff_min"),
    map_uri (nullptr, PROT_URI "l_diff_max"),
  };

  std::vector<float> out;
  out.reserve (in.size ());
  size_t next_ctrl = 0;
  size_t next_angle = 0;
  uint64_t run_idx = 0;
  bool printed_latency = false;

  for (uint64_t start = 0; start < n_frames; start += block, ++run_idx) {
    const uint32_t n = (uint32_t) (n_frames - start < block
                                       ? n_frames - start
                                       : block);

    // apply angle schedule (port values are per-run)
    while (next_angle < angles.size () &&
           angles[next_angle].frame <= start) {
      angle_port[angles[next_angle].chn] = angles[next_angle].deg;
      ++next_angle;
    }

    // forge this run's control sequence
    LV2_Atom_Forge_Frame seq_frame;
    lv2_atom_forge_set_buffer (&forge, control_buf, sizeof (control_buf));
    lv2_atom_forge_sequence_head (&forge, &seq_frame, 0);
    while (next_ctrl < ctrls.size () &&
           ctrls[next_ctrl].frame < start + n) {
      const CtrlEv& ev = ctrls[next_ctrl];
      LV2_Atom_Forge_Frame obj_frame;
      lv2_atom_forge_frame_time (&forge, 0);
      if (ev.kind == 0) {
        lv2_atom_forge_object (&forge, &obj_frame, 1, u_ui_on);
      } else if (ev.kind == 1) {
        lv2_atom_forge_object (&forge, &obj_frame, 1, u_reset);
      } else {
        lv2_atom_forge_object (&forge, &obj_frame, 1, u_state);
        lv2_atom_forge_property_head (&forge, u_uiscale, 0);
        lv2_atom_forge_float (&forge, ev.uiscale);
        lv2_atom_forge_property_head (&forge, u_link, 0);
        lv2_atom_forge_bool (&forge, ev.link != 0);
      }
      lv2_atom_forge_pop (&forge, &obj_frame);
      ++next_ctrl;
    }
    lv2_atom_forge_pop (&forge, &seq_frame);

    // notify capacity: host tells the plugin how much it may write
    ((LV2_Atom*)notify_buf)->size = 8192;
    ((LV2_Atom*)notify_buf)->type = 0;

    // de-interleave
    for (uint32_t i = 0; i < n; ++i) {
      for (int c = 0; c < n_chn; ++c) {
        abuf_in[c][i] = in[(start + i) * n_chn + c];
      }
    }

    desc->run (h, n);

    if (!printed_latency) {
      fprintf (stderr, "LATENCY %d\n", (int)latency_out);
      printed_latency = true;
    }

    for (uint32_t i = 0; i < n; ++i) {
      for (int c = 0; c < n_chn; ++c) {
        out.push_back (abuf_out[c][i]);
      }
    }

    // parse notify atoms
    const LV2_Atom_Sequence* seq = (const LV2_Atom_Sequence*)notify_buf;
    LV2_Atom_Event* ev = lv2_atom_sequence_begin (&seq->body);
    while (!lv2_atom_sequence_is_end (&seq->body, seq->atom.size, ev)) {
      if (ev->body.type == forge.Object) {
        const LV2_Atom_Object* obj = (const LV2_Atom_Object*)&ev->body;
        if (obj->body.otype == u_levels) {
          const LV2_Atom* v[10] = { nullptr };
          lv2_atom_object_get (obj,
                               u_lv[0], &v[0], u_lv[1], &v[1],
                               u_lv[2], &v[2], u_lv[3], &v[3],
                               u_lv[4], &v[4], u_lv[5], &v[5],
                               u_lv[6], &v[6], u_lv[7], &v[7],
                               u_lv[8], &v[8], u_lv[9], &v[9],
                               (LV2_URID)0);
          int chn = v[0] ? ((const LV2_Atom_Int*)v[0])->body : -1;
          fprintf (stderr, "LVL %llu %d", (unsigned long long)run_idx,
                   chn);
          for (int k = 1; k < 10; ++k) {
            fprintf (stderr, " %.9g",
                     v[k] ? ((const LV2_Atom_Float*)v[k])->body : -1.0f);
          }
          fprintf (stderr, "\n");
        } else if (obj->body.otype == u_state) {
          const LV2_Atom* vs = nullptr;
          const LV2_Atom* vl = nullptr;
          lv2_atom_object_get (obj, u_uiscale, &vs, u_link, &vl,
                               (LV2_URID)0);
          fprintf (stderr, "STATE %.9g %d\n",
                   vs ? ((const LV2_Atom_Float*)vs)->body : -1.0f,
                   vl ? (int)((const LV2_Atom_Bool*)vl)->body : -1);
        }
      }
      ev = lv2_atom_sequence_next (ev);
    }
  }

  desc->cleanup (h);

  fwrite (out.data (), sizeof (float), out.size (), stdout);
  fflush (stdout);
  return 0;
}
