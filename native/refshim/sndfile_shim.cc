// refshim/sndfile_shim.cc — independent WAV backend for the sf_* API.
//
// Implements exactly what the reference CLI exercises
// (/root/reference/cli/phase-rotate.cc:541-587, 683-710, 872, 950-1007):
// streamed frame reads/writes with float conversion, rewind, RIFF
// string/cue/broadcast-info passthrough, and a log-info string.  The
// parser is an ordinary RIFF chunk walk written for this shim; it shares
// no code with libsndfile (which is not installed here) and supports the
// WAV subtypes the differential corpus uses.

#include "sndfile.h"

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <map>
#include <string>
#include <vector>

struct prt_sndfile_s
{
  FILE* fp = nullptr;
  int mode = 0;
  SF_INFO info{};
  std::string path;
  std::string log;

  // audio geometry
  int subtype = 0;       // SF_FORMAT_* subtype
  int bytes_per_samp = 0;
  long data_offset = 0;  // file offset of first audio byte (read mode)
  sf_count_t data_frames = 0;
  sf_count_t pos_frames = 0;

  // metadata (read: parsed; write: staged until close)
  std::map<int, std::string> strings;
  SF_CUES cues{};
  bool have_cues = false;
  SF_BROADCAST_INFO binfo{};
  bool have_binfo = false;

  // write bookkeeping
  long riff_size_pos = 0;
  long data_size_pos = 0;
  sf_count_t frames_written = 0;
};

static std::string g_last_error = "No Error.";

namespace {

uint32_t
rd_u32 (const unsigned char* p)
{
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16)
         | ((uint32_t)p[3] << 24);
}

uint16_t
rd_u16 (const unsigned char* p)
{
  return (uint16_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8));
}

void
wr_u32 (FILE* fp, uint32_t v)
{
  unsigned char b[4] = { (unsigned char)(v & 0xff),
                         (unsigned char)((v >> 8) & 0xff),
                         (unsigned char)((v >> 16) & 0xff),
                         (unsigned char)((v >> 24) & 0xff) };
  fwrite (b, 1, 4, fp);
}

void
wr_u16 (FILE* fp, uint16_t v)
{
  unsigned char b[2] = { (unsigned char)(v & 0xff),
                         (unsigned char)((v >> 8) & 0xff) };
  fwrite (b, 1, 2, fp);
}

// LIST/INFO fourcc <-> SF_STR mapping (the ids libsndfile uses for WAV)
struct InfoMap
{
  const char* fcc;
  int str_type;
};
const InfoMap k_info_map[] = {
  { "INAM", SF_STR_TITLE },   { "ICOP", SF_STR_COPYRIGHT },
  { "ISFT", SF_STR_SOFTWARE }, { "IART", SF_STR_ARTIST },
  { "ICMT", SF_STR_COMMENT }, { "ICRD", SF_STR_DATE },
  { "IPRD", SF_STR_ALBUM },   { "ITRK", SF_STR_TRACKNUMBER },
  { "IGNR", SF_STR_GENRE },
};

void
parse_list_info (prt_sndfile_s* sf, const std::vector<unsigned char>& d)
{
  if (d.size () < 4 || std::memcmp (d.data (), "INFO", 4) != 0) {
    return;
  }
  size_t off = 4;
  while (off + 8 <= d.size ()) {
    char fcc[5] = { 0 };
    std::memcpy (fcc, &d[off], 4);
    uint32_t sz = rd_u32 (&d[off + 4]);
    off += 8;
    if (off + sz > d.size ()) {
      break;
    }
    for (const auto& m : k_info_map) {
      if (std::memcmp (fcc, m.fcc, 4) == 0) {
        std::string s ((const char*)&d[off], sz);
        s = s.c_str (); // trim at first NUL
        sf->strings[m.str_type] = s;
      }
    }
    off += sz + (sz & 1);
  }
}

void
parse_cue (prt_sndfile_s* sf, const std::vector<unsigned char>& d)
{
  if (d.size () < 4) {
    return;
  }
  uint32_t n = rd_u32 (d.data ());
  if (n > 100) {
    n = 100;
  }
  std::memset (&sf->cues, 0, sizeof (sf->cues));
  uint32_t stored = 0;
  for (uint32_t i = 0; i < n; ++i) {
    size_t off = 4 + (size_t)i * 24;
    if (off + 24 > d.size ()) {
      break;
    }
    SF_CUE_POINT& c = sf->cues.cue_points[stored++];
    c.indx = (int32_t)rd_u32 (&d[off]);
    c.position = rd_u32 (&d[off + 4]);
    std::memcpy (&c.fcc_chunk, &d[off + 8], 4);
    c.chunk_start = (int32_t)rd_u32 (&d[off + 12]);
    c.block_start = (int32_t)rd_u32 (&d[off + 16]);
    c.sample_offset = rd_u32 (&d[off + 20]);
  }
  sf->cues.cue_count = stored;
  sf->have_cues = stored > 0;
}

void
parse_bext (prt_sndfile_s* sf, const std::vector<unsigned char>& d)
{
  if (d.size () < 602) {
    return;
  }
  SF_BROADCAST_INFO& b = sf->binfo;
  std::memset (&b, 0, sizeof (b));
  const unsigned char* p = d.data ();
  std::memcpy (b.description, p, 256);
  std::memcpy (b.originator, p + 256, 32);
  std::memcpy (b.originator_reference, p + 288, 32);
  std::memcpy (b.origination_date, p + 320, 10);
  std::memcpy (b.origination_time, p + 330, 8);
  b.time_reference_low = rd_u32 (p + 338);
  b.time_reference_high = rd_u32 (p + 342);
  b.version = (short)rd_u16 (p + 346);
  std::memcpy (b.umid, p + 348, 64);
  std::memcpy (b.reserved, p + 412, 190);
  size_t hist = d.size () - 602;
  if (hist > sizeof (b.coding_history)) {
    hist = sizeof (b.coding_history);
  }
  std::memcpy (b.coding_history, p + 602, hist);
  b.coding_history_size = (uint32_t)hist;
  sf->have_binfo = true;
}

bool
open_read (prt_sndfile_s* sf)
{
  unsigned char hdr[12];
  if (fread (hdr, 1, 12, sf->fp) != 12 || std::memcmp (hdr, "RIFF", 4) != 0
      || std::memcmp (hdr + 8, "WAVE", 4) != 0) {
    g_last_error = "Not a RIFF/WAVE file.";
    return false;
  }
  bool have_fmt = false, have_data = false;
  int audio_format = 0, bits = 0;
  while (true) {
    unsigned char ch[8];
    if (fread (ch, 1, 8, sf->fp) != 8) {
      break;
    }
    uint32_t sz = rd_u32 (ch + 4);
    if (std::memcmp (ch, "fmt ", 4) == 0 && sz >= 16) {
      std::vector<unsigned char> d (sz);
      if (fread (d.data (), 1, sz, sf->fp) != sz) {
        break;
      }
      audio_format = rd_u16 (&d[0]);
      sf->info.channels = rd_u16 (&d[2]);
      sf->info.samplerate = (int)rd_u32 (&d[4]);
      bits = rd_u16 (&d[14]);
      if (audio_format == 0xFFFE && sz >= 40) { // WAVE_FORMAT_EXTENSIBLE
        audio_format = rd_u16 (&d[24]);
      }
      have_fmt = true;
    } else if (std::memcmp (ch, "data", 4) == 0) {
      sf->data_offset = ftell (sf->fp);
      have_data = true;
      if (!have_fmt) {
        g_last_error = "data chunk before fmt.";
        return false;
      }
      sf->bytes_per_samp = bits / 8;
      sf->data_frames =
        (sf_count_t)sz / (sf->bytes_per_samp * sf->info.channels);
      fseek (sf->fp, (long)(sz + (sz & 1)), SEEK_CUR);
    } else {
      std::vector<unsigned char> d (sz);
      if (fread (d.data (), 1, sz, sf->fp) != sz) {
        break;
      }
      if (sz & 1) {
        fseek (sf->fp, 1, SEEK_CUR);
      }
      if (std::memcmp (ch, "LIST", 4) == 0) {
        parse_list_info (sf, d);
      } else if (std::memcmp (ch, "cue ", 4) == 0) {
        parse_cue (sf, d);
      } else if (std::memcmp (ch, "bext", 4) == 0) {
        parse_bext (sf, d);
      }
    }
  }
  if (!have_fmt || !have_data) {
    g_last_error = "Missing fmt or data chunk.";
    return false;
  }
  if (audio_format == 1 && bits == 16) {
    sf->subtype = SF_FORMAT_PCM_16;
  } else if (audio_format == 1 && bits == 24) {
    sf->subtype = SF_FORMAT_PCM_24;
  } else if (audio_format == 1 && bits == 32) {
    sf->subtype = SF_FORMAT_PCM_32;
  } else if (audio_format == 3 && bits == 32) {
    sf->subtype = SF_FORMAT_FLOAT;
  } else {
    g_last_error = "Unsupported WAV encoding.";
    return false;
  }
  sf->info.format = SF_FORMAT_WAV | sf->subtype;
  sf->info.frames = sf->data_frames;
  sf->info.sections = 1;
  sf->info.seekable = 1;
  fseek (sf->fp, sf->data_offset, SEEK_SET);
  sf->pos_frames = 0;

  char buf[256];
  std::snprintf (buf, sizeof (buf),
                 "refshim sndfile\nFile : %s\nRIFF/WAVE fmt %d, %d Hz, "
                 "%d chn, %d frames\n",
                 sf->path.c_str (), audio_format, sf->info.samplerate,
                 sf->info.channels, (int)sf->data_frames);
  sf->log = buf;
  return true;
}

bool
open_write (prt_sndfile_s* sf)
{
  const int sub = sf->info.format & SF_FORMAT_SUBMASK;
  int bits = 0, fmt = 1;
  switch (sub) {
    case SF_FORMAT_PCM_16: bits = 16; break;
    case SF_FORMAT_PCM_24: bits = 24; break;
    case SF_FORMAT_PCM_32: bits = 32; break;
    case SF_FORMAT_FLOAT: bits = 32; fmt = 3; break;
    default:
      g_last_error = "Unsupported output format.";
      return false;
  }
  sf->subtype = sub;
  sf->bytes_per_samp = bits / 8;
  FILE* fp = sf->fp;
  fwrite ("RIFF", 1, 4, fp);
  sf->riff_size_pos = ftell (fp);
  wr_u32 (fp, 0);
  fwrite ("WAVE", 1, 4, fp);
  fwrite ("fmt ", 1, 4, fp);
  wr_u32 (fp, 16);
  wr_u16 (fp, (uint16_t)fmt);
  wr_u16 (fp, (uint16_t)sf->info.channels);
  wr_u32 (fp, (uint32_t)sf->info.samplerate);
  const uint32_t block = sf->bytes_per_samp * sf->info.channels;
  wr_u32 (fp, (uint32_t)sf->info.samplerate * block);
  wr_u16 (fp, (uint16_t)block);
  wr_u16 (fp, (uint16_t)bits);
  if (fmt == 3) { // float needs a fact chunk
    fwrite ("fact", 1, 4, fp);
    wr_u32 (fp, 4);
    wr_u32 (fp, 0); // patched at close
  }
  fwrite ("data", 1, 4, fp);
  sf->data_size_pos = ftell (fp);
  wr_u32 (fp, 0);
  sf->data_offset = ftell (fp);
  return true;
}

void
write_metadata_chunks (prt_sndfile_s* sf)
{
  FILE* fp = sf->fp;
  if (!sf->strings.empty ()) {
    std::vector<unsigned char> body;
    body.insert (body.end (), { 'I', 'N', 'F', 'O' });
    for (const auto& m : k_info_map) {
      auto it = sf->strings.find (m.str_type);
      if (it == sf->strings.end ()) {
        continue;
      }
      const std::string& s = it->second;
      uint32_t sz = (uint32_t)s.size () + 1; // include NUL
      body.insert (body.end (), m.fcc, m.fcc + 4);
      for (int b = 0; b < 4; ++b) {
        body.push_back ((unsigned char)((sz >> (8 * b)) & 0xff));
      }
      body.insert (body.end (), s.begin (), s.end ());
      body.push_back (0);
      if (sz & 1) {
        body.push_back (0);
      }
    }
    fwrite ("LIST", 1, 4, fp);
    wr_u32 (fp, (uint32_t)body.size ());
    fwrite (body.data (), 1, body.size (), fp);
    if (body.size () & 1) {
      fputc (0, fp);
    }
  }
  if (sf->have_cues && sf->cues.cue_count > 0) {
    fwrite ("cue ", 1, 4, fp);
    wr_u32 (fp, 4 + sf->cues.cue_count * 24);
    wr_u32 (fp, sf->cues.cue_count);
    for (uint32_t i = 0; i < sf->cues.cue_count; ++i) {
      const SF_CUE_POINT& c = sf->cues.cue_points[i];
      wr_u32 (fp, (uint32_t)c.indx);
      wr_u32 (fp, c.position);
      fwrite (&c.fcc_chunk, 1, 4, fp);
      wr_u32 (fp, (uint32_t)c.chunk_start);
      wr_u32 (fp, (uint32_t)c.block_start);
      wr_u32 (fp, c.sample_offset);
    }
  }
  if (sf->have_binfo) {
    const SF_BROADCAST_INFO& b = sf->binfo;
    uint32_t hist = b.coding_history_size;
    if (hist > sizeof (b.coding_history)) {
      hist = sizeof (b.coding_history);
    }
    fwrite ("bext", 1, 4, fp);
    wr_u32 (fp, 602 + hist);
    fwrite (b.description, 1, 256, fp);
    fwrite (b.originator, 1, 32, fp);
    fwrite (b.originator_reference, 1, 32, fp);
    fwrite (b.origination_date, 1, 10, fp);
    fwrite (b.origination_time, 1, 8, fp);
    wr_u32 (fp, b.time_reference_low);
    wr_u32 (fp, b.time_reference_high);
    wr_u16 (fp, (uint16_t)b.version);
    fwrite (b.umid, 1, 64, fp);
    fwrite (b.reserved, 1, 190, fp);
    fwrite (b.coding_history, 1, hist, fp);
    if ((602 + hist) & 1) {
      fputc (0, fp);
    }
  }
}

} // namespace

extern "C" {

SNDFILE*
sf_open (const char* path, int mode, SF_INFO* sfinfo)
{
  prt_sndfile_s* sf = new prt_sndfile_s ();
  sf->mode = mode;
  sf->path = path;
  if (mode == SFM_READ) {
    sf->fp = fopen (path, "rb");
  } else if (mode == SFM_WRITE) {
    sf->info = *sfinfo;
    sf->fp = fopen (path, "wb");
  } else {
    g_last_error = "SFM_RDWR not supported by refshim.";
    delete sf;
    return nullptr;
  }
  if (!sf->fp) {
    g_last_error = "System error : cannot open file.";
    delete sf;
    return nullptr;
  }
  bool ok = (mode == SFM_READ) ? open_read (sf) : open_write (sf);
  if (!ok) {
    fclose (sf->fp);
    delete sf;
    return nullptr;
  }
  if (mode == SFM_READ) {
    *sfinfo = sf->info;
  }
  return sf;
}

int
sf_close (SNDFILE* sndfile)
{
  prt_sndfile_s* sf = sndfile;
  if (!sf) {
    return 0;
  }
  if (sf->mode == SFM_WRITE) {
    const uint32_t data_bytes = (uint32_t)(sf->frames_written
                                           * sf->bytes_per_samp
                                           * sf->info.channels);
    if (data_bytes & 1) {
      fputc (0, sf->fp);
    }
    write_metadata_chunks (sf);
    long end = ftell (sf->fp);
    fseek (sf->fp, sf->riff_size_pos, SEEK_SET);
    wr_u32 (sf->fp, (uint32_t)(end - 8));
    fseek (sf->fp, sf->data_size_pos, SEEK_SET);
    wr_u32 (sf->fp, data_bytes);
    if (sf->subtype == SF_FORMAT_FLOAT) { // fact chunk frame count
      fseek (sf->fp, sf->data_size_pos - 16, SEEK_SET);
      wr_u32 (sf->fp, (uint32_t)sf->frames_written);
    }
  }
  fclose (sf->fp);
  delete sf;
  return 0;
}

sf_count_t
sf_readf_float (SNDFILE* sndfile, float* ptr, sf_count_t frames)
{
  prt_sndfile_s* sf = sndfile;
  if (sf->mode != SFM_READ) {
    return 0;
  }
  sf_count_t avail = sf->data_frames - sf->pos_frames;
  if (frames > avail) {
    frames = avail;
  }
  if (frames <= 0) {
    return 0;
  }
  const int chn = sf->info.channels;
  const size_t n_samp = (size_t)frames * chn;
  std::vector<unsigned char> raw (n_samp * sf->bytes_per_samp);
  size_t got = fread (raw.data (), sf->bytes_per_samp, n_samp, sf->fp);
  frames = (sf_count_t)(got / chn);
  const unsigned char* p = raw.data ();
  switch (sf->subtype) {
    case SF_FORMAT_PCM_16:
      for (size_t i = 0; i < (size_t)frames * chn; ++i, p += 2) {
        int16_t v = (int16_t)rd_u16 (p);
        ptr[i] = (float)v / 32768.0f;
      }
      break;
    case SF_FORMAT_PCM_24:
      for (size_t i = 0; i < (size_t)frames * chn; ++i, p += 3) {
        int32_t v = (int32_t)(((uint32_t)p[0] << 8) | ((uint32_t)p[1] << 16)
                              | ((uint32_t)p[2] << 24));
        ptr[i] = (float)(v >> 8) / 8388608.0f;
      }
      break;
    case SF_FORMAT_PCM_32:
      for (size_t i = 0; i < (size_t)frames * chn; ++i, p += 4) {
        int32_t v = (int32_t)rd_u32 (p);
        ptr[i] = (float)((double)v / 2147483648.0);
      }
      break;
    case SF_FORMAT_FLOAT:
      std::memcpy (ptr, p, (size_t)frames * chn * 4);
      break;
  }
  sf->pos_frames += frames;
  return frames;
}

sf_count_t
sf_writef_float (SNDFILE* sndfile, const float* ptr, sf_count_t frames)
{
  prt_sndfile_s* sf = sndfile;
  if (sf->mode != SFM_WRITE) {
    return 0;
  }
  const int chn = sf->info.channels;
  const size_t n_samp = (size_t)frames * chn;
  std::vector<unsigned char> raw (n_samp * sf->bytes_per_samp);
  unsigned char* p = raw.data ();
  switch (sf->subtype) {
    case SF_FORMAT_PCM_16:
      for (size_t i = 0; i < n_samp; ++i, p += 2) {
        double v = (double)ptr[i] * 32768.0;
        long s = std::lrint (v);
        if (s > 32767) {
          s = 32767;
        } else if (s < -32768) {
          s = -32768;
        }
        p[0] = (unsigned char)(s & 0xff);
        p[1] = (unsigned char)((s >> 8) & 0xff);
      }
      break;
    case SF_FORMAT_PCM_24:
      for (size_t i = 0; i < n_samp; ++i, p += 3) {
        double v = (double)ptr[i] * 8388608.0;
        long s = std::lrint (v);
        if (s > 8388607) {
          s = 8388607;
        } else if (s < -8388608) {
          s = -8388608;
        }
        p[0] = (unsigned char)(s & 0xff);
        p[1] = (unsigned char)((s >> 8) & 0xff);
        p[2] = (unsigned char)((s >> 16) & 0xff);
      }
      break;
    case SF_FORMAT_PCM_32:
      for (size_t i = 0; i < n_samp; ++i, p += 4) {
        double v = (double)ptr[i] * 2147483648.0;
        if (v > 2147483647.0) {
          v = 2147483647.0;
        } else if (v < -2147483648.0) {
          v = -2147483648.0;
        }
        int32_t s = (int32_t)std::llrint (v);
        std::memcpy (p, &s, 4);
      }
      break;
    case SF_FORMAT_FLOAT:
      std::memcpy (p, ptr, n_samp * 4);
      break;
  }
  size_t put = fwrite (raw.data (), sf->bytes_per_samp, n_samp, sf->fp);
  sf_count_t ok = (sf_count_t)(put / chn);
  sf->frames_written += ok;
  return ok;
}

sf_count_t
sf_seek (SNDFILE* sndfile, sf_count_t frames, int whence)
{
  prt_sndfile_s* sf = sndfile;
  if (sf->mode != SFM_READ) {
    return -1;
  }
  sf_count_t target = frames;
  if (whence == SEEK_CUR) {
    target = sf->pos_frames + frames;
  } else if (whence == SEEK_END) {
    target = sf->data_frames + frames;
  }
  if (target < 0 || target > sf->data_frames) {
    return -1;
  }
  fseek (sf->fp,
         sf->data_offset
           + (long)(target * sf->bytes_per_samp * sf->info.channels),
         SEEK_SET);
  sf->pos_frames = target;
  return target;
}

const char*
sf_strerror (SNDFILE*)
{
  return g_last_error.c_str ();
}

const char*
sf_get_string (SNDFILE* sndfile, int str_type)
{
  prt_sndfile_s* sf = sndfile;
  auto it = sf->strings.find (str_type);
  return it == sf->strings.end () ? nullptr : it->second.c_str ();
}

int
sf_set_string (SNDFILE* sndfile, int str_type, const char* str)
{
  prt_sndfile_s* sf = sndfile;
  if (sf->mode != SFM_WRITE || !str) {
    return 1;
  }
  sf->strings[str_type] = str;
  return 0;
}

int
sf_command (SNDFILE* sndfile, int command, void* data, int datasize)
{
  prt_sndfile_s* sf = sndfile;
  switch (command) {
    case SFC_GET_LOG_INFO: {
      if (!data || datasize <= 0) {
        return 0;
      }
      std::snprintf ((char*)data, (size_t)datasize, "%s",
                     sf->log.c_str ());
      return (int)sf->log.size ();
    }
    case SFC_GET_CUE:
      if (sf->have_cues && data
          && datasize >= (int)sizeof (SF_CUES)) {
        std::memcpy (data, &sf->cues, sizeof (SF_CUES));
        return SF_TRUE;
      }
      return SF_FALSE;
    case SFC_SET_CUE:
      if (sf->mode == SFM_WRITE && data
          && datasize >= (int)sizeof (SF_CUES)) {
        std::memcpy (&sf->cues, data, sizeof (SF_CUES));
        sf->have_cues = sf->cues.cue_count > 0;
        return SF_TRUE;
      }
      return SF_FALSE;
    case SFC_GET_BROADCAST_INFO:
      if (sf->have_binfo && data
          && datasize >= (int)sizeof (SF_BROADCAST_INFO)) {
        std::memcpy (data, &sf->binfo, sizeof (SF_BROADCAST_INFO));
        return SF_TRUE;
      }
      return SF_FALSE;
    case SFC_SET_BROADCAST_INFO:
      if (sf->mode == SFM_WRITE && data
          && datasize >= (int)sizeof (SF_BROADCAST_INFO)) {
        std::memcpy (&sf->binfo, data, sizeof (SF_BROADCAST_INFO));
        sf->have_binfo = true;
        return SF_TRUE;
      }
      return SF_FALSE;
    default:
      return SF_FALSE;
  }
}

} // extern "C"
