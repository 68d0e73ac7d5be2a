/* refshim/sndfile.h — minimal libsndfile-compatible API, own code.
 *
 * Same purpose as refshim/fftw3.h: libsndfile is not installed here, so
 * this header + sndfile_shim.cc supply exactly the surface the upstream
 * reference CLI uses (sf_open/readf/writef/seek/close, string + cue +
 * broadcast-info passthrough, log info) backed by an independent WAV
 * reader/writer, so the unmodified reference source builds and runs as
 * a differential oracle.  WAV only (PCM 16/24/32 + float32) — the
 * differential corpus is WAV, and the reference itself is format-
 * agnostic through this same API.  Struct layouts follow libsndfile's
 * documented public ABI where the reference depends on them (SF_CUES
 * entries mirror the RIFF cue chunk; SF_BROADCAST_INFO mirrors bext).
 */
#ifndef PRT_REFSHIM_SNDFILE_H
#define PRT_REFSHIM_SNDFILE_H

#include <stdint.h>
#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t sf_count_t;
typedef struct prt_sndfile_s SNDFILE;

typedef struct
{
  sf_count_t frames;
  int samplerate;
  int channels;
  int format;
  int sections;
  int seekable;
} SF_INFO;

enum
{
  SFM_READ  = 0x10,
  SFM_WRITE = 0x20,
  SFM_RDWR  = 0x30
};

#define SF_TRUE 1
#define SF_FALSE 0

/* format field: major type | subtype (libsndfile encoding) */
#define SF_FORMAT_WAV 0x010000
#define SF_FORMAT_PCM_16 0x0002
#define SF_FORMAT_PCM_24 0x0003
#define SF_FORMAT_PCM_32 0x0004
#define SF_FORMAT_FLOAT 0x0006
#define SF_FORMAT_SUBMASK 0x0000FFFF
#define SF_FORMAT_TYPEMASK 0x0FFF0000

enum
{
  SF_STR_TITLE       = 0x01,
  SF_STR_COPYRIGHT   = 0x02,
  SF_STR_SOFTWARE    = 0x03,
  SF_STR_ARTIST      = 0x04,
  SF_STR_COMMENT     = 0x05,
  SF_STR_DATE        = 0x06,
  SF_STR_ALBUM       = 0x07,
  SF_STR_LICENSE     = 0x08,
  SF_STR_TRACKNUMBER = 0x09,
  SF_STR_GENRE       = 0x10
};
#define SF_STR_FIRST SF_STR_TITLE
#define SF_STR_LAST SF_STR_GENRE

enum
{
  SFC_GET_LOG_INFO       = 0x1000,
  SFC_GET_CUE            = 0x10CD,
  SFC_SET_CUE            = 0x10CE,
  SFC_GET_BROADCAST_INFO = 0x10F0,
  SFC_SET_BROADCAST_INFO = 0x10F1
};

typedef struct
{
  int32_t indx;
  uint32_t position;
  int32_t fcc_chunk;
  int32_t chunk_start;
  int32_t block_start;
  uint32_t sample_offset;
  char name[256];
} SF_CUE_POINT;

typedef struct
{
  uint32_t cue_count;
  SF_CUE_POINT cue_points[100];
} SF_CUES;

typedef struct
{
  char description[256];
  char originator[32];
  char originator_reference[32];
  char origination_date[10];
  char origination_time[8];
  uint32_t time_reference_low;
  uint32_t time_reference_high;
  short version;
  char umid[64];
  char reserved[190];
  uint32_t coding_history_size;
  char coding_history[256];
} SF_BROADCAST_INFO;

SNDFILE* sf_open (const char* path, int mode, SF_INFO* sfinfo);
int sf_close (SNDFILE* sndfile);
sf_count_t sf_readf_float (SNDFILE* sndfile, float* ptr, sf_count_t frames);
sf_count_t sf_writef_float (SNDFILE* sndfile, const float* ptr,
                            sf_count_t frames);
sf_count_t sf_seek (SNDFILE* sndfile, sf_count_t frames, int whence);
const char* sf_strerror (SNDFILE* sndfile);
const char* sf_get_string (SNDFILE* sndfile, int str_type);
int sf_set_string (SNDFILE* sndfile, int str_type, const char* str);
int sf_command (SNDFILE* sndfile, int command, void* data, int datasize);

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_SNDFILE_H */
