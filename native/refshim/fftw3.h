/* refshim/fftw3.h — minimal FFTW3f-compatible API, own implementation.
 *
 * Purpose: the environment has no fftw3f, so the upstream reference CLI
 * (/root/reference/cli/phase-rotate.cc) cannot be built against the real
 * library.  This header + fftw_shim.cc provide just the fftwf_* surface
 * that binary needs, with FFTW's documented transform conventions
 * (unnormalized r2c forward / c2r backward, n/2+1 half spectra), so the
 * UNMODIFIED reference source can be compiled here and used as a
 * differential-test oracle for the framework (tests/test_ref_binary.py).
 * This is not FFTW code: the transforms are an independent radix-2
 * implementation computed in double precision (see fftw_shim.cc).
 *
 * Pow2 sizes run a radix-2 FFT; other (even) sizes fall back to a
 * direct O(n^2) DFT — needed only for the PLUGIN's one-shot firlen
 * c2r at instantiate (3072 @ <=48 kHz, src/phaserotate.c:361-364).
 * The CLI plans pow2 lengths exclusively (blksiz pow2-clamped at
 * phase-rotate.cc:749-755).  Odd sizes abort loudly.
 */
#ifndef PRT_REFSHIM_FFTW3_H
#define PRT_REFSHIM_FFTW3_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef float fftwf_complex[2];
typedef struct prt_shim_plan_s* fftwf_plan;

#define FFTW_ESTIMATE (1U << 6)
#define FFTW_MEASURE (0U)
#define FFTW_PATIENT (1U << 5)

fftwf_plan fftwf_plan_dft_r2c_1d (int n, float* in, fftwf_complex* out,
                                  unsigned flags);
fftwf_plan fftwf_plan_dft_c2r_1d (int n, fftwf_complex* in, float* out,
                                  unsigned flags);
void fftwf_execute (const fftwf_plan p);
void fftwf_execute_dft_r2c (const fftwf_plan p, float* in,
                            fftwf_complex* out);
void fftwf_execute_dft_c2r (const fftwf_plan p, fftwf_complex* in,
                            float* out);
void fftwf_destroy_plan (fftwf_plan p);
void* fftwf_malloc (size_t n);
void fftwf_free (void* p);
void fftwf_cleanup (void);

#ifdef __cplusplus
}
#endif

#endif /* PRT_REFSHIM_FFTW3_H */
