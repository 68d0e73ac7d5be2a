// refshim/fftw_shim.cc — independent FFT behind the fftwf_* API
// (radix-2 for pow2 sizes, direct DFT otherwise).
//
// Conventions match FFTW's documentation exactly (what the reference CLI
// assumes): r2c is the unnormalized forward DFT, out[k] = sum_j in[j] *
// exp(-2*pi*i*j*k/n) for k = 0..n/2; c2r is the unnormalized backward
// DFT of the Hermitian-extended half spectrum (a full r2c->c2r round
// trip scales by n).  Butterflies run in double so the float32 results
// are as close to an exactly-rounded DFT as float32 allows — the
// differential tests compare against the framework at ~1e-5, far above
// double-vs-FFTW noise.  Unlike real FFTW, c2r never destroys its
// input (FFTW *may*, not must — the reference never reuses the input).

#include "fftw3.h"

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

struct prt_shim_plan_s {
  int n;        // real length
  int kind;     // 0 = r2c, 1 = c2r
  float* rbuf;  // buffers given at plan time (for fftwf_execute)
  fftwf_complex* cbuf;
};

namespace {

// iterative radix-2 Cooley-Tukey, in place, double precision.
// sign = -1 forward, +1 backward.  No normalization.
void fft_inplace (std::vector<double>& re, std::vector<double>& im,
                  int sign)
{
  const size_t n = re.size ();
  // bit-reversal permutation
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) {
      j ^= bit;
    }
    j ^= bit;
    if (i < j) {
      std::swap (re[i], re[j]);
      std::swap (im[i], im[j]);
    }
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = sign * 2.0 * M_PI / (double)len;
    const double wr = std::cos (ang), wi = std::sin (ang);
    for (size_t i = 0; i < n; i += len) {
      double cr = 1.0, ci = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        const size_t a = i + k, b = i + k + len / 2;
        const double ur = re[a], ui = im[a];
        const double vr = re[b] * cr - im[b] * ci;
        const double vi = re[b] * ci + im[b] * cr;
        re[a] = ur + vr;
        im[a] = ui + vi;
        re[b] = ur - vr;
        im[b] = ui - vi;
        const double ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

// direct O(n^2) DFT for non-pow2 sizes, double precision.  The only
// non-pow2 plan either consumer makes is the PLUGIN's firlen c2r
// (3072 = 3*2^10 at <=48 kHz, src/phaserotate.c:361-364) — executed
// once per instantiate for the FIR design, so quadratic cost is fine.
void dft_direct (std::vector<double>& re, std::vector<double>& im,
                 int sign)
{
  const size_t n = re.size ();
  std::vector<double> or_ (n, 0.0), oi (n, 0.0);
  for (size_t k = 0; k < n; ++k) {
    for (size_t j = 0; j < n; ++j) {
      const double ang = sign * 2.0 * M_PI * (double)((j * k) % n) /
                         (double)n;
      const double wr = std::cos (ang), wi = std::sin (ang);
      or_[k] += re[j] * wr - im[j] * wi;
      oi[k] += re[j] * wi + im[j] * wr;
    }
  }
  re.swap (or_);
  im.swap (oi);
}

bool is_pow2 (int n)
{
  return n >= 2 && (n & (n - 1)) == 0;
}

void transform (std::vector<double>& re, std::vector<double>& im,
                int sign)
{
  if (is_pow2 ((int)re.size ())) {
    fft_inplace (re, im, sign);
  } else {
    dft_direct (re, im, sign);
  }
}

void require_even (int n)
{
  if (n < 2 || (n & 1)) {
    std::fprintf (stderr, "refshim fftw: unsupported size %d\n", n);
    std::abort ();
  }
}

} // namespace

extern "C" {

fftwf_plan
fftwf_plan_dft_r2c_1d (int n, float* in, fftwf_complex* out, unsigned)
{
  require_even (n);
  prt_shim_plan_s* p = new prt_shim_plan_s{ n, 0, in, out };
  return p;
}

fftwf_plan
fftwf_plan_dft_c2r_1d (int n, fftwf_complex* in, float* out, unsigned)
{
  require_even (n);
  prt_shim_plan_s* p = new prt_shim_plan_s{ n, 1, out, in };
  return p;
}

void
fftwf_execute_dft_r2c (const fftwf_plan p, float* in, fftwf_complex* out)
{
  const int n = p->n;
  std::vector<double> re (n), im (n, 0.0);
  for (int j = 0; j < n; ++j) {
    re[j] = (double)in[j];
  }
  transform (re, im, -1);
  for (int k = 0; k <= n / 2; ++k) {
    out[k][0] = (float)re[k];
    out[k][1] = (float)im[k];
  }
}

void
fftwf_execute_dft_c2r (const fftwf_plan p, fftwf_complex* in, float* out)
{
  const int n = p->n;
  std::vector<double> re (n), im (n);
  // FFTW c2r documents that the imaginary parts of the DC and Nyquist
  // bins are IGNORED (assumed real).  The reference relies on this: its
  // ideal-Hilbert spectrum is (0, +/-1) at EVERY bin including 0 and
  // n/2 (phase-rotate.cc:148-152), and only survives the c2r because
  // FFTW drops those two imaginary parts.
  re[0] = (double)in[0][0];
  im[0] = 0.0;
  for (int k = 1; k < n / 2; ++k) {
    re[k] = (double)in[k][0];
    im[k] = (double)in[k][1];
    re[n - k] = re[k];
    im[n - k] = -im[k];
  }
  re[n / 2] = (double)in[n / 2][0];
  im[n / 2] = 0.0;
  transform (re, im, +1);
  for (int j = 0; j < n; ++j) {
    out[j] = (float)re[j];
  }
}

void
fftwf_execute (const fftwf_plan p)
{
  if (p->kind == 0) {
    fftwf_execute_dft_r2c (p, p->rbuf, p->cbuf);
  } else {
    fftwf_execute_dft_c2r (p, p->cbuf, p->rbuf);
  }
}

void
fftwf_destroy_plan (fftwf_plan p)
{
  delete p;
}

void*
fftwf_malloc (size_t n)
{
  void* p = nullptr;
  if (posix_memalign (&p, 64, n ? n : 64) != 0) {
    return nullptr;
  }
  return p;
}

void
fftwf_free (void* p)
{
  free (p);
}

void
fftwf_cleanup (void)
{
}

} // extern "C"
