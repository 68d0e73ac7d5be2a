"""Real FFTs as MXU matmuls (4-step Cooley-Tukey).

XLA's TPU FFT runs on the VPU at a small fraction of roofline; the MXU
sits idle.  This module computes the block transforms of the convolution
engine as dense matmuls instead: a complex FFT of size ``M = N1*N2``
decomposes into

    1) a (N1 x N1) DFT matmul down the columns,
    2) a pointwise twiddle multiply,
    3) a (N2 x N2) DFT matmul across the rows,

with N1, N2 in the 64..128 range — exactly MXU-shaped.  ~30x more FLOPs
than an FFT, but the MXU's f32 throughput advantage more than pays for it
(measured ~3-4x faster than XLA's FFT for the 16384-point blocks of the
search pipeline).

Real transforms use the standard half-size complex packing: an N-point
rfft is an N/2-point complex FFT plus an O(N) untangling pass.  Everything
is ri-format float32 (utils/cplx.py); matmuls run at HIGHEST precision so
the 1e-5 parity budget holds (error ~ sqrt(N) ulp).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft_mxu", "irfft_mxu", "supported_size"]

_PREC = jax.lax.Precision.HIGHEST


def _split(m: int) -> Tuple[int, int]:
    """Factor M into (N1, N2) as close to square as possible, powers of 2."""
    p = m.bit_length() - 1
    n1 = 1 << (p // 2)
    return n1, m // n1


def supported_size(n: int) -> bool:
    """True if this module handles an n-point real transform."""
    return n >= 256 and (n & (n - 1)) == 0


@functools.lru_cache(maxsize=16)
def _consts(m: int, inverse: bool):
    """DFT matrices + twiddles for an m-point complex FFT, numpy f32."""
    n1, n2 = _split(m)
    sign = 2j if inverse else -2j
    w1 = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w2 = np.exp(sign * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / m)
    f32 = lambda a: (a.real.astype(np.float32), a.imag.astype(np.float32))
    return n1, n2, f32(w1), f32(w2), f32(tw)


def _cmatmul_left(wr, wi, ar, ai):
    """(W @ A) for complex W (k, j), A (..., j, n): four real matmuls."""
    rr = jnp.einsum("kj,...jn->...kn", wr, ar, precision=_PREC)
    ri = jnp.einsum("kj,...jn->...kn", wr, ai, precision=_PREC)
    ir = jnp.einsum("kj,...jn->...kn", wi, ar, precision=_PREC)
    ii = jnp.einsum("kj,...jn->...kn", wi, ai, precision=_PREC)
    return rr - ii, ri + ir


def _cmatmul_right(ar, ai, wr, wi):
    """(A @ W) for A (..., k, n), symmetric W (n, m)."""
    rr = jnp.einsum("...kn,nm->...km", ar, wr, precision=_PREC)
    ri = jnp.einsum("...kn,nm->...km", ai, wr, precision=_PREC)
    ir = jnp.einsum("...kn,nm->...km", ar, wi, precision=_PREC)
    ii = jnp.einsum("...kn,nm->...km", ai, wi, precision=_PREC)
    return rr - ii, ri + ir


def _cfft(zr, zi, m: int, inverse: bool):
    """m-point complex FFT of (..., m) via 4-step matmuls."""
    n1, n2, (w1r, w1i), (w2r, w2i), (twr, twi) = _consts(m, inverse)
    a_r = zr.reshape(*zr.shape[:-1], n1, n2)
    a_i = zi.reshape(*zi.shape[:-1], n1, n2)
    b_r, b_i = _cmatmul_left(w1r, w1i, a_r, a_i)  # (..., k1, n2)
    c_r = b_r * twr - b_i * twi
    c_i = b_r * twi + b_i * twr
    d_r, d_i = _cmatmul_right(c_r, c_i, w2r, w2i)  # (..., k1, k2)
    # k = k2 * n1 + k1  -> transpose (k1, k2) -> (k2, k1) then flatten
    d_r = jnp.swapaxes(d_r, -1, -2).reshape(*zr.shape[:-1], m)
    d_i = jnp.swapaxes(d_i, -1, -2).reshape(*zi.shape[:-1], m)
    if inverse:
        inv = jnp.float32(1.0 / m)
        return d_r * inv, d_i * inv
    return d_r, d_i


@functools.lru_cache(maxsize=16)
def _pack_consts(n: int):
    m = n // 2
    k = np.arange(m + 1)
    e = np.exp(-2j * np.pi * k / n)
    return (e.real.astype(np.float32), e.imag.astype(np.float32))


@functools.partial(jax.jit, static_argnames=("n",))
def rfft_mxu(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """rfft of (..., n) real input -> (..., n/2+1, 2) ri-format."""
    m = n // 2
    z_r = x[..., 0::2]
    z_i = x[..., 1::2]
    zr, zi = _cfft(z_r, z_i, m, inverse=False)
    # untangle: X[k] = E[k] + W_N^k O[k], k = 0..m (Z[m] := Z[0])
    zfr = jnp.concatenate([zr, zr[..., :1]], axis=-1)
    zfi = jnp.concatenate([zi, zi[..., :1]], axis=-1)
    zcr = zfr[..., ::-1]
    zci = -zfi[..., ::-1]
    e_r = 0.5 * (zfr + zcr)
    e_i = 0.5 * (zfi + zci)
    o_r = 0.5 * (zfi - zci)  # -0.5j*(Zf - Zc): real part
    o_i = -0.5 * (zfr - zcr)  # imag part
    tr, ti = _pack_consts(n)
    x_r = e_r + tr * o_r - ti * o_i
    x_i = e_i + tr * o_i + ti * o_r
    return jnp.stack([x_r, x_i], axis=-1)


@functools.partial(jax.jit, static_argnames=("n",))
def irfft_mxu(x_ri: jnp.ndarray, n: int) -> jnp.ndarray:
    """irfft of (..., n/2+1, 2) ri-format spectrum -> (..., n) real."""
    m = n // 2
    x_r = x_ri[..., 0]
    x_i = x_ri[..., 1]
    xcr = x_r[..., ::-1]
    xci = -x_i[..., ::-1]
    e_r = 0.5 * (x_r + xcr)
    e_i = 0.5 * (x_i + xci)
    o_r = 0.5 * (x_r - xcr)
    o_i = 0.5 * (x_i - xci)
    tr, ti = _pack_consts(n)
    # odd' = odd * conj(W_N^k)... forward used W_N^{-k}? inverse twiddle:
    # Z[k] = E[k] + j * (O[k] * e^{+2 pi i k / n}) with the packing of the
    # prototype: even + 1j*odd where odd = 0.5*(X - Xc)*e^{+2pi i k/N}
    orr = o_r * tr + o_i * ti  # (o * conj(t)).re  since e^{+} = conj(e^{-})
    ori = o_i * tr - o_r * ti
    z_r = e_r[..., :m] - ori[..., :m]
    z_i = e_i[..., :m] + orr[..., :m]
    zr, zi = _cfft(z_r, z_i, m, inverse=True)
    out = jnp.stack([zr, zi], axis=-1)
    return out.reshape(*zr.shape[:-1], n)