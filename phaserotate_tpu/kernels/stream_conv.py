"""Fused small-geometry convolution kernel: the streaming engine's hot
path (src/phaserotate.c:640-717) as MXU matmuls entirely in VMEM.

The plugin geometries (parsiz 256/512/1024, src/phaserotate.c:278-297)
are too small for the 4-step matmul-FFT of kernels/fused_conv.py (a
factor drops under the 64-lane floor).  At these sizes a *direct* DFT is
the better TPU program: the transform matrices are tiny enough to sit in
VMEM permanently, every stage is one MXU matmul over a whole tile of
frames, and the n_segm-partition frequency delay line + overlap-add +
rotation mix all stay in kernel scratch — HBM sees each sample exactly
twice (read frame, write mixed output).

Internal framing is fixed at P = 256 samples regardless of the plugin
parsiz: the partitioned convolution of the same FIR is framing-invariant
(it is just the linear convolution ``(fir * x)[m]``), so every geometry
(including the CLI's MIN_BLKSIZ=1024 offline one) maps onto one kernel
shape with n_segm = fir_taps/256 partitions.  The half-spectrum is kept
(bins 0..256 of the 512-point transform, zero-padded to 384 lanes); the
inverse matrix carries the Hermitian-doubling weights, so conjugate bins
are never materialized.

Matmuls run at HIGHEST precision (f32-accurate) for the 1e-5 parity
budget; per-frame angle/slope pairs ride a (n_frames, 2) side input and
the per-sample interpolation ramp (src/phaserotate.c:697-702) is
evaluated on the VPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rotate_peak import use_interpret

__all__ = [
    "P",
    "small_conv_supported",
    "stream_mix_supported",
    "fused_hilbert_small",
    "fused_stream_mix",
    "fused_rotate_small",
]

P = 256          # internal frame (samples consumed/produced per step)
FFTK = 2 * P     # zero-padded transform length
NB = 384         # half-spectrum bins 0..256, padded to a lane multiple

_PREC = jax.lax.Precision.HIGHEST
_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"))


def small_conv_supported(fir_taps: int) -> bool:
    """FIR supports P-divisible tap counts with 2..64 partitions — covers
    every plugin FIR (3072/4096/8192, src/phaserotate.c:278-290) and the
    offline MIN_BLKSIZ FIR (1024 taps, cli/phase-rotate.cc:128-141)."""
    return fir_taps % P == 0 and 2 <= fir_taps // P <= 64


def stream_mix_supported(firlen: int) -> bool:
    """The fused rotation mix additionally needs the FIR group delay to
    be a whole number of internal frames (true for all plugin FIRs)."""
    return small_conv_supported(firlen) and (firlen // 2) % P == 0


@functools.lru_cache(maxsize=1)
def _dft_consts() -> Tuple[np.ndarray, ...]:
    """Forward/inverse DFT matrices for the fixed internal geometry.

    Forward maps a P-sample frame (zero-padded to FFTK) to bins 0..P of
    its FFTK-point spectrum; the inverse folds the Hermitian mirror into
    doubled weights and the 1/FFTK normalization, emitting all FFTK time
    samples.  Known-zero entries (imag at DC/Nyquist) are set to exact
    zeros so the kernel reproduces irfft's discard semantics.
    """
    n = np.arange(P, dtype=np.float64)[:, None]
    k = np.arange(NB, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / FFTK
    wfr = np.cos(ang)
    wfi = -np.sin(ang)
    wfi[:, P] = 0.0  # Nyquist imag: exactly zero for real input
    wfr[:, P + 1 :] = 0.0
    wfi[:, P + 1 :] = 0.0

    kk = np.arange(NB, dtype=np.float64)[:, None]
    m = np.arange(FFTK, dtype=np.float64)[None, :]
    c = np.where((kk == 0) | (kk == P), 1.0, 2.0) / FFTK
    angi = 2.0 * np.pi * kk * m / FFTK
    va = c * np.cos(angi)
    vb = -c * np.sin(angi)
    vb[0, :] = 0.0   # irfft discards the imaginary parts of the
    vb[P, :] = 0.0   # DC and Nyquist bins
    va[P + 1 :, :] = 0.0
    vb[P + 1 :, :] = 0.0
    f = lambda a: np.ascontiguousarray(a, np.float32)
    return f(wfr), f(wfi), f(va), f(vb)


@functools.lru_cache(maxsize=16)
def _fir_parts_np(fir_taps: int) -> np.ndarray:
    """Hilbert FIR of ``fir_taps`` split into P-sample partitions, each
    forward-transformed into the padded half-spectrum: (n_segm, NB, 2).

    Same per-partition spectra as core.fir.partition_fir_spectra — the
    reference's per-segment r2c transforms (src/phaserotate.c:396-401) at
    the kernel's internal partition size.
    """
    from ..core.fir import _partition_fir_spectra_np

    spec = _partition_fir_spectra_np(fir_taps, P)  # (ns, P+1) complex
    ns = spec.shape[0]
    out = np.zeros((ns, NB, 2), np.float32)
    out[:, : P + 1, 0] = spec.real
    out[:, : P + 1, 1] = spec.imag
    return out


def _make_kernel(t: int, ns: int, d_rows: int, mix: bool,
                 prec=jax.lax.Precision.HIGHEST):
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32)

    def kernel(*refs):
        if mix:
            (wfr, wfi, va, vb, fr, fi, frames, angs, out,
             shr, shi, xh, tl) = refs
        else:
            (wfr, wfi, va, vb, fr, fi, frames, out,
             shr, shi, xh, tl) = refs
            angs = None
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            shr[:] = jnp.zeros_like(shr)
            shi[:] = jnp.zeros_like(shi)
            tl[:] = jnp.zeros_like(tl)
            if mix:
                xh[:] = jnp.zeros_like(xh)

        x = frames[0]  # (t, P)
        # forward half-spectrum of every frame in the tile (one matmul)
        sr = dot(x, wfr[:])
        si = dot(x, wfi[:])
        # frequency delay line (src/phaserotate.c:640-655): extend with
        # the previous tile's last ns-1 spectra, MAC over partitions
        sr_e = jnp.concatenate([shr[:], sr], axis=0)  # (ns-1+t, NB)
        si_e = jnp.concatenate([shi[:], si], axis=0)
        ur = jnp.zeros_like(sr)
        ui = jnp.zeros_like(si)
        for s in range(ns):
            er = sr_e[ns - 1 - s : ns - 1 - s + t]
            ei = si_e[ns - 1 - s : ns - 1 - s + t]
            gr = fr[s : s + 1]
            gi = fi[s : s + 1]
            ur = ur + (er * gr - ei * gi)
            ui = ui + (er * gi + ei * gr)
        shr[:] = sr_e[t:]
        shi[:] = si_e[t:]
        # inverse (Hermitian weights folded): all FFTK samples per frame
        y = dot(ur, va[:]) + dot(ui, vb[:])  # (t, FFTK)
        # overlap-add: tail reaches back exactly one frame
        prev_tails = jnp.concatenate([tl[0:1], y[:-1, P:]], axis=0)
        h = y[:, :P] + prev_tails
        tl[0:1] = y[-1:, P:]
        if mix:
            # group-delay-aligned dry signal from the frame history,
            # then the rotation mix with the per-sample angle ramp
            # (src/phaserotate.c:664-717) — all VPU, nothing spills
            xd = jnp.concatenate([xh[:], x], axis=0)  # (d_rows+t, P)
            dly = xd[:t]
            xh[:] = xd[t:]
            a = angs[0]  # (t, 2): pre-block angle, per-sample slope
            idx = jax.lax.broadcasted_iota(  # Mosaic: integer iota only
                jnp.int32, (t, P), 1).astype(jnp.float32)
            rad = (a[:, 0:1] + a[:, 1:2] * idx) * jnp.float32(
                2.0 * np.pi)
            out[0] = jnp.cos(rad) * dly + jnp.sin(rad) * h
        else:
            out[0] = h

    return kernel


def _call(frames: jnp.ndarray, fir_taps: int, angs, t_blocks: int,
          bf16: bool = False):
    mix = angs is not None
    if not small_conv_supported(fir_taps):
        raise ValueError(f"unsupported fir_taps {fir_taps}")
    ns = fir_taps // P
    d_rows = (fir_taps // 2) // P if mix else 1
    b, n_blocks, _ = frames.shape
    pad_blocks = (-n_blocks) % t_blocks
    if pad_blocks:
        frames = jnp.pad(frames, ((0, 0), (0, pad_blocks), (0, 0)))
        if mix:
            angs = jnp.pad(angs, ((0, 0), (0, pad_blocks), (0, 0)))
        n_blocks += pad_blocks
    n_tiles = n_blocks // t_blocks

    wfr, wfi, va, vb = (jnp.asarray(a) for a in _dft_consts())
    fir = _fir_parts_np(fir_taps)
    inputs = [wfr, wfi, va, vb,
              jnp.asarray(fir[..., 0]), jnp.asarray(fir[..., 1])]
    const_specs = [
        pl.BlockSpec(a.shape, (lambda b_, i_, r=a.ndim: (0,) * r),
                     memory_space=pltpu.VMEM)
        for a in inputs
    ]
    in_specs = const_specs + [
        pl.BlockSpec((1, t_blocks, P), lambda b_, i_: (b_, i_, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs.append(frames)
    if mix:
        in_specs.append(
            pl.BlockSpec((1, t_blocks, 2), lambda b_, i_: (b_, i_, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(angs, jnp.float32))
    out_spec = pl.BlockSpec((1, t_blocks, P), lambda b_, i_: (b_, i_, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n_blocks, P), jnp.float32)
    scratch = [
        pltpu.VMEM((ns - 1, NB), jnp.float32),  # spectrum history (re)
        pltpu.VMEM((ns - 1, NB), jnp.float32),  # spectrum history (im)
        pltpu.VMEM((d_rows, P), jnp.float32),   # dry-signal delay
        pltpu.VMEM((1, P), jnp.float32),        # OLA tail
    ]
    cost = pl.CostEstimate(
        flops=b * n_blocks * (2 * P * NB + 2 * NB * FFTK) * 2,
        bytes_accessed=b * n_blocks * P * 8,
        transcendentals=b * n_blocks * 2 * P if mix else 0,
    )
    out = pl.pallas_call(
        _make_kernel(t_blocks, ns, d_rows, mix,
                     jax.lax.Precision.DEFAULT if bf16 else _PREC),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=cost,
        compiler_params=_PARAMS,
        interpret=use_interpret(),
    )(*inputs)
    if pad_blocks:
        out = out[:, : n_blocks - pad_blocks]
    return out


@functools.partial(jax.jit, static_argnames=("fir_taps", "t_blocks",
                                              "bf16"))
def fused_hilbert_small(
    x: jnp.ndarray,
    fir_taps: int,
    t_blocks: int = 256,
    bf16: bool = False,
) -> jnp.ndarray:
    """Linear convolution stream ``h[m] = (fir * x)[m]`` of ``x`` (..., n)
    with the ``fir_taps``-tap Hilbert FIR, via the small-geometry kernel.

    Returns (..., n_frames*P) with ``n_frames = ceil(n/P) + fir_taps/P``
    — covers the full convolution support (identical arithmetic role to
    ops.convolve.partitioned_convolve's head; parity-tested).

    ``bf16=True`` runs the DFT/MAC matmuls at DEFAULT precision (one
    bf16 MXU pass instead of HIGHEST's multi-pass f32 emulation) — the
    opt-in fast mode for angle SELECTION, where only the argmin must
    survive, not 1e-5 waveform parity.  Guarded by the on-chip
    selected-angle equality test (tests_tpu) before any fleet use.
    """
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    b = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    n_frames = -(-n // P) + fir_taps // P
    xp = jnp.pad(x.reshape(b, n), ((0, 0), (0, n_frames * P - n)))
    h = _call(xp.reshape(b, n_frames, P), fir_taps, None, t_blocks,
              bf16=bf16)
    return h.reshape(*batch_shape, n_frames * P)


@functools.partial(jax.jit, static_argnames=("firlen", "t_blocks"))
def fused_rotate_small(
    x: jnp.ndarray,
    turns: jnp.ndarray,
    firlen: int,
    t_blocks: int = 256,
) -> jnp.ndarray:
    """Steady-angle FIR rotation via the small-geometry kernel:

        out[m] = cos(2*pi*turns)*x[m] + sin(2*pi*turns)*(fir*x)[m + lat]

    Same contract as kernels.fused_conv.fused_rotate_fir (group delay
    compensated, time-aligned) but measured ~25% faster on-chip for the
    plugin FIRs — the direct-DFT pipeline does ~4.9 kflop/sample vs the
    4-step kernel's ~6.1 (doc/KERNELS.md).

    Args:
      x: (..., n) float32.
      turns: negated-turns angle, broadcastable to ``x.shape[:-1]``.
    """
    if not stream_mix_supported(firlen):
        raise ValueError(f"unsupported firlen {firlen}")
    lat = firlen // 2
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    b = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    n_frames = -(-(n + lat) // P)  # stream must cover n + lat
    xp = jnp.pad(x.reshape(b, n), ((0, 0), (0, n_frames * P - n)))
    t = jnp.broadcast_to(
        jnp.asarray(turns, jnp.float32), batch_shape).reshape(b)
    params = jnp.stack(
        [jnp.broadcast_to(t[:, None], (b, n_frames)),
         jnp.zeros((b, n_frames), jnp.float32)], axis=-1)
    out = _call(xp.reshape(b, n_frames, P), firlen, params, t_blocks)
    return out.reshape(b, n_frames * P)[
        :, lat : lat + n].reshape(*batch_shape, n)


@functools.partial(jax.jit, static_argnames=("firlen", "t_blocks"))
def fused_stream_mix(
    frames: jnp.ndarray,
    angle_params: jnp.ndarray,
    firlen: int,
    t_blocks: int = 256,
) -> jnp.ndarray:
    """The complete streaming block body in one kernel pass:

        out[m] = cos(rad_m)*x[m - firlen/2] + sin(rad_m)*(fir*x)[m]

    with the per-sample angle ramp ``rad_m`` from per-frame
    ``angle_params`` (src/phaserotate.c:664-717).

    Args:
      frames: (B, n_frames, P) float32 — internal 256-sample framing of
        the input stream (plugin parsiz blocks are exact multiples).
      angle_params: (B, n_frames, 2) float32 — per-frame (pre-frame angle
        in negated turns, per-sample slope) from the resolved angle
        recursion (stream.engine.angle_sequence).
      firlen: plugin FIR length (3072/4096/8192).

    Returns (B, n_frames, P) mixed output frames — the exact stream the
    scan engine emits (parity-tested <1e-5).
    """
    if not stream_mix_supported(firlen):
        raise ValueError(f"mix unsupported for firlen {firlen}")
    return _call(frames, firlen, angle_params, t_blocks)
