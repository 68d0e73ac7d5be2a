"""Fused OLA convolution kernel: matmul-FFT pipeline entirely in VMEM.

One Pallas kernel computes, per ``parsiz``-sample block,

    h = OLA( irfft( rfft(block) * FIR ) )

with both transforms as 4-step Cooley-Tukey *matmuls on the MXU* and the
overlap-add tail carried in kernel scratch across sequential grid steps.
HBM sees each sample exactly twice (read block, write h) — the XLA FFT
path materializes every intermediate.

Key structural trick: the forward 4-step (left matmul, twiddle, right
matmul) leaves the spectrum in digit-reversed ``[k1][k2]`` order, and the
inverse is formulated to *consume exactly that order* (right matmul by
conj(W2), conjugate twiddle, left matmul by conj(W1)) and emit natural
sample order — so the whole pipeline needs no transposes, flips, or
strided accesses, the operations TPUs are worst at.  The FIR spectrum is
pre-arranged in the same ``[k1][k2]`` layout with the inverse
normalization folded in.

Real input is exploited twice: the zero-padded half of each FFT frame
drops half of the first forward matmul, and only the real part of the
final inverse matmul is computed.  Matmuls run at HIGHEST precision
(f32-accurate) to hold the framework's 1e-5 parity budget.
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
    "fused_ola_conv",
    "fused_hilbert",
    "fused_rotate_fir",
    "mix_supported",
    "supported_parsiz",
    "fused_parsiz_for",
    "fir_kk_layout",
    "hilbert_fir_kk",
]

_PREC = jax.lax.Precision.HIGHEST

# the batch grid dim is embarrassingly parallel (per-batch OLA state
# resets at tile 0); the tile dim carries the OLA tail sequentially.
# Measured +5% on a multi-core chip, bit-identical results.
_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "arbitrary"))


def _split(m: int) -> Tuple[int, int]:
    """4-step factorization (n1, n2) of an m-point FFT.

    The lane factor n2 is pinned to 64 for m >= 8192 so frame tiles stay
    (rows, 64) and the paired kernel variant keeps every matmul at
    K >= 128 (full MXU depth); smaller m falls back to the near-square
    split."""
    if m >= 8192:
        return m // 64, 64
    p = m.bit_length() - 1
    n1 = 1 << ((p + 1) // 2)  # prefer larger row dim (sublane-major)
    return n1, m // n1


def supported_parsiz(parsiz: int) -> bool:
    """Kernel supports power-of-two partition sizes in [2048, 16384]:
    below, a 4-step factor drops under 64 (not MXU-shaped); above, the
    (fftlen/64, 64) DFT matrices alone would eat most of VMEM (65536-pt
    W1 is 4 MB per real/imag half)."""
    return (2048 <= parsiz <= 16384
            and (parsiz & (parsiz - 1)) == 0)


def fused_parsiz_for(firlen: int) -> int:
    """Single-partition size hosting a ``firlen``-tap FIR: the FIR is
    zero-padded up to the next supported power of two (3072 -> 4096; the
    padded taps are zeros, so the convolution is unchanged)."""
    p = 2048
    while p < firlen:
        p <<= 1
    return p


@functools.lru_cache(maxsize=8)
def _fft_consts(fftlen: int):
    """Forward/inverse DFT matrices + twiddles, numpy float32."""
    n1, n2 = _split(fftlen)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / fftlen)
    f = lambda a: a.astype(np.float32)
    return (
        n1, n2,
        f(w1.real), f(w1.imag),
        f(w2.real), f(w2.imag),
        f(tw.real), f(tw.imag),
    )


def fir_kk_layout(fir_spectrum_ri: np.ndarray, fftlen: int) -> np.ndarray:
    """Arrange an rfft FIR spectrum (fftlen/2+1, 2) into the kernel's
    full-spectrum ``[k1][k2]`` layout with 1/fftlen folded in.

    Returns (n1, n2, 2) float32.
    """
    n1, n2 = _split(fftlen)
    half = np.asarray(fir_spectrum_ri, np.float32)
    hr, hi = half[..., 0], half[..., 1]
    m = fftlen // 2
    full_r = np.concatenate([hr, hr[1:m][::-1]])
    full_i = np.concatenate([hi, -hi[1:m][::-1]])
    k = np.arange(fftlen)
    k1 = k % n1
    k2 = k // n1
    out = np.zeros((n1, n2, 2), np.float32)
    out[k1, k2, 0] = full_r / fftlen
    out[k1, k2, 1] = full_i / fftlen
    return out


def _make_kernel(n1: int, n2: int, t_blocks: int, mix_rows: int = 0):
    rows_in = n1 // 2  # zero-padded half of each frame drops these rows
    assert t_blocks % 2 == 0 and n2 < 128  # guaranteed by _split

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=_PREC, preferred_element_type=jnp.float32)

    def body(refs):
        # frames/out blocks are (1, t_blocks, rows_in, n2): keeping each
        # frame pre-shaped as a 2-D (rows_in, n2) tile means the Mosaic
        # lowering never sees a 1-D 4096-wide reshape (which violates the
        # (8, 128) tiling rule and crashed the TPU compile in round 1).
        #
        # Frames are processed in PAIRS side by side in the lane axis
        # (every supported geometry has n2 = 64, see _split): the
        # right-side DFT matmul becomes one (.., 2*n2) @ blkdiag(W2) dot
        # and the left matmuls double their N — measured 1.40x over
        # per-frame dots on-chip (K=n2 dots underfill the MXU), with
        # bit-identical results (the blkdiag zeros contribute exactly
        # nothing).  Twiddle/FIR operands arrive pre-tiled to (n1, 2*n2).
        if mix_rows:
            # cs is a scalar-prefetch arg (full (B, 2) array in SMEM,
            # indexed by the batch grid position)
            (cs, w1r_h, w1i_h, w2rB, w2iB, twr2, twi2, w1r, w1i,
             h4r2, h4i2, frames, out, tail, xprev) = refs
        else:
            (w1r_h, w1i_h, w2rB, w2iB, twr2, twi2, w1r, w1i,
             h4r2, h4i2, frames, out, tail) = refs
            cs = xprev = None
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            tail[:] = jnp.zeros_like(tail)
            if mix_rows:
                xprev[:] = jnp.zeros_like(xprev)

        for t in range(0, t_blocks, 2):
            a = frames[0, t]
            b = frames[0, t + 1]
            a2 = jnp.concatenate([a, b], axis=1)  # (rows_in, 2*n2)
            # forward: B = W1[:, :rows] @ A   (real input)
            br = dot(w1r_h[:], a2)
            bi = dot(w1i_h[:], a2)
            # forward twiddle
            cr = br * twr2[:] - bi * twi2[:]
            ci = br * twi2[:] + bi * twr2[:]
            # D = C @ blkdiag(W2, W2) -> per-frame spectra, [k1][k2] order
            dr = dot(cr, w2rB[:]) - dot(ci, w2iB[:])
            di = dot(cr, w2iB[:]) + dot(ci, w2rB[:])
            # FIR multiply (1/fftlen folded into h4)
            er = dr * h4r2[:] - di * h4i2[:]
            ei = dr * h4i2[:] + di * h4r2[:]
            # inverse consumes [k1][k2]: E @ conj(blkdiag W2)
            fr = dot(er, w2rB[:]) + dot(ei, w2iB[:])
            fi = dot(ei, w2rB[:]) - dot(er, w2iB[:])
            # conjugate twiddle
            gr = fr * twr2[:] + fi * twi2[:]
            gi = fi * twr2[:] - fr * twi2[:]
            # real part of conj(W1) @ G -> natural sample order, paired
            y2 = dot(w1r[:], gr) + dot(w1i[:], gi)  # (n1, 2*n2)
            ya = y2[:, :n2]
            yb = y2[:, n2:]
            # sequential overlap-add across the pair
            head_a = ya[:rows_in] + tail[:]
            tail_a = ya[rows_in:]
            head_b = yb[:rows_in] + tail_a
            tail[:] = yb[rows_in:]
            if mix_rows:
                # rotation mix fused in: the FIR group delay is a whole
                # number of (n2-wide) rows, so the delayed dry signal is
                # a pure sublane shift carried in the xprev scratch —
                # out = ca*x[m - delay] + sa*(fir*x)[m], and the Hilbert
                # stream never touches HBM (src/phaserotate.c:700 role)
                keep = rows_in - mix_rows
                bidx = pl.program_id(0)
                ca = cs[bidx, 0]
                sa = cs[bidx, 1]
                delayed_a = jnp.concatenate([xprev[:], a[:keep]], axis=0)
                xprev_a = a[keep:]
                delayed_b = jnp.concatenate([xprev_a, b[:keep]], axis=0)
                xprev[:] = b[keep:]
                out[0, t] = ca * delayed_a + sa * head_a
                out[0, t + 1] = ca * delayed_b + sa * head_b
            else:
                out[0, t] = head_a
                out[0, t + 1] = head_b

    def kernel(*refs):
        body(refs)

    return kernel


@functools.partial(jax.jit, static_argnames=("parsiz", "t_blocks"))
def fused_ola_conv(
    frames: jnp.ndarray,
    fir_kk: jnp.ndarray,
    parsiz: int,
    t_blocks: int = 4,
) -> jnp.ndarray:
    """Single-partition OLA convolution of framed signals.

    Args:
      frames: (B, n_blocks, parsiz) float32 — consecutive input blocks
        (implicitly zero-padded to fftlen = 2*parsiz each).
      fir_kk: (n1, n2, 2) float32 — FIR spectrum from
        :func:`fir_kk_layout`.
      parsiz: partition size (power of two >= 2048).
      t_blocks: blocks per grid step.

    Returns (B, n_blocks*parsiz) float32: the linear convolution stream
    ``h[m] = (fir * x)[m]`` for m < n_blocks*parsiz (identical arithmetic
    to ops.convolve.partitioned_convolve's head; run one extra zero block
    through for the tail).
    """
    return _fused_call(frames, fir_kk, parsiz, t_blocks, cs=None,
                       mix_rows=0)


def _fused_call(frames, fir_kk, parsiz, t_blocks, cs, mix_rows):
    """Shared pallas_call plumbing for the conv-only and rotate-mix
    variants."""
    fftlen = 2 * parsiz
    if not supported_parsiz(parsiz):
        raise ValueError(f"unsupported parsiz {parsiz}")
    (n1, n2, w1r, w1i, w2r, w2i, twr, twi) = _fft_consts(fftlen)
    b, n_blocks, _ = frames.shape
    if t_blocks % 2:  # frames are processed in pairs
        t_blocks += 1
    pad_blocks = (-n_blocks) % t_blocks
    if pad_blocks:
        frames = jnp.pad(frames, ((0, 0), (0, pad_blocks), (0, 0)))
        n_blocks += pad_blocks
    n_tiles = n_blocks // t_blocks

    rows_in = n1 // 2
    # pre-shape every frame as a (rows_in, n2) tile: sample m of a frame
    # sits at [m // n2, m % n2] — the layout both matmul stages consume
    # and emit, so the kernel body is reshape-free
    frames = frames.reshape(b, n_blocks, rows_in, n2)
    w1r_h = jnp.asarray(w1r[:, :rows_in])
    w1i_h = jnp.asarray(w1i[:, :rows_in])

    def widen(m):  # lane-tile an (r, n2) operand for the frame pair
        return jnp.asarray(np.tile(m, (1, 2)))

    def blkdiag(m):
        z = np.zeros_like(m)
        return jnp.asarray(np.block([[m, z], [z, m]]))

    kk = jnp.asarray(fir_kk)
    consts = [
        (w1r_h, (n1, rows_in)),
        (w1i_h, (n1, rows_in)),
        (blkdiag(w2r), (2 * n2, 2 * n2)),
        (blkdiag(w2i), (2 * n2, 2 * n2)),
        (widen(twr), (n1, 2 * n2)),
        (widen(twi), (n1, 2 * n2)),
        (jnp.asarray(w1r), (n1, n1)),
        (jnp.asarray(w1i), (n1, n1)),
        (jnp.tile(kk[..., 0], (1, 2)), (n1, 2 * n2)),
        (jnp.tile(kk[..., 1], (1, 2)), (n1, 2 * n2)),
    ]

    # index_maps are variadic: under PrefetchScalarGridSpec they receive
    # the scalar-prefetch ref as a trailing argument
    const_specs = [
        pl.BlockSpec(shape, (lambda b_, i_, *_, r=len(shape): (0,) * r),
                     memory_space=pltpu.VMEM)
        for _, shape in consts
    ]

    in_specs = const_specs + [
        pl.BlockSpec((1, t_blocks, rows_in, n2),
                     lambda b_, i_, *_: (b_, i_, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [c for c, _ in consts] + [frames]
    out_spec = pl.BlockSpec(
        (1, t_blocks, rows_in, n2), lambda b_, i_, *_: (b_, i_, 0, 0),
        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n_blocks, rows_in, n2),
                                     jnp.float32)
    scratch = [pltpu.VMEM((n1 // 2, n2), jnp.float32)]
    cost = pl.CostEstimate(
        flops=b * n_blocks * 12 * n1 * n1 * n2 * 2,
        bytes_accessed=b * n_blocks * parsiz * 8,
        transcendentals=0,
    )
    if mix_rows:
        # per-batch-element (ca, sa) ride scalar prefetch: the whole
        # (B, 2) table sits in SMEM, indexed by the batch grid position
        scratch.append(pltpu.VMEM((mix_rows, n2), jnp.float32))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_tiles),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            _make_kernel(n1, n2, t_blocks, mix_rows),
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            compiler_params=_PARAMS,
            interpret=use_interpret(),
        )(jnp.asarray(cs, jnp.float32), *inputs)
    else:
        out = pl.pallas_call(
            _make_kernel(n1, n2, t_blocks, mix_rows),
            grid=(b, n_tiles),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=_PARAMS,
            interpret=use_interpret(),
        )(*inputs)
    h = out.reshape(b, n_blocks * parsiz)
    if pad_blocks:
        h = h[:, : (n_blocks - pad_blocks) * parsiz]
    return h


@functools.lru_cache(maxsize=16)
def _hilbert_fir_kk_np(firlen: int, parsiz: int) -> np.ndarray:
    """Hilbert FIR (``firlen`` taps, core/fir.py design), zero-padded to a
    single ``parsiz``-tap partition, in the kernel's [k1][k2] layout."""
    from ..core.fir import _design_hilbert_fir_np

    fir = np.pad(_design_hilbert_fir_np(firlen), (0, parsiz - firlen))
    spec = np.fft.rfft(np.pad(fir, (0, parsiz)))  # fftlen = 2*parsiz
    ri = np.stack([spec.real, spec.imag], -1).astype(np.float32)
    return fir_kk_layout(ri, 2 * parsiz)


def hilbert_fir_kk(firlen: int, parsiz: int) -> jnp.ndarray:
    return jnp.asarray(_hilbert_fir_kk_np(firlen, parsiz))


def fused_hilbert(
    x: jnp.ndarray,
    firlen: int,
    parsiz: int | None = None,
    t_blocks: int = 16,
) -> jnp.ndarray:
    """Full linear convolution of ``x`` (..., n) with the ``firlen``-tap
    Hilbert FIR via the fused MXU kernel.

    Returns (..., n_frames*parsiz) with ``n_frames = ceil(n/parsiz) + 1``
    — the head of the linear convolution stream, covering every index of
    ``fir * x`` up to at least ``n + parsiz`` (the extra flush frame
    drains the OLA tail).  Identical arithmetic to
    ``ops.convolve.partitioned_convolve`` (parity-tested <3e-6); measured
    ~1.4x the XLA FFT path on-chip for the 48k stream geometry.
    """
    if parsiz is None:
        parsiz = fused_parsiz_for(firlen)
    if not supported_parsiz(parsiz) or firlen > parsiz:
        raise ValueError(f"unsupported (firlen={firlen}, parsiz={parsiz})")
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    b = 1
    for d in batch_shape:
        b *= d
    n_frames = -(-n // parsiz) + 1  # + flush frame for the tail
    pad = n_frames * parsiz - n
    xp = jnp.pad(x.reshape(b, n), ((0, 0), (0, pad)))
    frames = xp.reshape(b, n_frames, parsiz)
    kk = hilbert_fir_kk(firlen, parsiz)
    h = fused_ola_conv(frames, kk, parsiz, t_blocks=t_blocks)
    return h.reshape(*batch_shape, n_frames * parsiz)


def mix_supported(firlen: int, parsiz: int | None = None) -> bool:
    """True when the rotation mix can fuse into the kernel: the
    partition size must be kernel-supported and the FIR group delay a
    whole number of sublane rows."""
    if parsiz is None:
        parsiz = fused_parsiz_for(firlen)
    if not supported_parsiz(parsiz) or firlen > parsiz:
        return False
    n2 = _split(2 * parsiz)[1]
    rows = (firlen // 2) // n2
    return (firlen // 2) % n2 == 0 and rows % 8 == 0 and rows < parsiz // n2


def fused_rotate_fir(
    x: jnp.ndarray,
    turns: jnp.ndarray,
    firlen: int,
    t_blocks: int = 16,
) -> jnp.ndarray:
    """Complete FIR phase rotation in ONE kernel pass:

        out[m] = cos(2*pi*turns)*x[m] + sin(2*pi*turns)*(fir*x)[m + lat]

    (the reference's rotation mix, src/phaserotate.c:700, with the
    ``lat = firlen/2`` group delay compensated).  HBM sees each sample
    exactly twice — read x, write out; the Hilbert stream lives only in
    VMEM.  Identical result to ``rotate_fir``'s unfused path
    (parity-tested <3e-6).

    Args:
      x: (..., n) float32.
      turns: negated-turns angle, broadcastable to ``x.shape[:-1]``
        (core/angles.degrees_to_turns).
    """
    from ..core.angles import sin_cos_turns

    parsiz = fused_parsiz_for(firlen)
    if not mix_supported(firlen, parsiz):
        raise ValueError(f"mix not supported for firlen {firlen}")
    n2 = _split(2 * parsiz)[1]
    mix_rows = (firlen // 2) // n2
    lat = firlen // 2

    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    b = 1
    for d in batch_shape:
        b *= d
    sa, ca = sin_cos_turns(turns)
    cs = jnp.stack(
        [jnp.broadcast_to(ca, batch_shape).reshape(b),
         jnp.broadcast_to(sa, batch_shape).reshape(b)], axis=-1)

    n_frames = -(-(n + lat) // parsiz)  # stream must cover n + lat
    pad = n_frames * parsiz - n
    xp = jnp.pad(x.reshape(b, n), ((0, 0), (0, pad)))
    frames = xp.reshape(b, n_frames, parsiz)
    kk = hilbert_fir_kk(firlen, parsiz)
    out = _fused_call(frames, kk, parsiz, t_blocks, cs, mix_rows)
    return out[:, lat : lat + n].reshape(*batch_shape, n)
