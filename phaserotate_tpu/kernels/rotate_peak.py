"""Pallas TPU kernels: fused rotate-and-peak reduction.

The TPU counterpart of the reference's hand-written SIMD kernels
(cli/dsp_peak_calc.h — AVX/SSE2/NEON `dsp_compute_peak`) and of the fused
rotate+scan inner loop (`calc_rotated_peak`, cli/phase-rotate.cc:98-121):
one pass over the samples computes ``ca*x + sa*h`` for *every* candidate
angle tile on the MXU and folds the abs-max on the VPU, never
materializing the (samples x angles) rotation matrix in HBM.

Grid iterations on TPU run sequentially per core, so the kernels
accumulate their running max into a single output block across grid steps
— the Pallas idiom for the reference's `pk = max(pk, ...)` carry
(dsp_peak_calc.h:27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.angles import MAXSAMPLE

__all__ = ["peak_kernel", "rotate_peak_sweep_kernel", "on_tpu",
           "use_interpret"]

_LANES = 128


def on_tpu() -> bool:
    """True on a real TPU backend (incl. the tunneled 'axon' platform) —
    the single platform predicate for every kernel/dispatch decision."""
    return jax.default_backend() in ("tpu", "axon")


def use_interpret() -> bool:
    """Pallas interpret mode off-TPU (CPU test mesh)."""
    return not on_tpu()


def _peak_body(x_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile_max = jnp.max(jnp.abs(x_ref[:]), axis=0, keepdims=True)  # (1, L)
    out_ref[:] = jnp.maximum(out_ref[:], tile_max)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def peak_kernel(x: jnp.ndarray, tile_rows: int = 512) -> jnp.ndarray:
    """max(|x|) over a 1-D signal via a tiled Pallas reduction.

    Functional parity with ``dsp_compute_peak`` (cli/dsp_peak_calc.h:27):
    the alignment prologue/horizontal-max epilogue of the SIMD versions
    map to zero padding and a final lane reduce.
    """
    n = x.shape[-1]
    per_tile = tile_rows * _LANES
    n_tiles = max(1, -(-n // per_tile))
    pad = n_tiles * per_tile - n
    xp = jnp.pad(x, (0, pad)).reshape(n_tiles * tile_rows, _LANES)

    out = pl.pallas_call(
        _peak_body,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, _LANES), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, _LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
        interpret=use_interpret(),
    )(xp)
    return jnp.max(out)


def _sweep_body(cs_ref, s_ref, out_ref):
    i = pl.program_id(1)  # tile index (dim 0 is the batch element)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # (A, 1) * (1, T) broadcasts: every candidate angle's rotation of this
    # sample tile, abs-max folded before anything leaves VMEM.  With a
    # contraction depth of only 2 the VPU beats the MXU here — and stays
    # exact f32, where the MXU's default bf16 passes round to ~1e-2.
    # Samples ride the lane axis; a (T, 2) layout would pad its 2-wide
    # lane dim to 128 and blow out VMEM 64x.
    ca = cs_ref[:, 0:1]  # (A, 1)
    sa = cs_ref[:, 1:2]
    b0 = s_ref[0, 0:1, :]  # (1, T)
    b1 = s_ref[0, 1:2, :]
    prod = ca * b0 + sa * b1  # (A, T) on the VPU
    tile_max = jnp.max(jnp.abs(prod), axis=1, keepdims=True)  # (A, 1)
    out_ref[0] = jnp.maximum(out_ref[0], tile_max)


@functools.partial(jax.jit, static_argnames=("tile_len",))
def rotate_peak_sweep_kernel(
    b0: jnp.ndarray,
    b1: jnp.ndarray,
    cos_sin: jnp.ndarray,
    tile_len: int = 2048,
) -> jnp.ndarray:
    """Fused angle-sweep peak: ``peaks[..., a] = max_m |cos[a]*b0[..., m]
    + sin[a]*b1[..., m]|``.

    Args:
      b0, b1: (..., n) float32 aligned dry/Hilbert signals; leading dims
        (files, channels, ...) become a sequential batch grid axis.
      cos_sin: (2, A) float32 stacked [cos; sin] — the full MAXSAMPLE
        table, or an angle SLICE (the angle-parallel path shards the
        grid over devices; VPU work scales with the padded slice size).
      tile_len: samples per grid step (lane-axis width; the (A, T)
        product must fit scoped VMEM: a_pad*T*4 bytes).

    Returns (..., A) float32 — the candidates of the reference's serial
    sweep (cli/phase-rotate.cc:409-428) in one kernel launch for the
    whole batch.
    """
    batch_shape = b0.shape[:-1]
    n = b0.shape[-1]
    bsz = 1
    for d in batch_shape:
        bsz *= d
    n_tiles = max(1, -(-n // tile_len))
    pad = n_tiles * tile_len - n
    pad_cfg = [(0, 0)] * (b0.ndim - 1) + [(0, pad)]
    s = jnp.stack([jnp.pad(b0, pad_cfg), jnp.pad(b1, pad_cfg)], axis=-2)
    s = s.reshape(bsz, 2, n_tiles * tile_len)

    a = cos_sin.shape[-1]
    a_pad = max(8, -(-a // 8) * 8)  # sublane multiple
    cs_t = jnp.pad(cos_sin.T, ((0, a_pad - a), (0, 0)))  # (A_pad, 2)

    out = pl.pallas_call(
        _sweep_body,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (a_pad, 2), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, tile_len), lambda b, i: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, a_pad, 1), lambda b, i: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, a_pad, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_tiles * tile_len * a_pad,
            bytes_accessed=bsz * n_tiles * tile_len * 2 * 4 + a_pad * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=use_interpret(),
    )(cs_t, s)
    return out[:, :a, 0].reshape(*batch_shape, a)
