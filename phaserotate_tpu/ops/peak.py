"""Peak scanning and level math.

XLA-level equivalents of the reference's hand-written SIMD peak kernels
(cli/dsp_peak_calc.h — AVX/SSE2/NEON/vDSP ``dsp_compute_peak``) and of the
rotated-peak evaluator (cli/phase-rotate.cc:98-121).  On TPU the VPU
vectorizes the abs-max reduction and the MXU evaluates *all* candidate
angles of the sweep as one matmul; see also kernels/rotate_peak.py for the
fully-fused Pallas version.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_peak", "rotated_peak", "rotated_peak_sweep", "coeff_to_db"]


def compute_peak(buf: jnp.ndarray, current=0.0) -> jnp.ndarray:
    """max(|buf|) folded with a running peak (dsp_peak_calc.h:27)."""
    buf = jnp.asarray(buf)
    peak = jnp.max(jnp.abs(buf), axis=-1) if buf.size else jnp.float32(0)
    return jnp.maximum(jnp.asarray(current, jnp.float32), peak)


def rotated_peak(b0: jnp.ndarray, b1: jnp.ndarray, sa, ca, current=0.0):
    """Peak of ``ca*b0 + sa*b1`` (cli/phase-rotate.cc:98-121)."""
    x = jnp.asarray(ca) * b0 + jnp.asarray(sa) * b1
    return compute_peak(x, current)


def rotated_peak_sweep(
    b0: jnp.ndarray,
    b1: jnp.ndarray,
    cos_sin: jnp.ndarray,
    chunk: int = 65536,
) -> jnp.ndarray:
    """Peak of ``cos[a]*b0 + sin[a]*b1`` for every angle ``a`` at once.

    Args:
      b0, b1: (n,) float32 — aligned input and Hilbert signals.
      cos_sin: (2, A) float32 — stacked [cos; sin] rows
        (core/angles.all_angle_cos_sin).
      chunk: samples per tile; the (chunk, 2) x (2, A) product and its
        abs-max reduce stay fused so the (n, A) rotation matrix is never
        materialized in HBM.

    Returns (A,) float32 peaks — the whole 720-angle sweep of
    cli/phase-rotate.cc:409-428 in one batched MXU pass.
    """
    n = b0.shape[-1]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        b0 = jnp.pad(b0, (0, pad))
        b1 = jnp.pad(b1, (0, pad))
    stacked = jnp.stack([b0, b1], axis=-1).reshape(n_chunks, chunk, 2)

    def body(carry, xs):
        prod = jnp.dot(
            xs, cos_sin, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.maximum(carry, jnp.max(jnp.abs(prod), axis=0)), None

    init = jnp.zeros((cos_sin.shape[-1],), jnp.float32)
    peaks, _ = jax.lax.scan(body, init, stacked)
    return peaks


def coeff_to_db(coeff) -> jnp.ndarray:
    """Linear coefficient -> dBFS; -inf below 1e-15
    (cli/phase-rotate.cc:76-83)."""
    coeff = jnp.asarray(coeff, jnp.float32)
    return jnp.where(
        coeff < 1e-15,
        jnp.float32(-np.inf),
        20.0 * jnp.log10(jnp.maximum(coeff, 1e-30)),
    )
