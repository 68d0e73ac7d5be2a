"""Gradient-based continuous angle refinement.

Beyond-parity capability: the reference's resolution floor is the 0.5
degree grid (SUBSAMPLE, cli/phase-rotate.cc:38).  Because the whole
pipeline here is differentiable JAX, the peak-vs-angle objective can be
descended *continuously*: starting from the table argmin, a few damped
gradient steps on a softmax-smoothed peak polish the angle to arbitrary
precision.

The objective matches the full sweep evaluation map (sweep.aligned_pair):

    peak(theta) = max( max_m |cos t * x_d[m] + sin t * h[m]|,
                       |sin t| * h_start )

including the start-block term, so the reported value is the realized
output peak.  Descent runs on the smoothed ``softpeak_T`` with a
temperature annealed toward the hard max; steps are kept only when the
hard peak improves, so the result is always <= the starting grid point.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sizes import OfflineGeometry

__all__ = ["refine_angle", "peak_at_angle"]

_RAD = np.float32(np.pi / 360.0)  # half-degree units -> radians, negated


def _operands(x: jnp.ndarray, geom: OfflineGeometry):
    from .sweep import aligned_pair

    b0, b1, h_start, _ = aligned_pair(x, geom)
    return b0, b1, h_start


def _hard_peak(theta_units, b0, b1, h_start):
    rad = theta_units * _RAD * -1.0
    sa = jnp.sin(rad)
    aligned = jnp.max(jnp.abs(jnp.cos(rad) * b0 + sa * b1))
    return jnp.maximum(aligned, jnp.abs(sa) * h_start)


@functools.partial(jax.jit, static_argnames=("geom",))
def peak_at_angle(x: jnp.ndarray, theta_units: jnp.ndarray,
                  geom: OfflineGeometry) -> jnp.ndarray:
    """Hard peak at a *continuous* angle (half-degree units, float),
    over the complete sweep evaluation map incl. the start block."""
    b0, b1, h_start = _operands(x, geom)
    return _hard_peak(theta_units, b0, b1, h_start)


@functools.partial(jax.jit, static_argnames=("geom", "steps"))
def _refine_impl(x, theta0, geom: OfflineGeometry, steps: int):
    b0, b1, h_start = _operands(x, geom)

    def softpeak(theta_units, temp):
        rad = theta_units * _RAD * -1.0
        sa = jnp.sin(rad)
        y = jnp.abs(jnp.cos(rad) * b0 + sa * b1)
        y = jnp.concatenate([y, (jnp.abs(sa) * h_start)[None]])
        m = jnp.max(y)
        return m + temp * jnp.log(jnp.mean(jnp.exp((y - m) / temp)))

    grad = jax.grad(softpeak)

    def body(carry, i):
        theta, lr, cur = carry
        # anneal the smoothing toward the hard max
        temp = jnp.float32(1e-3) * jnp.exp(-i / jnp.float32(steps / 3.0))
        g = grad(theta, temp)
        theta_new = theta - lr * g
        # backtrack: keep the step only if the hard peak improved (the
        # accepted peak rides the carry — one hard evaluation per step)
        new_peak = _hard_peak(theta_new, b0, b1, h_start)
        improved = new_peak < cur
        theta = jnp.where(improved, theta_new, theta)
        cur = jnp.where(improved, new_peak, cur)
        lr = jnp.where(improved, lr * 1.1, lr * 0.5)
        return (theta, lr, cur), None

    t0 = jnp.float32(theta0)
    p0 = _hard_peak(t0, b0, b1, h_start)
    (theta, _, peak), _ = jax.lax.scan(
        body, (t0, jnp.float32(2.0), p0),
        jnp.arange(steps, dtype=jnp.float32))
    return theta, peak


def refine_angle(
    audio,
    theta0_units: float,
    geom: OfflineGeometry,
    steps: int = 24,
) -> Tuple[float, float]:
    """Polish a candidate angle continuously.

    Args:
      audio: (n,) one channel.
      theta0_units: starting angle in half-degree units (e.g. the table
        argmin from the grid sweep).
      steps: descent iterations.

    Returns (theta_units_float, peak): the refined sub-grid angle and its
    realized peak — always <= the starting grid point's peak.
    """
    x = jnp.asarray(audio, jnp.float32)
    t, p = _refine_impl(x, float(theta0_units), geom, steps)
    return float(t), float(p)
