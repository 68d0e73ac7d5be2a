"""Gradient-based continuous angle refinement.

Beyond-parity capability: the reference's resolution floor is the 0.5
degree grid (SUBSAMPLE, cli/phase-rotate.cc:38).  Because the whole
pipeline here is differentiable JAX, the peak-vs-angle objective can be
descended *continuously*: starting from the table argmin, a few damped
Newton/gradient steps on a softmax-smoothed peak polish the angle to
arbitrary precision.

The objective ``peak(theta) = max_m |cos(theta) x_d[m] + sin(theta) h[m]|``
is piecewise-smooth in theta; we descend the smoothed
``softpeak_T(theta) = T * logsumexp(|y_m| / T)`` with a temperature
annealed toward the hard max, then report the hard peak at the refined
angle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sizes import OfflineGeometry

__all__ = ["refine_angle", "peak_at_angle"]


def _aligned_pair(x: jnp.ndarray, geom: OfflineGeometry):
    from .sweep import _offline_frames, hilbert_offline

    parsiz, firlen = geom.parsiz, geom.firlen
    n_blocks = _offline_frames(x, parsiz)
    total = (n_blocks + 1) * parsiz
    pad = n_blocks * parsiz - x.shape[-1]
    x_pad = jnp.pad(x, (0, pad + parsiz))
    h = hilbert_offline(x, geom)
    b0 = x_pad[parsiz - firlen : total - firlen]
    b1 = h[parsiz:total]
    return b0, b1


@functools.partial(jax.jit, static_argnames=("geom",))
def peak_at_angle(x: jnp.ndarray, theta_units: jnp.ndarray,
                  geom: OfflineGeometry) -> jnp.ndarray:
    """Hard peak at a *continuous* angle (half-degree units, float)."""
    b0, b1 = _aligned_pair(x, geom)
    rad = theta_units * jnp.float32(np.pi / 360.0) * -1.0
    y = jnp.cos(rad) * b0 + jnp.sin(rad) * b1
    return jnp.max(jnp.abs(y))


@functools.partial(jax.jit, static_argnames=("geom", "steps"))
def _refine_impl(x, theta0, geom: OfflineGeometry, steps: int):
    b0, b1 = _aligned_pair(x, geom)

    def softpeak(theta_units, temp):
        rad = theta_units * jnp.float32(np.pi / 360.0) * -1.0
        y = jnp.abs(jnp.cos(rad) * b0 + jnp.sin(rad) * b1)
        m = jnp.max(y)
        return m + temp * jnp.log(jnp.mean(jnp.exp((y - m) / temp)))

    grad = jax.grad(softpeak)

    def body(carry, i):
        theta, lr = carry
        # anneal the smoothing toward the hard max
        temp = jnp.float32(1e-3) * jnp.exp(-i / jnp.float32(steps / 3.0))
        g = grad(theta, temp)
        theta_new = theta - lr * g
        # backtrack: keep the step only if the hard peak improved
        def hard(t):
            rad = t * jnp.float32(np.pi / 360.0) * -1.0
            return jnp.max(jnp.abs(jnp.cos(rad) * b0 + jnp.sin(rad) * b1))

        improved = hard(theta_new) < hard(theta)
        theta = jnp.where(improved, theta_new, theta)
        lr = jnp.where(improved, lr * 1.1, lr * 0.5)
        return (theta, lr), None

    (theta, _), _ = jax.lax.scan(
        body, (jnp.float32(theta0), jnp.float32(2.0)),
        jnp.arange(steps, dtype=jnp.float32))
    rad = theta * jnp.float32(np.pi / 360.0) * -1.0
    peak = jnp.max(jnp.abs(jnp.cos(rad) * b0 + jnp.sin(rad) * b1))
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
