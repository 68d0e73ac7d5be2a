"""Metering subsystem: peak / momentary / gain-diff ballistics.

Functional re-design of the plugin's meter state machine
(src/phaserotate.c:451-509, 573-611, 832-838):

* momentary meter: rises instantly, holds 0.5 s, then falls at 15 dB/s
  (hold time src/phaserotate.c:303, falloff :832-838);
* peak-hold meter: all-time max until an explicit reset;
* gain-diff meter: running min/max of the momentary out/in ratio
  (:730-739), with a delayed reset `latency` samples after an angle change
  so the ratio never mixes pre/post-change audio (:497-509, 611);
* the input meter is time-aligned to the output through a `latency`-sample
  delay line (:575-609).

Everything is a pytree of scalars/small arrays updated by pure jittable
functions — vmap over channels for multichannel metering.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


__all__ = [
    "MeterConfig",
    "MeterState",
    "MeterLevels",
    "init_meter_state",
    "meter_falloff",
    "meter_block",
    "reset_peaks",
    "delay_line_update",
]

FALL_DB_PER_S = 15.0  # src/phaserotate.c:834
HOLD_SECONDS = 0.5  # src/phaserotate.c:303
DIFF_GATE = 0.001  # src/phaserotate.c:731


@dataclasses.dataclass(frozen=True)
class MeterConfig:
    """Static meter configuration."""

    rate: float
    latency: int

    @property
    def hold_samples(self) -> int:
        """Momentary hold time in samples (src/phaserotate.c:303)."""
        return int(HOLD_SECONDS * self.rate + 0.5)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeterState:
    """Per-channel meter carry.

    Index 0 of each pair is the input meter, 1 the output meter
    (src/phaserotate.c:67-72).
    """

    momentary: jnp.ndarray  # (2,) f32
    peak: jnp.ndarray  # (2,) f32
    holdcnt: jnp.ndarray  # (2,) i32
    diff: jnp.ndarray  # (2,) f32: [min, max] ratio
    reset_delay: jnp.ndarray  # () i32
    dly: jnp.ndarray  # (latency,) f32 input delay line


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeterLevels:
    """One block's meter outputs — the 9 fields of the `levels` atom
    (src/phaserotate.c:749-768)."""

    in_cur: jnp.ndarray
    in_mom: jnp.ndarray
    in_peak: jnp.ndarray
    out_cur: jnp.ndarray
    out_mom: jnp.ndarray
    out_peak: jnp.ndarray
    diff_cur: jnp.ndarray
    diff_min: jnp.ndarray
    diff_max: jnp.ndarray


def init_meter_state(cfg: MeterConfig, channels: Tuple[int, ...] = ()) -> MeterState:
    """Fresh meters (channel_init + activate,
    src/phaserotate.c:147-157, 489-495, 511-519).

    ``reset_delay`` starts at ``latency`` like activate() does (:518)."""
    shape = tuple(channels)
    return MeterState(
        momentary=jnp.zeros((*shape, 2), jnp.float32),
        peak=jnp.zeros((*shape, 2), jnp.float32),
        holdcnt=jnp.zeros((*shape, 2), jnp.int32),
        diff=jnp.ones((*shape, 2), jnp.float32),
        reset_delay=jnp.full(shape, cfg.latency, jnp.int32),
        dly=jnp.zeros((*shape, cfg.latency), jnp.float32),
    )


def meter_falloff(rate: float, n_samples: int) -> jnp.ndarray:
    """Per-block momentary decay multiplier for a 15 dB/s fall
    (src/phaserotate.c:832-838)."""
    tme = jnp.float32(n_samples) / jnp.float32(rate)
    return jnp.power(jnp.float32(10.0), -0.05 * FALL_DB_PER_S * tme)


def _meter_proc(mom, peak, holdcnt, new_peak, hold_samples, fpp, falloff):
    """One meter's ballistics step (src/phaserotate.c:451-470)."""
    new_peak = jnp.where(jnp.isfinite(new_peak), new_peak, 0.0)
    peak = jnp.maximum(peak, new_peak)
    rises = new_peak > mom
    holding = holdcnt > 0
    mom_next = jnp.where(
        rises,
        new_peak,
        jnp.where(holding, mom, mom * falloff + 1e-20),
    )
    holdcnt_next = jnp.where(
        rises,
        hold_samples,
        jnp.where(holding, holdcnt - fpp, holdcnt),
    )
    return mom_next, peak, holdcnt_next, new_peak


def delay_line_update(dly: jnp.ndarray, block: jnp.ndarray):
    """Push ``block`` through the delay line; returns (delayed_block, dly').

    Functional form of the plugin's input-meter alignment buffer
    (src/phaserotate.c:575-608; the reference's byte shuffling — including
    the index slip in its manual memmove fallback at :586-588 — reduces to
    exactly this concat/split)."""
    combined = jnp.concatenate([dly, block], axis=-1)
    n = block.shape[-1]
    return combined[..., :n], combined[..., n:]


@functools.partial(jax.jit, static_argnames=("hold_samples",))
def meter_block(
    state: MeterState,
    in_block: jnp.ndarray,
    out_block: jnp.ndarray,
    falloff: jnp.ndarray,
    hold_samples: int,
    angle_changed: jnp.ndarray,
) -> Tuple[MeterState, MeterLevels]:
    """Process one host block's metering.

    Args:
      state: current meters (one channel; vmap for more).
      in_block: (n,) the channel's raw input this block.
      out_block: (n,) the rotated output this block.
      falloff: per-block decay factor (:func:`meter_falloff` — recompute
        when the host block size changes, src/phaserotate.c:833).
      hold_samples: momentary hold in samples.
      angle_changed: bool — target angle != current angle this block;
        schedules the delayed diff reset (src/phaserotate.c:611).

    Returns (new_state, levels-for-this-block).
    """
    n = in_block.shape[-1]
    latency = state.dly.shape[-1]

    delayed, dly = delay_line_update(state.dly, in_block)
    lvl_in_raw = jnp.max(jnp.abs(delayed))
    lvl_out_raw = jnp.max(jnp.abs(out_block))

    mom0, peak0, hold0, lvl_in = _meter_proc(
        state.momentary[0], state.peak[0], state.holdcnt[0],
        lvl_in_raw, hold_samples, n, falloff)

    # delayed meter reset runs BEFORE the output meter ballistics
    # (src/phaserotate.c:611 precedes :728): while the reset window is
    # open, diff pins to 1 and the output momentary restarts from 0 so the
    # block's own output peak re-seeds it immediately (:497-509).
    resetting = state.reset_delay > 0
    diff_min = jnp.where(resetting, 1.0, state.diff[0])
    diff_max = jnp.where(resetting, 1.0, state.diff[1])
    mom1_pre = jnp.where(resetting, 0.0, state.momentary[1])
    reset_delay = jnp.where(
        resetting, state.reset_delay - n, state.reset_delay)
    reset_delay = jnp.where(
        angle_changed, latency + n, reset_delay)

    mom1, peak1, hold1, lvl_out = _meter_proc(
        mom1_pre, state.peak[1], state.holdcnt[1],
        lvl_out_raw, hold_samples, n, falloff)

    # gain-diff ratio (src/phaserotate.c:730-739)
    gated = (mom0 > DIFF_GATE) & (mom1 > DIFF_GATE)
    ratio = jnp.where(gated, mom1 / jnp.maximum(mom0, 1e-30), 1.0)
    diff_min = jnp.where(gated & (ratio < diff_min), ratio, diff_min)
    diff_max = jnp.where(gated & (ratio > diff_max), ratio, diff_max)

    new_state = MeterState(
        momentary=jnp.stack([mom0, mom1]),
        peak=jnp.stack([peak0, peak1]),
        holdcnt=jnp.stack([hold0, hold1]),
        diff=jnp.stack([diff_min, diff_max]),
        reset_delay=reset_delay,
        dly=dly,
    )
    levels = MeterLevels(
        in_cur=lvl_in, in_mom=mom0, in_peak=peak0,
        out_cur=lvl_out, out_mom=mom1, out_peak=peak1,
        diff_cur=ratio, diff_min=diff_min, diff_max=diff_max,
    )
    return new_state, levels


def reset_peaks(state: MeterState) -> MeterState:
    """GUI 'reset_peaks' message (src/phaserotate.c:489-495)."""
    return dataclasses.replace(
        state,
        peak=jnp.zeros_like(state.peak),
        diff=jnp.ones_like(state.diff),
        momentary=jnp.zeros_like(state.momentary),
    )
