"""Streaming phase-rotation engine.

Functional re-design of the plugin's real-time path
(src/phaserotate.c:538-772).  The C version keeps a mutable input ring
(``buf_src``), re-FFTs every FIR partition's input segment on every block
(12 forward FFTs per 256 samples at 48 kHz), and overlap-adds into
``buf_out``.  Here the state is an explicit pytree carried through
``lax.scan`` and the engine keeps a *frequency delay line*: each input frame
is transformed once and its spectrum retained for the next ``n_segm``
blocks, so a block costs exactly one forward and one inverse FFT plus
``n_segm`` complex multiply-adds — strictly less work than the reference,
with identical arithmetic (the FFT of a frame does not depend on when it is
taken).

Latency and block semantics match the plugin exactly: output lags input by
``parsiz + firlen/2`` samples, the mix happens one ``parsiz`` block after
the input completes, and per-sample angle interpolation follows
src/phaserotate.c:673-709 (rate clamp ``parsiz*1e-6`` turns/sample,
wrap-around at +-180 deg).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.angles import degrees_to_turns
from ..core.fir import stream_fir_spectra
from ..core.sizes import StreamGeometry, stream_geometry_for_rate

__all__ = [
    "StreamState",
    "init_state",
    "stream_step",
    "stream_step_batched",
    "stream_process",
    "stream_process_batched",
    "rotate_streamed",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamState:
    """Per-channel streaming carry.

    Attributes:
      spec_hist: (n_segm, parsiz+1, 2) float32 — ri-format spectra of the
        last n_segm input frames, newest first (frequency delay line).
        Real/imag pairs rather than complex64 so the state pytree can cross
        the host<->device boundary (utils/cplx.py).
      time_hist: (n_segm//2 + 1, parsiz) float32 — recent input frames,
        newest first; row n_segm//2 is the FIR-group-delay-aligned input
        (the reference reads it from the ring at src/phaserotate.c:664-670).
      tail: (parsiz,) float32 — overlap-add tail of the previous inverse
        FFT (``time_data[parsiz:]``, src/phaserotate.c:633).
      angle: () float32 — current angle in negated turns
        (src/phaserotate.c:54).
    """

    spec_hist: jnp.ndarray
    time_hist: jnp.ndarray
    tail: jnp.ndarray
    angle: jnp.ndarray


def init_state(geom: StreamGeometry, channels: Tuple[int, ...] = ()) -> StreamState:
    """Zeroed state — the plugin's ``activate`` (src/phaserotate.c:511-520).

    ``channels`` prepends batch dims, e.g. ``(2,)`` for stereo; all engine
    functions broadcast over leading state dims via vmap.
    """
    shape = tuple(channels)
    return StreamState(
        spec_hist=jnp.zeros(
            (*shape, geom.n_segm, geom.parsiz + 1, 2), jnp.float32
        ),
        time_hist=jnp.zeros((*shape, geom.n_segm // 2 + 1, geom.parsiz), jnp.float32),
        tail=jnp.zeros((*shape, geom.parsiz), jnp.float32),
        angle=jnp.zeros(shape, jnp.float32),
    )


def _mix_block(
    delayed_in: jnp.ndarray,
    hilb: jnp.ndarray,
    angle: jnp.ndarray,
    target: jnp.ndarray,
    geom: StreamGeometry,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation mix with click-free per-sample interpolation
    (src/phaserotate.c:673-717).  Returns (out_block, new_angle)."""
    parsiz = geom.parsiz
    twopi = jnp.float32(2.0 * jnp.pi)

    da = target - angle
    # wrap around at +-180 deg (src/phaserotate.c:676-683)
    da = jnp.where(jnp.abs(da) > 0.5, da - jnp.sign(da) * 1.0, da)
    da = da * jnp.float32(geom.interp_nm)
    thresh = jnp.float32(geom.interp_th)
    clipped = jnp.abs(da) > thresh
    da = jnp.clip(da, -thresh, thresh)

    idx = jnp.arange(parsiz, dtype=jnp.float32)
    angles = angle + da * idx  # sample i uses the pre-increment angle
    rad = angles * twopi
    out_interp = jnp.cos(rad) * delayed_in + jnp.sin(rad) * hilb

    # steady state: constant coefficients (src/phaserotate.c:710-717)
    rad0 = angle * twopi
    out_const = jnp.cos(rad0) * delayed_in + jnp.sin(rad0) * hilb

    interpolating = target != angle
    out = jnp.where(interpolating, out_interp, out_const)
    new_angle = jnp.where(
        interpolating,
        jnp.where(clipped, angle + da * parsiz, target),
        angle,
    )
    return out.astype(jnp.float32), new_angle


@functools.partial(jax.jit, static_argnames=("geom",))
def stream_step(
    state: StreamState,
    frame: jnp.ndarray,
    target_degrees: jnp.ndarray,
    geom: StreamGeometry,
) -> Tuple[StreamState, jnp.ndarray]:
    """Process one ``parsiz``-sample input frame; returns the output frame
    that the plugin would emit while the *next* frame streams in.

    The block body mirrors src/phaserotate.c:629-719 with the FFT schedule
    hoisted into the frequency delay line.
    """
    from ..utils.cplx import from_ri, to_ri

    fir_spectra = from_ri(stream_fir_spectra(geom))
    target = degrees_to_turns(target_degrees)

    spec = jnp.fft.rfft(frame, n=geom.fftlen)  # zero-padded to fftlen
    spec_hist_c = jnp.concatenate(
        [spec[None], from_ri(state.spec_hist[:-1])], axis=0
    )
    spec_hist = to_ri(spec_hist_c)
    time_hist = jnp.concatenate([frame[None], state.time_hist[:-1]], axis=0)

    # sum_s X[s] * FIR[s]  (src/phaserotate.c:640-655)
    freq_sum = jnp.sum(spec_hist_c * fir_spectra, axis=0)
    y = jnp.fft.irfft(freq_sum, n=geom.fftlen)

    hilb = state.tail + y[: geom.parsiz]  # overlap-add (:660-662)
    tail = y[geom.parsiz :]

    delayed_in = time_hist[geom.n_segm // 2]  # firlen/2 delay (:664-670)
    out, new_angle = _mix_block(delayed_in, hilb, state.angle, target, geom)

    return (
        StreamState(spec_hist=spec_hist, time_hist=time_hist, tail=tail,
                    angle=new_angle),
        out,
    )


@functools.partial(jax.jit, static_argnames=("geom",))
def stream_step_batched(
    state: StreamState,
    frames: jnp.ndarray,
    target_degrees: jnp.ndarray,
    geom: StreamGeometry,
) -> Tuple[StreamState, jnp.ndarray]:
    """:func:`stream_step` vmapped over a leading channel/batch axis.

    One device dispatch advances every channel — the idiomatic TPU
    replacement for the reference's thread-per-channel fan-out
    (cli/phase-rotate.cc:437-444): channels ride the batch axis of the
    same FFTs instead of separate threads.

    Args:
      state: batched state from ``init_state(geom, (channels,))``.
      frames: (channels, parsiz) float32.
      target_degrees: (channels,) float32.
    """
    return jax.vmap(
        lambda s, f, t: stream_step(s, f, t, geom)
    )(state, frames, jnp.asarray(target_degrees, jnp.float32))


@functools.partial(jax.jit, static_argnames=("geom",))
def stream_process(
    state: StreamState,
    frames: jnp.ndarray,
    target_degrees: jnp.ndarray,
    geom: StreamGeometry,
) -> Tuple[StreamState, jnp.ndarray]:
    """Scan :func:`stream_step` over ``frames`` (n_frames, parsiz).

    ``target_degrees`` is per-frame (n_frames,) — the control-port value the
    plugin would read at each block boundary.
    """

    def body(carry, xs):
        frame, tgt = xs
        return stream_step(carry, frame, tgt, geom)

    return jax.lax.scan(body, state, (frames, target_degrees))


@functools.partial(jax.jit, static_argnames=("geom",))
def stream_process_batched(
    state: StreamState,
    frames: jnp.ndarray,
    target_degrees: jnp.ndarray,
    geom: StreamGeometry,
) -> Tuple[StreamState, jnp.ndarray]:
    """Scan over frames AND vmap over channels in one dispatch.

    Args:
      state: batched state from ``init_state(geom, (channels,))``.
      frames: (channels, n_frames, parsiz) float32.
      target_degrees: (channels,) float32 — one control read per host
        block, shared by every frame in it (src/phaserotate.c:564 reads
        the port once per run()).

    Returns (new_state, (channels, n_frames, parsiz) outputs).  The host
    shells use this to advance any number of complete frames in a single
    device round trip (a 256-sample-frame stream pushed in 8192-sample
    host blocks costs 1 dispatch instead of 32).
    """
    targets = jnp.asarray(target_degrees, jnp.float32)

    def per_channel(st, fr, tgt):
        return stream_process(
            st, fr, jnp.full((fr.shape[0],), tgt), geom)

    return jax.vmap(per_channel)(state, frames, targets)


def rotate_streamed(
    audio,
    degrees,
    rate: float = 48000.0,
    geom: StreamGeometry | None = None,
    trim_latency: bool = True,
):
    """Rotate a whole signal through the streaming engine.

    Convenience wrapper reproducing exactly what an LV2 host pushing the
    full file through the plugin would get.  With ``trim_latency`` the
    ``parsiz + firlen/2`` delay is removed so the result aligns with
    :func:`phaserotate_tpu.ops.rotate`.
    """
    if geom is None:
        geom = stream_geometry_for_rate(rate)
    x = jnp.asarray(audio, jnp.float32)
    n = x.shape[-1]
    parsiz = geom.parsiz
    # pad with latency worth of silence so the tail flushes
    pad_frames = -(-(n + geom.latency) // parsiz)
    total = pad_frames * parsiz
    x_pad = jnp.pad(x, (0, total - n))
    frames = x_pad.reshape(pad_frames, parsiz)
    targets = jnp.full((pad_frames,), jnp.float32(degrees))

    state = init_state(geom)
    _, out_frames = stream_process(state, frames, targets, geom)
    y = out_frames.reshape(total)
    if trim_latency:
        # the scan output already absorbs the parsiz pipeline delay (frame k
        # of the output is computed from input frame k); only the FIR group
        # delay remains.
        return y[geom.firlat : geom.firlat + n]
    return jnp.concatenate([jnp.zeros(parsiz, jnp.float32), y])[: n + geom.latency]
