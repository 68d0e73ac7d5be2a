"""Streaming-state serialization.

The reference never persists its DSP streaming state — ``activate`` resets
it (src/phaserotate.c:511-520) and a host restart loses the overlap ring.
Here the entire engine carry is an explicit pytree (stream/engine.py), so
a live stream checkpoints to disk and resumes sample-exactly: save in one
process, load in another, outputs continue bit-identically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..core.sizes import StreamGeometry
from .engine import StreamState

__all__ = ["save_stream_state", "load_stream_state"]

_FIELDS = ("spec_hist", "time_hist", "tail", "angle")


def save_stream_state(path: str, state: StreamState,
                      geom: Optional[StreamGeometry] = None,
                      host: Optional[dict] = None) -> None:
    """Serialize a :class:`StreamState` (any batch shape) to ``path``.

    ``host`` optionally carries host-shell staging arrays (the partial
    frame and the staged output block a StreamingRotator holds between
    device dispatches) so a resumed stream is bit-identical from the very
    first sample, not just from the next frame boundary.
    """
    payload = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    if geom is not None:
        payload["__geom__"] = np.array(
            [geom.rate, geom.fftlen, geom.firlen], np.float64)
    for k, v in (host or {}).items():
        payload[f"__host_{k}__"] = np.asarray(v)
    np.savez(path, **payload)


def load_stream_state(path: str):
    """Load a stream state; returns (state, geom_or_None, host_dict)."""
    import jax.numpy as jnp

    # allow_pickle=False is numpy's default but stated explicitly: a
    # checkpoint is untrusted input and must never deserialize objects
    with np.load(path, allow_pickle=False) as z:
        state = StreamState(
            **{f: jnp.asarray(z[f]) for f in _FIELDS})
        geom = None
        if "__geom__" in z.files:
            rate, fftlen, firlen = z["__geom__"]
            geom = StreamGeometry(
                rate=float(rate), fftlen=int(fftlen), firlen=int(firlen))
        host = {
            k[len("__host_"):-2]: z[k]
            for k in z.files if k.startswith("__host_")
        }
    return state, geom, host
