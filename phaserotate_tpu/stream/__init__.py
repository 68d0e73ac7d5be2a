"""Streaming engine: lax.scan OLA core + host-blocksize wrapper."""

from .engine import (
    StreamState,
    init_state,
    rotate_streamed,
    stream_process,
    stream_process_bulk,
    stream_step,
)
from .host import StreamingRotator

__all__ = [
    "StreamState",
    "StreamingRotator",
    "init_state",
    "rotate_streamed",
    "stream_process",
    "stream_process_bulk",
    "stream_step",
]

from .checkpoint import load_stream_state, save_stream_state

__all__ += ["load_stream_state", "save_stream_state"]
