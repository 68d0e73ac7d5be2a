"""Utilities: complex representation, profiling, misc DSP helpers."""

from .cplx import from_ri, np_to_ri, to_ri

__all__ = ["from_ri", "np_to_ri", "to_ri"]

from .checkpoint import SweepCheckpoint
from .profiling import StageTimer, device_trace, sync

__all__ += ["StageTimer", "SweepCheckpoint", "device_trace", "sync"]
