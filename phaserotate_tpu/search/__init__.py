"""Minimum-peak angle search: batched sweep + CLI-parity selection."""

from typing import Optional

import numpy as np

from ..core.angles import SUBSAMPLE
from ..core.sizes import OfflineGeometry, offline_geometry
from .minimize import SearchResult, select_min_peak_angles
from .sweep import apply_angles, hilbert_offline, sweep_peaks, sweep_peaks_aux

__all__ = [
    "SearchResult",
    "apply_angles",
    "find_min_peak_angle",
    "hilbert_offline",
    "select_min_peak_angles",
    "sweep_peaks",
    "sweep_peaks_aux",
]


def find_min_peak_angle(
    audio,
    rate: int = 48000,
    stride: int = 12 * SUBSAMPLE,
    link_channels: bool = False,
    blksiz: int = 0,
    geom: Optional[OfflineGeometry] = None,
) -> SearchResult:
    """Find the phase-rotation angle(s) minimizing the digital peak.

    Mirrors ``phase-rotate <file>`` (cli/phase-rotate.cc:779-948): same
    block geometry, same coarse stride + 7 % candidate tolerance + fine
    refinement + channel unwrapping — evaluated from one batched sweep.

    Args:
      audio: (n,) mono or (channels, n) float array.
      rate: sample rate (sets the default block size, rate/8 -> pow2).
      stride: coarse step in half-degree units (CLI ``-s``).
      link_channels: minimize the downmixed peak (CLI ``-l``).
      blksiz: explicit block size (CLI ``-f``), 0 = derive from rate.

    Returns a :class:`SearchResult` with per-channel angles in degrees.
    """
    x = np.atleast_2d(np.asarray(audio, np.float32))
    if geom is None:
        geom = offline_geometry(rate, blksiz)
    table, rot0 = sweep_peaks_aux(x, geom)
    return select_min_peak_angles(
        np.asarray(table),
        stride=stride,
        link_channels=link_channels,
        rot0=np.asarray(rot0),
    )


def refine_angle(audio, theta0_units, geom, steps: int = 24):
    """Continuous sub-grid refinement (lazy import; see
    phaserotate_tpu.search.gradient)."""
    from .gradient import refine_angle as _impl

    return _impl(audio, theta0_units, geom, steps=steps)
