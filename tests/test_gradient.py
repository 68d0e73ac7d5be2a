"""Gradient-based continuous angle refinement (beyond-parity capability)."""

import numpy as np
import pytest

from phaserotate_tpu.core.sizes import OfflineGeometry
from phaserotate_tpu.search import find_min_peak_angle, sweep_peaks
from phaserotate_tpu.search.gradient import peak_at_angle, refine_angle

GEOM = OfflineGeometry(blksiz=1024)


def _sig(n=6000):
    t = np.arange(n) / 48000.0
    return (0.6 * np.sin(2 * np.pi * 997 * t)
            + 0.35 * np.sin(2 * np.pi * 1994 * t + 0.7)
            + 0.15 * np.sin(2 * np.pi * 2991 * t + 1.9)).astype(np.float32)


def test_peak_at_angle_matches_table():
    x = _sig()
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    for a in (17, 100, 255):
        p = float(peak_at_angle(x, np.float32(a), GEOM))
        # continuous evaluation covers all aligned samples; table also
        # folds the start-block term, so compare loosely from above
        assert p <= table[a] + 1e-5


def test_refine_improves_on_grid():
    """The continuous refinement must do at least as well as the 0.5-deg
    grid minimum, usually strictly better."""
    x = _sig()
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    a0 = int(table.argmin())
    theta, peak = refine_angle(x, a0, GEOM)
    assert peak <= table[a0] + 1e-6
    # refined angle stays in the neighborhood
    assert abs(theta - a0) < 4.0


def test_refine_from_poor_start():
    x = _sig()
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    a0 = int(table.argmin())
    theta, peak = refine_angle(x, a0 + 3, GEOM, steps=40)
    assert peak <= table[(a0 + 3) % 360] + 1e-6
