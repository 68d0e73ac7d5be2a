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


# ---- adversarial hardening (round-2 verdict, weak #5) ----------------------


def _dense_peaks(x, thetas_units):
    """Dense brute-force evaluation of the full sweep objective in
    float64 numpy — the independent oracle the refiner is checked
    against (same map as gradient.peak_at_angle)."""
    from phaserotate_tpu.search.sweep import aligned_pair

    b0, b1, h_start, _ = (np.asarray(a, np.float64)
                          for a in aligned_pair(x[None], GEOM))
    rad = -np.asarray(thetas_units, np.float64)[:, None] * np.pi / 360.0
    aligned = np.max(np.abs(np.cos(rad) * b0 + np.sin(rad) * b1), axis=1)
    return np.maximum(aligned, np.abs(np.sin(rad[:, 0])) * h_start[0])


def _multimodal_sig(n=6000):
    """Harmonic stack with phases chosen so peak-vs-angle has several
    near-equal local minima (adversarial for local refinement)."""
    t = np.arange(n) / 48000.0
    x = np.zeros(n)
    for k, (amp, ph) in enumerate(
            [(0.5, 0.0), (0.28, 2.1), (0.22, 4.0), (0.17, 0.9),
             (0.12, 3.3)], start=1):
        x += amp * np.sin(2 * np.pi * 750 * k * t + ph)
    return (0.8 * x / np.abs(x).max()).astype(np.float32)


def test_refine_beats_dense_grid_near_start():
    """Within its basin the refiner must land on the 0.01-deg brute
    force's minimum: within 2e-5 of the float64 dense oracle (float32
    descent on a kinked max-of-abs objective), and strictly below the
    best 0.5-deg grid point whenever the dense minimum is."""
    x = _multimodal_sig()
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    a0 = int(table.argmin())
    theta, peak = refine_angle(x, a0, GEOM, steps=48)
    dense = np.arange(a0 - 1.0, a0 + 1.0, 0.02)
    dense_min = _dense_peaks(x, dense).min()
    assert peak <= dense_min + 2e-5
    if dense_min < table[a0] - 2e-5:  # sub-grid structure exists
        assert peak < table[a0]  # ...and the refiner captured it


def test_refine_multimodal_from_each_local_minimum():
    """Start the refiner at every local minimum of the coarse table; it
    must improve (or match) each one and stay inside its basin —
    adversarial multi-modal surface."""
    x = _multimodal_sig()
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    # local minima of the circular table
    locs = [a for a in range(360)
            if table[a] <= table[(a - 1) % 360]
            and table[a] <= table[(a + 1) % 360]]
    assert len(locs) >= 3, "surface not multi-modal — bad fixture"
    for a0 in locs[:6]:
        theta, peak = refine_angle(x, a0, GEOM, steps=32)
        assert peak <= table[a0] + 1e-6
        assert abs(theta - a0) <= 4.0  # stays in the local basin


def test_refine_flat_surface_stable():
    """Incommensurate two-tone: the objective is nearly angle-invariant
    (range ~1e-4).  The refiner must stay put and not diverge."""
    t = np.arange(6000) / 48000.0
    x = (0.5 * np.sin(2 * np.pi * 997 * t)
         + 0.31 * np.sin(2 * np.pi * 1601.7 * t + 1.0)).astype(np.float32)
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    a0 = int(table.argmin())
    theta, peak = refine_angle(x, a0, GEOM, steps=32)
    assert np.isfinite(theta) and np.isfinite(peak)
    assert peak <= table[a0] + 1e-6
    assert abs(theta - a0) < 8.0


def test_refine_from_argmax_never_worsens():
    """Convergence-failure posture: even started at the worst angle the
    accepted-step rule guarantees the result never exceeds the start."""
    x = _multimodal_sig()
    table = np.asarray(sweep_peaks(x[None], GEOM))[0]
    a_bad = int(table.argmax())
    p_start = _dense_peaks(x, np.array([float(a_bad)]))[0]
    theta, peak = refine_angle(x, a_bad, GEOM, steps=32)
    assert np.isfinite(peak) and peak <= p_start + 2e-6


def test_refine_degenerate_inputs():
    """Zeros, DC, and a single impulse: finite results, no NaNs, peak
    never above the start (grad of |.| and max at ties must not
    poison the descent)."""
    for x in (np.zeros(4096, np.float32),
              np.full(4096, 0.25, np.float32),
              np.eye(1, 4096, 2048, dtype=np.float32)[0]):
        theta, peak = refine_angle(x, 0, GEOM, steps=16)
        assert np.isfinite(theta) and np.isfinite(peak)
        p0 = _dense_peaks(x, np.array([0.0]))[0]
        assert peak <= p0 + 2e-6


def test_refine_wraparound_start():
    """theta0 at the +180-deg edge (unit 359/360 region): periodic
    objective, refinement proceeds without wrap artifacts."""
    x = _multimodal_sig()
    theta, peak = refine_angle(x, 359, GEOM, steps=24)
    assert np.isfinite(theta) and np.isfinite(peak)
    p0 = _dense_peaks(x, np.array([359.0]))[0]
    assert peak <= p0 + 2e-6
