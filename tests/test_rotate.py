"""Offline rotation: golden/parity tests against independent oracles."""

import numpy as np
import pytest
import scipy.signal

from phaserotate_tpu.ops import (
    fft_convolve,
    partitioned_convolve,
    rotate,
    rotate_fir,
    rotate_spectral,
)
from phaserotate_tpu.core import fir, sizes


def spectral_oracle(x: np.ndarray, degrees: float) -> np.ndarray:
    """Independent numpy/float64 oracle: multiply positive-frequency bins
    by e^{-j theta}; DC/Nyquist scale by cos(theta)."""
    n = len(x)
    theta = np.deg2rad(degrees)
    X = np.fft.rfft(x.astype(np.float64))
    coef = np.full(len(X), np.exp(-1j * theta), complex)
    coef[0] = np.cos(theta)
    if n % 2 == 0:
        coef[-1] = np.cos(theta)
    return np.fft.irfft(X * coef, n=n)


def test_rotate_90_of_sin_is_minus_cos():
    """README.md observable: +90 deg delays phase, sin -> sin(wt - 90deg)
    = -cos(wt)."""
    rate = 48000
    t = np.arange(rate) / rate
    x = np.sin(2 * np.pi * 480.0 * t).astype(np.float32)  # integer # cycles
    y = np.asarray(rotate(x, 90.0))
    want = -np.cos(2 * np.pi * 480.0 * t)
    np.testing.assert_allclose(y, want, atol=1e-4)


@pytest.mark.parametrize("deg", [-135.0, -90.0, -10.0, 0.0, 33.3, 90.0, 180.0])
def test_spectral_matches_oracle(deg, rng):
    x = rng.standard_normal(48000).astype(np.float32)
    y = np.asarray(rotate_spectral(x, deg))
    want = spectral_oracle(x, deg)
    np.testing.assert_allclose(y, want, atol=2e-5)


def test_rotation_preserves_energy(rng):
    x = rng.standard_normal(32768).astype(np.float32)
    for deg in (30.0, 135.0):
        y = np.asarray(rotate_spectral(x, deg))
        np.testing.assert_allclose(
            np.sum(y**2), np.sum(x**2), rtol=1e-4)


def test_rotation_composes(rng):
    """rot(50) . rot(40) == rot(90) — holds on DC/Nyquist-free signals
    (those bins scale by cos(theta), which does not compose)."""
    x = rng.standard_normal(16384).astype(np.float64)
    X = np.fft.rfft(x)
    X[0] = X[-1] = 0.0
    x = np.fft.irfft(X, n=len(x)).astype(np.float32)
    y = rotate_spectral(rotate_spectral(x, 40.0), 50.0)
    z = rotate_spectral(x, 90.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(z), atol=1e-4)


def test_rotate_180_negates(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    y = np.asarray(rotate_spectral(x, 180.0))
    np.testing.assert_allclose(y, -x, atol=1e-5)


def test_fir_matches_spectral_steady_state(sine_sweep):
    """The plugin's FIR path approximates the ideal rotation in-band.

    The reference's 3072-tap windowed FIR rolls off below ~40 Hz at
    44.1 kHz, so errors concentrate at the sweep's subsonic start; in the
    audio band the two paths agree tightly."""
    rate = 44100
    n = 1 << 17
    t = np.arange(n) / rate
    f0, f1 = 500.0, 20000.0
    k = np.log(f1 / f0) / t[-1]
    x = (0.7 * np.sin(2 * np.pi * f0 * (np.exp(k * t) - 1) / k)).astype(
        np.float32)
    deg = 57.0
    y_fir = np.asarray(rotate_fir(x, deg, rate=rate))
    y_ideal = spectral_oracle(x, deg)
    g = sizes.stream_geometry_for_rate(rate)
    sl = slice(g.firlen, len(x) - g.firlen)
    err = np.abs(y_fir[sl] - y_ideal[sl]).max()
    assert err < 5e-3, err


def test_fir_matches_spectral_in_band(rng):
    """A 997 Hz tone rotates near-exactly through the FIR path."""
    rate = 48000
    n = 1 << 16
    t = np.arange(n) / rate
    x = (0.8 * np.sin(2 * np.pi * 997.0 * t)).astype(np.float32)
    for deg in (30.0, 90.0, -120.0):
        y_fir = np.asarray(rotate_fir(x, deg, rate=rate))
        y_ideal = spectral_oracle(x, deg)
        g = sizes.stream_geometry_for_rate(rate)
        sl = slice(g.firlen, n - g.firlen)
        assert np.abs(y_fir[sl] - y_ideal[sl]).max() < 1e-3


def test_rotate_batched_independent_angles(rng):
    x = rng.standard_normal((3, 2, 4096)).astype(np.float32)
    degs = np.array([[10.0, 20.0], [30.0, -40.0], [0.0, 90.0]], np.float32)
    y = np.asarray(rotate(x, degs))
    assert y.shape == x.shape
    for b in range(3):
        for c in range(2):
            want = np.asarray(rotate(x[b, c], degs[b, c]))
            np.testing.assert_allclose(y[b, c], want, atol=1e-6)


def test_angle_clamp_matches_reference(rng):
    """Out-of-range degrees clamp to +-180 via the turns representation
    (src/phaserotate.c:564-571)."""
    x = rng.standard_normal(4096).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rotate(x, 250.0)), np.asarray(rotate(x, 180.0)), atol=1e-6
    )


def test_partitioned_equals_fft_convolve(rng):
    geom = sizes.stream_geometry_for_rate(48000)
    x = rng.standard_normal(10000).astype(np.float32)
    taps = np.asarray(fir.design_hilbert_fir(geom.firlen))
    full = np.asarray(fft_convolve(x, taps))
    spectra = fir.stream_fir_spectra(geom)
    part = np.asarray(partitioned_convolve(x, spectra, geom.parsiz))
    m = min(len(full), part.shape[-1])
    np.testing.assert_allclose(part[:m], full[:m], atol=2e-4)


def test_partitioned_convolve_batched(rng):
    geom = sizes.stream_geometry_for_rate(48000)
    spectra = fir.stream_fir_spectra(geom)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    out = np.asarray(partitioned_convolve(x, spectra, geom.parsiz))
    for c in range(2):
        want = np.asarray(partitioned_convolve(x[c], spectra, geom.parsiz))
        np.testing.assert_allclose(out[c], want, atol=1e-6)
