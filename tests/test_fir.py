"""FIR design parity: closed form, scipy oracle, partition consistency."""

import numpy as np
import pytest
import scipy.signal

from phaserotate_tpu.core import fir, sizes


def closed_form_fir(length: int) -> np.ndarray:
    """Independent closed-form series for the reference FIR.

    irfft of spec[k] = j*(-1)^k (DC/Nyquist imag parts discarded by the
    real transform) is
        x[n] = -(2/L) * sum_{k=1}^{L/2-1} (-1)^k sin(2 pi k n / L)
    then Hann windowed.
    """
    L = length
    n = np.arange(L)[:, None]
    k = np.arange(1, L // 2)[None, :]
    x = -(2.0 / L) * np.sum((-1.0) ** k * np.sin(2 * np.pi * k * n / L), axis=1)
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(L) / L))
    return x * hann


@pytest.mark.parametrize("length", [64, 3072, 4096])
def test_fir_matches_closed_form(length):
    got = np.asarray(fir.design_hilbert_fir(length))
    want = closed_form_fir(length)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fir_is_negated_delayed_hilbert():
    """Convolving with the FIR approximates -H(x) delayed by firlen/2."""
    L = 3072
    taps = np.asarray(fir.design_hilbert_fir(L), np.float64)
    rate = 48000
    t = np.arange(8192) / rate
    x = np.sin(2 * np.pi * 1000.0 * t)
    y = np.convolve(x, taps)[L // 2 : L // 2 + len(x)]
    # H(sin) = -cos, so -H(sin) = cos. Compare away from edges.
    want = np.cos(2 * np.pi * 1000.0 * t)
    sl = slice(L, len(x) - L)
    np.testing.assert_allclose(y[sl], want[sl], atol=1e-3)


def test_fir_frequency_response_flat():
    """|G(f)| ~ 1 in the passband (loudness preservation)."""
    L = 3072
    taps = np.asarray(fir.design_hilbert_fir(L), np.float64)
    w, h = scipy.signal.freqz(taps, worN=4096, fs=48000)
    band = (w > 400) & (w < 23000)
    mag = np.abs(h[band])
    assert mag.max() < 1.001 and mag.min() > 0.995


def test_partition_spectra_shapes_and_consistency():
    geom = sizes.stream_geometry_for_rate(48000)
    spectra_ri = np.asarray(fir.stream_fir_spectra(geom))
    assert spectra_ri.shape == (geom.n_segm, geom.parsiz + 1, 2)
    spectra = spectra_ri[..., 0] + 1j * spectra_ri[..., 1]
    # Partition s spectrum == rfft of that segment zero-padded.
    taps = np.asarray(fir.design_hilbert_fir(geom.firlen))
    for s in [0, geom.n_segm // 2, geom.n_segm - 1]:
        seg = taps[s * geom.parsiz : (s + 1) * geom.parsiz]
        want = np.fft.rfft(np.concatenate([seg, np.zeros(geom.parsiz)]))
        np.testing.assert_allclose(spectra[s], want, atol=1e-4)


def test_offline_fir_spectrum_geometry():
    geom = sizes.OfflineGeometry(blksiz=4096)
    spec = np.asarray(fir.offline_fir_spectrum(geom))
    assert spec.shape == (geom.parsiz + 1, 2)


def test_sizing_tables():
    g = sizes.stream_geometry_for_rate(44100)
    assert (g.fftlen, g.firlen, g.parsiz, g.n_segm, g.latency) == (
        512, 3072, 256, 12, 1792)
    g = sizes.stream_geometry_for_rate(96000)
    assert (g.fftlen, g.firlen, g.latency, g.n_segm) == (1024, 4096, 2560, 8)
    g = sizes.stream_geometry_for_rate(192000)
    assert (g.fftlen, g.firlen, g.latency, g.n_segm) == (2048, 8192, 5120, 8)


def test_default_blksiz():
    # rate/8 rounded up to pow2, clamped (cli/phase-rotate.cc:749-755)
    assert sizes.default_blksiz(44100) == 8192
    assert sizes.default_blksiz(48000) == 8192
    assert sizes.default_blksiz(96000) == 16384
    assert sizes.default_blksiz(8000) == 1024
    assert sizes.default_blksiz(48000, requested=2000) == 2048
    assert sizes.default_blksiz(48000, requested=40000) == 8192
