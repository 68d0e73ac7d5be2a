"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

from phaserotate_tpu.core.angles import MAXSAMPLE, all_angle_cos_sin
from phaserotate_tpu.kernels import peak_kernel, rotate_peak_sweep_kernel
from phaserotate_tpu.ops.peak import rotated_peak_sweep


def test_peak_kernel_matches_numpy(rng):
    for n in (1, 100, 65536, 100001):
        x = rng.standard_normal(n).astype(np.float32)
        got = float(peak_kernel(x))
        assert got == pytest.approx(float(np.abs(x).max()), rel=1e-7)


def test_peak_kernel_negative_peak(rng):
    x = rng.standard_normal(5000).astype(np.float32)
    x[1234] = -7.5
    assert float(peak_kernel(x)) == pytest.approx(7.5)


def test_sweep_kernel_matches_xla_scan(rng):
    n = 30000
    b0 = rng.standard_normal(n).astype(np.float32)
    b1 = rng.standard_normal(n).astype(np.float32)
    cs = all_angle_cos_sin()
    got = np.asarray(rotate_peak_sweep_kernel(b0, b1, cs, tile_len=8192))
    want = np.asarray(rotated_peak_sweep(b0, b1, cs))
    assert got.shape == (MAXSAMPLE,)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sweep_kernel_matches_direct(rng):
    n = 4096
    b0 = rng.standard_normal(n).astype(np.float32)
    b1 = rng.standard_normal(n).astype(np.float32)
    cs = np.asarray(all_angle_cos_sin())
    got = np.asarray(rotate_peak_sweep_kernel(b0, b1, cs, tile_len=2048))
    direct = np.abs(
        cs[0][:, None] * b0[None] + cs[1][:, None] * b1[None]
    ).max(axis=1)
    np.testing.assert_allclose(got, direct, atol=2e-5)
