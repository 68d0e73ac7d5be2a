"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from phaserotate_tpu.core.angles import MAXSAMPLE
from phaserotate_tpu.core.sizes import OfflineGeometry
from phaserotate_tpu.ops import rotate_fir
from phaserotate_tpu.parallel import (
    batch_find_min_peak_angles,
    batch_rotate,
    batch_sweep_peaks,
    file_mesh,
    shard_files,
    sharded_sweep_peaks,
)
from phaserotate_tpu.search import find_min_peak_angle, sweep_peaks_aux

GEOM = OfflineGeometry(blksiz=1024)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return file_mesh(8)


def _signals(rng, files, n):
    t = np.arange(n) / 48000.0
    return np.stack([
        (0.6 * np.sin(2 * np.pi * (300 + 37 * i) * t + i)
         + 0.4 * np.sin(2 * np.pi * (700 + 11 * i) * t)).astype(np.float32)
        for i in range(files)
    ])


def test_batch_rotate_matches_single(rng, mesh):
    x = _signals(rng, 8, 4096)
    degs = np.linspace(-120, 120, 8).astype(np.float32)
    y = np.asarray(batch_rotate(x, degs, mesh))
    for i in range(8):
        want = np.asarray(rotate_fir(x[i], degs[i], rate=48000.0))
        np.testing.assert_allclose(y[i], want, atol=1e-5)


def test_batch_sweep_matches_single(rng, mesh):
    x = _signals(rng, 8, 3000)[:, None, :]  # (files, 1 chn, n)
    tables, rot0 = batch_sweep_peaks(x, GEOM, mesh)
    tables = np.asarray(tables)
    for i in range(8):
        want, want_r = sweep_peaks_aux(x[i], GEOM)
        np.testing.assert_allclose(tables[i], np.asarray(want), atol=1e-5)


def test_batch_find_min_matches_single(rng, mesh):
    x = _signals(rng, 8, 3000)[:, None, :]
    results = batch_find_min_peak_angles(x, GEOM, mesh)
    assert len(results) == 8
    for i in range(8):
        want = find_min_peak_angle(x[i], rate=48000, blksiz=GEOM.blksiz)
        assert results[i].angles_units == want.angles_units


def test_sharded_sweep_matches_unsharded(rng, mesh):
    """Sequence-parallel sweep (halo exchange + pmax) == single-device
    sweep of the same signal."""
    n = 6 * GEOM.parsiz  # 6 blocks -> with flush 7, padded to 8 shards
    x = _signals(rng, 1, n)[0]
    peaks_sh, rot0_sh = sharded_sweep_peaks(x, GEOM, mesh, axis="files")
    want, want_rot0 = sweep_peaks_aux(x[None], GEOM)
    np.testing.assert_allclose(
        np.asarray(peaks_sh), np.asarray(want)[0], atol=2e-5)
    np.testing.assert_allclose(
        float(rot0_sh), float(np.asarray(want_rot0)[0]), atol=2e-5)


def test_sharded_sweep_long_signal(rng, mesh):
    n = 40000  # not block aligned
    x = _signals(rng, 1, n)[0]
    peaks_sh, _ = sharded_sweep_peaks(x, GEOM, mesh, axis="files")
    want, _ = sweep_peaks_aux(x[None], GEOM)
    np.testing.assert_allclose(
        np.asarray(peaks_sh), np.asarray(want)[0], atol=2e-5)


def test_sharded_sweep_2d_mesh(rng):
    """files x samples 2-D mesh: sequence parallelism composed with data
    parallelism matches per-file unsharded sweeps."""
    from phaserotate_tpu.parallel import grid_mesh

    mesh2 = grid_mesh(2, 4)
    n = 4 * 4 * GEOM.parsiz - 333
    x = _signals(rng, 2, n)
    peaks, rot0 = sharded_sweep_peaks(
        x, GEOM, mesh2, axis="samples", file_axis="files")
    want, want_r = sweep_peaks_aux(x, GEOM)
    np.testing.assert_allclose(
        np.asarray(peaks), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(rot0), np.asarray(want_r), atol=2e-5)


def test_batch_find_min_chunked(rng, mesh):
    """OOM-safe chunking returns identical results to one big dispatch."""
    x = _signals(rng, 11, 3000)[:, None, :]  # 11 files: not mesh-divisible
    full = batch_find_min_peak_angles(x, GEOM, mesh)
    chunked = batch_find_min_peak_angles(
        x, GEOM, mesh, max_files_per_call=8)
    assert len(full) == len(chunked) == 11
    for a, b in zip(full, chunked):
        assert a.angles_units == b.angles_units


def test_stem_batch_96k_stereo(rng, mesh):
    """BASELINE config 4: stereo stems at 96 kHz rotated at independent
    per-stem angles in one batch."""
    files, n = 8, 9600
    t = np.arange(n) / 96000.0
    x = np.stack([
        np.stack([
            (0.5 * np.sin(2 * np.pi * (200 + 30 * i) * t + c)).astype(
                np.float32)
            for c in range(2)
        ]) for i in range(files)
    ])  # (files, 2, n)
    degs = rng.uniform(-180, 180, (files, 2)).astype(np.float32)
    y = np.asarray(batch_rotate(x, degs, mesh, rate=96000.0))
    assert y.shape == x.shape
    # spot check two stems against the single-file path
    for i in (0, 5):
        want = np.asarray(rotate_fir(x[i], degs[i], rate=96000.0))
        np.testing.assert_allclose(y[i], want, atol=1e-5)


def test_mesh_raises_on_insufficient_devices():
    """Silently shrinking the mesh would mis-shard the fleet — must raise
    (round-1 verdict, weak #7)."""
    from phaserotate_tpu.parallel.mesh import file_mesh, grid_mesh

    with pytest.raises(ValueError, match="device"):
        file_mesh(99)
    with pytest.raises(ValueError, match="device"):
        grid_mesh(16, 16)


def test_sharded_rotate_matches_unsharded(rng, mesh):
    """Sequence-parallel rotation (two-sided ppermute halo) == rotate_fir
    on the whole signal, incl. the zero-padded edges."""
    from phaserotate_tpu.parallel import sharded_rotate

    n = 8 * 6000 - 777  # not mesh-divisible
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(sharded_rotate(x, 35.0, mesh, firlen=3072,
                                    axis="files"))
    want = np.asarray(rotate_fir(x, 35.0, firlen=3072))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_rotate_2d_mesh(rng):
    """files x samples composition: per-file angles, samples halo."""
    from phaserotate_tpu.parallel import grid_mesh, sharded_rotate

    mesh2 = grid_mesh(2, 4)
    n = 4 * 7000 + 123
    x = rng.standard_normal((2, n)).astype(np.float32)
    degs = np.array([35.0, -120.0], np.float32)
    got = np.asarray(sharded_rotate(x, degs, mesh2, firlen=3072,
                                    axis="samples", file_axis="files"))
    for i in range(2):
        want = np.asarray(rotate_fir(x[i], degs[i], firlen=3072))
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_sharded_rotate_shard_too_small(rng, mesh):
    from phaserotate_tpu.parallel import sharded_rotate

    with pytest.raises(ValueError, match="halo"):
        sharded_rotate(np.zeros(4000, np.float32), 0.0, mesh,
                       firlen=3072, axis="files")


def test_angle_sharded_sweep_matches_unsharded(rng, mesh):
    """Angle-grid sharding (the domain's tensor parallelism): sliced
    sweeps all_gather into the exact full table."""
    from phaserotate_tpu.parallel import angle_sharded_sweep_peaks

    geom = OfflineGeometry(blksiz=1024)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    got, rot0 = angle_sharded_sweep_peaks(x, geom, mesh, axis="files")
    want, want_rot0 = sweep_peaks_aux(x, geom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(rot0), np.asarray(want_rot0),
                               atol=2e-6)
    # mono 1-D input path
    g1, r1 = angle_sharded_sweep_peaks(x[0], geom, mesh, axis="files")
    np.testing.assert_allclose(np.asarray(g1), np.asarray(want)[0],
                               atol=2e-6)
