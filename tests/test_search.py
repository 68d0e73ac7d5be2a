"""Angle search: parity against the literal CLI simulator + properties."""

import numpy as np
import pytest

from phaserotate_tpu.core.angles import MAXSAMPLE, SUBSAMPLE
from phaserotate_tpu.core.sizes import OfflineGeometry
from phaserotate_tpu.search import (
    apply_angles,
    find_min_peak_angle,
    select_min_peak_angles,
    sweep_peaks,
    sweep_peaks_aux,
)

from ref_cli_sim import RefRotate

GEOM = OfflineGeometry(blksiz=1024)


def make_signal(rng, n_chn, n):
    """Asymmetric multi-tone: has a well-defined peak-vs-angle structure."""
    t = np.arange(n) / 48000.0
    out = []
    for c in range(n_chn):
        x = (
            0.6 * np.sin(2 * np.pi * 997.0 * t + c)
            + 0.35 * np.sin(2 * np.pi * 1994.0 * t + 0.7 + c)
            + 0.15 * np.sin(2 * np.pi * 2991.0 * t + 1.9)
        )
        out.append(x)
    return np.asarray(out, np.float32)


def test_sweep_matches_cli_simulator_full_resolution(rng):
    x = make_signal(rng, 2, 2600)
    table = np.asarray(sweep_peaks(x, GEOM))

    sim = RefRotate(GEOM.blksiz, 2)
    sim.analyze_file(x, 0, MAXSAMPLE, 1)
    np.testing.assert_allclose(table, sim.peak, atol=3e-5)


def test_sweep_matches_cli_simulator_mono(rng):
    x = make_signal(rng, 1, 4000)
    table = np.asarray(sweep_peaks(x, GEOM))
    sim = RefRotate(GEOM.blksiz, 1)
    sim.analyze_file(x, 0, MAXSAMPLE, 1)
    np.testing.assert_allclose(table, sim.peak, atol=3e-5)


def test_sweep_rot0_aux_matches_simulator(rng):
    """The aux rotated-at-0 value equals what a fine window crossing 360
    writes into table slot 0."""
    x = make_signal(rng, 1, 2600)
    _, rot0 = sweep_peaks_aux(x, GEOM)
    sim = RefRotate(GEOM.blksiz, 1)
    # window [336, 360] evaluates wrapped 0 via the generic path
    sim.analyze_file(x, 336, 361, 1)
    np.testing.assert_allclose(np.asarray(rot0)[0], sim.peak[0][0], atol=3e-5)


def test_apply_matches_cli_simulator(rng):
    """Block-aligned file length: bit-close parity with the CLI apply path."""
    x = make_signal(rng, 2, 3 * GEOM.blksiz)
    angles = [70, -44]
    y = np.asarray(apply_angles(x, np.asarray(angles), GEOM))
    sim = RefRotate(GEOM.blksiz, 2)
    want = sim.apply_file(x, angles)
    assert want.shape == y.shape == x.shape
    np.testing.assert_allclose(y, want, atol=3e-5)


def test_apply_partial_tail_is_gapless(rng):
    """Documented deviation: for file lengths with a partial final block
    the reference CLI mis-splices the last `latency` samples (the write
    count follows the read count, skipping stream positions
    [n, B*blksiz) — cli/phase-rotate.cc:963-991, no memset when
    latency <= n_read < blksiz).  The framework instead produces the
    gapless ideal: head and interior match the simulator, and the tail
    equals the whole-signal FIR rotation."""
    x = make_signal(rng, 1, 3000)
    angles = [70]
    y = np.asarray(apply_angles(x, np.asarray(angles), GEOM))
    sim = RefRotate(GEOM.blksiz, 1)
    want = sim.apply_file(x, angles)
    # interior identical
    np.testing.assert_allclose(y[:, :2488], want[:, :2488], atol=3e-5)
    # framework tail: continuous (equals rotating the padded signal)
    x_long = np.concatenate([x, np.zeros((1, 1096), np.float32)], axis=1)
    y_long = np.asarray(apply_angles(x_long, np.asarray(angles), GEOM))
    np.testing.assert_allclose(y, y_long[:, :3000], atol=1e-6)


def test_apply_zero_angle_identity(rng):
    x = make_signal(rng, 1, 2600)
    y = np.asarray(apply_angles(x, np.zeros(1, np.int32), GEOM))
    np.testing.assert_allclose(y, x, atol=2e-6)


def test_apply_negative_wraps_to_negated(rng):
    """-10 deg wraps to 170 deg = negation of +(-10+180); reference
    convention (cli/phase-rotate.cc:463)."""
    x = make_signal(rng, 1, 2600)
    y_neg = np.asarray(apply_angles(x, np.asarray([-20]), GEOM))
    y_wrap = np.asarray(apply_angles(x, np.asarray([340]), GEOM))
    np.testing.assert_allclose(y_neg, y_wrap, atol=1e-7)


def test_peak_table_periodicity(rng):
    """Rotating by a+180 deg negates the signal: same peak. The table's
    180-degree period is why MAXSAMPLE covers only half the circle."""
    x = make_signal(rng, 1, 2600)
    y1 = np.asarray(apply_angles(x, np.asarray([50]), GEOM))
    y2 = np.asarray(apply_angles(x, np.asarray([50 + MAXSAMPLE]), GEOM))
    np.testing.assert_allclose(y1, y2, atol=1e-7)


def test_selection_matches_simulator_procedure(rng):
    """End-to-end: select_min_peak_angles on the batched table equals the
    simulator running the CLI's literal coarse+fine+unwrap procedure."""
    x = make_signal(rng, 2, 3000)
    res = find_min_peak_angle(x, rate=48000, blksiz=GEOM.blksiz)

    # simulator: coarse at default stride, then fine around candidates
    stride = 12 * SUBSAMPLE
    sim = RefRotate(GEOM.blksiz, 2)
    sim.analyze_file(x, 0, MAXSAMPLE, stride)
    coarse = sim.peak.copy()
    # simulate selection with the same procedure on simulator tables
    from phaserotate_tpu.search.minimize import select_min_peak_angles as sel

    # build full-resolution simulator table for the fine reads
    sim2 = RefRotate(GEOM.blksiz, 2)
    sim2.analyze_file(x, 0, MAXSAMPLE, 1)
    sim_rot0 = []
    for c in range(2):
        sim3 = RefRotate(GEOM.blksiz, 1)
        sim3.analyze_file(x[c : c + 1], 336, 361, 1)
        sim_rot0.append(sim3.peak[0][0])
    want = sel(sim2.peak, stride=stride, rot0=np.asarray(sim_rot0))

    assert res.angles_units == want.angles_units
    assert res.found == want.found
    np.testing.assert_allclose(res.peak_min, want.peak_min, atol=3e-5)


def test_search_finds_peak_reducing_angle(rng):
    """The chosen angle must actually reduce the digital peak vs 0 deg."""
    x = make_signal(rng, 1, 8000)
    res = find_min_peak_angle(x, rate=48000, blksiz=GEOM.blksiz)
    assert res.found[0]
    y = np.asarray(apply_angles(x, np.asarray(res.angles_units), GEOM))
    assert np.abs(y).max() < np.abs(x).max()
    # table value agrees with the realized peak away from the warm-up
    # region (the reference's start-block evaluation pairs the first
    # half-block with pre-file zeros, so the table does not cover it)
    np.testing.assert_allclose(
        np.abs(y[:, GEOM.firlen :]).max(), res.peak_min[0], rtol=5e-3)


def test_constant_peak_channel_reports_not_found():
    """A pure sine has angle-independent peak (range == 0): CLI prints
    'cannot find min' (cli/phase-rotate.cc:935-936)."""
    t = np.arange(4096, dtype=np.float64) / 48000.0
    x = (0.5 * np.sin(2 * np.pi * 700.0 * t)).astype(np.float32)[None]
    res = find_min_peak_angle(x, rate=48000, blksiz=1024)
    # peak variation of a pure sine across angles is tiny but nonzero in
    # float32 (block edges), so this may legitimately "find" an angle; the
    # strict range==0 path needs exact constancy:
    table = np.zeros((1, MAXSAMPLE), np.float32) + 0.5
    res2 = select_min_peak_angles(table)
    assert res2.found == [False]
    assert res2.angles_units == [0]


def test_stride_validation():
    table = np.zeros((1, MAXSAMPLE), np.float32)
    with pytest.raises(ValueError):
        select_min_peak_angles(table, stride=7)  # 360 % 7 != 0
    with pytest.raises(ValueError):
        select_min_peak_angles(table, stride=0)
    with pytest.raises(ValueError):
        select_min_peak_angles(table, stride=120)  # > 45 deg


def test_link_channels_mode(rng):
    """Linked selection uses the cross-channel max table."""
    x = make_signal(rng, 2, 3000)
    table, rot0 = sweep_peaks_aux(x, GEOM)
    r_lnk = select_min_peak_angles(
        np.asarray(table), link_channels=True, rot0=np.asarray(rot0))
    r_ind = select_min_peak_angles(
        np.asarray(table), link_channels=False, rot0=np.asarray(rot0))
    # both must be valid results; linked channels share candidate windows
    assert len(r_lnk.angles_units) == 2
    assert all(isinstance(a, int) for a in r_lnk.angles_units)
