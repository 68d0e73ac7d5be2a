"""Model classes, checkpoint/resume, profiling utils."""

import numpy as np
import pytest

from phaserotate_tpu.models import AngleAnalyzer, OfflineRotator, PhaseRotator
from phaserotate_tpu.utils import StageTimer, SweepCheckpoint


def _sig(rng, n=3000, chans=1):
    t = np.arange(n) / 48000.0
    return np.stack([
        (0.6 * np.sin(2 * np.pi * 997 * t + c)
         + 0.35 * np.sin(2 * np.pi * 1994 * t + 0.7)).astype(np.float32)
        for c in range(chans)
    ])


def test_offline_rotator(rng):
    # integer-period tones: zero DC/Nyquist, so +-90 deg round-trips
    # exactly (those bins scale by cos 90 = 0 and are unrecoverable
    # otherwise — inherent to the rotation operator)
    t = np.arange(4800) / 48000.0
    x = (0.5 * np.sin(2 * np.pi * 1000 * t)
         + 0.3 * np.sin(2 * np.pi * 2000 * t + 0.6)).astype(np.float32)
    rot = OfflineRotator(rate=48000)
    y = rot(x, 90.0)
    z = rot(y, -90.0)
    np.testing.assert_allclose(z, x, atol=1e-4)
    with pytest.raises(ValueError):
        OfflineRotator(method="nope")


def test_phase_rotator_streaming(rng):
    x = _sig(rng, n=4096)[0]
    rot = PhaseRotator(rate=48000, channels=1)
    y = rot.process(x, 0.0)
    lat = rot.latency
    np.testing.assert_allclose(y[lat:], x[: len(x) - lat], atol=1e-6)


def test_analyzer_roundtrip(rng):
    x = _sig(rng, n=4000)
    an = AngleAnalyzer(rate=48000, blksiz=1024)
    res = an.analyze(x)
    assert res.found == [True]
    y = an.apply(x, res)
    assert np.abs(y[:, 512:]).max() <= np.abs(x[:, 512:]).max() + 1e-6


def test_analyzer_checkpoint_resume(tmp_path, rng):
    files = {f"f{i}": _sig(rng, n=3000 + 64 * i) for i in range(3)}
    ck = str(tmp_path / "sweeps.npz")
    an = AngleAnalyzer(rate=48000, blksiz=1024)
    first = an.analyze_many(files, checkpoint=ck)

    # resume run: tables come from disk; results identical even with a
    # corrupted input (proves no re-sweep happened)
    files_broken = {k: np.zeros_like(v) for k, v in files.items()}
    second = an.analyze_many(files_broken, checkpoint=ck)
    for k in files:
        assert first[k].angles_units == second[k].angles_units

    ckpt = SweepCheckpoint(ck)
    assert len(ckpt) == 3
    assert "f0" in ckpt

    # changing stride re-selects from stored tables without re-sweeping
    an2 = AngleAnalyzer(rate=48000, blksiz=1024, stride=8)
    third = an2.analyze_many(files_broken, checkpoint=ck)
    assert set(third) == set(files)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "2x" in rep


def test_warmup_plans():
    """C10 equivalent: pre-compilation of every hot path for a geometry."""
    from phaserotate_tpu.core import warmup_offline, warmup_stream
    from phaserotate_tpu.core.sizes import OfflineGeometry, StreamGeometry

    warmup_stream(StreamGeometry(rate=48000, fftlen=512, firlen=3072))
    warmup_offline(OfflineGeometry(blksiz=1024), lengths=[2048])


def test_phase_rotator_meters_and_reset(rng):
    rot = PhaseRotator(rate=48000, channels=1)
    x = (0.8 * rng.standard_normal(8192)).astype(np.float32)
    rot.process(x, 35.0)
    lv = rot.levels(0)
    assert float(lv.in_peak) > 0.3  # loud input registered
    assert float(lv.in_cur) >= 0.0
    # flush the metering delay line before resetting, so nothing loud is
    # still in flight (input meters are latency-aligned)
    rot.process(np.zeros(rot.latency + 256, np.float32), 35.0)
    rot.reset_peaks()
    rot.process(np.zeros(256, np.float32), 35.0)
    assert float(rot.levels(0).in_peak) < 0.3


def test_phase_rotator_checkpoint_resume(tmp_path, rng):
    """Save mid-stream, resume in a fresh rotator: outputs continue
    bit-identically — even from the middle of a frame (the host staging
    buffers are checkpointed along with the engine carry)."""
    parsiz = 256  # 48k geometry
    x = rng.standard_normal(16 * parsiz).astype(np.float32)
    split = 8 * parsiz + 100  # mid-frame split
    a, b = x[:split], x[split:]

    ref = PhaseRotator(rate=48000, channels=1)
    y_ref = np.concatenate([ref.process(a, 90.0), ref.process(b, 90.0)])

    r1 = PhaseRotator(rate=48000, channels=1)
    y1 = r1.process(a, 90.0)
    path = str(tmp_path / "stream.npz")
    r1.save(path)

    r2 = PhaseRotator(rate=48000, channels=1)
    r2.load(path)
    y2 = r2.process(b, 90.0)
    np.testing.assert_array_equal(np.concatenate([y1, y2]), y_ref)


def test_phase_rotator_checkpoint_validation(tmp_path):
    r1 = PhaseRotator(rate=48000, channels=1)
    path = str(tmp_path / "s.npz")
    r1.save(path)
    r2 = PhaseRotator(rate=48000, channels=2)
    with pytest.raises(ValueError, match="channels"):
        r2.load(path)
    r3 = PhaseRotator(rate=96000, channels=1)
    with pytest.raises(ValueError, match="geometry"):
        r3.load(path)


def test_phase_rotator_diff_hold_resets_on_angle_change(rng):
    """Gain-diff holds reset when the target angle changes, like the
    plugin lifecycle (round-2 self-review: was hardcoded False)."""
    rot = PhaseRotator(rate=48000, channels=1)
    x = (0.5 * rng.standard_normal(8192)).astype(np.float32)
    rot.process(x, 0.0)
    rot.process(x, 0.0)
    base_min = float(rot.levels(0).diff_min)
    rot.process(x, 90.0)  # angle change -> delayed reset armed
    for _ in range(6):
        rot.process(x, 90.0)
    lv = rot.levels(0)
    # holds re-accumulated from the new steady state, not stuck at the
    # old extremes: diff_cur participates in fresh min/max
    assert float(lv.diff_min) <= float(lv.diff_cur) <= float(lv.diff_max)


def test_checkpoint_rejects_geometry_mismatch(tmp_path, rng):
    """Sweep tables are geometry-specific: reusing a checkpoint with a
    different blksiz must raise, not silently return wrong angles."""
    files = {"f0": _sig(rng, n=3000)}
    ck = str(tmp_path / "sweeps.npz")
    AngleAnalyzer(rate=48000, blksiz=1024).analyze_many(files, checkpoint=ck)
    with pytest.raises(ValueError, match="blksiz"):
        AngleAnalyzer(rate=48000, blksiz=2048).analyze_many(
            files, checkpoint=ck)


def test_checkpoint_unfingerprinted_warns(tmp_path):
    """A pre-fingerprint (round-1 era) checkpoint has no //blksiz key and
    so can't be verified — loading it under a declared geometry must warn
    instead of silently trusting the tables (ADVICE r2)."""
    import warnings

    import numpy as np

    ck = str(tmp_path / "old.npz")
    np.savez(ck, f0=np.zeros((1, 720), np.float32),
             **{"f0//rot0": np.zeros(1, np.float32)})
    with pytest.warns(UserWarning, match="fingerprint"):
        SweepCheckpoint(ck, blksiz=1024)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no geometry declared -> silent
        SweepCheckpoint(ck)
