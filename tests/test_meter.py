"""Metering ballistics: hold, falloff, peak-hold, diff reset, alignment."""

import numpy as np
import pytest

from phaserotate_tpu.meter import (
    MeterConfig,
    init_meter_state,
    meter_block,
    meter_falloff,
    reset_peaks,
)

RATE = 48000.0
LAT = 1792
CFG = MeterConfig(rate=RATE, latency=LAT)
N = 256
FALL = meter_falloff(RATE, N)


def run_blocks(state, blocks_in, blocks_out, angle_changed=None):
    levels = []
    for i, (bi, bo) in enumerate(zip(blocks_in, blocks_out)):
        ac = False if angle_changed is None else angle_changed[i]
        state, lv = meter_block(state, bi, bo, FALL, CFG.hold_samples, ac)
        levels.append(lv)
    return state, levels


def test_momentary_rises_instantly_and_holds():
    state = init_meter_state(CFG)
    # activate() schedules a `latency`-sample reset window
    # (src/phaserotate.c:518) pinning the output momentary to 0; the spike
    # must come after it (block 7 for 1792/256).
    blocks = [np.zeros(N, np.float32) for _ in range(40)]
    blocks[10] = np.full(N, 0.8, np.float32)
    state, levels = run_blocks(state, blocks, blocks)
    moms = [float(l.out_mom) for l in levels]
    assert moms[10] == pytest.approx(0.8)
    # hold: 0.5 s = 24000 samples = ~93 blocks of 256 -> still holding at 39
    assert moms[39] == pytest.approx(0.8)


def test_momentary_falls_at_15db_per_second():
    state = init_meter_state(CFG)
    warm = LAT // N + 1  # skip the activate reset window
    hold_blocks = int(CFG.hold_samples / N) + 2
    n_fall = 200
    blocks = [np.zeros(N, np.float32)] * (warm + 1 + hold_blocks + n_fall)
    blocks[warm] = np.full(N, 1.0, np.float32)
    state, levels = run_blocks(state, blocks, blocks)
    m_end = float(levels[-1].out_mom)
    fall_time = n_fall * N / RATE
    want_db = -15.0 * fall_time
    got_db = 20 * np.log10(m_end)
    assert got_db == pytest.approx(want_db, abs=0.75)


def test_peak_hold_until_reset():
    state = init_meter_state(CFG)
    blocks = [np.zeros(N, np.float32) for _ in range(400)]
    blocks[2] = np.full(N, 0.9, np.float32)
    state, levels = run_blocks(state, blocks, blocks)
    assert float(levels[-1].out_peak) == pytest.approx(0.9)
    state = reset_peaks(state)
    assert float(state.peak[1]) == 0.0
    assert float(state.diff[0]) == 1.0


def test_input_meter_time_alignment():
    """The input meter lags by exactly `latency` samples."""
    state = init_meter_state(CFG)
    spike_block = 3
    blocks_in = [np.zeros(N, np.float32) for _ in range(40)]
    blocks_in[spike_block] = np.full(N, 0.7, np.float32)
    zeros = [np.zeros(N, np.float32)] * 40
    state, levels = run_blocks(state, blocks_in, zeros)
    in_curs = [float(l.in_cur) for l in levels]
    first_seen = next(i for i, v in enumerate(in_curs) if v > 0)
    expect_block = spike_block + LAT // N
    assert first_seen == expect_block


def test_diff_ratio_and_delayed_reset():
    state = init_meter_state(CFG)
    half = np.full(N, 0.5, np.float32)
    quarter = np.full(N, 0.25, np.float32)
    # run past the initial reset window (reset_delay starts at latency)
    blocks = [half] * 60
    outs = [quarter] * 60
    state, levels = run_blocks(state, blocks, outs)
    # once the delay line has flushed, ratio = 0.25/0.5 = 0.5
    assert float(levels[-1].diff_cur) == pytest.approx(0.5, rel=1e-5)
    assert float(levels[-1].diff_min) == pytest.approx(0.5, rel=1e-5)
    assert float(levels[-1].diff_max) == pytest.approx(1.0)  # initial 1

    # establish a historical min of ~0.2 with a quieter output stretch —
    # long enough for the momentary hold (0.5 s) to expire and the 15 dB/s
    # fall to bring mom1 from 0.25 down to 0.1 (8 dB ~ 0.53 s more)
    tenth = np.full(N, 0.1, np.float32)
    state, levels = run_blocks(state, [half] * 260, [tenth] * 260)
    # (one block's decay quantization of undershoot before re-seed)
    assert float(levels[-1].diff_min) == pytest.approx(0.2, rel=2e-2)

    # angle change: the delayed reset discards the historical min; the
    # ratio re-accumulates from the current momentaries each block
    # (src/phaserotate.c:497-509 runs before :730-739), so after the
    # window only fresh ratios (0.5) remain.
    changed = [True] + [False] * 29
    state, levels = run_blocks(
        state, [half] * 30, [quarter] * 30, angle_changed=changed)
    assert float(levels[-1].diff_min) == pytest.approx(0.5, rel=1e-5)


def test_nonfinite_input_guard():
    state = init_meter_state(CFG)
    # flush the activate reset window first
    for _ in range(LAT // N + 1):
        state, _ = meter_block(
            state, np.zeros(N, np.float32), np.zeros(N, np.float32),
            FALL, CFG.hold_samples, False)
    bad = np.full(N, np.nan, np.float32)
    state, lv = meter_block(
        state, bad, bad, FALL, CFG.hold_samples, False)
    # isfinite guard (src/phaserotate.c:454-456): nan peak -> 0
    assert float(lv.out_cur) == 0.0
    assert np.isfinite(float(lv.out_mom))


def test_vmapped_channels():
    import jax

    state = init_meter_state(CFG, channels=(2,))
    bi = np.stack([np.full(N, 0.5, np.float32), np.full(N, 0.1, np.float32)])
    f = jax.vmap(
        lambda s, i, o: meter_block(s, i, o, FALL, CFG.hold_samples, False)
    )
    state2, lv = f(state, bi, bi)
    assert lv.out_cur.shape == (2,)
    assert float(lv.out_cur[0]) == pytest.approx(0.5)
    assert float(lv.out_cur[1]) == pytest.approx(0.1)
