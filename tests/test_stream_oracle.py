"""Streaming-engine differential tests against the RefPlugin oracle.

ref_cli_sim.RefPlugin is an independent numpy re-derivation of the
PLUGIN's run loop (src/phaserotate.c:538-772) — the streaming
counterpart of the offline RefRotate oracle (round-4 verdict #7).
These tests drive the framework's full plugin lifecycle and the oracle
with the SAME block/angle schedule and compare audio and meter levels:
three hardware geometries x odd host block sizes, blocks below and
above the plugin latency, mid-stream angle automation with the
per-sample interpolation ramp and the +/-180 wrap.
"""

import numpy as np
import pytest

from phaserotate_tpu.plugin import (
    PLUGIN_URI,
    LevelsMsg,
    PhaseRotatePlugin,
    PortIndex,
    UiOn,
)

from ref_cli_sim import RefPlugin

# (rate, expected parsiz/firlen per src/phaserotate.c:278-297)
GEOMETRIES = [(48000, 256, 3072), (96000, 512, 4096),
              (192000, 1024, 8192)]


def _make(rate, block, meters=False):
    p = PhaseRotatePlugin(PLUGIN_URI, rate)
    control, notify = [], []
    latency = np.zeros(1, np.float32)
    angle = np.zeros(1, np.float32)
    io = np.zeros(block, np.float32)
    p.connect_port(PortIndex.ATOM_CONTROL, control)
    p.connect_port(PortIndex.ATOM_NOTIFY, notify)
    p.connect_port(PortIndex.LATENCY, latency)
    p.connect_port(3, angle)
    p.connect_port(4, io)
    p.connect_port(5, io)
    p.activate()
    if meters:
        control.append(UiOn())
    return p, control, notify, angle, io


def _stream(rate, block, schedule, x, meters=False):
    """Run framework plugin and oracle over the same schedule.

    schedule: list of (n_blocks, angle_deg) segments.
    Returns (plugin_audio, oracle_audio, plugin_levels, oracle_levels).
    """
    p, control, notify, angle, io = _make(rate, block, meters=meters)
    ref = RefPlugin(rate)
    assert p.latency == ref.latency
    got, want = [], []
    lv_got, lv_want = [], []
    pos = 0
    for n_blocks, deg in schedule:
        angle[0] = deg
        for _ in range(n_blocks):
            blk = x[pos : pos + block]
            pos += block
            io[:] = blk
            notify.clear()
            p.run(block)
            got.append(io.copy())
            ref_out, ref_lv = ref.run(blk, deg)
            want.append(ref_out)
            if meters:
                lv = [m for m in notify if isinstance(m, LevelsMsg)]
                assert len(lv) == 1
                lv_got.append(lv[0])
                lv_want.append(ref_lv)
    return (np.concatenate(got), np.concatenate(want), lv_got, lv_want)


@pytest.mark.parametrize("rate,parsiz,firlen", GEOMETRIES)
@pytest.mark.parametrize("block_kind", ["odd_small", "odd_large"])
def test_streaming_audio_matches_oracle(rate, parsiz, firlen,
                                        block_kind, rng):
    """Audio parity at odd block sizes (blocks < latency exercise the
    sub-parsiz offset bookkeeping; blocks > latency the other meter
    branch) across all three hardware geometries, with mid-stream
    angle automation incl. a +/-180 wrap."""
    latency = parsiz + firlen // 2
    block = 333 if block_kind == "odd_small" else latency + 257
    total_blocks = max(10, (4 * firlen) // block + 6)
    x = (0.5 * rng.standard_normal(block * total_blocks)).astype(
        np.float32)
    third = total_blocks // 3
    schedule = [(third, 0.0), (third, 137.5),
                (total_blocks - 2 * third, -170.0)]
    got, want, _, _ = _stream(rate, block, schedule, x)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_streaming_meters_match_oracle(rng):
    """Meter levels (delayed input, momentary hold/falloff, peak hold,
    diff min/max, delayed reset after an angle change) match the
    oracle's per-run values — including the blocks < latency delay-line
    shift path the reference handles at src/phaserotate.c:576-591."""
    rate, block = 48000, 333  # block << latency (1792)
    n_blocks = 40
    x = (0.4 * rng.standard_normal(block * n_blocks)).astype(np.float32)
    x[: 3 * block] *= 0.05  # quiet lead-in, then loud: peak/hold moves
    schedule = [(n_blocks // 2, 0.0), (n_blocks - n_blocks // 2, 90.0)]
    got, want, lv_got, lv_want = _stream(
        rate, block, schedule, x, meters=True)
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert len(lv_got) == n_blocks
    for i, (g, w) in enumerate(zip(lv_got, lv_want)):
        fields = (g.in_cur, g.in_mom, g.in_peak, g.out_cur, g.out_mom,
                  g.out_peak, g.diff_cur, g.diff_min, g.diff_max)
        np.testing.assert_allclose(
            fields, [float(v) for v in w], rtol=5e-4, atol=2e-4,
            err_msg=f"levels diverge at block {i}")


def test_streaming_meters_large_blocks(rng):
    """The n >= latency meter branch (src/phaserotate.c:592-608): the
    delay line refills from the block tail and the peak covers the
    delayed window + block head."""
    rate = 48000
    block = 2051  # > latency 1792, odd
    n_blocks = 12
    x = (0.5 * rng.standard_normal(block * n_blocks)).astype(np.float32)
    got, want, lv_got, lv_want = _stream(
        rate, block, [(n_blocks, 30.0)], x, meters=True)
    np.testing.assert_allclose(got, want, atol=2e-4)
    for g, w in zip(lv_got, lv_want):
        np.testing.assert_allclose(
            (g.in_cur, g.in_mom, g.in_peak),
            [float(v) for v in w[:3]], rtol=5e-4, atol=2e-4)


def test_oracle_latency_structure():
    """Self-check of the oracle itself: at angle 0 its output is the
    input delayed by exactly parsiz + firlen/2 samples (the latency
    contract, src/phaserotate.c:292-297)."""
    rng = np.random.default_rng(17)
    ref = RefPlugin(48000)
    n = 6 * ref.latency
    x = (0.5 * rng.standard_normal(n)).astype(np.float32)
    out = np.concatenate(
        [ref.run(x[i : i + 512], 0.0)[0] for i in range(0, n, 512)])
    np.testing.assert_allclose(
        out[ref.latency :], x[: n - ref.latency], atol=1e-5)
