"""Interactive TUI host: key handling, live angle changes, pty drive."""

import os
import pty
import select
import subprocess
import sys
import time

import numpy as np
import pytest

from phaserotate_tpu.hostapp import StandaloneHost
from phaserotate_tpu.io.wav import read_wav, write_wav
from phaserotate_tpu.ops import rotate_fir
from phaserotate_tpu.tui import TuiSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _session(channels=2):
    host = StandaloneHost(48000, channels, block=256)
    return TuiSession(host), host


def test_keys_drive_dial_and_ports():
    s, host = _session()
    s.feed(b"\x1b[C")  # right arrow: +0.5
    assert s.ui.dials[0].value == 0.5
    assert host.angles[0][0] == 0.5  # written through to the control port
    s.feed(b"\x1b[A")  # up: +5 (scroll, step x10)
    assert s.ui.dials[0].value == 5.5
    s.feed(b"\x1b[D" * 3)  # left x3
    assert s.ui.dials[0].value == 4.0
    s.feed(b"0")
    assert s.ui.dials[0].value == 0.0


def test_tab_switches_channel_and_link_mirrors():
    s, host = _session()
    s.feed(b"\t")
    assert s.active == 1
    s.feed(b"\x1b[C")
    assert s.ui.dials[1].value == 0.5
    assert s.ui.dials[0].value == 0.0
    s.feed(b"l")  # link: dial1 snaps to dial0, edits mirror
    assert s.ui.link.active
    assert s.ui.dials[1].value == 0.0
    s.feed(b"\t")
    assert s.active == 0
    s.feed(b"\x1b[A")
    assert s.ui.dials[0].value == 5.0
    assert s.ui.dials[1].value == 5.0
    assert host.angles[1][0] == 5.0


def test_quit_keys():
    s, _ = _session()
    assert s.running
    s.feed(b"q")
    assert not s.running
    s2, _ = _session()
    s2.feed(b"\x1b\x1b")  # Esc Esc
    assert not s2.running


def test_reset_peaks_key():
    s, host = _session(1)
    x = 0.9 * np.ones((1, 256), np.float32)
    host.process(x)
    # input metering is time-aligned through the latency delay line
    # (src/phaserotate.c:575-609): flush until the peak reaches the meter
    for _ in range(int(host.latency[0]) // 256 + 2):
        host.process(np.zeros((1, 256), np.float32))
    s.ui.poll()
    assert s.ui.meters[0].in_peak > 0.5
    s.feed(b"r")
    host.process(np.zeros((1, 256), np.float32))
    s.ui.poll()
    assert s.ui.meters[0].in_peak < 0.5


def test_render_contents():
    s, _ = _session()
    s.feed(b"\x1b[C")
    out = s.render()
    assert "angle    +0.5 deg" in out
    assert "ch0" in out and "ch1" in out
    assert "q: quit" in out


def test_mid_stream_angle_change_is_applied():
    """Turning the dial while audio runs changes the rotation through the
    click-free ramp — the interaction the product exists for."""
    rate = 48000
    s, host = _session(1)
    t = np.arange(rate // 4) / rate
    x = np.sin(2 * np.pi * 480.0 * t).astype(np.float32)
    n = len(x)
    outs = []
    fed = False
    for i in range(0, n, 256):
        if not fed and i >= n // 2:
            s.feed(b"\x1b[A" * 18)  # +90 deg mid-stream
            fed = True
        outs.append(host.process(x[None, i : i + 256]))
    assert s.ui.dials[0].value == 90.0
    y = np.concatenate(outs, axis=1)[0]
    lat = int(host.latency[0])
    # early output: unrotated; late output: rotated by 90
    want0 = x
    want90 = np.asarray(rotate_fir(x, 90.0, rate=rate))
    early = slice(lat + 2048, n // 2)
    late = slice(n - 2048, n - lat)
    np.testing.assert_allclose(y[early.start : early.stop],
                               want0[early.start - lat : early.stop - lat],
                               atol=1e-4)
    np.testing.assert_allclose(y[late.start : late.stop],
                               want90[late.start - lat : late.stop - lat],
                               atol=1e-4)
    # no clicks: bounded sample-to-sample step through the whole ramp
    assert np.abs(np.diff(y)).max() < 0.2


def test_pty_end_to_end(tmp_path):
    """Drive the real terminal loop through a pty: turn the dial, quit."""
    rate = 48000
    rng = np.random.default_rng(7)
    x = (0.2 * rng.standard_normal(rate // 5)).astype(np.float32)
    src = tmp_path / "in.wav"
    write_wav(str(src), x, rate)

    master, slave = pty.openpty()
    proc = subprocess.Popen(
        [sys.executable, "-m", "phaserotate_tpu.hostapp", str(src),
         "--ui", "--block", "256"],
        stdin=slave, stdout=slave, stderr=subprocess.DEVNULL, cwd=REPO)
    os.close(slave)

    def read_screen(timeout=90.0, until=None):
        buf = b""
        end = time.time() + timeout
        while time.time() < end:
            r, _, _ = select.select([master], [], [], 0.2)
            if r:
                try:
                    buf += os.read(master, 4096)
                except OSError:
                    break
            if until and until in buf:
                return buf
        return buf

    try:
        assert b"interactive host" in read_screen(until=b"interactive host")
        os.write(master, b"\x1b[C")  # +0.5 deg
        assert b"+0.5 deg" in read_screen(until=b"+0.5 deg")
        os.write(master, b"q")
        assert proc.wait(timeout=90) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        os.close(master)


def test_ui_with_outfile_noninteractive(tmp_path):
    """--ui with an output file: streams the file once (no loop), writes
    the latency-compensated recording; works without a real terminal."""
    rate = 48000
    rng = np.random.default_rng(8)
    x = (0.3 * rng.standard_normal(rate // 6)).astype(np.float32)
    src = tmp_path / "in.wav"
    dst = tmp_path / "out.wav"
    write_wav(str(src), x, rate)
    proc = subprocess.Popen(
        [sys.executable, "-m", "phaserotate_tpu.hostapp", str(src),
         str(dst), "--ui", "--block", "256"],
        stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, cwd=REPO)
    assert proc.wait(timeout=120) == 0
    y, _, _ = read_wav(str(dst))
    np.testing.assert_allclose(y[0], x, atol=1e-6)


def test_run_tui_loop_mode_does_not_retain_blocks(tmp_path):
    """Interactive loop mode must not grow memory per block (round-2
    self-review): run_tui returns no captured output in loop mode."""
    import io

    from phaserotate_tpu.tui import run_tui

    rate = 48000
    x = np.zeros((1, 2000), np.float32)
    host = StandaloneHost(rate, 1, block=256)
    r, w = os.pipe()
    try:
        outs, played = run_tui(host, x, rate, 256, loop=True,
                               stdin_fd=r, stdout=io.StringIO(),
                               max_seconds=0.15)
        assert outs == [] and played == 0
    finally:
        os.close(r)
        os.close(w)


def test_run_tui_capture_counts_played_frames(tmp_path):
    import io

    from phaserotate_tpu.tui import run_tui

    rate = 48000
    n = 1000
    x = (0.1 * np.ones((1, n))).astype(np.float32)
    host = StandaloneHost(rate, 1, block=256)
    r, w = os.pipe()
    try:
        outs, played = run_tui(host, x, rate, 256, loop=False,
                               stdin_fd=r, stdout=io.StringIO())
        assert played == n
        assert len(outs) >= -(-n // 256) + 1  # blocks + drain
    finally:
        os.close(r)
        os.close(w)
