"""MP3 read/write through the system codecs (libmpg123/libmp3lame —
the same libraries libsndfile links for MP3, cli/phase-rotate.cc:33)."""

import numpy as np
import pytest

from phaserotate_tpu.io import mp3, read_audio, write_audio

pytestmark = pytest.mark.skipif(
    not mp3.available(),
    reason="system libmpg123/libmp3lame not present")


def _tone(ch=2, n=48000, rate=48000):
    t = np.arange(n) / rate
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.4 * np.sin(2 * np.pi * 220 * t)][:ch])
    return x.astype(np.float32)


def _steady_state_err(y, x, search=40000):
    """Max error after aligning for codec delay via cross-correlation."""
    a = x[3000:20000]
    corr = np.correlate(y[:search], a, mode="valid")
    lag = int(np.argmax(corr))
    return np.abs(y[lag : lag + len(a)] - a).max()


@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_steady_state(tmp_path, ch):
    x = _tone(ch=ch)
    p = str(tmp_path / "t.mp3")
    mp3.write_mp3(p, x, 48000)
    y, rate, meta = mp3.read_mp3(p)
    assert rate == 48000 and y.shape[0] == ch
    assert meta.container == "MP3"
    for c in range(ch):
        assert _steady_state_err(y[c], x[c]) < 0.02


def test_dispatch_and_sniff(tmp_path):
    """write_audio .mp3 + read_audio by content (ID3/frame sync)."""
    x = _tone(n=24000)
    p = str(tmp_path / "d.mp3")
    write_audio(p, x, 48000)
    head = open(p, "rb").read(16)
    assert mp3.is_mp3(head)
    y, rate, _ = read_audio(p)
    assert rate == 48000 and y.shape[0] == 2


def test_is_mp3_rejects_other_magic():
    assert not mp3.is_mp3(b"RIFF....WAVE....")
    assert not mp3.is_mp3(b"fLaC............")
    assert not mp3.is_mp3(b"OggS............")
    assert mp3.is_mp3(b"ID3\x04....")
    assert mp3.is_mp3(bytes([0xFF, 0xFB, 0x94, 0x44]))


def test_cli_analyze_and_apply_mp3(tmp_path):
    """End to end: analyze an .mp3, apply an angle, mp3 out."""
    from phaserotate_tpu.cli import main

    rate = 48000
    t = np.arange(rate // 2) / rate
    x = (0.5 * np.sin(2 * np.pi * 100 * t)
         + 0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    src = str(tmp_path / "in.mp3")
    mp3.write_mp3(src, x[None], rate)
    assert main([src]) == 0
    dst = str(tmp_path / "out.mp3")
    assert main(["-a", "45", src, dst]) == 0
    y, r, _ = read_audio(dst)
    assert r == rate and y.shape[1] > 0
