"""Ogg Opus: framework Ogg muxing + system libopus packet codec."""

import numpy as np
import pytest

from phaserotate_tpu.io import opus, read_audio, write_audio

pytestmark = pytest.mark.skipif(
    not opus.available(), reason="system libopus not present")


def _tone(ch=2, n=48000, rate=48000):
    t = np.arange(n) / rate
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.4 * np.sin(2 * np.pi * 220 * t)][:ch])
    return x.astype(np.float32)


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("n", [48000, 12345])
def test_roundtrip_exact_duration(tmp_path, ch, n):
    """Sample-exact duration (preskip + lookahead accounting) and
    steady-state closeness at 48 kHz."""
    x = _tone(ch=ch, n=n)
    p = str(tmp_path / "t.opus")
    opus.write_opus(p, x, 48000)
    y, rate, meta = opus.read_opus(p)
    assert rate == 48000 and y.shape == (ch, n)
    assert meta.container == "OPUS"
    if n > 10000:
        sl = slice(3000, n - 2000)
        assert np.abs(y[0][sl] - x[0][sl]).max() < 0.05


def test_input_rates_and_validation(tmp_path):
    p = str(tmp_path / "r.opus")
    x24 = _tone(ch=1, n=24000, rate=24000)
    opus.write_opus(p, x24, 24000)
    y, rate, _ = opus.read_opus(p)
    assert rate == 48000 and y.shape[1] == 48000  # Opus decodes at 48k
    with pytest.raises(ValueError, match="8/12/16/24/48"):
        opus.write_opus(p, x24, 44100)


def test_tags_roundtrip(tmp_path):
    from phaserotate_tpu.io import WavMetadata

    meta = WavMetadata()
    meta.info[b"INAM"] = "master C"
    p = str(tmp_path / "m.opus")
    opus.write_opus(p, _tone(n=9600), 48000, meta=meta)
    _, _, m = opus.read_opus(p)
    assert m.info[b"INAM"] == "master C"


def test_dispatch_vs_vorbis(tmp_path):
    """Both Ogg codecs share the OggS capture: dispatch must probe the
    first packet and route correctly each way."""
    x = _tone(n=24000)
    p_opus = str(tmp_path / "a.opus")
    p_ogg = str(tmp_path / "a.ogg")
    write_audio(p_opus, x, 48000)
    write_audio(p_ogg, x, 48000)
    _, _, m1 = read_audio(p_opus)
    _, _, m2 = read_audio(p_ogg)
    assert m1.container == "OPUS" and m2.container == "OGG"


def test_ogg_pages_crc_valid(tmp_path):
    """Pages written by the muxer pass the reader's CRC check (the
    same CRC-verified parser that decodes Vorbis)."""
    from phaserotate_tpu.io.vorbis import _ogg_packets

    p = str(tmp_path / "c.opus")
    opus.write_opus(p, _tone(n=20000), 48000)
    data = open(p, "rb").read()
    packets, granule = _ogg_packets(data)
    assert packets[0][:8] == b"OpusHead"
    assert packets[1][:8] == b"OpusTags"
    assert granule > 0 and len(packets) > 10


def test_cli_analyze_and_apply_opus(tmp_path):
    from phaserotate_tpu.cli import main

    rate = 48000
    t = np.arange(rate // 2) / rate
    x = (0.5 * np.sin(2 * np.pi * 100 * t)
         + 0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    src = str(tmp_path / "in.opus")
    opus.write_opus(src, x[None], rate)
    assert main([src]) == 0
    dst = str(tmp_path / "out.opus")
    assert main(["-a", "45", src, dst]) == 0
    y, r, _ = read_audio(dst)
    assert r == rate and y.shape[1] > 0
