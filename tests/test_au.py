"""Sun AU (.au/.snd) codec: round-trips for every encoding, G.711
companding accuracy, read_audio/write_audio dispatch, corruption
contract, and the CLI end to end (libsndfile breadth parity —
/root/reference/cli/phase-rotate.cc:33 sf_open opens AU)."""

import struct

import numpy as np
import pytest

from phaserotate_tpu.io import (
    WavMetadata,
    read_au,
    read_audio,
    write_au,
    write_audio,
)
from phaserotate_tpu.io.au import _alaw_decode, _alaw_encode, \
    _ulaw_decode, _ulaw_encode
from phaserotate_tpu.io.wav import WavFormatError

RATE = 48000


@pytest.fixture()
def rng():
    return np.random.default_rng(17)


def _tone(ch=2, n=4800):
    t = np.arange(n) / RATE
    return np.stack([0.7 * np.sin(2 * np.pi * (330 + 110 * c) * t)
                     for c in range(ch)]).astype(np.float32)


@pytest.mark.parametrize("encoding,tol", [
    ("pcm8", 1 / 128), ("pcm16", 1 / 32768), ("pcm24", 2 / (1 << 23)),
    ("pcm32", 2 / (1 << 24)), ("f32", 0.0), ("f64", 1e-7),
])
def test_roundtrip_linear(tmp_path, encoding, tol):
    x = _tone()
    p = str(tmp_path / f"t_{encoding}.au")
    write_au(p, x, RATE, encoding=encoding)
    y, rate, meta = read_au(p)
    assert rate == RATE and meta.container == "AU"
    assert y.shape == x.shape
    assert np.abs(y - x).max() <= tol + 1e-9


@pytest.mark.parametrize("encoding", ["ulaw", "alaw"])
def test_roundtrip_g711(tmp_path, encoding, rng):
    """G.711 is logarithmic 8-bit: worst-case step near full scale is
    ~3% (mu) / ~6% (A); SNR on a tone should still clear ~30 dB."""
    x = _tone(ch=1)
    p = str(tmp_path / f"t.{encoding}.au")
    write_au(p, x, RATE, encoding=encoding)
    y, rate, _ = read_au(p)
    err = y - x
    snr = 10 * np.log10((x ** 2).mean() / max((err ** 2).mean(), 1e-20))
    assert snr > 30, snr
    assert np.abs(err).max() < 0.07


def test_g711_companding_is_idempotent(rng):
    """encode(decode(byte)) == byte for all 256 code points — the
    decoder output must be each segment's canonical midpoint.  One
    deliberate exception: mu-law 0x7F is NEGATIVE zero, which decodes
    to the same value as 0xFF (+0) and re-encodes to 0xFF — the
    format's single redundant code point."""
    codes = np.arange(256, dtype=np.uint8)
    u = _ulaw_encode(_ulaw_decode(codes))
    mismatch = np.nonzero(u != codes)[0]
    assert list(mismatch) == [0x7F] and u[0x7F] == 0xFF
    assert np.array_equal(_ulaw_decode(u), _ulaw_decode(codes))
    a = _alaw_encode(_alaw_decode(codes))
    assert np.array_equal(a, codes)


def test_annotation_and_dispatch(tmp_path):
    x = _tone()
    meta = WavMetadata(container="AU")
    meta.info[b"ICMT"] = "graft test note"
    p = str(tmp_path / "noted.au")
    write_au(p, x, RATE, meta=meta)
    y, rate, m2 = read_audio(p)  # content-sniffed dispatch
    assert m2.info[b"ICMT"] == "graft test note"
    assert np.abs(y - x).max() <= 1 / 32768 + 1e-9
    # write_audio by extension, .snd alias included
    for name in ("o.au", "o.snd"):
        q = str(tmp_path / name)
        write_audio(q, x, RATE)
        z, _, m3 = read_audio(q)
        assert m3.container == "AU"
        assert np.abs(z - x).max() <= 1 / 32768 + 1e-9


def test_pcm16_fleet_fast_path(tmp_path):
    """read_audio_pcm16 takes the no-float byteswap path for 16-bit AU
    and matches quantization of the float reader exactly; other
    encodings fall back to quantize."""
    from phaserotate_tpu.io import read_audio_pcm16
    from phaserotate_tpu.io.au import read_au_pcm16

    x = _tone()
    p = str(tmp_path / "t.au")
    write_au(p, x, RATE)
    q, rate, _ = read_audio_pcm16(p)
    assert q.dtype == np.int16 and rate == RATE
    y = read_au(p)[0]
    ref = np.clip(np.rint(y * 32768.0), -32768, 32767).astype(np.int16)
    assert np.array_equal(q, ref)
    write_au(p, x, RATE, encoding="f32")
    with pytest.raises(WavFormatError):
        read_au_pcm16(p)
    q2, _, _ = read_audio_pcm16(p)  # falls back to quantize
    assert q2.dtype == np.int16 and q2.shape == x.shape


def test_unknown_size_sentinel_reads_to_eof(tmp_path):
    """Streams written with data size 0xFFFFFFFF (unknown, the format's
    pipe convention) decode everything after the header."""
    x = _tone(ch=1, n=1000)
    p = str(tmp_path / "t.au")
    write_au(p, x, RATE)
    blob = bytearray(open(p, "rb").read())
    struct.pack_into(">I", blob, 8, 0xFFFFFFFF)
    with open(p, "wb") as f:
        f.write(blob)
    y, _, _ = read_au(p)
    assert y.shape == (1, 1000)


def test_corruption_contract(tmp_path, rng):
    x = _tone(ch=1, n=1000)
    src = str(tmp_path / "t.au")
    write_au(src, x, RATE)
    base = open(src, "rb").read()
    p = str(tmp_path / "f.au")
    # targeted: bad offset, bad encoding, absurd rate/channels
    for off, val in ((4, 2 ** 31), (12, 99), (16, 10 ** 9),
                     (20, 2 ** 20)):
        blob = bytearray(base)
        struct.pack_into(">I", blob, off, val)
        with open(p, "wb") as f:
            f.write(blob)
        with pytest.raises(WavFormatError):
            read_au(p)
    # random corruption never escapes ValueError
    for trial in range(60):
        d = bytearray(base)
        if trial % 2:
            d = d[: int(rng.integers(1, len(d)))]
        else:
            i = int(rng.integers(0, len(d)))
            ln = int(rng.integers(1, 32))
            d[i:i + ln] = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        with open(p, "wb") as f:
            f.write(bytes(d))
        try:
            read_audio(p)
        except ValueError:
            pass


def test_cli_end_to_end(tmp_path):
    """analyze + apply an .au file through the phase-rotate CLI."""
    from phaserotate_tpu.cli import main as cli_main

    t = np.arange(RATE) / RATE
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    src = str(tmp_path / "in.au")
    out = str(tmp_path / "out.au")
    write_au(src, x[None], RATE)
    rc = cli_main(["-a", "35", src, out])
    assert rc in (0, None)
    y, rate, meta = read_audio(out)
    assert rate == RATE and meta.container == "AU"
    assert y.shape[1] > RATE - 4096
