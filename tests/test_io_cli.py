"""WAV I/O round trips and the phase-rotate compatible CLI."""

import subprocess
import sys

import numpy as np
import pytest

from phaserotate_tpu.io.wav import WavMetadata, read_wav, write_wav


def tone(n=20000, rate=44100, chans=2):
    t = np.arange(n) / rate
    return np.stack([
        (0.6 * np.sin(2 * np.pi * 500 * t + c)
         + 0.3 * np.sin(2 * np.pi * 1100 * t)).astype(np.float32)
        for c in range(chans)
    ])


def test_wav_float_roundtrip(tmp_path):
    x = tone()
    p = tmp_path / "a.wav"
    write_wav(str(p), x, 44100)
    y, rate, meta = read_wav(str(p))
    assert rate == 44100
    np.testing.assert_array_equal(y, x)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_pcm_roundtrip(tmp_path, bits):
    x = tone() * 0.8
    p = tmp_path / "p.wav"
    write_wav(str(p), x, 48000, bits=bits, float_format=False)
    y, rate, _ = read_wav(str(p))
    tol = 2.0 ** -(bits - 1)
    assert np.abs(y - x).max() <= tol * 1.01


def test_wav_metadata_roundtrip(tmp_path):
    x = tone(n=4000)
    meta = WavMetadata(
        info={b"INAM": "My Track", b"IART": "An Artist"},
        cues=b"\x01\x00\x00\x00" + b"\x00" * 24,
        bext=b"B" * 602,
    )
    p = tmp_path / "m.wav"
    write_wav(str(p), x, 44100, meta)
    _, _, got = read_wav(str(p))
    assert got.info[b"INAM"] == "My Track"
    assert got.info[b"IART"] == "An Artist"
    assert got.cues == meta.cues
    assert got.bext == meta.bext


def test_wav_mono_1d(tmp_path):
    x = tone(chans=1)[0]
    p = tmp_path / "mono.wav"
    write_wav(str(p), x, 22050)
    y, rate, _ = read_wav(str(p))
    assert y.shape == (1, len(x))


def run_cli(args):
    from phaserotate_tpu import cli

    return cli.main(args)


def test_cli_analysis_prints_result(tmp_path, capsys):
    p = tmp_path / "in.wav"
    write_wav(str(p), tone(n=12000), 44100)
    rc = run_cli([str(p), "-f", "1024"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "# Result -- Minimize digital peak" in out
    assert "Channel:  1 Phase:" in out
    assert "Channel:  2 Phase:" in out


def test_cli_apply_roundtrip(tmp_path, capsys):
    src = tmp_path / "in.wav"
    dst = tmp_path / "out.wav"
    x = tone(n=8192)
    meta = WavMetadata(info={b"INAM": "Keep Me"})
    write_wav(str(src), x, 44100, meta)
    rc = run_cli(["-a", "35", str(src), str(dst), "-f", "1024"])
    assert rc == 0
    y, rate, got_meta = read_wav(str(dst))
    assert y.shape == x.shape
    assert got_meta.info[b"INAM"] == "Keep Me"
    # energy preserved (rotation property)
    assert np.sum(y**2) == pytest.approx(np.sum(x**2), rel=5e-2)


def test_cli_apply_per_channel_angles(tmp_path):
    src = tmp_path / "in.wav"
    dst = tmp_path / "out.wav"
    x = tone(n=6000)
    write_wav(str(src), x, 44100)
    assert run_cli(["-a", "10,20", str(src), str(dst), "-f", "1024"]) == 0
    # zero rotation on both channels reproduces input
    dst2 = tmp_path / "out2.wav"
    assert run_cli(["-a", "0", str(src), str(dst2), "-f", "1024"]) == 0
    y, _, _ = read_wav(str(dst2))
    np.testing.assert_allclose(y, x, atol=2e-6)


def test_cli_validation_errors(tmp_path):
    p = tmp_path / "in.wav"
    write_wav(str(p), tone(n=4000), 44100)
    with pytest.raises(SystemExit):
        run_cli(["-s", "7", str(p)])  # bad stride
    with pytest.raises(SystemExit):
        run_cli(["-f", "100", str(p)])  # fftlen out of bounds
    with pytest.raises(SystemExit):
        run_cli(["-a", "35", str(p)])  # -a without out-file
    with pytest.raises(SystemExit):
        run_cli(["-a", "999", str(p), str(tmp_path / "o.wav")])  # bad angle
    with pytest.raises(SystemExit):
        run_cli([])  # missing file


def test_cli_verbose_gnuplot(tmp_path, capsys):
    p = tmp_path / "in.wav"
    write_wav(str(p), tone(n=12000), 44100)
    rc = run_cli(["-vv", "-f", "1024", str(p)])
    captured = capsys.readouterr()
    assert rc == 0
    # gnuplot data on stdout, logs on stderr (cli/phase-rotate.cc:704)
    assert "# Angle mono-peak chn-1 chn-2" in captured.out
    assert "Process block-size 1024" in captured.err
    rows = [l for l in captured.out.splitlines()
            if l and l[0].isdigit()]
    assert len(rows) >= MAXSAMPLE_ROWS_MIN


MAXSAMPLE_ROWS_MIN = 15  # coarse rows (360/24) at default stride


def test_wav_malformed_rejected(tmp_path):
    from phaserotate_tpu.io.wav import WavFormatError

    p = tmp_path / "bad.wav"
    p.write_bytes(b"RIFFxxxxNOPE" + b"\x00" * 50)
    with pytest.raises(WavFormatError):
        read_wav(str(p))
    p2 = tmp_path / "trunc.wav"
    p2.write_bytes(b"RIFF\x04\x00\x00\x00WAVE")  # no fmt/data
    with pytest.raises(WavFormatError):
        read_wav(str(p2))


def test_cli_missing_input_file(tmp_path, capsys):
    from phaserotate_tpu import cli

    rc = cli.main([str(tmp_path / "nope.wav")])
    assert rc == 1
    assert "Cannot open" in capsys.readouterr().err


def test_wav_truncated_data_chunk_rejected(tmp_path):
    """A data chunk shorter than its declared size must raise, not
    silently shorten the audio (round-1 advisor finding)."""
    from phaserotate_tpu.io.wav import WavFormatError

    p = tmp_path / "ok.wav"
    write_wav(str(p), np.zeros(1000, np.float32), 48000)
    blob = bytearray(p.read_bytes())
    p3 = tmp_path / "cut.wav"
    p3.write_bytes(bytes(blob[:-100]))  # cut 100 bytes off the data chunk
    with pytest.raises(WavFormatError, match="truncated"):
        read_wav(str(p3))


def test_angle_units_c_round_semantics():
    """Half-unit angles round away from zero like C round(), not to even
    (cli/phase-rotate.cc:730 uses rintf-free round)."""
    from phaserotate_tpu.core.angles import angle_units_from_degrees

    assert angle_units_from_degrees(10.25) == 21
    assert angle_units_from_degrees(-10.25) == -21
    assert angle_units_from_degrees(10.0) == 20
    assert angle_units_from_degrees(0.25) == 1
    assert angle_units_from_degrees(-0.25) == -1
    assert angle_units_from_degrees(0.0) == 0


def test_cli_profile_trace(tmp_path, monkeypatch, capsys):
    """PHASEROTATE_TPU_PROFILE captures a jax.profiler trace of the run
    (the tracing hook of SURVEY.md section 5)."""
    from phaserotate_tpu import cli

    src = tmp_path / "in.wav"
    write_wav(str(src), np.zeros(30000, np.float32), 48000)
    trace_dir = tmp_path / "trace"
    monkeypatch.setenv("PHASEROTATE_TPU_PROFILE", str(trace_dir))
    assert cli.main([str(src)]) == 0
    capsys.readouterr()
    found = list(trace_dir.rglob("*.xplane.pb")) + \
        list(trace_dir.rglob("*trace*"))
    assert found, "no trace artifacts written"


class TestAiff:
    def test_roundtrip_bits(self, tmp_path, rng):
        from phaserotate_tpu.io import read_aiff, write_aiff

        x = np.clip(0.5 * rng.standard_normal((2, 3000)), -0.99,
                    0.99).astype(np.float32)
        for bits, tol in ((16, 1 / 32768), (24, 1 / 8388608),
                          (32, 1e-7)):
            p = tmp_path / f"a{bits}.aiff"
            write_aiff(str(p), x, 44100, bits=bits, float_format=False)
            y, rate, _ = read_aiff(str(p))
            assert rate == 44100 and y.shape == x.shape
            assert np.abs(y - x).max() <= tol
            assert p.read_bytes()[8:12] == b"AIFF"  # classic PCM form

    def test_f80_rates(self, tmp_path):
        from phaserotate_tpu.io import read_aiff, write_aiff

        for rate in (8000, 22050, 44100, 48000, 96000, 192000):
            p = tmp_path / "r.aiff"
            write_aiff(str(p), np.zeros(100, np.float32), rate)
            _, got, _ = read_aiff(str(p))
            assert got == rate

    def test_metadata_text_chunks(self, tmp_path):
        from phaserotate_tpu.io import read_aiff, write_aiff

        meta = WavMetadata()
        meta.info[b"INAM"] = "My Song"
        meta.info[b"IART"] = "An Artist"
        p = tmp_path / "m.aiff"
        write_aiff(str(p), np.zeros(64, np.float32), 48000, meta=meta)
        _, _, got = read_aiff(str(p))
        assert got.info[b"INAM"] == "My Song"
        assert got.info[b"IART"] == "An Artist"

    def test_dispatch_sniffs_and_writes_by_ext(self, tmp_path, rng):
        from phaserotate_tpu.io import read_audio, write_audio

        x = np.clip(0.3 * rng.standard_normal(500), -0.99,
                    0.99).astype(np.float32)
        a = tmp_path / "x.aiff"
        w = tmp_path / "x.wav"
        write_audio(str(a), x, 48000)
        write_audio(str(w), x, 48000)
        assert a.read_bytes()[:4] == b"FORM"
        assert w.read_bytes()[:4] == b"RIFF"
        ya, ra, _ = read_audio(str(a))
        yw, rw, _ = read_audio(str(w))
        assert ra == rw == 48000
        np.testing.assert_allclose(ya[0], yw[0], atol=1 / 8388608)

    def test_truncated_aiff_rejected(self, tmp_path):
        from phaserotate_tpu.io import read_aiff, write_aiff
        from phaserotate_tpu.io.wav import WavFormatError

        p = tmp_path / "t.aiff"
        write_aiff(str(p), np.zeros(1000, np.float32), 48000)
        cut = tmp_path / "cut.aiff"
        cut.write_bytes(p.read_bytes()[:-50])
        with pytest.raises(WavFormatError, match="truncated"):
            read_aiff(str(cut))

    def test_cli_end_to_end_aiff(self, tmp_path, capsys):
        """Analyze and apply on an AIFF input; output inherits AIFF."""
        from phaserotate_tpu import cli
        from phaserotate_tpu.io import read_aiff, write_aiff
        from phaserotate_tpu.ops import rotate_fir

        rng2 = np.random.default_rng(3)
        x = (0.4 * rng2.standard_normal(30000)).astype(np.float32)
        src = tmp_path / "in.aiff"
        write_aiff(str(src), x, 48000, bits=32)
        assert cli.main([str(src)]) == 0  # analysis runs
        out = capsys.readouterr().out
        assert "Phase:" in out or "deg" in out

        dst = tmp_path / "out.aiff"
        assert cli.main(["-a", "0", str(src), str(dst)]) == 0
        y, rate, _ = read_aiff(str(dst))
        x32, _, _ = read_aiff(str(src))
        assert rate == 48000
        np.testing.assert_allclose(y[0], x32[0], atol=2 / 8388608)

    def test_malformed_aiff_raises_wavformaterror(self, tmp_path):
        """Every malformation surfaces as WavFormatError so the CLI's
        error handling covers AIFF like WAV (round-2 self-review)."""
        from phaserotate_tpu.io import read_aiff
        from phaserotate_tpu.io.wav import WavFormatError
        import struct

        def form(body):
            return b"FORM" + struct.pack(">I", len(body) + 4) + b"AIFF" + body

        cases = {
            "short COMM": form(b"COMM" + struct.pack(">I", 4) + b"\x00" * 4),
            "short SSND": form(
                b"COMM" + struct.pack(">I", 18)
                + struct.pack(">hIh", 1, 0, 16) + b"\x40\x0e" + b"\xac\x44"
                + b"\x00" * 6
                + b"SSND" + struct.pack(">I", 4) + b"\x00" * 4),
            "missing chunks": form(b""),
        }
        for name, blob in cases.items():
            p = tmp_path / "bad.aiff"
            p.write_bytes(blob)
            with pytest.raises(WavFormatError):
                read_aiff(str(p))

    def test_ssnd_shorter_than_comm_frames_raises(self, tmp_path):
        from phaserotate_tpu.io import read_aiff, write_aiff
        from phaserotate_tpu.io.wav import WavFormatError
        import struct

        p = tmp_path / "s.aiff"
        write_aiff(str(p), np.zeros(1000, np.float32), 48000,
                   float_format=False, bits=16)
        blob = bytearray(p.read_bytes())
        # inflate the declared COMM frame count past the SSND data
        comm_at = blob.find(b"COMM")
        struct.pack_into(">I", blob, comm_at + 8 + 2, 5000)
        p2 = tmp_path / "s2.aiff"
        p2.write_bytes(bytes(blob))
        with pytest.raises(WavFormatError, match="frames"):
            read_aiff(str(p2))

    def test_float_default_is_lossless(self, tmp_path, rng):
        """write_aiff defaults to AIFF-C fl32 — bit-exact roundtrip,
        matching the WAV writer's float32 default (round-2 self-review:
        the 24-bit default silently quantized AIFF outputs)."""
        from phaserotate_tpu.io import read_aiff, write_aiff

        x = rng.standard_normal((2, 2000)).astype(np.float32) * 1.7
        p = tmp_path / "f.aiff"
        write_aiff(str(p), x, 96000)
        y, rate, _ = read_aiff(str(p))
        assert rate == 96000
        np.testing.assert_array_equal(y, x)
        assert b"AIFC" in p.read_bytes()[:12]

    def test_like_sniffs_content_not_extension(self, tmp_path, rng):
        """An extension-less AIFF input keeps producing AIFF output."""
        from phaserotate_tpu.io import read_audio, write_audio, write_aiff

        x = (0.3 * rng.standard_normal(400)).astype(np.float32)
        src = tmp_path / "master"  # no extension
        write_aiff(str(src), x, 48000)
        out = tmp_path / "out"  # no extension either
        write_audio(str(out), x, 48000, like=str(src))
        assert out.read_bytes()[:4] == b"FORM"
        y, _, _ = read_audio(str(out))
        np.testing.assert_array_equal(y[0], x)

    def test_f80_overflow_raises_wavformaterror(self, tmp_path):
        """An inf/huge COMM rate encoding must not leak OverflowError."""
        from phaserotate_tpu.io import read_aiff
        from phaserotate_tpu.io.wav import WavFormatError
        import struct

        comm = (struct.pack(">hIh", 1, 0, 16)
                + struct.pack(">HQ", 0x7FFF, 1 << 63))  # inf encoding
        body = (b"AIFF" + b"COMM" + struct.pack(">I", 18) + comm
                + b"SSND" + struct.pack(">I", 8) + b"\x00" * 8)
        p = tmp_path / "inf.aiff"
        p.write_bytes(b"FORM" + struct.pack(">I", len(body)) + body)
        with pytest.raises(WavFormatError, match="bad COMM"):
            read_aiff(str(p))

    def test_cli_vvv_names_the_container(self, tmp_path, capsys, rng):
        from phaserotate_tpu import cli
        from phaserotate_tpu.io import write_aiff

        x = (0.3 * rng.standard_normal(30000)).astype(np.float32)
        p = tmp_path / "in.aiff"
        write_aiff(str(p), x, 48000)
        assert cli.main(["-vvv", str(p)]) == 0
        err = capsys.readouterr().err
        assert "FORM/AIFC" in err and "RIFF/WAVE" not in err


def test_wav_zero_channels_rejected(tmp_path):
    """fmt.channels == 0 must raise WavFormatError, not ZeroDivision."""
    from phaserotate_tpu.io.wav import WavFormatError
    import struct

    fmt = struct.pack("<HHIIHH", 1, 0, 48000, 0, 0, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    p = tmp_path / "z.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(WavFormatError, match="bad fmt"):
        read_wav(str(p))


def test_cli_version_flag(capsys):
    from phaserotate_tpu import cli

    assert cli.main(["-V"]) == 0
    out = capsys.readouterr().out
    assert "phase-rotate version" in out and "phaserotate-tpu" in out


def test_aiff_pcm16_fleet_fast_path(tmp_path):
    """read_audio_pcm16 takes the no-float path for 16-bit PCM AIFF
    (big-endian byteswap) and matches the float reader's quantization;
    other encodings fall back to quantize."""
    import numpy as np
    import pytest

    from phaserotate_tpu.io import read_aiff, read_audio_pcm16, write_aiff
    from phaserotate_tpu.io.aiff import read_aiff_pcm16
    from phaserotate_tpu.io.wav import WavFormatError

    rate = 48000
    t = np.arange(4800) / rate
    x = np.stack([0.7 * np.sin(2 * np.pi * (330 + 110 * c) * t)
                  for c in range(2)]).astype(np.float32)
    p = str(tmp_path / "t.aiff")
    write_aiff(p, x, rate, bits=16, float_format=False)
    q, r2, _ = read_audio_pcm16(p)
    assert q.dtype == np.int16 and r2 == rate and q.shape == x.shape
    y = read_aiff(p)[0]
    ref = np.clip(np.rint(y * 32768.0), -32768, 32767).astype(np.int16)
    assert np.array_equal(q, ref)
    # fl32 AIFF-C is not raw-PCM16: explicit reader raises, dispatch
    # falls back to quantize
    write_aiff(p, x, rate)  # default fl32
    with pytest.raises(WavFormatError):
        read_aiff_pcm16(p)
    q2, _, _ = read_audio_pcm16(p)
    assert q2.dtype == np.int16 and q2.shape == x.shape
