"""W64 / RF64 / CAF containers: roundtrips, dispatch, format details
(reference breadth parity: cli/phase-rotate.cc:33 sf_open)."""

import struct

import numpy as np
import pytest

from phaserotate_tpu.io import (
    WavFormatError,
    WavMetadata,
    read_audio,
    read_caf,
    read_rf64,
    read_w64,
    write_audio,
    write_caf,
    write_rf64,
    write_w64,
)


def _tone(ch=2, n=12000):
    t = np.arange(n) / 48000.0
    x = np.stack([0.5 * np.sin(2 * np.pi * 440 * t),
                  0.3 * np.sin(2 * np.pi * 220 * t)][:ch])
    return x.astype(np.float32)


@pytest.mark.parametrize("writer,reader,ext", [
    (write_w64, read_w64, "w64"),
    (write_rf64, read_rf64, "rf64"),
    (write_caf, read_caf, "caf"),
])
@pytest.mark.parametrize("ch", [1, 2])
def test_float_roundtrip_exact(tmp_path, writer, reader, ext, ch):
    """Default float32 encode: bit-exact roundtrip."""
    x = _tone(ch=ch)
    p = str(tmp_path / f"t.{ext}")
    writer(p, x, 48000)
    y, rate, meta = reader(p)
    assert rate == 48000
    np.testing.assert_array_equal(y, x)
    assert meta.container in ("W64", "RF64", "CAF")


@pytest.mark.parametrize("writer,reader,ext", [
    (write_w64, read_w64, "w64"),
    (write_rf64, read_rf64, "rf64"),
    (write_caf, read_caf, "caf"),
])
def test_pcm24_roundtrip(tmp_path, writer, reader, ext):
    x = _tone()
    p = str(tmp_path / f"t.{ext}")
    writer(p, x, 48000, bits=24, float_format=False)
    y, _, _ = reader(p)
    assert np.abs(y - x).max() < 2.0 ** -22


def test_dispatch_by_magic_and_extension(tmp_path):
    """read_audio sniffs all three by magic; write_audio routes the
    extensions and inherits the container for extension-less outputs."""
    x = _tone()
    for ext, container in (("w64", "W64"), ("rf64", "RF64"),
                           ("caf", "CAF")):
        src = str(tmp_path / f"in.{ext}")
        write_audio(src, x, 48000)
        y, rate, meta = read_audio(src)
        assert meta.container == container
        np.testing.assert_array_equal(y, x)
        out = str(tmp_path / f"out_{ext}_noext")
        write_audio(out, y, rate, meta, like=src)
        _, _, m2 = read_audio(out)
        assert m2.container == container  # inherited like sf_open


def test_rf64_ds64_size_override(tmp_path):
    """The data chunk's 32-bit size field must hold the 0xFFFFFFFF
    sentinel with the true size in ds64 (the whole point of RF64)."""
    x = _tone(ch=1, n=4000)
    p = str(tmp_path / "t.rf64")
    write_rf64(p, x, 48000)
    blob = open(p, "rb").read()
    assert blob[:4] == b"RF64"
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    assert riff_size == 0xFFFFFFFF
    i = blob.index(b"data")
    (dsize,) = struct.unpack_from("<I", blob, i + 4)
    assert dsize == 0xFFFFFFFF
    i = blob.index(b"ds64")
    _, data_size, frames = struct.unpack_from("<QQQ", blob, i + 8)
    assert data_size == 4000 * 4 and frames == 4000
    # and a reader that ignores ds64 must fail loudly, not mis-read
    y, _, _ = read_rf64(p)
    np.testing.assert_array_equal(y, x)


def test_rf64_missing_ds64_rejected(tmp_path):
    x = _tone(ch=1, n=100)
    p = str(tmp_path / "t.rf64")
    write_rf64(p, x, 48000)
    blob = bytearray(open(p, "rb").read())
    i = blob.index(b"ds64")
    blob[i : i + 4] = b"junk"  # hide the size override
    open(p, "wb").write(bytes(blob))
    with pytest.raises(WavFormatError, match="ds64"):
        read_rf64(p)


def test_caf_big_endian_and_last_chunk_sentinel(tmp_path):
    """Hand-built CAF: big-endian 16-bit PCM with the -1 last-chunk
    size — both decoder paths our writer does not emit."""
    n = 256
    samples = (np.sin(np.arange(n) * 0.1) * 20000).astype(">i2")
    desc = struct.pack(">d4sIIIII", 48000.0, b"lpcm", 0, 2, 1, 1, 16)
    blob = (b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", len(desc)) + desc
            + b"data" + struct.pack(">q", -1)
            + struct.pack(">I", 0) + samples.tobytes())
    p = str(tmp_path / "be.caf")
    open(p, "wb").write(blob)
    y, rate, _ = read_caf(p)
    assert rate == 48000 and y.shape == (1, n)
    np.testing.assert_allclose(
        y[0], samples.astype(np.float64) / 32768.0, atol=1e-7)


def test_caf_info_strings(tmp_path):
    meta = WavMetadata()
    meta.info[b"INAM"] = "master A"
    meta.info[b"IART"] = "someone"
    p = str(tmp_path / "t.caf")
    write_caf(p, _tone(n=500), 48000, meta)
    _, _, m = read_caf(p)
    assert m.info[b"INAM"] == "master A"
    assert m.info[b"IART"] == "someone"


def test_caf_non_lpcm_rejected(tmp_path):
    desc = struct.pack(">d4sIIIII", 48000.0, b"aac ", 0, 2, 1, 1, 16)
    blob = (b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", len(desc)) + desc
            + b"data" + struct.pack(">q", 8) + b"\x00" * 8)
    p = str(tmp_path / "bad.caf")
    open(p, "wb").write(blob)
    with pytest.raises(WavFormatError, match="LPCM"):
        read_caf(p)


def test_truncation_detected(tmp_path):
    for writer, ext in ((write_w64, "w64"), (write_caf, "caf")):
        p = str(tmp_path / f"t.{ext}")
        writer(p, _tone(n=2000), 48000)
        blob = open(p, "rb").read()
        open(p, "wb").write(blob[: len(blob) // 2])
        with pytest.raises(WavFormatError, match="truncated|missing"):
            read_audio(p)


def test_cli_accepts_w64(tmp_path):
    """CLI end to end on a W64 file."""
    from phaserotate_tpu.cli import main

    rate = 48000
    t = np.arange(rate // 2) / rate
    x = (0.5 * np.sin(2 * np.pi * 100 * t)
         + 0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    src = str(tmp_path / "in.w64")
    write_w64(src, x, rate)
    dst = str(tmp_path / "out.w64")
    assert main(["-a", "45", src, dst]) == 0
    y, r, _ = read_w64(dst)
    assert r == rate and y.shape[1] == len(x)


def test_fuzzed_containers_never_escape_format_error(tmp_path):
    """Byte flips + truncations in W64/RF64/CAF must fail as
    WavFormatError or decode, never raw struct/index errors."""
    rng = np.random.default_rng(13)
    from phaserotate_tpu.io import write_aiff

    for writer, ext in ((write_w64, "w64"), (write_rf64, "rf64"),
                        (write_caf, "caf"), (write_aiff, "aiff")):
        p = str(tmp_path / f"t.{ext}")
        writer(p, _tone(n=3000), 48000)
        good = np.frombuffer(open(p, "rb").read(), np.uint8)
        for _ in range(40):
            data = good.copy()
            if rng.random() < 0.5:
                data = data[: rng.integers(0, len(data))].copy()
            if len(data):
                data[rng.integers(0, len(data))] ^= 1 << rng.integers(0, 8)
            open(p, "wb").write(data.tobytes())
            try:
                read_audio(p)
            except (WavFormatError, Exception) as e:
                from phaserotate_tpu.io import FlacFormatError

                assert isinstance(
                    e, (WavFormatError, FlacFormatError)), repr(e)


def test_w64_rf64_metadata_passthrough(tmp_path):
    """INFO strings, bext, and cues survive W64 and RF64 roundtrips —
    the same passthrough contract the WAV writer honors
    (cli/phase-rotate.cc:541-563 copy_metadata)."""
    meta = WavMetadata()
    meta.info[b"INAM"] = "master B"
    meta.info[b"IART"] = "engineer"
    meta.bext = b"B" * 602
    meta.cues = b"\x01\x00\x00\x00" + b"C" * 24
    for writer, reader, ext in ((write_w64, read_w64, "w64"),
                                (write_rf64, read_rf64, "rf64")):
        p = str(tmp_path / f"t.{ext}")
        writer(p, _tone(n=500), 48000, meta)
        y, _, m = reader(p)
        assert m.info[b"INAM"] == "master B", ext
        assert m.info[b"IART"] == "engineer", ext
        assert m.bext == meta.bext, ext
        assert m.cues == meta.cues, ext
        np.testing.assert_array_equal(y, _tone(n=500))


def test_caf_negative_chunk_size_rejected(tmp_path):
    """A corrupt CAF chunk size of e.g. -12 must raise, not hang: only
    the -1 run-to-EOF sentinel is a legal negative size (advisor
    finding: pos += 12 + size advanced zero bytes -> infinite loop)."""
    p = str(tmp_path / "neg.caf")
    write_caf(p, _tone(n=500), 48000)
    blob = bytearray(open(p, "rb").read())
    # first chunk header starts at offset 8: fourcc(4) + i64 size
    for bad in (-12, -2, -(1 << 40)):
        blob[12:20] = struct.pack(">q", bad)
        open(p, "wb").write(bytes(blob))
        with pytest.raises(WavFormatError, match="negative"):
            read_caf(p)


def test_caf_short_desc_rejected(tmp_path):
    """A desc chunk shorter than its 32-byte body must fail as a
    format error, not a raw struct.error."""
    blob = (b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", 8) + b"\x00" * 8)
    p = str(tmp_path / "short.caf")
    open(p, "wb").write(blob)
    with pytest.raises(WavFormatError, match="short desc"):
        read_caf(p)


def test_rf64_truncated_fmt_rejected_before_parse(tmp_path):
    """RF64 bounds-checks chunk payloads BEFORE unpacking them: a fmt
    chunk whose declared size runs past EOF raises WavFormatError."""
    p = str(tmp_path / "t.rf64")
    write_rf64(p, _tone(n=500), 48000)
    blob = bytearray(open(p, "rb").read())
    fmt_at = bytes(blob).index(b"fmt ")
    # declare a fmt size far past EOF
    blob[fmt_at + 4 : fmt_at + 8] = struct.pack("<I", 1 << 30)
    open(p, "wb").write(bytes(blob))
    with pytest.raises(WavFormatError, match="truncated"):
        read_rf64(p)


def test_w64_short_fmt_rejected(tmp_path):
    """W64 fmt payload shorter than 16 bytes is a format error."""
    from phaserotate_tpu.io.containers import _W64_RIFF, _w64_guid

    fmt_chunk = _w64_guid(b"fmt ") + struct.pack("<Q", 24 + 8) + b"\x00" * 8
    body = _w64_guid(b"wave") + fmt_chunk
    blob = _W64_RIFF + struct.pack("<Q", 24 + len(body)) + body
    p = str(tmp_path / "short.w64")
    open(p, "wb").write(blob)
    with pytest.raises(WavFormatError, match="short fmt"):
        read_w64(p)
