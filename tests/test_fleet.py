"""Fleet CLI: batched multi-file analysis parity, padding exactness,
checkpoint resume, apply mode."""

import os

import numpy as np
import pytest

from phaserotate_tpu.fleet import analyze_paths, main
from phaserotate_tpu.io import read_audio, write_flac, write_wav
from phaserotate_tpu.search import find_min_peak_angle


@pytest.fixture()
def rng():
    return np.random.default_rng(41)


def _mk(tmp_path, rng, n_files=5, rate=48000, n=20000):
    paths = []
    t = np.arange(n) / rate
    for i in range(n_files):
        x = (0.4 * np.sin(2 * np.pi * (100 + 37 * i) * t)
             + 0.2 * np.sin(2 * np.pi * (210 + 11 * i) * t + 0.4)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, x, rate, bits=16, float_format=False)
        paths.append(p)
    return paths


def test_fleet_matches_single_file_search(tmp_path, rng):
    """Batched fleet results == per-file find_min_peak_angle, including
    the zero-padding to the bucket length (padding exactness)."""
    paths = _mk(tmp_path, rng, n_files=5)
    res = analyze_paths(paths, batch=3)  # 2 device batches
    for p in paths:
        audio, rate, _ = read_audio(p)
        want = find_min_peak_angle(audio, rate=rate)
        got, grate = res[p]
        assert grate == rate
        assert got.angles_units == want.angles_units, p
        np.testing.assert_allclose(got.peak_min, want.peak_min,
                                   rtol=0, atol=0)


def test_fleet_transport_parity(tmp_path, rng):
    """All three wire transports (pcm16 / packed / auto) must produce
    identical selections and peak tables — the packed unpack is
    bit-exact, so the device sees the same floats either way."""
    paths = _mk(tmp_path, rng, n_files=4)
    base = analyze_paths(paths, transport="pcm16")
    for transport in ("packed", "auto"):
        res = analyze_paths(paths, transport=transport)
        for p in paths:
            assert res[p][0].angles_units == base[p][0].angles_units, \
                (transport, p)
            np.testing.assert_array_equal(
                res[p][0].peak_min, base[p][0].peak_min)


def test_fleet_transport_parity_stereo(tmp_path, rng):
    """Stereo batches stage as (files, 2, n): the packed transport's
    stream axis covers files x channels — selections must still match
    the pcm16 wire per channel."""
    rate = 48000
    t = np.arange(30000) / rate
    paths = []
    for i in range(3):
        x = np.stack([
            0.5 * np.sin(2 * np.pi * (120 + 31 * i) * t)
            + 0.01 * rng.standard_normal(t.size),
            0.4 * np.sin(2 * np.pi * (260 + 17 * i) * t + 0.7)
            + 0.01 * rng.standard_normal(t.size),
        ]).astype(np.float32)
        p = str(tmp_path / f"s{i}.wav")
        write_wav(p, x, rate, bits=16, float_format=False)
        paths.append(p)
    base = analyze_paths(paths, transport="pcm16")
    res = analyze_paths(paths, transport="packed")
    for p in paths:
        assert res[p][0].angles_units == base[p][0].angles_units
        np.testing.assert_array_equal(
            res[p][0].peak_min, base[p][0].peak_min)


def test_fleet_mixed_lengths_and_formats(tmp_path, rng):
    """Different lengths land in different buckets; FLAC rides the
    same int16 ingest; results still match per-file search."""
    rate = 48000
    t1 = np.arange(15000) / rate
    t2 = np.arange(50000) / rate
    a = (0.5 * np.sin(2 * np.pi * 150 * t1)).astype(np.float32)
    b = (0.4 * np.sin(2 * np.pi * 440 * t2)
         + 0.2 * np.sin(2 * np.pi * 97 * t2)).astype(np.float32)
    pa = str(tmp_path / "a.wav")
    pb = str(tmp_path / "b.flac")
    write_wav(pa, a, rate, bits=16, float_format=False)
    write_flac(pb, b, rate, bits=16)
    res = analyze_paths([pa, pb])
    for p in (pa, pb):
        audio, r, _ = read_audio(p)
        want = find_min_peak_angle(audio, rate=r)
        assert res[p][0].angles_units == want.angles_units, p


def test_fleet_batched_apply_matches_per_file(tmp_path, rng):
    """apply_paths (one device pass per batch, files zero-padded to the
    bucket length) writes the same audio a per-file apply_angles run
    produces — padding exactness for the APPLY path, mixed lengths and
    channel counts in one fleet."""
    from phaserotate_tpu.core.sizes import offline_geometry
    from phaserotate_tpu.fleet import apply_paths
    from phaserotate_tpu.io import read_audio
    from phaserotate_tpu.search.sweep import apply_angles

    rate = 48000
    paths = _mk(tmp_path, rng, n_files=3, n=20000)
    t2 = np.arange(33333) / rate
    stereo = np.stack([
        0.5 * np.sin(2 * np.pi * 130 * t2),
        0.4 * np.sin(2 * np.pi * 270 * t2 + 0.5),
    ]).astype(np.float32)
    ps = str(tmp_path / "st.wav")
    write_wav(ps, stereo, rate, bits=16, float_format=False)
    paths.append(ps)

    results = analyze_paths(paths)
    outdir = str(tmp_path / "out")
    written = apply_paths(paths, results, outdir, batch=2)
    assert set(written) == set(paths)
    for p in paths:
        audio, arate, _ = read_audio(p)
        geom = offline_geometry(arate, 0)
        want = np.asarray(apply_angles(
            np.atleast_2d(np.asarray(audio, np.float32)),
            np.asarray(results[p][0].angles_units), geom))
        got, grate, _ = read_audio(written[p])
        assert grate == arate
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_fleet_checkpoint_resume(tmp_path, rng):
    paths = _mk(tmp_path, rng, n_files=4)
    ck = str(tmp_path / "sweeps.npz")
    r1 = analyze_paths(paths, checkpoint=ck)
    seen = []
    r2 = analyze_paths(
        paths, checkpoint=ck,
        progress=lambda p, res, cached: seen.append(cached))
    assert all(seen)  # every file served from stored sweeps
    for p in paths:
        assert r1[p][0].angles_units == r2[p][0].angles_units


def test_fleet_cli_analyze_and_apply(tmp_path, rng, capsys):
    from phaserotate_tpu.core.sizes import offline_geometry
    from phaserotate_tpu.search.sweep import apply_angles

    paths = _mk(tmp_path, rng, n_files=3)
    outdir = str(tmp_path / "out")
    assert main(paths + ["--apply", "--outdir", outdir]) == 0
    out = capsys.readouterr().out
    assert out.count("ch 1:") == 3
    res = analyze_paths(paths)
    for p in paths:
        dst = os.path.join(outdir, os.path.basename(p))
        y, rate, _ = read_audio(dst)
        src, _, _ = read_audio(p)
        assert y.shape == src.shape and rate == 48000
        # the written file IS the engine's apply output for the found
        # angle (note: like the reference CLI, the analysis table and
        # the applied file can differ at block edges for files only a
        # couple of blocks long — the guarantee is parity, not a strict
        # peak bound on tiny inputs)
        want = np.asarray(apply_angles(
            src, np.asarray(res[p][0].angles_units),
            offline_geometry(rate, 0)))
        np.testing.assert_allclose(y, want, atol=2e-7)


def test_fleet_lossy_inputs(tmp_path, rng):
    """Lossy sources (Vorbis/MP3) ride the quantizing ingest fallback
    and still produce valid fleet results."""
    from phaserotate_tpu.io import vorbisenc

    if not vorbisenc.available():
        pytest.skip("system libvorbis not present")
    from phaserotate_tpu.io import write_ogg

    rate = 48000
    t = np.arange(24000) / rate
    x = (0.5 * np.sin(2 * np.pi * 150 * t)
         + 0.2 * np.sin(2 * np.pi * 340 * t)).astype(np.float32)
    p = str(tmp_path / "l.ogg")
    write_ogg(p, x[None], rate, quality=0.5)
    res = analyze_paths([p])
    r, grate = res[p]
    assert grate == rate and len(r.angles_deg) == 1
    # parity with the single-file search over the same decoded audio
    audio, _, _ = read_audio(p)
    q = np.clip(np.rint(audio * 32768.0), -32768, 32767) / 32768.0
    want = find_min_peak_angle(q.astype(np.float32), rate=rate)
    assert r.angles_units == want.angles_units


def test_probe_audio_headers_match_decode(tmp_path, rng):
    """probe_audio reports exactly what a full decode yields, without
    decoding (WAV/FLAC headers; Ogg ID packet + final granule)."""
    import pytest

    from phaserotate_tpu.io import read_audio, write_audio
    from phaserotate_tpu.io.audio import probe_audio
    from phaserotate_tpu.io.vorbisenc import available as vorbis_encoder_available

    rate, n = 48000, 17311
    x = (0.4 * np.sin(2 * np.pi * 220 *
                      np.arange(n) / rate)).astype(np.float32)
    files = []
    for name in ("p.wav", "p.flac", "p.au"):
        p = str(tmp_path / name)
        write_audio(p, x[None], rate)
        files.append(p)
    if vorbis_encoder_available():
        p = str(tmp_path / "p.ogg")
        write_audio(p, np.stack([x, -x]), rate)
        files.append(p)
    from phaserotate_tpu.io.opus import available as opus_available

    if opus_available():
        p = str(tmp_path / "p.opus")
        write_audio(p, x[None], rate)
        files.append(p)
    for p in files:
        audio, arate, _ = read_audio(p)
        rate_p, ch_p, n_p = probe_audio(p)
        assert rate_p == arate, p
        assert ch_p == audio.shape[0], p
        assert n_p == audio.shape[1], p


def _ogg_page(granule: int, body: bytes, htype: int = 4) -> bytes:
    """Hand-built, CRC-valid Ogg page (for granule-scan tests)."""
    import struct

    from phaserotate_tpu.io.vorbis import _ogg_crc

    segs, n = [], len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    hdr = (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
           + struct.pack("<I", 1) + struct.pack("<I", 0)
           + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs))
    page = hdr + body
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def test_ogg_final_granule_validates_pages(tmp_path):
    """An 'OggS' byte pattern inside packet data must not be trusted as
    a page: the scan validates version byte + CRC and falls back to the
    real page; negative (Vorbis -1) granules clamp to 0."""
    from phaserotate_tpu.io.audio import _ogg_final_granule

    # spurious capture pattern INSIDE the final page's packet data,
    # followed by a non-zero byte so it can't parse as version 0
    body = b"\x01" * 40 + b"OggS\x07garbage-not-a-page" + b"\x02" * 40
    p = str(tmp_path / "spurious.ogg")
    with open(p, "wb") as f:
        f.write(_ogg_page(98765, body))
    assert _ogg_final_granule(p) == 98765

    # a valid page carrying granule -1 clamps to 0, not a bogus count
    p2 = str(tmp_path / "neg.ogg")
    with open(p2, "wb") as f:
        f.write(_ogg_page(-1, b"\x00" * 16))
    assert _ogg_final_granule(p2) == 0

    # no valid page at all -> -1 (probe falls back to full decode)
    p3 = str(tmp_path / "junk.ogg")
    with open(p3, "wb") as f:
        f.write(b"OggS" + b"\xff" * 100)
    assert _ogg_final_granule(p3) == -1
