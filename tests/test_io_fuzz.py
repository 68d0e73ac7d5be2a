"""Corruption fuzz for the lossy decode surfaces (Ogg Vorbis, Ogg Opus,
MP3): the io contract is that malformed INPUT raises a ValueError
subclass (WavFormatError / FlacFormatError / OggFormatError /
Mp3FormatError) — never an internal exception type, never a hang.

Two layers, mirroring tests/test_flac.py's container fuzz:

* whole-file corruption (bit flips, scrambles, truncation) — mostly
  stopped at the Ogg page CRC / MPEG frame sync, which must itself be a
  clean format error;
* PACKET-level corruption re-muxed into pages with VALID CRCs, so the
  corrupt bytes reach the deep Vorbis parsers (codebooks, floors,
  residues, audio packet decode).  This is the layer that caught two
  real bugs: a truncated header packet escaping as the internal
  ``_EndOfPacket`` exception, and an audio packet truncated inside the
  mode/window header hitting ``UnboundLocalError`` (spec says such a
  packet is dropped).
"""

import os
import struct

import numpy as np
import pytest

from phaserotate_tpu.io import mp3, opus, read_audio, vorbisenc, write_audio
from phaserotate_tpu.io.opus import _ogg_page
from phaserotate_tpu.io.vorbis import _ogg_packets

RATE = 48000
N = 12000  # 0.25 s — enough for every packet type, fast to decode


def _tone(ch=2):
    t = np.arange(N) / RATE
    return np.stack([0.5 * np.sin(2 * np.pi * (440 + 200 * c) * t)
                     for c in range(ch)]).astype(np.float32)


def _check(path: str, data: bytes) -> None:
    """Decode must succeed or raise ValueError — nothing else."""
    with open(path, "wb") as f:
        f.write(data)
    try:
        read_audio(path)
    except ValueError:
        pass


def _whole_file_trials(base: bytes, path: str, ntrials: int) -> None:
    rng = np.random.default_rng(0)
    for trial in range(ntrials):
        d = bytearray(base)
        kind = trial % 3
        if kind == 0:
            i = int(rng.integers(0, len(d)))
            d[i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1:
            i = int(rng.integers(0, len(d)))
            ln = int(rng.integers(1, 64))
            d[i:i + ln] = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        else:
            d = d[: int(rng.integers(1, len(d)))]
        _check(path, bytes(d))


@pytest.mark.skipif(not vorbisenc.available(),
                    reason="system libvorbis not present")
def test_vorbis_whole_file_corruption(tmp_path):
    src = str(tmp_path / "t.ogg")
    write_audio(src, _tone(), RATE)
    _whole_file_trials(open(src, "rb").read(), str(tmp_path / "f.ogg"),
                       45)


@pytest.mark.skipif(not opus.available(),
                    reason="system libopus not present")
def test_opus_whole_file_corruption(tmp_path):
    src = str(tmp_path / "t.opus")
    write_audio(src, _tone(), RATE)
    _whole_file_trials(open(src, "rb").read(),
                       str(tmp_path / "f.opus"), 45)


@pytest.mark.skipif(not mp3.available(),
                    reason="system libmpg123/libmp3lame not present")
def test_mp3_whole_file_corruption(tmp_path):
    src = str(tmp_path / "t.mp3")
    write_audio(src, _tone(), RATE)
    _whole_file_trials(open(src, "rb").read(), str(tmp_path / "f.mp3"),
                       45)


def _remux(packets, granule) -> bytes:
    """Packets -> BOS page + one page per packet, all with valid CRCs."""
    out = b""
    for i, pkt in enumerate(packets):
        htype = 2 if i == 0 else (4 if i == len(packets) - 1 else 0)
        g = granule if i == len(packets) - 1 else (0 if i < 3 else -1)
        out += _ogg_page(1234, i, g, [pkt[:255 * 254]], htype)
    return out


@pytest.mark.skipif(not vorbisenc.available(),
                    reason="system libvorbis not present")
def test_vorbis_packet_corruption_reaches_parsers(tmp_path):
    """Valid-CRC pages carrying corrupt packets: the Vorbis header and
    audio parsers themselves must keep the ValueError contract."""
    src = str(tmp_path / "t.ogg")
    write_audio(src, _tone(), RATE)
    packets, granule = _ogg_packets(open(src, "rb").read())
    path = str(tmp_path / "f.ogg")
    rng = np.random.default_rng(1)
    for trial in range(48):
        pkts = [bytearray(p) for p in packets]
        # bias half the trials onto the three header packets
        if trial % 2 == 0 and len(pkts) >= 3:
            pi = int(rng.integers(0, 3))
        else:
            pi = int(rng.integers(0, len(pkts)))
        p = pkts[pi]
        kind = trial % 3
        if kind == 0 and len(p):
            for _ in range(1 + int(rng.integers(0, 6))):
                i = int(rng.integers(0, len(p)))
                p[i] ^= 1 << int(rng.integers(0, 8))
        elif kind == 1 and len(p):
            pkts[pi] = p[: int(rng.integers(0, len(p)))]
        else:
            i = int(rng.integers(0, len(p) + 1))
            ln = int(rng.integers(1, 48))
            p[i:i + ln] = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        _check(path, _remux([bytes(q) for q in pkts], granule))


@pytest.mark.skipif(not vorbisenc.available(),
                    reason="system libvorbis not present")
def test_vorbis_truncated_packets_regressions(tmp_path):
    """The two observed escape classes, pinned deterministically."""
    from phaserotate_tpu.io.vorbis import OggFormatError

    src = str(tmp_path / "t.ogg")
    write_audio(src, _tone(), RATE)
    packets, granule = _ogg_packets(open(src, "rb").read())
    path = str(tmp_path / "f.ogg")

    # truncated identification/setup header -> OggFormatError (was the
    # internal _EndOfPacket leaking out)
    for pi, cut in ((0, 11), (2, 40)):
        pkts = list(packets)
        pkts[pi] = pkts[pi][:cut]
        with open(path, "wb") as f:
            f.write(_remux(pkts, granule))
        with pytest.raises(OggFormatError):
            read_audio(path)

    # audio packet truncated inside the mode/window header -> the
    # packet is DROPPED (spec 4.3), the rest of the stream decodes
    # (was UnboundLocalError on first-packet truncation)
    pkts = list(packets)
    pkts[3] = pkts[3][:0]  # empty: skipped
    with open(path, "wb") as f:
        f.write(_remux(pkts, granule))
    read_audio(path)
    pkts = list(packets)
    pkts[3] = pkts[3][:1]  # one byte: EOP inside the packet header
    with open(path, "wb") as f:
        f.write(_remux(pkts, granule))
    read_audio(path)


@pytest.mark.skipif(not vorbisenc.available(),
                    reason="system libvorbis not present")
def test_vorbis_hostile_codebook_sizes(tmp_path):
    """A forged setup header declaring a huge codebook must be rejected
    as a format error (not a multi-second/GB allocation)."""
    from phaserotate_tpu.io.vorbis import OggFormatError

    src = str(tmp_path / "t.ogg")
    write_audio(src, _tone(), RATE)
    packets, granule = _ogg_packets(open(src, "rb").read())
    setup = bytearray(packets[2])
    # setup layout: type(1) + "vorbis"(6) + count-1(1) + first codebook
    # header: sync 0x564342 (24 bits) + dims (16) + entries (24)
    off = 8 + 3 + 2
    struct.pack_into("<I", setup, off, 0x00FFFFFF)  # entries ~16.7M
    pkts = list(packets)
    pkts[2] = bytes(setup[: off + 4]) + bytes(packets[2][off + 4:])
    path = str(tmp_path / "f.ogg")
    with open(path, "wb") as f:
        f.write(_remux(pkts, granule))
    with pytest.raises(OggFormatError):
        read_audio(path)


@pytest.mark.skipif(not mp3.available(),
                    reason="system libmpg123/libmp3lame not present")
def test_mp3_garbage_is_format_error(tmp_path):
    """Sync-looking garbage must raise Mp3FormatError (ValueError), not
    the RuntimeError reserved for a missing codec."""
    path = str(tmp_path / "g.mp3")
    with open(path, "wb") as f:
        f.write(b"\xff\xfb" + b"\x00" * 64)  # valid sync, bogus frame
    with pytest.raises(ValueError):
        read_audio(path)
