"""Format-dispatching audio I/O.

The reference opens files through libsndfile and gets every major format
for free (cli/phase-rotate.cc sf_open); here the two interchange formats
mastering workflows use — WAV and AIFF — are dispatched by content
sniffing on read and by extension on write.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .aiff import is_aiff, read_aiff, write_aiff
from .wav import WavFormatError, WavMetadata, read_wav, write_wav

__all__ = ["read_audio", "write_audio"]

_AIFF_EXT = (".aiff", ".aif", ".aifc")


def read_audio(path: str) -> Tuple[np.ndarray, int, WavMetadata]:
    """Read WAV or AIFF (sniffed by magic) -> ((ch, n) f32, rate, meta)."""
    with open(path, "rb") as f:
        head = f.read(12)
    if is_aiff(head):
        return read_aiff(path)
    return read_wav(path)


def _sniff_is_aiff(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return is_aiff(f.read(12))
    except OSError:
        return False


def write_audio(
    path: str,
    audio: np.ndarray,
    rate: int,
    meta: Optional[WavMetadata] = None,
    like: Optional[str] = None,
) -> None:
    """Write by output extension (.aiff/.aif/.aifc -> AIFF, .wav -> WAV);
    with no recognizable extension, follow the format of ``like`` (the
    input file, sniffed by CONTENT like the read path — an extension-less
    AIFF input keeps producing AIFF) the way the reference's write path
    inherits the input's major format."""
    lower = path.lower()
    if lower.endswith(_AIFF_EXT) or (
        not lower.endswith(".wav") and like is not None
        and _sniff_is_aiff(like)
    ):
        write_aiff(path, audio, rate, meta)
        return
    write_wav(path, audio, rate, meta)
