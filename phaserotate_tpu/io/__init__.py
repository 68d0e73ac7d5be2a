"""Audio file I/O: WAV + AIFF read/write with metadata passthrough."""

from .aiff import read_aiff, write_aiff
from .audio import read_audio, write_audio
from .wav import WavFormatError, WavMetadata, read_wav, write_wav

__all__ = [
    "WavFormatError",
    "WavMetadata",
    "read_aiff",
    "read_audio",
    "read_wav",
    "write_aiff",
    "write_audio",
    "write_wav",
]
