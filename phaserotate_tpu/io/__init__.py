"""Audio file I/O: WAV read/write with metadata passthrough."""

from .wav import WavFormatError, WavMetadata, read_wav, write_wav

__all__ = ["WavFormatError", "WavMetadata", "read_wav", "write_wav"]
