"""High-level rotator models.

The flagship user-facing objects, combining the functional layers into the
two "model families" the reference ships: the real-time plugin
(mono/stereo streaming) and the offline processor.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from ..core.sizes import StreamGeometry, stream_geometry_for_rate
from ..ops.rotate import rotate
from ..stream.host import StreamingRotator

__all__ = ["PhaseRotator", "OfflineRotator"]


class PhaseRotator(StreamingRotator):
    """Streaming phase rotator (the plugin model, mono or stereo).

    A thin alias over :class:`StreamingRotator` that names the model
    family; see plugin/lifecycle.py for the full host-ABI wrapper with
    metering and the UI protocol.
    """


class OfflineRotator:
    """Whole-buffer rotator with a fixed configuration.

    Example::

        rot = OfflineRotator(rate=48000, method="fir")
        y = rot(x, degrees=35.0)
    """

    def __init__(self, rate: float = 48000.0, method: str = "spectral",
                 geom: Optional[StreamGeometry] = None):
        if method not in ("spectral", "fir"):
            raise ValueError(f"unknown method {method!r}")
        self.rate = rate
        self.method = method
        self.geom = geom or stream_geometry_for_rate(rate)

    def __call__(self, audio, degrees) -> np.ndarray:
        return np.asarray(
            rotate(audio, degrees, method=self.method, rate=self.rate,
                   firlen=self.geom.firlen if self.method == "fir" else None)
        )
