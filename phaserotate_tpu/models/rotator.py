"""High-level rotator models.

The flagship user-facing objects, combining the functional layers into
the two model families the reference ships: the real-time streaming
processor (plugin role) and the offline whole-buffer processor.

:class:`PhaseRotator` is the pythonic face of the full streaming stack —
engine + metering + checkpoint/resume — without the LV2 port surface of
plugin/lifecycle.PhaseRotatePlugin (use that for host-ABI parity).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..core.sizes import StreamGeometry, stream_geometry_for_rate
from ..meter import (
    MeterConfig,
    MeterLevels,
    init_meter_state,
    meter_block,
    meter_falloff,
    reset_peaks,
)
from ..ops.rotate import rotate
from ..stream.checkpoint import load_stream_state, save_stream_state
from ..stream.host import StreamingRotator

__all__ = ["PhaseRotator", "OfflineRotator"]


class PhaseRotator(StreamingRotator):
    """Streaming phase rotator with metering and checkpoint/resume.

    Extends :class:`~phaserotate_tpu.stream.host.StreamingRotator` (any
    host block size, single batched device dispatch per frame) with:

    * the reference's metering subsystem per channel — momentary with
      0.5 s hold, 15 dB/s falloff, peak hold, gain-diff min/max
      (src/phaserotate.c:303, 451-509, 832-838) — read via
      :meth:`levels`;
    * mid-stream checkpointing: :meth:`save` the entire engine carry,
      :meth:`load` it in another process and the output continues
      bit-identically (the reference resets its ring on activate,
      src/phaserotate.c:511-520, and loses the stream).

    Example::

        rot = PhaseRotator(rate=48000, channels=2)
        out = rot.process(block, degrees=[35.0, 35.0])
        print(rot.levels(0).out_peak)
        rot.save("stream.npz")
    """

    def __init__(
        self,
        rate: float = 48000.0,
        channels: int = 1,
        geom: Optional[StreamGeometry] = None,
        meters: bool = True,
    ):
        super().__init__(rate=rate, channels=channels, geom=geom)
        self.meters_enabled = meters
        self._mtr_cfg = MeterConfig(rate=self.geom.rate,
                                    latency=self.geom.latency)
        self._reset_meters()

    def _reset_meters(self) -> None:
        self._mtr = [init_meter_state(self._mtr_cfg)
                     for _ in range(self.channels)]
        self._levels: List[MeterLevels] = [
            MeterLevels(*([0.0] * 6), 1.0, 1.0, 1.0)
            for _ in range(self.channels)]
        self._falloff = None
        self._fpp = 0

    def reset(self) -> None:
        super().reset()
        if hasattr(self, "_mtr_cfg"):
            self._reset_meters()

    def process(self, block: np.ndarray, degrees) -> np.ndarray:
        from ..core.angles import degrees_to_turns

        squeeze = np.ndim(block) == 1
        x = np.atleast_2d(np.asarray(block, np.float32))
        if self.meters_enabled:
            # the gain-diff holds reset on an angle change, compared
            # against the *current* (possibly still ramping) engine
            # angle like the plugin does (src/phaserotate.c:497-509)
            target = np.asarray(degrees_to_turns(np.broadcast_to(
                np.asarray(degrees, np.float32), (self.channels,))))
            changed = target != np.asarray(self._state.angle)
        out = super().process(x, degrees)
        y = np.atleast_2d(out)
        if self.meters_enabled:
            n = x.shape[1]
            if self._fpp != n:
                self._falloff = meter_falloff(self.geom.rate, n)
                self._fpp = n
            for c in range(self.channels):
                self._mtr[c], self._levels[c] = meter_block(
                    self._mtr[c], x[c], y[c], self._falloff,
                    self._mtr_cfg.hold_samples, bool(changed[c]))
        return out[0] if squeeze and out.ndim > 1 else out

    def levels(self, channel: int = 0) -> MeterLevels:
        """Latest meter levels for ``channel`` (9 fields, the reference's
        'levels' atom payload, src/phaserotate.c:741-771)."""
        return self._levels[channel]

    def reset_peaks(self) -> None:
        """Clear the peak holds (the GUI's click-on-meter)."""
        self._mtr = [reset_peaks(m) for m in self._mtr]

    # -- checkpoint / resume ------------------------------------------------

    def save(self, path: str) -> None:
        """Checkpoint the full stream mid-flight: engine carry (all
        channels) plus the host shell's staged partial frame, so resume
        is bit-identical from the very next sample."""
        save_stream_state(path, self._state, self.geom, host={
            "offset": np.int64(self._offset),
            "cur_in": self._cur_in,
            "cur_out": self._cur_out,
        })

    def load(self, path: str) -> None:
        """Resume from a checkpoint saved by :meth:`save`; output
        continues bit-identically (tested in tests/test_models.py)."""
        state, geom, host = load_stream_state(path)
        if geom is not None and geom != self.geom:
            raise ValueError(
                f"checkpoint geometry {geom} != rotator geometry "
                f"{self.geom}")
        if state.angle.shape != (self.channels,):
            raise ValueError(
                f"checkpoint has {state.angle.shape} channels, rotator "
                f"has {self.channels}")
        self._state = state
        if host:
            self._offset = int(host["offset"])
            self._cur_in = np.array(host["cur_in"], np.float32)
            self._cur_out = np.array(host["cur_out"], np.float32)


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
