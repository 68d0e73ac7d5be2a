"""Angle-analyzer model: resumable fleet analysis.

Combines the batched sweep, the CLI-parity selection, and sweep
checkpointing into the model a production user drives: point it at a set
of files, get per-file minimum-peak angles, resume after interruption.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.angles import SUBSAMPLE
from ..core.sizes import OfflineGeometry, offline_geometry
from ..search.minimize import SearchResult, select_min_peak_angles
from ..search.sweep import apply_angles, sweep_peaks_aux
from ..utils.checkpoint import SweepCheckpoint

__all__ = ["AngleAnalyzer"]


class AngleAnalyzer:
    """Minimum-peak angle analyzer with optional checkpointing.

    Example::

        an = AngleAnalyzer(rate=48000)
        res = an.analyze(audio)                    # one file
        results = an.analyze_many(batch_dict,      # resumable fleet
                                  checkpoint="sweeps.npz")
    """

    def __init__(self, rate: int = 48000, blksiz: int = 0,
                 stride: int = 12 * SUBSAMPLE, link_channels: bool = False):
        self.geom = offline_geometry(rate, blksiz)
        self.stride = stride
        self.link_channels = link_channels

    def sweep(self, audio) -> tuple:
        """Raw peak tables (table, rot0) for (channels, n) audio."""
        x = np.atleast_2d(np.asarray(audio, np.float32))
        t, r = sweep_peaks_aux(x, self.geom)
        return np.asarray(t), np.asarray(r)

    def select(self, table: np.ndarray, rot0: np.ndarray) -> SearchResult:
        return select_min_peak_angles(
            table, stride=self.stride, link_channels=self.link_channels,
            rot0=rot0)

    def analyze(self, audio) -> SearchResult:
        table, rot0 = self.sweep(audio)
        return self.select(table, rot0)

    def apply(self, audio, result: SearchResult) -> np.ndarray:
        x = np.atleast_2d(np.asarray(audio, np.float32))
        return np.asarray(
            apply_angles(x, np.asarray(result.angles_units), self.geom))

    def analyze_many(
        self,
        files: Dict[str, np.ndarray],
        checkpoint: Optional[str] = None,
    ) -> Dict[str, SearchResult]:
        """Analyze a dict of file-id -> (channels, n) arrays.

        With ``checkpoint`` set, completed sweeps persist after every file
        and are skipped on re-runs — selection is recomputed from stored
        tables (so changing stride/link does not invalidate sweeps).
        """
        ckpt = SweepCheckpoint(checkpoint, blksiz=self.geom.blksiz) \
            if checkpoint else None
        out: Dict[str, SearchResult] = {}
        for fid, audio in files.items():
            if ckpt is not None and fid in ckpt:
                table, rot0 = ckpt.get(fid)
            else:
                table, rot0 = self.sweep(audio)
                if ckpt is not None:
                    ckpt.put(fid, table, rot0)
            out[fid] = self.select(table, rot0)
        return out
