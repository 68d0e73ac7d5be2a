"""Minimum-peak angle selection: exact CLI-result parity.

The reference CLI runs a coarse sweep at ``stride`` half-degree steps,
collects candidate minima within 7 % of the coarse range, rewinds the file
and re-analyzes each candidate's neighborhood at step 1, then unwraps the
chosen angles to minimize inter-channel phase distance
(cli/phase-rotate.cc:779-948).

On TPU the full 720-entry peak table comes out of *one* batched sweep
(search/sweep.py), so no file rewinds or re-reads are needed — but the
selection procedure below walks that table in exactly the order and with
exactly the tie-breaking (``<=`` keeps the last candidate visited,
cli/phase-rotate.cc:885) of the reference, so the chosen angles match the
CLI bit for bit given matching peak tables.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.angles import MAXSAMPLE, SUBSAMPLE

__all__ = ["SearchResult", "select_min_peak_angles", "coeff_to_db"]


def coeff_to_db(coeff: float) -> float:
    """cli/phase-rotate.cc:76-83."""
    if coeff < 1e-15:
        return float("-inf")
    return 20.0 * math.log10(coeff)


@dataclasses.dataclass
class SearchResult:
    """Per-file search outcome.

    Attributes:
      angles_units: chosen rotation per channel, half-degree units, already
        unwrapped (may be negative — same convention the CLI prints and
        applies).
      angles_deg: the same in degrees.
      peak_zero: per-channel peak at 0 deg (``r_zro``).
      peak_min: per-channel peak at the chosen angle (``r_min``).
      found: per-channel flag — False mirrors the CLI's "cannot find min"
        (constant-peak channels, cli/phase-rotate.cc:935-936).
      coarse_considered: candidate coarse angles per channel (diagnostics).
    """

    angles_units: List[int]
    angles_deg: List[float]
    peak_zero: List[float]
    peak_min: List[float]
    found: List[bool]
    coarse_considered: Dict[int, List[int]]

    def gain_db(self, c: int) -> float:
        """Attenuation gained: peak(0deg) - peak(min) in dB
        (cli/phase-rotate.cc:940-942)."""
        return coeff_to_db(self.peak_zero[c]) - coeff_to_db(self.peak_min[c])


def _peak(table: np.ndarray, link: bool, c: int, a: int) -> float:
    """pr.peak(link ? -1 : c, a) with wrap (cli/phase-rotate.cc:276-299)."""
    a = (a + MAXSAMPLE) % MAXSAMPLE
    if link:
        return float(table[:, a].max())
    return float(table[c, a])


def select_min_peak_angles(
    peak_table: np.ndarray,
    stride: int = 12 * SUBSAMPLE,
    link_channels: bool = False,
    rot0: Optional[np.ndarray] = None,
) -> SearchResult:
    """Reproduce the CLI's coarse->fine selection on a full peak table.

    Args:
      peak_table: (channels, MAXSAMPLE) float32 from
        :func:`phaserotate_tpu.search.sweep.sweep_peaks`.
      stride: coarse step in half-degree units (default 24 = 12 deg,
        cli/phase-rotate.cc:597); must divide MAXSAMPLE and be <= 90.
      link_channels: use the cross-channel max peak for selection
        (``-l``, cli/phase-rotate.cc:639).
      rot0: optional (channels,) "rotated by 0" aux peaks
        (sweep_peaks_aux): the value a fine window crossing 360 writes into
        table slot 0 via the generic path instead of the raw-input
        special case.  Without it, slot 0 is used for wrapped reads too
        (difference only matters when the file's peak lies in the first
        half block).

    Returns a :class:`SearchResult` whose angles match the reference CLI.
    """
    if stride < 1 or stride > 45 * SUBSAMPLE or MAXSAMPLE % stride:
        raise ValueError(
            "180 deg is not evenly dividable by given stride"
        )  # cli/phase-rotate.cc:668-671
    table = np.asarray(peak_table, np.float32)
    n_chn = table.shape[0]
    rot0_arr = None if rot0 is None else np.asarray(rot0, np.float32)

    def fine_peak(link: bool, c: int, a_unwrapped: int) -> float:
        """Table read during a fine pass: wrapped-0 reads resolve to the
        rotated-at-0 accumulation (see rot0 docstring)."""
        w = (a_unwrapped + MAXSAMPLE) % MAXSAMPLE
        if w == 0 and a_unwrapped != 0 and rot0_arr is not None:
            return float(rot0_arr.max() if link else rot0_arr[c])
        return _peak(table, link, c, a_unwrapped)

    # ---- coarse candidate collection (cli/phase-rotate.cc:815-857) ----
    mins: Dict[int, List[int]] = {}
    degenerate: set = set()
    min_angle = [0] * n_chn
    p_min = [float("inf")] * n_chn
    r_zro = [0.0] * n_chn
    r_min = [0.0] * n_chn

    for c in range(n_chn):
        c_min = float("inf")
        c_max = 0.0
        r_zro[c] = _peak(table, False, c, 0)
        for a in range(0, MAXSAMPLE, stride):
            p = _peak(table, link_channels, c, a)
            c_min = min(c_min, p)
            c_max = max(c_max, p)
        rng = c_max - c_min
        if rng == 0:
            # Degenerate channel (constant peak, e.g. a pure tone or
            # silence).  The reference leaves p_min uninitialized here
            # (cli/phase-rotate.cc:836-839 — undefined behavior in C) but
            # its output path prints "cannot find min" for p_min == inf;
            # we implement that stated intent: the channel stays
            # not-found and its angle is 0.  It enters no candidate list
            # (it would pollute peak_min and the coarse diagnostics).
            degenerate.add(c)
            continue
        if stride > 1:
            rng *= 0.07
            p_min[c] = float("inf")
        else:
            rng = 0.0
            p_min[c] = c_min
        for a in range(0, MAXSAMPLE, stride):
            p = _peak(table, link_channels, c, a)
            if p <= c_min + rng:
                mins.setdefault(a, []).append(c)

    if stride == 1:
        for ma in sorted(mins):
            for cn in mins[ma]:
                if cn in degenerate:
                    continue  # stays not-found, like the stride>1 pass
                min_angle[cn] = ma
                r_min[cn] = _peak(table, False, cn, ma)
    else:
        # ---- fine pass (cli/phase-rotate.cc:866-902); the full-resolution
        # table already holds what each re-analysis would produce ----
        stride_2 = (stride + 1) // 2
        for ma in sorted(mins):  # std::map iterates ascending
            # Reference quirk: a single-channel candidate re-analyzes only
            # that channel after pr.reset(), so in link mode peak_all()
            # reads zeros for the other channels and degenerates to the
            # candidate channel's own peak (cli/phase-rotate.cc:880, 884).
            link_here = link_channels and len(mins[ma]) > 1
            for cn in mins[ma]:
                if cn in degenerate:
                    continue
                for a in range(ma - stride_2, ma + stride_2 + 1):
                    p = fine_peak(link_here, cn, a)
                    if p <= p_min[cn]:
                        p_min[cn] = p
                        r_min[cn] = fine_peak(False, cn, a)
                        min_angle[cn] = (a + MAXSAMPLE) % MAXSAMPLE

    # ---- collect results (cli/phase-rotate.cc:905-915) ----
    avg_rotate = 0.0
    avg_count = 0
    for c in range(n_chn):
        if p_min[c] != float("inf"):
            avg_rotate += min_angle[c]
            avg_count += 1
    found = [p_min[c] != float("inf") for c in range(n_chn)]
    angles: List[int] = []
    if avg_count:
        avg_rotate /= avg_count
        avg_dist = MAXSAMPLE / float(avg_count)
        # ---- minimize channel phase distance (cli/phase-rotate.cc:918-929)
        for c in range(n_chn):
            if not found[c]:
                angles.append(0)
            else:
                ma = min_angle[c]
                if ma > 90 * SUBSAMPLE and abs(ma - avg_rotate) > avg_dist:
                    ma -= MAXSAMPLE
                elif avg_rotate > 90 * SUBSAMPLE:
                    ma -= MAXSAMPLE
                angles.append(ma)
    else:
        angles = [0] * n_chn

    return SearchResult(
        angles_units=angles,
        angles_deg=[a / SUBSAMPLE for a in angles],
        peak_zero=r_zro,
        peak_min=r_min,
        found=found,
        coarse_considered=mins,
    )
