"""Meter and faceplate rendering.

Two render targets replacing the reference's cairo drawing
(gui/phaserotate.c:218-759 meters, :117-177 dial faceplates):

* ANSI terminal bars for the standalone host's live display — the same
  deflection geometry, peak-hold markers and bidirectional gain-delta bar;
* SVG dial faceplate with tick dots and labels at 45-degree marks (the
  pre-rendered cairo surfaces of prepare_faceplates).
"""

from __future__ import annotations

import math
from typing import List

from .client import MeterValues
from .deflect import (
    DELTA_TICKS_DB,
    METER_TICKS_DB,
    deflect_db,
    deflect_delta,
    deflect_dbfs,
    deflect_meter,
)

__all__ = ["render_meter_bar", "render_delta_bar", "render_channel",
           "faceplate_svg"]


def render_meter_bar(value: float, momentary: float, peak: float,
                     width: int = 60) -> str:
    """One level meter line: live bar, momentary cap, peak-hold marker
    (the drawing logic of gui/phaserotate.c:534-615)."""
    cells = [" "] * width
    live = int(deflect_meter(width, value))
    for i in range(min(live, width)):
        cells[i] = "="
    mom = int(deflect_meter(width, momentary))
    if 0 < mom <= width:
        cells[mom - 1] = "#"
    pk = int(deflect_meter(width, peak))
    if 0 < pk <= width:
        cells[pk - 1] = "|"
    return "[" + "".join(cells) + "]"


def render_delta_bar(cur: float, dmin: float, dmax: float,
                     width: int = 60) -> str:
    """Bidirectional gain-diff bar around the 0 dB center
    (gui/phaserotate.c:617-727)."""
    cells = [" "] * width
    center = int(deflect_db(width, 0.0))
    lo = int(deflect_delta(width, dmin))
    hi = int(deflect_delta(width, dmax))
    for i in range(min(lo, center), center):
        cells[i] = "-"
    for i in range(center, min(hi, width)):
        cells[i] = "+"
    cur_pos = int(deflect_delta(width, cur))
    if 0 <= cur_pos < width:
        cells[cur_pos] = "#"
    if 0 <= center < width:
        cells[center] = "|" if cells[center] == " " else cells[center]
    return "[" + "".join(cells) + "]"


def _db(v: float) -> str:
    if v < 1e-10:
        return "  -inf"
    return f"{20 * math.log10(v):6.1f}"


def render_channel(m: MeterValues, label: str = "", width: int = 48) -> str:
    """Three meter rows for one channel: in, out, gain-diff."""
    rows = [
        f"{label:>4} in  {render_meter_bar(m.in_cur, m.in_mom, m.in_peak, width)} {_db(m.in_peak)} dBFS",
        f"{'':>4} out {render_meter_bar(m.out_cur, m.out_mom, m.out_peak, width)} {_db(m.out_peak)} dBFS",
        f"{'':>4} +/- {render_delta_bar(m.diff_cur, m.diff_min, m.diff_max, width)}",
    ]
    return "\n".join(rows)


def faceplate_svg(size: int = 120, radius: float = 40.0) -> str:
    """Dial faceplate: tick dots at 45-degree marks with labels
    (prepare_faceplates, gui/phaserotate.c:117-177)."""
    cx = cy = size / 2.0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" '
        f'height="{size}" viewBox="0 0 {size} {size}">',
        f'<circle cx="{cx}" cy="{cy}" r="{radius * 0.72:.1f}" '
        'fill="#444" stroke="#999" stroke-width="1.5"/>',
    ]
    for deg in range(-180, 181, 45):
        # dial sweep: -180 deg at 7:30, +180 at 4:30 (270-degree sweep
        # is not used — the reference dial is threesixty: full circle)
        ang = math.radians(deg - 90.0)
        tx = cx + radius * math.cos(ang)
        ty = cy + radius * math.sin(ang)
        parts.append(
            f'<circle cx="{tx:.1f}" cy="{ty:.1f}" r="2.0" fill="#ccc"/>')
        lx = cx + (radius + 12) * math.cos(ang)
        ly = cy + (radius + 12) * math.sin(ang)
        if deg in (-180, -90, 0, 90, 180):
            parts.append(
                f'<text x="{lx:.1f}" y="{ly:.1f}" font-size="8" '
                f'fill="#ddd" text-anchor="middle" '
                f'dominant-baseline="middle">{deg}</text>')
    parts.append("</svg>")
    return "".join(parts)
