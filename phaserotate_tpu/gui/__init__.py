"""Headless UI layer: deflection maps, widget models, protocol client,
terminal/SVG rendering."""

from .client import MeterValues, UIClient
from .deflect import (
    DELTA_TICKS_DB,
    METER_TICKS_DB,
    deflect_db,
    deflect_dbfs,
    deflect_delta,
    deflect_meter,
)
from .render import (
    faceplate_svg,
    meter_pattern,
    meter_svg,
    render_channel,
    render_ruler,
    render_delta_bar,
    render_meter_bar,
)
from .widgets import DialModel, LinkGroup

__all__ = [
    "DELTA_TICKS_DB",
    "DialModel",
    "LinkGroup",
    "METER_TICKS_DB",
    "MeterValues",
    "UIClient",
    "deflect_db",
    "deflect_dbfs",
    "deflect_delta",
    "deflect_meter",
    "faceplate_svg",
    "meter_pattern",
    "meter_svg",
    "render_channel",
    "render_ruler",
    "render_delta_bar",
    "render_meter_bar",
]
