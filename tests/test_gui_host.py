"""GUI layer models + standalone host end-to-end."""

import numpy as np
import pytest

from phaserotate_tpu.gui import (
    DialModel,
    LinkGroup,
    UIClient,
    deflect_delta,
    deflect_meter,
    faceplate_svg,
    render_channel,
)
from phaserotate_tpu.gui.client import MeterValues
from phaserotate_tpu.hostapp import StandaloneHost
from phaserotate_tpu.io.wav import read_wav, write_wav
from phaserotate_tpu.ops import rotate_fir


def test_deflection_maps():
    # -80 dBFS floor, +6 dBFS ceiling (gui/phaserotate.c:227-237)
    assert deflect_meter(86, 0.0) == 0
    assert deflect_meter(86, 3.0) == 86
    assert deflect_meter(86, 1.0) == pytest.approx(80.0, abs=0.01)
    # delta scale +-12 dB (gui/phaserotate.c:244-254)
    assert deflect_delta(24, 0.1) == 0
    assert deflect_delta(24, 4.5) == 24
    assert deflect_delta(24, 1.0) == pytest.approx(12.0, abs=0.01)


def test_dial_model_semantics():
    d = DialModel()
    d.set_value(33.33)
    assert d.value == 33.5  # 0.5 deg quantization
    d.set_value(0.4)
    assert d.value == 0.0  # detent snap
    d.set_value(190.0)
    assert d.value == -170.0  # threesixty wrap
    d.set_value(100.0)
    d.scroll(1)
    assert d.value == 105.0  # step 0.5 x scroll_mult 10
    d.reset()
    assert d.value == 0.0


def test_dial_model_hostile_values():
    """Garbage from a host control port must not hang, raise, or poison
    the dial: NaN/inf are ignored, huge finite values wrap in O(1)."""
    d = DialModel()
    d.set_value(33.5)
    for bad in (float("nan"), float("inf"), float("-inf")):
        d.set_value(bad)
        assert d.value == 33.5  # ignored, state intact
    d.set_value(1e18)  # would spin ~3e15 iterations with loop-wrap
    assert -180.0 <= d.value <= 180.0
    # fmod wrap matches the iterative definition on moderate values
    d2 = DialModel()
    for v, want in ((190.0, -170.0), (-190.0, 170.0), (540.0, 180.0),
                    (900.0, 180.0), (-541.0, 179.0), (180.0, 180.0),
                    (-180.0, -180.0), (361.0, 1.0),
                    # off-grid values just above the seam must display
                    # +180, not wrap+quantize down to -180 (the edge
                    # rule is re-applied after quantization)
                    (180.2, 180.0), (540.2, 180.0), (-180.2, 180.0)):
        d2.set_value(v)
        assert d2.value == want, (v, d2.value, want)


def test_link_group_mirrors_and_freezes():
    writes = {0: [], 1: []}
    dials = [DialModel(on_change=lambda v, c=c: writes[c].append(v))
             for c in range(2)]
    link = LinkGroup(dials)
    dials[1].set_value(50.0)
    assert dials[1].value == 50.0
    link.set_active(True)
    assert dials[1].value == dials[0].value  # immediate sync
    dials[0].set_value(30.0)
    assert dials[1].value == 30.0  # mirrored
    dials[1].set_value(90.0)
    assert dials[1].value == 30.0  # insensitive while linked
    link.set_active(False)
    dials[1].set_value(90.0)
    assert dials[1].value == 90.0


def test_render_smoke():
    m = MeterValues(in_cur=0.5, in_mom=0.6, in_peak=0.9,
                    out_cur=0.4, out_mom=0.5, out_peak=0.8,
                    diff_cur=0.8, diff_min=0.7, diff_max=1.1)
    text = render_channel(m, "ch0")
    assert "in" in text and "out" in text and "[" in text
    svg = faceplate_svg()
    assert svg.startswith("<svg") and "-180" in svg.replace(">", " ")


def test_host_end_to_end(tmp_path, rng):
    """WAV through the standalone host == offline FIR rotation."""
    rate = 48000
    x = (0.5 * rng.standard_normal(6000)).astype(np.float32)
    src = tmp_path / "in.wav"
    dst = tmp_path / "out.wav"
    write_wav(str(src), x, rate)

    from phaserotate_tpu import hostapp

    rc = hostapp.main([str(src), str(dst), "--angle", "0", "--block", "333"])
    assert rc == 0
    y, yrate, _ = read_wav(str(dst))
    assert yrate == rate
    assert y.shape[1] == len(x)
    np.testing.assert_allclose(y[0], x, atol=1e-6)


def test_host_rotation_and_ui(tmp_path, rng):
    rate = 48000
    n = 8192
    x = (0.5 * rng.standard_normal(n)).astype(np.float32)
    host = StandaloneHost(rate, 1, block=256)
    host.set_angles(90.0)
    host.ui.open()
    outs = []
    for pos in range(0, n, 256):
        chunk = x[None, pos : pos + 256]
        outs.append(host.process(chunk))
        host.ui.poll()
    y = np.concatenate(outs, axis=1)[0]
    # meters live after polling
    assert host.ui.meters[0].in_peak > 0
    # steady-state rotation correct (skip interpolation ramp + latency)
    want = np.asarray(rotate_fir(x, 90.0, rate=rate))
    lat = int(host.latency[0])
    sl = slice(4096, n - lat)
    np.testing.assert_allclose(y[lat:][sl], want[sl], atol=1e-4)


def test_host_meters_plus_outfile_no_splice(tmp_path, rng):
    """--meters together with an output file must not drop the ui-close
    flush block from the stream (round-1 advisor, severity medium)."""
    rate = 48000
    x = (0.5 * rng.standard_normal(6000)).astype(np.float32)
    src = tmp_path / "in.wav"
    write_wav(str(src), x, rate)

    from phaserotate_tpu import hostapp

    dst_m = tmp_path / "with_meters.wav"
    rc = hostapp.main(
        [str(src), str(dst_m), "--angle", "0", "--block", "333", "--meters"])
    assert rc == 0
    y, _, _ = read_wav(str(dst_m))
    np.testing.assert_allclose(y[0], x, atol=1e-6)

    # and with a rotation: must equal the no-meters run sample-exactly
    dst_a = tmp_path / "a.wav"
    dst_b = tmp_path / "b.wav"
    assert hostapp.main([str(src), str(dst_a), "--angle", "35",
                         "--block", "256"]) == 0
    assert hostapp.main([str(src), str(dst_b), "--angle", "35",
                         "--block", "256", "--meters"]) == 0
    ya, _, _ = read_wav(str(dst_a))
    yb, _, _ = read_wav(str(dst_b))
    np.testing.assert_array_equal(ya, yb)


def test_meter_pattern_cached_gradient():
    """Per-width gradient/tick pattern (the reference's cached cairo
    pattern surfaces, gui/phaserotate.c:256-430)."""
    from phaserotate_tpu.gui import meter_pattern

    colors, ticks = meter_pattern(86)
    assert len(colors) == 86
    # -80..+6 scale: cell 0 is deep green zone, last cell is red
    assert colors[0] == 34 and colors[-1] == 196
    # ticks at every METER_TICKS_DB position inside the bar, increasing
    assert list(ticks) == sorted(ticks) and len(ticks) >= 10
    assert meter_pattern(86) is meter_pattern(86)  # lru-cached


def test_render_color_and_ruler():
    from phaserotate_tpu.gui import render_ruler
    from phaserotate_tpu.gui.render import render_meter_bar

    plain = render_meter_bar(1.0, 1.0, 1.0, width=48)
    colored = render_meter_bar(1.0, 1.0, 1.0, width=48, color=True)
    assert "\x1b[38;5;" in colored and "\x1b[0m" in colored
    # stripped of SGR codes the colored bar draws the same geometry
    import re

    assert re.sub(r"\x1b\[[0-9;]*m", "", colored).replace(".", " ") == plain
    ruler = render_ruler(48)
    assert "'" in ruler and "-24" in ruler and "0" in ruler


def test_meter_svg():
    from phaserotate_tpu.gui import meter_svg

    m = MeterValues(in_cur=0.5, in_mom=0.6, in_peak=0.9,
                    out_cur=0.4, out_mom=0.5, out_peak=0.7,
                    diff_cur=1.0, diff_min=0.8, diff_max=1.2)
    svg = meter_svg(m)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert 'linearGradient id="lvl"' in svg
    assert svg.count("<stop") == 4  # green/yellow/orange/red zones
    assert "<line" in svg and ">-24<" in svg  # tick ruler with labels


def test_ruler_aligns_with_meter_bars():
    """The dB ruler's bracket must sit in the same column as the meter
    bars' bracket (round-2 self-review: it was one column off)."""
    from phaserotate_tpu.gui import render_ruler

    m = MeterValues(in_cur=0.5, in_mom=0.5, in_peak=0.5)
    bar_row = render_channel(m, "ch0", width=48).splitlines()[0]
    ruler_row = render_ruler(48, indent=9).splitlines()[0]
    assert bar_row.index("[") == ruler_row.index("[")


def test_faceplate_with_pointer():
    """The dial renders the pointer, value arc, and readout at an angle
    (the live dial drawing of gui/phaserotate.c, not just the plate)."""
    plate = faceplate_svg()
    live = faceplate_svg(angle=35.0)
    assert "<line" not in plate  # static plate: no pointer
    assert "<line" in live and "+35.0" in live
    assert "url(#knob)" in live  # shaded knob gradient
    neg = faceplate_svg(angle=-90.0)
    assert "-90.0" in neg and "<path" in neg  # value arc drawn
    zero = faceplate_svg(angle=0.0)
    assert "<path" not in zero  # detent: no arc


def test_ui_dials_sync_from_angle_ports(rng):
    """Dials reflect the host-set control-port angle instead of starting
    at 0 (round-2 self-review: the first keypress used to jump the live
    angle from the port value to ~0)."""
    host = StandaloneHost(48000, 2, block=256)
    host.set_angles([35.0, -60.0])
    host.ui.sync_dials()
    assert host.ui.dials[0].value == 35.0
    assert host.ui.dials[1].value == -60.0
    # a nudge moves relative to the synced value, not from zero
    host.ui.dials[0].set_value(host.ui.dials[0].value + 0.5)
    assert host.angles[0][0] == 35.5
    # reopening the UI re-syncs (host-persisted angle survives close)
    host.ui.open()
    host.set_angles(10.0)
    host.ui.close()
    host.ui.open()
    assert host.ui.dials[0].value == 10.0


def test_ui_client_requires_control_port():
    from phaserotate_tpu.gui import UIClient
    from phaserotate_tpu.plugin.lifecycle import PhaseRotatePlugin
    from phaserotate_tpu.plugin.uris import PLUGIN_URI

    p = PhaseRotatePlugin(PLUGIN_URI, 48000)  # no ports connected
    ui = UIClient(p)
    with pytest.raises(RuntimeError, match="control port"):
        ui.click_meter()
    with pytest.raises(RuntimeError, match="control port"):
        ui.close()
