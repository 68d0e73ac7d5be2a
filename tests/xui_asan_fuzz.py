"""ASan campaign driver for the embedded X11 LV2UI's untrusted-input
surfaces (native/prt_xui.cc + prt_atom.h): 4000 random / plausible-
header atoms on the notify port and hostile floats on the control
ports, with the UI built under -fsanitize=address.

Run via `make -C native fuzz-xui` (builds the instrumented .so, runs
this under LD_PRELOAD=libasan).  The pytest fuzz
(tests/test_xui.py::test_port_event_fuzz_no_crash) covers the same
surface uninstrumented on every CI run; this harness exists to catch
silent out-of-bounds reads that do not crash.

Usage: xui_asan_fuzz.py <dir-containing-instrumented-prt_xui.so>
"""

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["PHASEROTATE_TPU_XUI"] = "headless"

import numpy as np  # noqa: E402

from test_xui import ATOM_NS, _XuiHost  # noqa: E402


def main() -> None:
    native_dir = sys.argv[1]
    host = _XuiHost(native_dir, stereo=True)
    rng = np.random.default_rng(0)
    ev = host.urid.map(ATOM_NS + "eventTransfer")
    seq_id = host.urid.map(ATOM_NS + "Sequence")
    obj_id = host.urid.map(ATOM_NS + "Object")
    for trial in range(4000):
        n = int(rng.integers(0, 160))
        raw = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        if n >= 8 and trial % 3 == 0:
            # plausible header (huge forged size), garbage body — the
            # case that reads past the buffer without the size cap
            typ = (seq_id, obj_id)[trial % 2]
            raw = struct.pack("<II", int(rng.integers(0, 2 ** 17)),
                              typ) + raw[8:]
        host.port_event(1, ev, raw)
        host.port_event(3, 0, raw[:4] if n >= 4 else raw)
    for v in (float("nan"), float("inf"), float("-inf"), 3.4e38,
              -3.4e38, 1e18, 540.0, -540.0):
        host.port_event(3, 0, struct.pack("<f", v))
        host.port_event(6, 0, struct.pack("<f", v))
    host.idle()
    host.close()
    print("XUI-ASAN-OK")


if __name__ == "__main__":
    main()
