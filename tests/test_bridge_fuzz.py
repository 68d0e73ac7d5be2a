"""Daemon wire fuzz: a bad client must never kill (or wedge) the daemon.

The connection handler promises exactly that (bridge.py _handle /
_serve_conn: per-connection exception containment, socket deadlines,
analyze-slot release on disconnect).  These tests slam the socket with
garbage — wrong magic, random message types, hostile lengths, truncated
payloads, mid-message disconnects — and then assert the daemon still
serves a well-formed session correctly.
"""

import os
import socket
import struct
import subprocess
import sys

import numpy as np
import pytest

from phaserotate_tpu.bridge import MAGIC, BridgeClient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("fuzz") / "engine.sock")
    r, w = os.pipe()
    proc = subprocess.Popen(
        [sys.executable, "-m", "phaserotate_tpu.bridge",
         "--socket", sock, "--ready-fd", str(w)],
        pass_fds=(w,), cwd=REPO,
        stderr=subprocess.DEVNULL)
    os.close(w)
    assert os.read(r, 1) == b"R", "daemon failed to start"
    os.close(r)
    yield sock
    proc.terminate()
    proc.wait(timeout=10)


def _blast(path: str, blob: bytes) -> None:
    """Send bytes, read whatever comes back, drop the connection.
    The short timeout is deliberate: delivering the garbage and hanging
    up IS the attack; the daemon's own socket deadlines do the rest."""
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.settimeout(0.25)
    try:
        s.connect(path)
        s.sendall(blob)
        try:
            s.recv(4096)
        except (socket.timeout, OSError):
            pass
    finally:
        s.close()


def _alive(path: str, rate: int = 48000) -> None:
    """The liveness oracle: a real session still works end to end."""
    cl = BridgeClient(path, rate, 1)
    try:
        assert cl.latency == 1792
        x = np.zeros((1, 256), np.float32)
        y = cl.process(x, 0.0)
        assert y.shape == (1, 256)
    finally:
        cl.close()


def test_garbage_connections_leave_daemon_serving(daemon):
    rng = np.random.default_rng(5)
    for trial in range(24):
        kind = trial % 6
        if kind == 0:  # wrong magic
            blob = struct.pack("<I", int(rng.integers(0, 2**32)))
        elif kind == 1:  # good magic, random message header + garbage
            blob = struct.pack(
                "<III", MAGIC, int(rng.integers(0, 64)),
                int(rng.integers(0, 4096)))
            blob += bytes(rng.integers(0, 256, int(rng.integers(0, 256)),
                                       dtype=np.uint8))
        elif kind == 2:  # hostile length field (max u32)
            blob = struct.pack("<III", MAGIC, 2, 0xFFFFFFFF)
        elif kind == 3:  # truncated mid-header
            blob = struct.pack("<I", MAGIC) + b"\x01"
        elif kind == 4:  # valid INIT header, truncated payload, hangup
            blob = struct.pack("<III", MAGIC, 1, 8) + b"\x00" * 5
        else:  # pure noise, no magic
            blob = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
        _blast(daemon, blob)
    _alive(daemon)


def test_hostile_init_and_analyze_fields(daemon):
    """Well-framed messages with hostile field values get T_ERR (or a
    drop), never take the daemon down."""
    bad_inits = [
        struct.pack("<II", 0, 1),          # rate 0
        struct.pack("<II", 48000, 0),      # 0 channels
        struct.pack("<II", 48000, 2**31),  # 2^31 channels
        struct.pack("<II", 10**9, 1),      # absurd rate
        b"\x00" * 3,                       # short payload
    ]
    for payload in bad_inits:
        blob = (struct.pack("<I", MAGIC)
                + struct.pack("<II", 1, len(payload)) + payload)
        _blast(daemon, blob)
    # ANALYZE_BEGIN with hostile config, then immediate disconnect —
    # must not leak the bounded analyze slots (a leak would wedge
    # later analyses, caught by _alive + repeat)
    for _ in range(8):
        payload = struct.pack("<IIIII", 48000, 8, 0, 24, 8192)
        blob = (struct.pack("<I", MAGIC)
                + struct.pack("<II", 4, len(payload)) + payload)
        _blast(daemon, blob)
    _alive(daemon)


def test_mid_session_hangup_releases_resources(daemon):
    """Open real sessions and hang up at every protocol stage; the
    daemon keeps serving new sessions."""
    for stage in range(4):
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.settimeout(5.0)
        s.connect(daemon)
        try:
            if stage >= 1:
                s.sendall(struct.pack("<I", MAGIC))
            if stage >= 2:
                payload = struct.pack("<II", 48000, 1)
                s.sendall(struct.pack("<II", 1, len(payload)) + payload)
                s.recv(4096)  # INIT_OK
            if stage >= 3:
                # half a PROC message, then vanish
                s.sendall(struct.pack("<II", 2, 4 + 4 + 256 * 4))
                s.sendall(struct.pack("<I", 256))
        finally:
            s.close()
    _alive(daemon)
