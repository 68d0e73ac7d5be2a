"""Native host runtime library (SIMD peak, PCM codec, SPSC ring)."""

import math
import threading

import numpy as np
import pytest

from phaserotate_tpu.io import native


def test_peak_matches_numpy(rng):
    for n in (0, 1, 31, 32, 33, 100000):
        x = rng.standard_normal(max(n, 1))[:n].astype(np.float32)
        want = float(np.abs(x).max()) if n else 0.0
        assert native.peak(x) == pytest.approx(want, abs=1e-7)


def test_peak_with_current(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    assert native.peak(x, current=100.0) == 100.0


def test_rotated_peak(rng):
    b0 = rng.standard_normal(9999).astype(np.float32)
    b1 = rng.standard_normal(9999).astype(np.float32)
    ca, sa = math.cos(1.1), math.sin(1.1)
    want = float(np.abs(ca * b0 + sa * b1).max())
    assert native.rotated_peak(b0, b1, ca, sa) == pytest.approx(
        want, rel=1e-6)


def test_interleave_roundtrip(rng):
    x = rng.standard_normal((3, 500)).astype(np.float32)
    il = native.interleave(x)
    assert np.array_equal(native.deinterleave(il, 3), x)


def test_pcm16_roundtrip(rng):
    x = np.clip(rng.standard_normal(5000) * 0.3, -1, 0.99).astype(np.float32)
    pcm = native.f32_to_pcm16(x)
    y = native.pcm16_to_f32(pcm)
    assert np.abs(y - x).max() <= 1.0 / 32768.0


def test_ring_basic(rng):
    r = native.Ring(256)
    x = rng.standard_normal(100).astype(np.float32)
    assert r.write(x) == 100
    assert r.read_space == 100
    assert np.array_equal(r.read(60), x[:60])
    assert np.array_equal(r.read(40), x[60:])


def test_ring_wraps_and_limits(rng):
    r = native.Ring(128)  # rounds up to pow2
    x = rng.standard_normal(200).astype(np.float32)
    wrote = r.write(x)
    assert wrote <= 128
    got = r.read(wrote)
    assert np.array_equal(got, x[:wrote])
    # wrap-around across the boundary
    for _ in range(5):
        assert r.write(x[:100]) == 100
        assert np.array_equal(r.read(100), x[:100])


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_ring_spsc_threads(rng):
    """Producer/consumer on separate threads: lock-free contract."""
    r = native.Ring(1 << 12)
    data = rng.standard_normal(200000).astype(np.float32)
    out = []

    def producer():
        pos = 0
        while pos < len(data):
            pos += r.write(data[pos : pos + 777])

    def consumer():
        got = 0
        while got < len(data):
            chunk = r.read(1024)
            if len(chunk):
                out.append(chunk)
                got += len(chunk)

    t1 = threading.Thread(target=producer)
    t2 = threading.Thread(target=consumer)
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    assert np.array_equal(np.concatenate(out), data)


def test_pcm24_roundtrip(rng):
    x = np.clip(rng.standard_normal(4000) * 0.4, -0.99, 0.99).astype(
        np.float32)
    raw = native.f32_to_pcm24(x)
    assert raw.dtype == np.uint8 and raw.size == 3 * x.size
    y = native.pcm24_to_f32(raw)
    assert np.abs(y - x).max() <= 1.0 / 8388608.0
