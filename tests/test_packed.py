"""Packed lossless wire transport (search/packed.py).

The transport must be BIT-EXACT: the in-graph unpack reproduces the
int16 samples exactly, so the packed sweep path is value-identical to
the pcm16 path (same floats after the shared 1/32768 dequantize)."""

import numpy as np
import pytest

from phaserotate_tpu.core.sizes import OfflineGeometry
from phaserotate_tpu.search.packed import (
    BLOCK,
    pack_residual,
    packed_bits_per_sample,
    sweep_peaks_aux_packed,
    unpack_residual,
)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _roundtrip(x16: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    pk = pack_residual(x16)
    out = unpack_residual(
        jnp.asarray(pk.words), jnp.asarray(pk.widths),
        jnp.asarray(pk.woffs), jnp.asarray(pk.order), pk.n)
    return np.asarray(out).reshape(pk.shape)


def _as_f32(x16):
    return x16.astype(np.float32) / 32768.0


def test_roundtrip_random(rng):
    x = rng.integers(-32768, 32768, (3, 2, 10_000), np.int16)
    np.testing.assert_array_equal(_roundtrip(x), _as_f32(x))


def test_roundtrip_hostile_extremes(rng):
    """Full-scale square waves, impulses, silence, ramps — the inputs
    that maximize residual magnitude at every order."""
    n = 3 * BLOCK + 17
    cases = [
        np.zeros(n, np.int16),
        np.full(n, 32767, np.int16),
        np.full(n, -32768, np.int16),
        (np.arange(n) % 2 * 65535 - 32768).astype(np.int16),  # nyquist sq
        np.clip(np.arange(n) * 7 - 32768, -32768, 32767).astype(np.int16),
    ]
    imp = np.zeros(n, np.int16)
    imp[::BLOCK] = 32767
    imp[1::BLOCK] = -32768
    cases.append(imp)
    for x in cases:
        np.testing.assert_array_equal(_roundtrip(x[None]), _as_f32(x[None]))


def test_roundtrip_odd_lengths(rng):
    for n in (1, 31, BLOCK - 1, BLOCK, BLOCK + 1, 2 * BLOCK + 333):
        x = rng.integers(-32768, 32768, (2, n), np.int16)
        np.testing.assert_array_equal(_roundtrip(x), _as_f32(x))


def test_tonal_content_compresses(rng):
    """Music-like content must pack well below 16 bits/sample; white
    noise must never exceed 16 + metadata overhead (worst case the
    order-0 residual IS the input)."""
    n = 48000 * 2
    t = np.arange(n) / 48000.0
    tone = np.clip(np.rint(32768 * (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 440 * t)
        + 0.001 * rng.standard_normal(n))), -32768, 32767).astype(np.int16)
    bps_tone = packed_bits_per_sample(pack_residual(tone[None]))
    assert bps_tone < 12.0, bps_tone

    noise = rng.integers(-32768, 32768, (1, n), np.int16)
    bps_noise = packed_bits_per_sample(pack_residual(noise))
    # metadata + word-grid padding only
    assert bps_noise < 17.5, bps_noise


def test_order_selection_adapts(rng):
    """A pure-noise stream picks order 0; a smooth ramp picks a
    differencing order (its diffs are near-constant)."""
    noise = rng.integers(-32768, 32768, (1, 4 * BLOCK), np.int16)
    assert pack_residual(noise).order[0] == 0
    smooth = (10000 * np.sin(np.arange(4 * BLOCK) / 2000.0)).astype(np.int16)
    assert pack_residual(smooth[None]).order[0] >= 1


def test_scratch_buffer_reuse(rng):
    x = rng.integers(-32768, 32768, (2, 3 * BLOCK), np.int16)
    ref = pack_residual(x)
    scratch = np.empty(ref.words.size + (1 << 19), np.int32)
    pk = pack_residual(x, out_words=scratch)
    assert pk.words.base is scratch
    np.testing.assert_array_equal(_roundtrip(x), _as_f32(x))
    np.testing.assert_array_equal(pk.words, ref.words)


def test_sweep_parity_vs_pcm16(rng):
    """The packed sweep must match the pcm16 sweep bitwise — identical
    dequantized floats feed the identical program."""
    from phaserotate_tpu.search.sweep import sweep_peaks_aux_pcm16

    geom = OfflineGeometry(blksiz=1024)
    n = 6000
    t = np.arange(n) / 48000.0
    x = np.clip(np.rint(32768 * (
        0.4 * np.sin(2 * np.pi * 300 * t)[None, None]
        * np.ones((3, 1, 1))
        + 0.02 * rng.standard_normal((3, 1, n)))), -32768,
        32767).astype(np.int16)
    want_t, want_r = sweep_peaks_aux_pcm16(x, geom)
    got_t, got_r = sweep_peaks_aux_packed(pack_residual(x), geom)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))


def test_native_pack_bit_parity(rng):
    """wire_pack.cc must reproduce the numpy pack bit for bit (words,
    widths, offsets, order) on random, hostile, and odd-length inputs."""
    from phaserotate_tpu.io.native import available

    if not available():
        pytest.skip("native host library unavailable")
    n = 3 * BLOCK + 17
    imp = np.zeros(n, np.int16)
    imp[::BLOCK] = 32767
    imp[1::BLOCK] = -32768
    cases = [
        rng.integers(-32768, 32768, (3, 2, 10_000), np.int16),
        np.full(n, 32767, np.int16)[None],
        (np.arange(n) % 2 * 65535 - 32768).astype(np.int16)[None],
        imp[None],
    ]
    cases += [rng.integers(-32768, 32768, (2, m), np.int16)
              for m in (1, BLOCK - 1, BLOCK + 1, 2 * BLOCK + 333)]
    for x in cases:
        a = pack_residual(x, native=True)
        b = pack_residual(x, native=False)
        np.testing.assert_array_equal(a.order, b.order)
        np.testing.assert_array_equal(a.widths, b.widths)
        np.testing.assert_array_equal(a.woffs, b.woffs)
        np.testing.assert_array_equal(a.words, b.words)
        assert a.n == b.n and a.shape == b.shape


def test_native_pack_scratch_reuse(rng):
    from phaserotate_tpu.io.native import available

    if not available():
        pytest.skip("native host library unavailable")
    x = rng.integers(-32768, 32768, (2, 3 * BLOCK), np.int16)
    scratch = np.empty(1 << 20, np.int32)
    pk = pack_residual(x, out_words=scratch, native=True)
    assert pk.words.base is scratch
    np.testing.assert_array_equal(
        pk.words, pack_residual(x, native=False).words)


def test_wire_is_smaller_for_audio(rng):
    """On plausibly-musical 16-bit content the packed wire must beat
    2 bytes/sample, grid padding included."""
    n = 48000 * 5
    t = np.arange(n) / 48000.0
    x = np.clip(np.rint(32768 * (
        0.4 * np.sin(2 * np.pi * 110 * t)
        + 0.2 * np.sin(2 * np.pi * 297 * t)
        + 0.01 * rng.standard_normal(n))), -32768, 32767).astype(np.int16)
    pk = pack_residual(np.broadcast_to(x, (8, n)).astype(np.int16))
    assert pk.wire_bytes < 2 * 8 * n, (pk.wire_bytes, 2 * 8 * n)
