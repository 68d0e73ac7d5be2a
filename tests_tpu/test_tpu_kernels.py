"""Compiled-Mosaic parity on the real chip.

The CPU-mesh suite (tests/) exercises every Pallas kernel in interpret
mode; this suite re-checks the production claims with the *compiled*
kernels against independent XLA references — fused conv vs partitioned
OLA, the rotate+peak sweep vs a dense XLA evaluation, and one end-to-end
rotate + min-peak-search parity run (SURVEY.md §4 golden-parity intent).
"""

import numpy as np
import pytest

import jax.numpy as jnp


def test_kernels_run_compiled():
    """Precondition for everything here: on TPU the kernels must take
    the compiled path, not interpret mode."""
    from phaserotate_tpu.kernels.rotate_peak import on_tpu, use_interpret

    assert on_tpu() and not use_interpret()


def test_fused_conv_matches_partitioned_convolve(rng):
    """kernels/fused_conv.py (matmul-FFT in VMEM) vs ops/convolve.py
    (XLA FFT partitioned OLA), offline geometry blksiz 8192."""
    from phaserotate_tpu.core.fir import partition_fir_spectra
    from phaserotate_tpu.kernels.fused_conv import (
        fused_hilbert,
        supported_parsiz,
    )
    from phaserotate_tpu.ops.convolve import partitioned_convolve

    firlen, parsiz = 2048, 2048
    assert supported_parsiz(parsiz)
    x = (0.5 * rng.standard_normal((2, 65536))).astype(np.float32)
    spectra = partition_fir_spectra(firlen, parsiz)
    y_kernel = np.asarray(fused_hilbert(jnp.asarray(x), firlen,
                                        parsiz=parsiz))
    y_ref = np.asarray(partitioned_convolve(
        jnp.asarray(x), spectra, parsiz=parsiz))
    m = min(y_kernel.shape[-1], y_ref.shape[-1])
    np.testing.assert_allclose(y_kernel[..., :m], y_ref[..., :m],
                               atol=5e-6)


def test_stream_kernel_matches_scan_engine(rng):
    """kernels/stream_conv.py (small-geometry fused kernel) vs the
    lax.scan engine, plugin geometry parsiz 256 (fftlen 512)."""
    from phaserotate_tpu.core.sizes import stream_geometry_for_rate
    from phaserotate_tpu.kernels.stream_conv import stream_mix_supported
    from phaserotate_tpu.stream import rotate_streamed
    from phaserotate_tpu.stream.engine import (
        init_state,
        stream_process,
    )

    geom = stream_geometry_for_rate(48000)
    assert stream_mix_supported(geom.firlen)
    n = 20 * geom.parsiz
    x = (0.5 * rng.standard_normal(n)).astype(np.float32)
    # fused path (rotate_streamed dispatches to it on TPU)
    y_fused = np.asarray(rotate_streamed(x, 35.0, geom=geom))
    # scan engine reference
    pad_frames = -(-(n + geom.latency) // geom.parsiz)
    xp = np.zeros(pad_frames * geom.parsiz, np.float32)
    xp[:n] = x
    st = init_state(geom)
    _, outf = stream_process(
        st, jnp.asarray(xp.reshape(pad_frames, geom.parsiz)),
        jnp.full((pad_frames,), 35.0, np.float32), geom)
    y_scan = np.asarray(outf).reshape(-1)[
        geom.firlat : geom.firlat + n]
    np.testing.assert_allclose(y_fused, y_scan, atol=5e-6)


def test_rotate_peak_sweep_matches_xla(rng):
    """Compiled rotate_peak_sweep_kernel vs a dense XLA max-abs
    evaluation over the same angle grid."""
    from phaserotate_tpu.core.angles import all_angle_cos_sin
    from phaserotate_tpu.kernels.rotate_peak import (
        rotate_peak_sweep_kernel,
    )

    n = 16384
    b0 = (0.5 * rng.standard_normal(n)).astype(np.float32)
    b1 = (0.5 * rng.standard_normal(n)).astype(np.float32)
    cs = np.asarray(all_angle_cos_sin())  # (2, 720) [cos; sin]
    got = np.asarray(rotate_peak_sweep_kernel(
        jnp.asarray(b0), jnp.asarray(b1), jnp.asarray(cs)))
    ref = np.max(np.abs(
        cs[0][:, None] * b0[None, :] + cs[1][:, None] * b1[None, :]),
        axis=1)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_end_to_end_rotate_and_search_parity(rng, tmp_path):
    """Golden path on chip: rotate a synthetic file, search its min-peak
    angle, and cross-check both against the literal CLI simulator
    (tests/ref_cli_sim.py float32 oracle)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from ref_cli_sim import RefRotate

    from phaserotate_tpu.core.angles import MAXSAMPLE
    from phaserotate_tpu.core.sizes import OfflineGeometry
    from phaserotate_tpu.search import find_min_peak_angle
    from phaserotate_tpu.search.sweep import sweep_peaks

    rate = 48000
    t = np.arange(rate, dtype=np.float64) / rate
    # harmonically locked partials: rotation changes their phase
    # alignment, so the peak-vs-angle surface has deep structure (an
    # incommensurate two-tone is nearly angle-invariant)
    x = (0.5 * np.sin(2 * np.pi * 100 * t)
         + 0.35 * np.sin(2 * np.pi * 200 * t)
         + 0.2 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)

    geom = OfflineGeometry(blksiz=8192)
    table = np.asarray(sweep_peaks(x[None], geom))[0]

    sim = RefRotate(geom.blksiz, 1)
    sim.analyze_file(x[None], 0, MAXSAMPLE, 1)
    np.testing.assert_allclose(table, sim.peak[0], atol=3e-5)

    res = find_min_peak_angle(x[None], rate=rate, blksiz=geom.blksiz)
    # coarse+refine contract (cli/phase-rotate.cc:815-902): the chosen
    # angle's dense-table peak lands within the candidate tolerance of
    # the global minimum (7% of the table's range above it) — not
    # necessarily AT the argmin when near-equal minima exist
    got_units = res.angles_units[0] % MAXSAMPLE
    lo, hi = float(sim.peak[0].min()), float(sim.peak[0].max())
    assert sim.peak[0][got_units] <= lo + 0.07 * (hi - lo) + 1e-6


def test_bf16_sweep_guard(rng):
    """Guard for the opt-in bf16 sweep (round-4 verdict #6): enabling
    DEFAULT-precision (one bf16 MXU pass) Hilbert matmuls is allowed in
    the fleet path ONLY if selected angles match the f32 sweep.

    Measured r5 on the bench chip: 14/32 identical over a realistic
    corpus (music-like multitone at three noise floors + near-tie
    quadrature synthetics), with basin-jumping mismatches on near-flat
    tables — bf16's ~3e-3 relative Hilbert error exceeds the spacing of
    the table's near-equal minima.  Speed delta measured at the fleet
    shape (512 x 10 s): 2095 -> 2397 files/s (+14%; the exact-f32 VPU
    rotate+peak stage dominates).  Verdict: NOT wired in; this test
    xfails while that holds and will XPASS loudly if a compiler/HW
    change ever makes the guard pass, prompting re-evaluation.
    """
    import pytest

    from phaserotate_tpu.core.sizes import OfflineGeometry
    from phaserotate_tpu.search.minimize import (
        select_min_peak_angles_batch,
    )
    from phaserotate_tpu.search.sweep import sweep_peaks_aux_pcm16

    rate, seconds = 48000, 2
    n = rate * seconds
    t = np.arange(n) / rate
    sigs = []
    for u in range(8):
        f0 = 55.0 * (u + 2)
        sigs.append(0.4 * np.sin(2 * np.pi * f0 * t)
                    + 0.2 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.3 * u)
                    + [0.05, 0.002][u % 2] * rng.standard_normal(n))
    for u in range(4):  # near-tie: quadrature pair, near-flat table
        f0 = 100.0 + 37 * u
        sigs.append(0.5 * np.sin(2 * np.pi * f0 * t)
                    + 0.5 * np.cos(2 * np.pi * f0 * t + 0.01 * u))
    x16 = np.clip(np.rint(np.stack(sigs)[:, None] * 20000),
                  -32768, 32767).astype(np.int16)
    geom = OfflineGeometry(blksiz=8192)

    def select(bf16):
        tbl, rot0 = sweep_peaks_aux_pcm16(x16, geom, bf16=bf16)
        return [r.angles_units for r in select_min_peak_angles_batch(
            np.asarray(tbl), rot0=np.asarray(rot0))]

    f32 = select(False)
    bf = select(True)
    mism = [(i, p, q) for i, (p, q) in enumerate(zip(f32, bf))
            if p != q]
    if mism:
        pytest.xfail(f"bf16 sweep guard fails ({len(mism)}/{len(f32)} "
                     f"mismatched selections, e.g. {mism[:3]}) — "
                     f"bf16 stays out of the fleet path")


def test_packed_transport_on_chip_parity(rng):
    """The packed wire transport through the COMPILED unpack program
    (bitcast/shift/gather/cumsum on real Mosaic/XLA-TPU, not interpret
    mode) is bitwise-identical to the pcm16 path, native packer
    included."""
    from phaserotate_tpu.core.sizes import OfflineGeometry
    from phaserotate_tpu.search.packed import (
        pack_residual,
        sweep_peaks_aux_packed,
    )
    from phaserotate_tpu.search.sweep import sweep_peaks_aux_pcm16

    rate, n = 48000, 30000
    t = np.arange(n) / rate
    x16 = np.clip(np.rint(np.stack([
        28000 * np.sin(2 * np.pi * 220 * t)
        + 400 * rng.standard_normal(n),
        20000 * np.sin(2 * np.pi * 97 * t)
        + 4000 * rng.standard_normal(n),
    ])[:, None]), -32768, 32767).astype(np.int16)
    geom = OfflineGeometry(blksiz=1024)
    want_t, want_r = sweep_peaks_aux_pcm16(x16, geom)
    got_t, got_r = sweep_peaks_aux_packed(pack_residual(x16), geom)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(want_r))
