"""Streaming engine: offline equivalence, block-size independence,
angle interpolation semantics."""

import numpy as np
import pytest

from phaserotate_tpu.core import sizes
from phaserotate_tpu.ops import rotate_fir
from phaserotate_tpu.stream import (
    StreamingRotator,
    init_state,
    rotate_streamed,
    stream_process,
)

GEOM = sizes.StreamGeometry(rate=48000, fftlen=512, firlen=3072)


def test_streamed_equals_offline_fir(rng):
    """Chunked OLA output must equal whole-file FIR rotation after latency
    trim (SURVEY.md §4 'streaming equivalence')."""
    x = rng.standard_normal(20000).astype(np.float32) * 0.5
    deg = 35.0
    y_stream = np.asarray(rotate_streamed(x, deg, geom=GEOM))
    y_offline = np.asarray(rotate_fir(x, deg, firlen=GEOM.firlen))
    # boundary effects only at the very end (stream zero-pads), so compare
    # the full interior
    np.testing.assert_allclose(y_stream, y_offline, atol=1e-5)


def test_stream_zero_angle_passthrough(rng):
    """0 deg must reproduce the (delayed) input bit-closely."""
    x = rng.standard_normal(8192).astype(np.float32)
    y = np.asarray(rotate_streamed(x, 0.0, geom=GEOM))
    np.testing.assert_allclose(y, x, atol=1e-6)


@pytest.mark.parametrize("blocksize", [64, 256, 333, 1024, 4096])
def test_blocksize_independence(rng, blocksize):
    """Any host block size produces identical output
    (src/phaserotate.c:615-629 contract)."""
    x = rng.standard_normal(8192).astype(np.float32) * 0.5
    deg = 77.0

    ref_rot = StreamingRotator(geom=GEOM, channels=1)
    want = ref_rot.process(x, deg)

    rot = StreamingRotator(geom=GEOM, channels=1)
    got = np.empty_like(x)
    for i in range(0, len(x), blocksize):
        blk = x[i : i + blocksize]
        got[i : i + len(blk)] = rot.process(blk, deg)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_host_wrapper_latency_alignment(rng):
    """Wrapper output is input delayed by exactly parsiz + firlen/2."""
    x = rng.standard_normal(6000).astype(np.float32)
    rot = StreamingRotator(geom=GEOM, channels=1)
    y = rot.process(x, 0.0)
    lat = rot.latency
    assert lat == GEOM.parsiz + GEOM.firlen // 2
    np.testing.assert_allclose(y[lat:], x[: len(x) - lat], atol=1e-6)
    np.testing.assert_allclose(y[:lat], 0.0, atol=1e-7)


def test_stereo_channels_independent(rng):
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    rot = StreamingRotator(geom=GEOM, channels=2)
    y = rot.process(x, [30.0, -60.0])

    m0 = StreamingRotator(geom=GEOM, channels=1)
    m1 = StreamingRotator(geom=GEOM, channels=1)
    np.testing.assert_allclose(y[0], m0.process(x[0], 30.0), atol=1e-7)
    np.testing.assert_allclose(y[1], m1.process(x[1], -60.0), atol=1e-7)


def test_angle_interpolation_ramp(rng):
    """Angle changes ramp per-sample, clamped to parsiz*1e-6 turns/sample
    (src/phaserotate.c:685-709): no discontinuity, eventual convergence."""
    x = np.ones(40960, np.float32)  # DC: any click is visible directly
    parsiz = GEOM.parsiz
    frames = x.reshape(-1, parsiz)
    n_frames = frames.shape[0]
    # jump 0 -> 90 deg at frame 30
    targets = np.where(np.arange(n_frames) < 30, 0.0, 90.0).astype(np.float32)
    state = init_state(GEOM)
    _, out = stream_process(state, frames, targets, GEOM)
    y = np.asarray(out).reshape(-1)

    # output continuous after warm-up: max per-sample jump bounded by the
    # ramp rate (the initial step at firlat is the delayed DC arriving)
    dy = np.abs(np.diff(y[GEOM.firlen :]))
    assert dy.max() < 2e-3, dy.max()

    # converged to the 90 deg steady state by the end
    # (DC through cos(theta): spectral rotation of DC scales by cos)
    final_state, _ = stream_process(state, frames, targets, GEOM)
    assert abs(float(final_state.angle) - (-0.25)) < 1e-6  # 90deg = -0.25 turns


def test_interp_rate_clamp():
    """A +-180 deg swing takes multiple blocks (rate clamp), smaller steps
    finish in one block."""
    parsiz = GEOM.parsiz
    x = np.zeros((40, parsiz), np.float32)
    state = init_state(GEOM)
    # 180 deg = 0.5 turns; max per block = parsiz^2 * 1e-6 = 0.0655 turns
    targets = np.full((40,), 180.0, np.float32)
    st, _ = stream_process(state, x, targets, GEOM)
    per_block = parsiz * GEOM.interp_th
    blocks_needed = int(np.ceil(0.5 / per_block))
    assert blocks_needed > 1
    assert abs(float(st.angle) - (-0.5)) < 1e-5


def test_wraparound_shortest_path():
    """170 -> -120 deg interpolates through 180 (the short way), not back
    through 0 (src/phaserotate.c:676-683)."""
    parsiz = GEOM.parsiz
    state = init_state(GEOM)
    # settle at 170 deg first
    x = np.zeros((60, parsiz), np.float32)
    st, _ = stream_process(state, x, np.full((60,), 170.0, np.float32), GEOM)
    a0 = float(st.angle)
    assert a0 == pytest.approx(170.0 / -360.0, abs=1e-6)
    st2, _ = stream_process(st, x[:1], np.full((1,), -120.0, np.float32), GEOM)
    a1 = float(st2.angle)
    # negated turns: 170 deg -> -0.4722; -120 deg -> +0.3333. The short way
    # (110 deg) runs *down* through -0.5 (=180 deg); rate-clamped, so after
    # one block the angle decreased past -0.5 rather than increasing.
    assert a1 < a0
    assert a1 < -0.5


def test_wraparound_small_jump_snaps():
    """170 -> -170 deg is only 20 deg the short way: completes in one block
    and snaps exactly to target."""
    parsiz = GEOM.parsiz
    state = init_state(GEOM)
    x = np.zeros((60, parsiz), np.float32)
    st, _ = stream_process(state, x, np.full((60,), 170.0, np.float32), GEOM)
    st2, _ = stream_process(st, x[:1], np.full((1,), -170.0, np.float32), GEOM)
    assert float(st2.angle) == pytest.approx(-170.0 / -360.0, abs=1e-6)


def test_stream_state_checkpoint_resume(tmp_path, rng):
    """Save mid-stream, resume in a 'new process': bit-identical output
    (SURVEY.md §5 checkpoint/resume)."""
    from phaserotate_tpu.stream import (
        load_stream_state,
        save_stream_state,
        stream_process,
    )

    x = rng.standard_normal((40, GEOM.parsiz)).astype(np.float32)
    targets = np.full((40,), 42.0, np.float32)

    st = init_state(GEOM)
    st, out_a = stream_process(st, x[:20], targets[:20], GEOM)
    path = str(tmp_path / "stream.npz")
    save_stream_state(path, st, GEOM)

    st2, geom2, host2 = load_stream_state(path)
    assert geom2 == GEOM
    assert host2 == {}  # no host staging saved at this layer
    _, out_b = stream_process(st2, x[20:], targets[20:], GEOM)

    st_ref = init_state(GEOM)
    _, want = stream_process(st_ref, x, targets, GEOM)
    got = np.concatenate([np.asarray(out_a), np.asarray(out_b)])
    np.testing.assert_array_equal(got, np.asarray(want))


def test_rotate_streamed_no_trim(rng):
    """trim_latency=False returns the raw host-visible stream: zeros for
    the first parsiz, then the engine output; aligns with the trimmed
    result shifted by the full latency (round-1 verdict, weak #7)."""
    x = rng.standard_normal(5000).astype(np.float32)
    trimmed = np.asarray(rotate_streamed(x, 35.0, geom=GEOM))
    raw = np.asarray(rotate_streamed(x, 35.0, geom=GEOM,
                                     trim_latency=False))
    assert raw.shape[-1] == 5000 + GEOM.latency
    assert np.all(raw[: GEOM.parsiz] == 0.0)
    np.testing.assert_allclose(raw[GEOM.latency :], trimmed, atol=0)


def test_plancache_warmup_and_persistent_cache(tmp_path):
    import jax

    from phaserotate_tpu.core.plancache import (
        enable_persistent_cache,
        warmup_offline,
        warmup_stream,
    )
    from phaserotate_tpu.core.sizes import OfflineGeometry

    warmup_stream(GEOM, channels=2)
    warmup_offline(OfflineGeometry(blksiz=1024), [3000])
    cache = tmp_path / "xla-cache"
    enable_persistent_cache(str(cache))
    assert cache.exists()
    assert jax.config.jax_compilation_cache_dir == str(cache)


@pytest.mark.parametrize("rate", [48000, 96000, 192000])
def test_bulk_engine_matches_scan(rng, rate):
    """stream_process_bulk (batched FFTs, block-axis FIR MAC) must match
    the sequential scan — output to FFT-reassociation noise, carried
    state exactly — across every plugin geometry, through an angle ramp."""
    from phaserotate_tpu.stream import stream_process_bulk

    geom = sizes.stream_geometry_for_rate(rate)
    n_frames = 40
    frames = rng.standard_normal((n_frames, geom.parsiz)).astype(np.float32)
    targets = np.concatenate(
        [np.zeros(5), np.full(20, 90.0), np.full(15, -33.0)]).astype(
        np.float32)
    s0 = init_state(geom)
    s_scan, out_scan = stream_process(s0, frames, targets, geom)
    s_bulk, out_bulk = stream_process_bulk(s0, frames, targets, geom)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_bulk),
                               atol=2e-6)
    np.testing.assert_array_equal(np.asarray(s_scan.spec_hist),
                                  np.asarray(s_bulk.spec_hist))
    np.testing.assert_array_equal(np.asarray(s_scan.time_hist),
                                  np.asarray(s_bulk.time_hist))
    np.testing.assert_allclose(np.asarray(s_scan.tail),
                               np.asarray(s_bulk.tail), atol=1e-6)
    assert float(s_scan.angle) == float(s_bulk.angle)


def test_bulk_engine_split_continuation(rng):
    """Mid-stream state carry across bulk calls is exact: two chunked
    calls equal one (the chunking contract rotate_streamed relies on)."""
    from phaserotate_tpu.stream import stream_process_bulk

    n_frames = 30
    frames = rng.standard_normal((n_frames, GEOM.parsiz)).astype(np.float32)
    targets = np.linspace(-170, 170, n_frames).astype(np.float32)
    s0 = init_state(GEOM)
    _, want = stream_process_bulk(s0, frames, targets, GEOM)
    s1, o1 = stream_process_bulk(s0, frames[:17], targets[:17], GEOM)
    _, o2 = stream_process_bulk(s1, frames[17:], targets[17:], GEOM)
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(o1), np.asarray(o2)]), np.asarray(want))


def test_rotate_streamed_chunked_matches_unchunked(rng):
    x = rng.standard_normal(9 * GEOM.parsiz + 100).astype(np.float32)
    a = np.asarray(rotate_streamed(x, 70.0, geom=GEOM))
    b = np.asarray(rotate_streamed(x, 70.0, geom=GEOM, chunk_frames=8))
    np.testing.assert_array_equal(a, b)


def test_host_bulk_path_matches_per_frame(rng):
    """Large host blocks take the single-dispatch scan path; output must
    be bit-identical to tiny-block (per-frame) streaming."""
    from phaserotate_tpu.stream import StreamingRotator

    x = rng.standard_normal((2, 10 * GEOM.parsiz + 123)).astype(np.float32)
    a = StreamingRotator(rate=48000, channels=2)
    b = StreamingRotator(rate=48000, channels=2)
    ya = a.process(x, [35.0, -90.0])  # one huge block -> bulk scan
    yb = np.concatenate(
        [b.process(x[:, i : i + 100], [35.0, -90.0])
         for i in range(0, x.shape[1], 100)], axis=1)
    np.testing.assert_array_equal(ya, yb)
    # mixed sizes afterwards stay aligned (offset continuity)
    ya2 = a.process(x[:, :700], [35.0, -90.0])
    yb2 = np.concatenate(
        [b.process(x[:, i : i + 70], [35.0, -90.0])
         for i in range(0, 700, 70)], axis=1)
    np.testing.assert_array_equal(ya2, yb2)


@pytest.mark.parametrize("rate,fftlen,firlen", [
    (96000, 1024, 4096),
    (192000, 2048, 8192),
])
def test_high_rate_geometries_end_to_end(rng, rate, fftlen, firlen):
    """96k/192k sizing tables (src/phaserotate.c:278-290): streaming ==
    offline FIR rotation at the high-rate geometries too."""
    geom = sizes.stream_geometry_for_rate(rate)
    assert (geom.fftlen, geom.firlen) == (fftlen, firlen)
    x = rng.standard_normal(4 * geom.latency).astype(np.float32) * 0.5
    y_stream = np.asarray(rotate_streamed(x, -70.0, geom=geom))
    y_offline = np.asarray(rotate_fir(x, -70.0, firlen=geom.firlen))
    np.testing.assert_allclose(y_stream, y_offline, atol=2e-5)


def test_streaming_fuzz_block_sizes(rng):
    """Property fuzz: ANY sequence of host block sizes (including the
    bulk single-dispatch path, partial frames, and 1-sample pushes)
    yields the identical stream (src/phaserotate.c:615-629 contract)."""
    from hypothesis import given, settings, strategies as st

    x = rng.standard_normal(6 * GEOM.parsiz + 17).astype(np.float32)
    ref = StreamingRotator(geom=GEOM, channels=1)
    want = ref.process(x, 42.0)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=1200), min_size=1))
    def run(sizes_list):
        rot = StreamingRotator(geom=GEOM, channels=1)
        got = np.empty_like(x)
        pos = 0
        it = iter(sizes_list)
        while pos < len(x):
            try:
                step = next(it)
            except StopIteration:
                step = 999
            blk = x[pos : pos + step]
            got[pos : pos + len(blk)] = rot.process(blk, 42.0)
            pos += len(blk)
        np.testing.assert_array_equal(got, want)

    run()


# ---- pipelined dispatch mode (stream/host.py OutputPipeline) ----------


@pytest.mark.parametrize("depth", [1, 4, 16])
def test_pipelined_rotator_is_exact_delay(rng, depth):
    """Depth-D pipelining emits the identical stream delayed by exactly
    D*parsiz samples (the advertised latency increase), for any mix of
    host block sizes (per-frame and bulk paths)."""
    x = (rng.standard_normal((depth + 24) * GEOM.parsiz + 37)
         * 0.5).astype(np.float32)
    blocks = [64, 700, 3 * GEOM.parsiz, 129, 2048]

    def run(rot):
        outs, pos = [], 0
        bi = 0
        while pos < len(x):
            n = min(blocks[bi % len(blocks)], len(x) - pos)
            bi += 1
            outs.append(rot.process(x[pos : pos + n], 35.0))
            pos += n
        return np.concatenate(outs)

    base = StreamingRotator(geom=GEOM)
    piped = StreamingRotator(geom=GEOM, pipeline_depth=depth)
    d = depth * GEOM.parsiz
    assert piped.latency == base.latency + d
    y0 = run(base)
    y1 = run(piped)
    np.testing.assert_array_equal(y1[:d], 0.0)
    np.testing.assert_array_equal(y1[d:], y0[: len(y0) - d])


def test_pipelined_rotator_angle_ramp_parity(rng):
    """Mid-stream angle changes ride the same ramp: the pipelined output
    is still the exact delayed image of the synchronous one."""
    parsiz = GEOM.parsiz
    x = (rng.standard_normal(10 * parsiz) * 0.5).astype(np.float32)
    depth = 3

    def run(rot):
        outs = []
        for k in range(10):
            deg = 0.0 if k < 3 else (90.0 if k < 6 else -120.0)
            outs.append(rot.process(x[k * parsiz : (k + 1) * parsiz], deg))
        return np.concatenate(outs)

    y0 = run(StreamingRotator(geom=GEOM))
    y1 = run(StreamingRotator(geom=GEOM, pipeline_depth=depth))
    d = depth * parsiz
    np.testing.assert_array_equal(y1[d:], y0[: len(y0) - d])


def test_host_angle_step_matches_device(rng):
    """The numpy shadow recursion (engine.host_angle_step) tracks the
    device angle carry: within 1 ulp mid-ramp (XLA may fuse the ramp
    multiply-add) and *bit-exact once converged* — the converged case is
    what the metering angle_changed flag depends on (a persistent
    mismatch there would re-trigger delayed meter resets forever)."""
    from phaserotate_tpu.stream.engine import (
        host_angle_step,
        init_state,
        stream_step_batched,
    )

    state = init_state(GEOM, (1,))
    shadow = np.zeros(1, np.float32)
    frame = np.zeros((1, GEOM.parsiz), np.float32)
    from phaserotate_tpu.core.angles import degrees_to_turns

    # ramps long enough that each target is eventually reached exactly
    plan = ([0.0] + [179.5] * 3 + [-179.5] * 3 + [10.0] * 600
            + [10.0001] * 3 + [-170.0] * 600)
    for i, deg in enumerate(plan):
        tgt = np.full(1, deg, np.float32)
        state, _ = stream_step_batched(state, frame, tgt, GEOM)
        target_turns = np.asarray(degrees_to_turns(tgt))
        shadow = host_angle_step(shadow, target_turns, GEOM)
        # mid-ramp: within a few ulp of the device carry (XLA fuses the
        # ramp multiply-add; under jit degrees_to_turns may also
        # canonicalize to multiply-by-reciprocal, 1 ulp off the eager
        # division — so the two recursions converge to targets 1 ulp
        # apart, which the plugin never observes: its angle_changed
        # flag compares the shadow against the *eagerly computed*
        # target, the same value the shadow snaps to)
        np.testing.assert_allclose(
            shadow, np.asarray(state.angle), atol=2e-7)
    # after a long steady ramp the shadow must equal the eager target
    # EXACTLY — that is the plugin's no-spurious-meter-reset invariant
    np.testing.assert_array_equal(shadow, target_turns)
