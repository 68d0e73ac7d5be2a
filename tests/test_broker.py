"""Cross-session batched dispatch (stream/broker.py): parity with the
dedicated pipelined engine, dynamic batching, slot lifecycle, and the
daemon --batch-sessions serving mode."""

import threading

import numpy as np
import pytest

from phaserotate_tpu.core.sizes import stream_geometry_for_rate
from phaserotate_tpu.stream import StreamingRotator
from phaserotate_tpu.stream.broker import StreamBroker

RATE = 48000
GEOM = stream_geometry_for_rate(RATE)
DEPTH = 3


@pytest.fixture()
def rng():
    return np.random.default_rng(31)


def test_broker_matches_dedicated_pipelined(rng):
    """One slot through the broker == StreamingRotator with the same
    pipeline depth, bit-exactly (same engine, same delay contract)."""
    parsiz = GEOM.parsiz
    n_frames = DEPTH + 6
    x = rng.standard_normal((1, n_frames * parsiz)).astype(np.float32)

    rot = StreamingRotator(rate=RATE, channels=1, pipeline_depth=DEPTH)
    want = rot.process(x, 35.0)

    broker = StreamBroker(GEOM, channels=1, capacity=4, depth=DEPTH)
    slot = broker.open()
    degs = np.array([35.0], np.float32)
    got = np.empty_like(x)
    for j in range(n_frames):
        frame = x[:, j * parsiz : (j + 1) * parsiz]
        got[:, j * parsiz : (j + 1) * parsiz] = \
            broker.submit(slot, frame, degs)
    # StreamingRotator emits cur_out (one frame behind the pipeline):
    # align by one frame
    np.testing.assert_array_equal(got[:, : -parsiz], want[:, parsiz:])
    broker.close(slot)


def test_broker_concurrent_sessions_match_solo(rng):
    """N sessions submitting concurrently each get exactly the stream a
    solo session would (dispatch coalescing must not mix slots)."""
    parsiz = GEOM.parsiz
    n_frames = DEPTH + 5
    n_sessions = 4
    xs = [rng.standard_normal((1, n_frames * parsiz)).astype(np.float32)
          for _ in range(n_sessions)]
    angles = [10.0 * (s + 1) for s in range(n_sessions)]

    # solo references (independent brokers, one slot each)
    refs = []
    for s in range(n_sessions):
        b = StreamBroker(GEOM, 1, capacity=1, depth=DEPTH)
        k = b.open()
        out = np.empty_like(xs[s])
        for j in range(n_frames):
            out[:, j * parsiz : (j + 1) * parsiz] = b.submit(
                k, xs[s][:, j * parsiz : (j + 1) * parsiz],
                np.array([angles[s]], np.float32))
        refs.append(out)

    broker = StreamBroker(GEOM, 1, capacity=n_sessions, depth=DEPTH)
    slots = [broker.open() for _ in range(n_sessions)]
    outs = [np.empty_like(xs[s]) for s in range(n_sessions)]
    errors = []

    def worker(s):
        try:
            degs = np.array([angles[s]], np.float32)
            for j in range(n_frames):
                frame = xs[s][:, j * parsiz : (j + 1) * parsiz]
                outs[s][:, j * parsiz : (j + 1) * parsiz] = \
                    broker.submit(slots[s], frame, degs)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,))
               for s in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    for s in range(n_sessions):
        np.testing.assert_array_equal(outs[s], refs[s])
    for k in slots:
        broker.close(k)


def test_broker_coalesces_concurrent_submits(monkeypatch, rng):
    """Frames arriving while a dispatch is in flight ride the NEXT
    dispatch together — deterministic check (the free-running test
    above can legally degrade to one dispatch per frame under
    pathological scheduling, so coalescing is forced here by slowing
    the step)."""
    import time

    from phaserotate_tpu.stream import broker as broker_mod

    real_step = broker_mod._slot_step

    def slow_step(*args, **kwargs):
        time.sleep(0.05)  # hold the dispatch so others queue behind it
        return real_step(*args, **kwargs)

    monkeypatch.setattr(broker_mod, "_slot_step", slow_step)
    broker = StreamBroker(GEOM, 1, capacity=3, depth=1)
    slots = [broker.open() for _ in range(3)]
    x = rng.standard_normal((1, GEOM.parsiz)).astype(np.float32)
    degs = np.array([10.0], np.float32)
    n_frames = 4
    threads = [threading.Thread(
        target=lambda k=k: [broker.submit(k, x, degs)
                            for _ in range(n_frames)])
        for k in slots]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert broker.frames_served == 3 * n_frames
    # with a 50 ms step, the 3 sessions' frames pile up behind each
    # dispatch: strictly fewer dispatches than frames served
    assert broker.dispatches < broker.frames_served
    for k in slots:
        broker.close(k)


def test_broker_slot_lifecycle():
    broker = StreamBroker(GEOM, 1, capacity=2, depth=1)
    a = broker.open()
    b = broker.open()
    assert broker.in_use() == 2
    with pytest.raises(RuntimeError, match="full"):
        broker.open()
    broker.close(a)
    c = broker.open()  # freed slot is reusable
    assert c == a
    broker.close(b)
    broker.close(c)
    assert broker.in_use() == 0


def test_broker_reset_clears_state(rng):
    """reset() gives activate() semantics: the slot behaves like a
    fresh instance (same contract as tests on StreamingRotator.reset)."""
    parsiz = GEOM.parsiz
    broker = StreamBroker(GEOM, 1, capacity=2, depth=1)
    slot = broker.open()
    degs = np.array([25.0], np.float32)
    x = rng.standard_normal((1, parsiz)).astype(np.float32)
    first = [broker.submit(slot, x, degs).copy() for _ in range(4)]
    broker.reset(slot)
    again = [broker.submit(slot, x, degs).copy() for _ in range(4)]
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)
    broker.close(slot)


def test_plugin_instance_on_broker_matches_pipelined(rng):
    """A PhaseRotatePlugin bound to a broker slot produces the exact
    stream of a dedicated instance with option {'pipeline': depth}."""
    from phaserotate_tpu.hostapp import StandaloneHost

    n = 4 * GEOM.parsiz
    x = rng.standard_normal((2, n)).astype(np.float32)

    ded = StandaloneHost(RATE, 2, block=n, pipeline=DEPTH)
    for c in range(2):
        ded.angles[c][0] = 30.0
    want = ded.process(x)

    broker = StreamBroker(GEOM, 2, capacity=2, depth=DEPTH)
    bat = StandaloneHost(RATE, 2, block=n, broker=broker)
    for c in range(2):
        bat.angles[c][0] = 30.0
    got = bat.process(x)
    np.testing.assert_array_equal(got, want)
    assert bat.plugin.latency == ded.plugin.latency
    bat.plugin.cleanup()
    assert broker.in_use() == 0


def test_daemon_batch_sessions_end_to_end(tmp_path, rng):
    """Daemon with --batch-sessions: concurrent clients stream correct,
    independent results through the shared dispatch."""
    import os
    import subprocess
    import sys

    from phaserotate_tpu.bridge import BridgeClient

    sock = str(tmp_path / "engine.sock")
    r, w = os.pipe()
    proc = subprocess.Popen(
        [sys.executable, "-m", "phaserotate_tpu.bridge", "--socket",
         sock, "--ready-fd", str(w), "--pipeline", "2",
         "--batch-sessions", "4"],
        pass_fds=(w,), stderr=subprocess.DEVNULL)
    os.close(w)
    try:
        assert os.read(r, 1) == b"R"
        os.close(r)
        parsiz = GEOM.parsiz
        n_blocks = 8
        xs = [rng.standard_normal((1, parsiz)).astype(np.float32)
              for _ in range(2)]
        outs = [[] for _ in range(2)]
        errs = []

        def client(i):
            try:
                cl = BridgeClient(sock, RATE, 1)
                for _ in range(n_blocks):
                    outs[i].append(cl.process(xs[i], 15.0 * (i + 1)))
                cl.close()
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=client, args=(i,)) for i in (0, 1)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        # parity vs a dedicated local pipelined instance fed the same
        # repeating block (same staging semantics -> same stream)
        for i in (0, 1):
            rot = StreamingRotator(rate=RATE, channels=1,
                                   pipeline_depth=2)
            want = [rot.process(xs[i], 15.0 * (i + 1))
                    for _ in range(n_blocks)]
            np.testing.assert_array_equal(
                np.concatenate(outs[i], axis=1),
                np.concatenate(want, axis=1))
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_close_reopen_during_inflight_dispatch_no_stale_output(
        monkeypatch, rng):
    """A slot closed and reopened while its dispatch is still on the
    device must not deposit the dead session's output into the new
    session's pipe (that would shift the new stream by one frame).
    Deterministic: the step is slowed and the close/reopen happens
    inside the in-flight window."""
    import time

    from phaserotate_tpu.stream import broker as broker_mod

    real_step = broker_mod._slot_step
    gate = threading.Event()

    def slow_step(*args, **kwargs):
        gate.set()  # dispatch entered the device step
        time.sleep(0.15)
        return real_step(*args, **kwargs)

    monkeypatch.setattr(broker_mod, "_slot_step", slow_step)
    broker = StreamBroker(GEOM, 1, capacity=1, depth=1)
    parsiz = GEOM.parsiz
    xa = rng.standard_normal((1, parsiz)).astype(np.float32)
    degs = np.array([10.0], np.float32)

    slot_a = broker.open()
    t = threading.Thread(
        target=lambda: broker.submit(slot_a, xa, degs))
    t.start()
    assert gate.wait(5.0)  # A's frame is now mid-flight on the device
    broker.close(slot_a)
    slot_b = broker.open()  # capacity 1: B reuses A's slot index
    assert slot_b == slot_a
    t.join()

    # B's stream must equal a solo run from a fresh broker — with the
    # stale A output in the pipe, B's outputs would be shifted by one
    monkeypatch.setattr(broker_mod, "_slot_step", real_step)
    n_frames = 4
    xb = [rng.standard_normal((1, parsiz)).astype(np.float32)
          for _ in range(n_frames)]
    got = [broker.submit(slot_b, f, degs) for f in xb]

    ref_broker = StreamBroker(GEOM, 1, capacity=1, depth=1)
    k = ref_broker.open()
    want = [ref_broker.submit(k, f, degs) for f in xb]
    for j in range(n_frames):
        np.testing.assert_array_equal(got[j], want[j])


def test_daemon_batch_sessions_survive_churn(tmp_path, rng):
    """Sessions connecting/disconnecting (reusing broker slots) while
    another session streams: the steady session's output stays
    bit-exact and the churned slots never leak (the in-flight
    close/reopen race regression, daemon-level)."""
    import os
    import subprocess
    import sys

    from phaserotate_tpu.bridge import BridgeClient

    sock = str(tmp_path / "engine.sock")
    r, w = os.pipe()
    proc = subprocess.Popen(
        [sys.executable, "-m", "phaserotate_tpu.bridge", "--socket",
         sock, "--ready-fd", str(w), "--pipeline", "2",
         "--batch-sessions", "2"],
        pass_fds=(w,), stderr=subprocess.DEVNULL)
    os.close(w)
    try:
        assert os.read(r, 1) == b"R"
        os.close(r)
        parsiz = GEOM.parsiz
        n_blocks = 10
        x = rng.standard_normal((1, parsiz)).astype(np.float32)
        out = []
        stop = threading.Event()
        errs = []

        def churner():
            # open/stream-one-block/close in a loop: each reuses the
            # broker slot the previous one released, overlapping the
            # steady session's in-flight dispatches
            try:
                while not stop.is_set():
                    cl = BridgeClient(sock, RATE, 1)
                    cl.process(x, -20.0)
                    cl.close()
            except Exception as e:  # pragma: no cover
                errs.append(e)

        th = threading.Thread(target=churner)
        th.start()
        try:
            cl = BridgeClient(sock, RATE, 1)
            for _ in range(n_blocks):
                out.append(cl.process(x, 30.0))
            cl.close()
        finally:
            stop.set()
            th.join(timeout=30)
        assert not errs
        rot = StreamingRotator(rate=RATE, channels=1, pipeline_depth=2)
        want = [rot.process(x, 30.0) for _ in range(n_blocks)]
        # tolerance, not bit-equality: under churn the session may land
        # on the K-slot broker program or the dedicated K=1 engine
        # depending on timing, and the two compiled programs can round
        # sin/cos of the angle ramp 1 ULP apart at some inputs.  The
        # corruption this test hunts (a stale frame deposited by a
        # closed session's in-flight dispatch => the stream shifts a
        # whole frame) is ~1e0, seven orders above the bar.
        np.testing.assert_allclose(np.concatenate(out, axis=1),
                                   np.concatenate(want, axis=1),
                                   atol=1e-5)
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_submit_to_unopened_slot_raises():
    """Submitting to a never-opened or already-closed slot must fail
    loudly — the slot may already belong to another session."""
    broker = StreamBroker(GEOM, 1, capacity=2, depth=1)
    x = np.zeros((1, GEOM.parsiz), np.float32)
    degs = np.zeros(1, np.float32)
    with pytest.raises(RuntimeError):
        broker.submit(0, x, degs)  # never opened
    k = broker.open()
    broker.submit(k, x, degs)
    broker.close(k)
    with pytest.raises(RuntimeError):
        broker.submit(k, x, degs)  # closed


def test_dispatch_failure_releases_queued_submitters(monkeypatch, rng):
    """A failed dispatch must release not only its own batch's waiters
    but also frames that queued into _pending WHILE it was in flight —
    those submitters would otherwise block in done.wait() forever (no
    dispatcher remains to serve them)."""
    import time

    from phaserotate_tpu.stream import broker as broker_mod

    gate = threading.Event()

    def failing_step(*args, **kwargs):
        gate.wait(timeout=10)  # hold until the second submit queues
        raise RuntimeError("injected dispatch failure")

    monkeypatch.setattr(broker_mod, "_slot_step", failing_step)
    broker = StreamBroker(GEOM, 1, capacity=2, depth=1, hold_frac=0.0)
    a, b = broker.open(), broker.open()
    x = rng.standard_normal((1, GEOM.parsiz)).astype(np.float32)
    degs = np.array([10.0], np.float32)

    results = {}
    errors = {}

    def run(tag, slot):
        try:
            results[tag] = broker.submit(slot, x, degs)
        except RuntimeError as e:
            errors[tag] = e

    ta = threading.Thread(target=run, args=("a", a))
    ta.start()
    time.sleep(0.1)  # thread A is the dispatcher, held at the gate
    tb = threading.Thread(target=run, args=("b", b))
    tb.start()
    time.sleep(0.1)  # thread B's frame is queued in _pending
    gate.set()
    ta.join(timeout=10)
    tb.join(timeout=10)
    assert not ta.is_alive() and not tb.is_alive()
    # the dispatcher surfaces the error; the queued submitter is
    # released with zeros (its frame never ran)
    assert "a" in errors
    assert "b" in results or "b" in errors
    if "b" in results:
        np.testing.assert_array_equal(results["b"], 0.0)
    # broker is reusable after the failure (claim was cleared): with
    # no dispatcher claimed, close() succeeds and a fresh open works
    broker.close(a)
    broker.close(b)
    assert broker.in_use() == 0
