"""Streaming session + scheduler behavior."""

import threading
import time
import types

import numpy as np
import pytest

from light_whisper_tpu.serving.scheduler import (
    PRIORITY_FINALIZE,
    PRIORITY_INTERIM,
    EngineScheduler,
)
from light_whisper_tpu.serving.streaming import (
    FINALIZE_REUSE_TAIL_GAP_SECONDS,
    INTERVAL_BASE_MS,
    INTERVAL_MAX_MS,
    INTERVAL_MIN_MS,
    SAMPLE_RATE,
    StreamingSession,
    adapt_interval,
)


class ScriptedTranscriber:
    """Returns queued texts; records the audio it was given."""

    def __init__(self, texts):
        self.texts = list(texts)
        self.calls = []

    def transcribe(self, audio):
        self.calls.append(np.asarray(audio))
        text = self.texts.pop(0) if self.texts else ""
        return types.SimpleNamespace(text=text, language="zh")


def seconds(n):
    return np.zeros(int(n * SAMPLE_RATE), dtype=np.float32)


def test_adaptive_interval_reference_parameters():
    assert adapt_interval(INTERVAL_BASE_MS, 500) == INTERVAL_BASE_MS + 42
    assert adapt_interval(INTERVAL_BASE_MS, 100) == INTERVAL_BASE_MS - 24
    assert adapt_interval(INTERVAL_BASE_MS, 300) == INTERVAL_BASE_MS
    assert adapt_interval(INTERVAL_MAX_MS, 1000) == INTERVAL_MAX_MS
    assert adapt_interval(INTERVAL_MIN_MS, 10) == INTERVAL_MIN_MS


def test_tick_below_min_audio_returns_none():
    session = StreamingSession(ScriptedTranscriber([]))
    session.accept(seconds(0.1))
    assert session.tick() is None


def test_tick_stable_tentative_progression():
    t = ScriptedTranscriber(["今天", "今天天气", "今天天气很好"])
    session = StreamingSession(t)
    session.accept(seconds(1))
    r1 = session.tick()
    assert (r1.stable, r1.tentative) == ("", "今天")
    session.accept(seconds(1))
    r2 = session.tick()
    assert (r2.stable, r2.tentative) == ("今天", "天气")
    r3 = session.tick()
    assert (r3.stable, r3.tentative) == ("今天天气", "很好")


def test_window_slides_and_aligns():
    t = ScriptedTranscriber(["a"] * 10)
    session = StreamingSession(t)
    session.accept(seconds(20))
    session.tick()
    window = t.calls[0]
    assert len(window) <= 12 * SAMPLE_RATE
    # start aligned to whole chunks: 20s buffer → start 8s (already aligned)
    assert len(window) == 12 * SAMPLE_RATE
    session.accept(seconds(0.5))
    session.tick()
    # start 8.5s → aligned down to 8s → window 12.5s? no: start aligned down
    # means window grows to ≤ 12 + 1 chunk
    assert len(t.calls[1]) == 12.5 * SAMPLE_RATE


def test_finalize_reuses_interim_cache_when_tail_small():
    t = ScriptedTranscriber(["你好世界"])
    session = StreamingSession(t)
    session.accept(seconds(3))
    session.tick()
    session.accept(seconds(FINALIZE_REUSE_TAIL_GAP_SECONDS - 0.05))
    final = session.finalize()
    assert final.from_interim_cache
    assert final.text == "你好世界"
    assert len(t.calls) == 1  # no re-transcription


def test_finalize_retranscribes_on_large_tail():
    t = ScriptedTranscriber(["partial", "full text"])
    session = StreamingSession(t)
    session.accept(seconds(3))
    session.tick()
    session.accept(seconds(1.0))  # 1 s tail > 250 ms
    final = session.finalize()
    assert not final.from_interim_cache
    assert final.text == "full text"
    assert len(t.calls) == 2
    assert len(t.calls[1]) == 4 * SAMPLE_RATE  # full buffer, not the window


def test_finalize_never_reuses_when_buffer_exceeds_window():
    t = ScriptedTranscriber(["w1", "full"])
    session = StreamingSession(t)
    session.accept(seconds(14))
    session.tick()
    final = session.finalize()  # no tail, but buffer > window
    assert not final.from_interim_cache
    assert final.text == "full"


def test_discard_resets_state():
    t = ScriptedTranscriber(["x", "y"])
    session = StreamingSession(t)
    session.accept(seconds(1))
    session.tick()
    session.discard()
    assert session.buffered_samples == 0
    session.accept(seconds(1))
    r = session.tick()
    assert r.stable == ""  # tracker was reset


def test_buffer_hard_cap():
    session = StreamingSession(ScriptedTranscriber([]))
    session.accept(np.zeros(31 * 60 * SAMPLE_RATE, dtype=np.float32))
    assert session.buffered_samples == 30 * 60 * SAMPLE_RATE


# ---------------------------------------------------------------------------
# scheduler
# ---------------------------------------------------------------------------


def test_scheduler_runs_jobs_and_reports_stats():
    s = EngineScheduler()
    try:
        job = s.submit("a", lambda: 41 + 1)
        assert s.wait(job, timeout=5) == 42
        assert s.stats()["count"] == 1
    finally:
        s.shutdown()


def test_scheduler_supersede_drops_stale_interim():
    s = EngineScheduler()
    try:
        gate = threading.Event()
        s.submit("warm", lambda: gate.wait(5))  # occupy the worker
        j1 = s.submit("stream1", lambda: "old")
        j2 = s.submit("stream1", lambda: "new")  # supersedes j1
        gate.set()
        assert s.wait(j2, timeout=5) == "new"
        with pytest.raises(RuntimeError):
            s.wait(j1, timeout=5)
    finally:
        s.shutdown()


def test_scheduler_priority_finalize_first():
    s = EngineScheduler()
    try:
        gate = threading.Event()
        order = []
        s.submit("warm", lambda: gate.wait(5))
        ji = s.submit("s1", lambda: order.append("interim"), priority=PRIORITY_INTERIM, supersede=False)
        jf = s.submit("s2", lambda: order.append("final"), priority=PRIORITY_FINALIZE, supersede=False)
        gate.set()
        s.wait(ji, timeout=5)
        s.wait(jf, timeout=5)
        assert order == ["final", "interim"]
    finally:
        s.shutdown()


def test_scheduler_propagates_errors():
    s = EngineScheduler()
    try:
        def boom():
            raise ValueError("nope")

        job = s.submit("x", boom)
        with pytest.raises(ValueError):
            s.wait(job, timeout=5)
    finally:
        s.shutdown()


def test_scheduler_shutdown_cancels_queued():
    s = EngineScheduler()
    gate = threading.Event()
    s.submit("warm", lambda: gate.wait(5))
    queued = s.submit("y", lambda: "never", supersede=False)
    s.shutdown()  # flush before gate releases the worker
    gate.set()
    with pytest.raises((RuntimeError, TimeoutError)):
        s.wait(queued, timeout=1)


# ---------------------------------------------------------------------------
# Batch coalescing


def _gate_worker(s):
    """Block the worker so subsequently queued jobs pile up."""
    gate = threading.Event()
    started = threading.Event()

    def hold():
        started.set()
        gate.wait(5)

    s.submit("warmhold", hold)
    started.wait(5)
    return gate


def test_scheduler_coalesces_batchable_jobs():
    s = EngineScheduler()
    calls = []

    def runner(payloads):
        calls.append(list(payloads))
        return [p * 10 for p in payloads]

    try:
        gate = _gate_worker(s)
        jobs = [
            s.submit_batchable(f"stream{i}", i + 1, "k", runner) for i in range(3)
        ]
        gate.set()
        results = [s.wait(j, timeout=5) for j in jobs]
        assert results == [10, 20, 30]
        assert len(calls) == 1 and sorted(calls[0]) == [1, 2, 3]
    finally:
        s.shutdown()


def test_scheduler_batchable_runs_solo_when_alone():
    s = EngineScheduler()
    calls = []

    def runner(payloads):
        calls.append(list(payloads))
        return [p + 1 for p in payloads]

    try:
        job = s.submit_batchable("only", 41, "k", runner)
        assert s.wait(job, timeout=5) == 42
        assert calls == [[41]]
    finally:
        s.shutdown()


def test_scheduler_batch_excludes_same_stream_and_stale():
    s = EngineScheduler()
    calls = []

    def runner(payloads):
        calls.append(list(payloads))
        return [p for p in payloads]

    try:
        gate = _gate_worker(s)
        old = s.submit_batchable("a", "a-old", "k", runner)
        new = s.submit_batchable("a", "a-new", "k", runner)  # supersedes old
        other = s.submit_batchable("b", "b-1", "k", runner)
        gate.set()
        assert s.wait(new, timeout=5) == "a-new"
        assert s.wait(other, timeout=5) == "b-1"
        with pytest.raises(RuntimeError):
            s.wait(old, timeout=5)
        # one batch of exactly the two live jobs, stale "a-old" excluded
        assert len(calls) == 1 and sorted(calls[0]) == ["a-new", "b-1"]
    finally:
        s.shutdown()


def test_scheduler_short_batch_result_fails_all_members():
    """ADVICE r1: a batch_runner returning fewer results than payloads must
    surface an error on every member — not silently hand someone None."""
    s = EngineScheduler()

    def runner(payloads):
        return [p for p in payloads][:-1]  # drop one result

    try:
        gate = _gate_worker(s)
        jobs = [s.submit_batchable(f"s{i}", i, "k", runner) for i in range(3)]
        gate.set()
        for job in jobs:
            with pytest.raises(RuntimeError, match="results"):
                s.wait(job, timeout=5)
    finally:
        s.shutdown()


def test_scheduler_batch_respects_max_batch():
    s = EngineScheduler()
    calls = []

    def runner(payloads):
        calls.append(list(payloads))
        return list(payloads)

    try:
        gate = _gate_worker(s)
        jobs = [
            s.submit_batchable(f"s{i}", i, "k", runner, max_batch=2)
            for i in range(4)
        ]
        gate.set()
        for i, j in enumerate(jobs):
            assert s.wait(j, timeout=5) == i
        assert [len(c) for c in calls] == [2, 2]
    finally:
        s.shutdown()


def test_scheduler_batch_error_propagates_to_all_members():
    s = EngineScheduler()

    def runner(payloads):
        raise ValueError("batch boom")

    try:
        gate = _gate_worker(s)
        jobs = [s.submit_batchable(f"e{i}", i, "k", runner) for i in range(2)]
        gate.set()
        for j in jobs:
            with pytest.raises(ValueError):
                s.wait(j, timeout=5)
    finally:
        s.shutdown()


def test_scheduler_rejects_submit_after_shutdown():
    s = EngineScheduler()
    s.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        s.submit("x", lambda: 1)
    with pytest.raises(RuntimeError, match="shut down"):
        s.submit_batchable("x", 1, "k", lambda p: p)


def test_scheduler_stats_count_batches():
    s = EngineScheduler()
    try:
        gate = _gate_worker(s)
        # one shared runner, like production submitters (bound methods):
        # distinct runner objects must NOT coalesce (payload shapes differ)
        runner = lambda p: list(p)  # noqa: E731
        jobs = [s.submit_batchable(f"c{i}", i, "k", runner) for i in range(3)]
        gate.set()
        for j in jobs:
            s.wait(j, timeout=5)
        stats = s.stats()
        assert stats["batches"] == 1 and stats["batched_jobs"] == 3
    finally:
        s.shutdown()


def test_finalize_immune_to_later_interim_supersede():
    # pipeline submits finalizes with supersede=False; an interim tick of
    # the NEXT recording on the same stream must not cancel it.
    s = EngineScheduler()
    try:
        gate = _gate_worker(s)
        finalize = s.submit("mic", lambda: "finalized", priority=0, supersede=False)
        tick = s.submit("mic", lambda: "interim", priority=1, supersede=True)
        gate.set()
        assert s.wait(finalize, timeout=5) == "finalized"
        assert s.wait(tick, timeout=5) == "interim"
    finally:
        s.shutdown()


def test_batch_coalescing_requires_same_runner():
    # Two submitters sharing a batch_key but with different runners (and
    # payload shapes) must not coalesce into one batch.
    s = EngineScheduler()
    try:
        gate = _gate_worker(s)
        runner_a_calls, runner_b_calls = [], []

        def runner_a(payloads):
            runner_a_calls.append(list(payloads))
            return [("a", p) for p in payloads]

        def runner_b(payloads):
            runner_b_calls.append(list(payloads))
            return [("b", p) for p in payloads]

        ja = s.submit_batchable("s1", "arr", "transcribe", runner_a)
        jb = s.submit_batchable("s2", ("key", "arr"), "transcribe", runner_b)
        gate.set()
        assert s.wait(ja, timeout=5) == ("a", "arr")
        assert s.wait(jb, timeout=5) == ("b", ("key", "arr"))
        assert runner_a_calls == [["arr"]]
        assert runner_b_calls == [[("key", "arr")]]
    finally:
        s.shutdown()
