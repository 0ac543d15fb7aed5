"""Engine lifecycle race tests: start tickets, owner CAS, generations.

Mirrors the cancellation-safety contracts of ``funasr_service.rs:210-297``
and ``app_state.rs:420-457`` with controllable fake spawns — every race is
forced deterministically with events, never with sleeps."""

import threading

import pytest

from light_whisper_tpu.runtime.lifecycle import (
    EngineManager,
    EngineStartBlocked,
    EngineStartRejected,
    EngineStartSuperseded,
)


class FakeClient:
    def __init__(self, engine):
        self.engine = engine
        self.shutdowns = 0

    def shutdown(self):
        self.shutdowns += 1


class FakeSpawner:
    """Spawn factory whose in-flight loads can be held open per-call."""

    def __init__(self):
        self.clients = []
        self.gate = None  # when set, spawn blocks until the event fires
        self.entered = threading.Event()

    def __call__(self, engine, **kwargs):
        self.entered.set()
        if self.gate is not None:
            assert self.gate.wait(10)
        client = FakeClient(engine)
        self.clients.append(client)
        return client


def test_start_promotes_and_restart_replaces():
    spawner = FakeSpawner()
    mgr = EngineManager(spawn=spawner, engine="qwen3-asr-0.6b")
    first = mgr.start()
    assert mgr.client() is first and first.engine == "qwen3-asr-0.6b"
    second = mgr.restart("qwen3-asr-1.7b")
    assert mgr.client() is second and second.engine == "qwen3-asr-1.7b"
    assert first.shutdowns == 1  # replaced engine was stopped
    assert mgr.engine == "qwen3-asr-1.7b"


def test_concurrent_start_loses_owner_cas():
    spawner = FakeSpawner()
    spawner.gate = threading.Event()
    mgr = EngineManager(spawn=spawner)

    errors = []
    started = []

    def slow_start():
        started.append(mgr.start())

    t = threading.Thread(target=slow_start, daemon=True)
    t.start()
    assert spawner.entered.wait(10)  # first start is inside spawn
    with pytest.raises(EngineStartRejected):
        mgr.start()
    spawner.gate.set()
    t.join(timeout=10)
    assert not errors and len(started) == 1
    assert mgr.client() is started[0]


def test_stop_during_slow_start_kills_unpromoted_child():
    spawner = FakeSpawner()
    spawner.gate = threading.Event()
    mgr = EngineManager(spawn=spawner)

    failures = []

    def slow_start():
        try:
            mgr.start()
        except EngineStartSuperseded as exc:
            failures.append(exc)

    t = threading.Thread(target=slow_start, daemon=True)
    t.start()
    assert spawner.entered.wait(10)
    mgr.stop()  # generation bump while the child is still loading
    spawner.gate.set()
    t.join(timeout=10)

    assert len(failures) == 1  # starter observed the supersede
    assert mgr.client() is None  # the stop stuck: no zombie promotion
    assert spawner.clients[0].shutdowns == 1  # child was killed, not leaked


def test_switch_during_start_invalidates_old_engine_ticket():
    spawner = FakeSpawner()
    spawner.gate = threading.Event()
    mgr = EngineManager(spawn=spawner, engine="qwen3-asr-0.6b")

    outcome = {}

    def slow_start():
        try:
            outcome["client"] = mgr.start()
        except EngineStartSuperseded:
            outcome["superseded"] = True

    t = threading.Thread(target=slow_start, daemon=True)
    t.start()
    assert spawner.entered.wait(10)
    # switch cannot win the owner slot while the old start holds it
    with pytest.raises(EngineStartRejected):
        mgr.switch_engine("qwen3-asr-1.7b")
    # ...but it already invalidated the in-flight ticket (generation bump),
    # WITHOUT altering the configured engine — a rejected start must not
    # change which engine later bare starts use (start()'s own invariant).
    assert mgr.engine == "qwen3-asr-0.6b"
    spawner.gate.set()
    t.join(timeout=10)
    assert outcome.get("superseded") is True
    assert spawner.clients[0].shutdowns == 1
    # a bare retry still starts the configured (old) engine...
    client = mgr.start()
    assert client.engine == "qwen3-asr-0.6b"
    # ...and retrying the switch itself lands the new one.
    client = mgr.switch_engine("qwen3-asr-1.7b")
    assert client.engine == "qwen3-asr-1.7b"
    assert mgr.engine == "qwen3-asr-1.7b"


def test_spawn_failure_releases_owner_slot():
    calls = {"n": 0}

    def flaky(engine, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("model file corrupt")
        return FakeClient(engine)

    mgr = EngineManager(spawn=flaky)
    with pytest.raises(RuntimeError, match="corrupt"):
        mgr.start()
    assert not mgr.is_starting()  # owner slot released on the failure path
    assert mgr.start() is mgr.client()  # retry succeeds


def test_shutdown_blocks_future_starts():
    spawner = FakeSpawner()
    mgr = EngineManager(spawn=spawner)
    running = mgr.start()
    mgr.shutdown()
    assert running.shutdowns == 1
    with pytest.raises(EngineStartBlocked):
        mgr.start()
    mgr.unblock_starts()
    assert mgr.start().engine == mgr.engine


def test_rejected_start_does_not_change_configured_engine():
    spawner = FakeSpawner()
    spawner.gate = threading.Event()
    mgr = EngineManager(spawn=spawner, engine="qwen3-asr-0.6b")
    t = threading.Thread(target=mgr.start, daemon=True)
    t.start()
    assert spawner.entered.wait(10)
    with pytest.raises(EngineStartRejected):
        mgr.start("qwen3-asr-1.7b")
    assert mgr.engine == "qwen3-asr-0.6b"  # loser must not reconfigure
    spawner.gate.set()
    t.join(timeout=10)
