"""App-startup wiring (portable lib.rs core): background engine start with
retries, daily profile maintenance with persisted last-run, exit kill."""

import json
import threading
import time

import pytest

from light_whisper_tpu.runtime.appinit import (
    BackgroundEngineStarter,
    DailyMaintenance,
    install_exit_kill,
)
from light_whisper_tpu.text.profile import ProfileStore, UserProfile, add_hot_word


class FakeManager:
    def __init__(self, fail_times=0):
        self.fail_times = fail_times
        self.start_calls = 0
        self.shutdowns = 0

    def start(self, **kwargs):
        self.start_calls += 1
        if self.start_calls <= self.fail_times:
            raise RuntimeError(f"boom {self.start_calls}")
        return object()

    def shutdown(self):
        self.shutdowns += 1


def test_background_start_succeeds_first_try():
    mgr = FakeManager()
    starter = BackgroundEngineStarter(mgr, sleep=lambda s: None)
    starter.start()
    assert starter.wait(5)
    assert mgr.start_calls == 1 and starter.last_error is None


def test_background_start_retries_then_succeeds():
    mgr = FakeManager(fail_times=2)
    starter = BackgroundEngineStarter(mgr, sleep=lambda s: None)
    starter.start()
    assert starter.wait(5)
    assert mgr.start_calls == 3 and starter.last_error is None


def test_background_start_exhausts_retries_without_raising():
    mgr = FakeManager(fail_times=99)
    starter = BackgroundEngineStarter(mgr, retries=3, sleep=lambda s: None)
    starter.start()
    assert starter.wait(5)
    assert mgr.start_calls == 3
    assert isinstance(starter.last_error, RuntimeError)  # surfaced, not raised


def test_maintenance_runs_once_per_interval(tmp_path):
    store = ProfileStore(str(tmp_path / "profile.json"))
    profile = UserProfile()
    add_hot_word(profile, "TPUWord")
    store.save_now(profile)

    now = [1000.0]
    m = DailyMaintenance(store, interval_s=100.0, clock=lambda: now[0])
    assert m.run_if_due() is not None  # first run: no stamp yet
    assert m.run_if_due() is None  # same instant: not due
    now[0] += 50
    assert m.run_if_due() is None  # half interval: not due
    now[0] += 60
    assert m.run_if_due() is not None  # past interval: due again
    assert m.runs == 2
    # the stamp persists: a fresh instance (process restart) is not due
    m2 = DailyMaintenance(store, interval_s=100.0, clock=lambda: now[0])
    assert m2.run_if_due() is None
    stamp = json.loads(open(store.path + ".maintenance").read())
    assert stamp["last_run"] == now[0]


def test_maintenance_schedule_fires_periodically(tmp_path):
    store = ProfileStore(str(tmp_path / "profile.json"))
    store.save_now(UserProfile())
    now = [0.0]
    m = DailyMaintenance(store, interval_s=0.01, clock=lambda: now[0])

    # advance the fake clock so each timer fire is "due"
    orig = m.run_if_due

    def advancing():
        now[0] += 1.0
        return orig()

    m.run_if_due = advancing
    m.start_schedule(check_every_s=0.02)
    time.sleep(0.15)
    m.stop_schedule()
    assert m.runs >= 3


def test_exit_kill_blocks_and_stops_once():
    mgr = FakeManager()
    registered = []
    hook = install_exit_kill(mgr, register=registered.append)
    assert registered == [hook]
    hook()
    hook()  # idempotent
    assert mgr.shutdowns == 1


def test_corrupt_stamp_is_treated_as_never_run(tmp_path):
    store = ProfileStore(str(tmp_path / "profile.json"))
    m = DailyMaintenance(store, interval_s=100.0, clock=lambda: 1000.0)
    # null / list / wrong-typed JSON stamps must read as "never run", not crash
    for bad in ("null", "[1,2]", '{"last_run": null}', "{}"):
        with open(m.stamp_path, "w") as f:
            f.write(bad)
        assert m.run_if_due() is not None  # ran and repaired the stamp
        import os
        os.remove(m.stamp_path)


def test_startup_maintenance_failure_still_arms_the_timer(tmp_path):
    store = ProfileStore(str(tmp_path / "profile.json"))
    clock = {"t": 0.0}
    m = DailyMaintenance(store, interval_s=0.02, clock=lambda: clock["t"])
    fails = {"n": 0}
    real_save = store.save_now

    def flaky_save(profile):
        if fails["n"] == 0:
            fails["n"] += 1
            raise OSError("disk full")
        real_save(profile)

    store.save_now = flaky_save
    # The initial run raises inside start_schedule; startup must survive and
    # the periodic timer must still be armed so a later fire succeeds.
    m.start_schedule(check_every_s=0.01)
    deadline = time.time() + 5
    while m.runs == 0 and time.time() < deadline:
        clock["t"] += 1.0
        time.sleep(0.02)
    m.stop_schedule()
    assert fails["n"] == 1 and m.runs >= 1


def test_run_if_due_is_serialized(tmp_path):
    store = ProfileStore(str(tmp_path / "profile.json"))
    m = DailyMaintenance(store, interval_s=1000.0, clock=time.time)
    barrier = threading.Barrier(4)
    results = []

    def worker():
        barrier.wait()
        results.append(m.run_if_due())

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # exactly one concurrent caller performed maintenance
    assert sum(1 for r in results if r is not None) == 1
    assert m.runs == 1
