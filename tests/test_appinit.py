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
