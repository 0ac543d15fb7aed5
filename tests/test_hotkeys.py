"""Hotkey dispatch semantics (portable core of hotkey.rs — hold/toggle
modes, 180 ms re-press debounce, off-hook dispatch, diagnostics)."""

import threading
import time

import numpy as np
import pytest

from light_whisper_tpu.runtime.hotkeys import (
    REPRESS_DEBOUNCE_MS,
    HotkeyAction,
    HotkeyEngine,
    HotkeyKind,
    HotkeyMode,
    classify_mode,
)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance_ms(self, ms):
        self.t += ms / 1000.0


def make_engine(mode=HotkeyMode.TOGGLE, min_hold_ms=0):
    clock = Clock()
    actions = []
    engine = HotkeyEngine(
        lambda kind, action: actions.append((kind, action)),
        clock=clock,
        min_hold_ms=min_hold_ms,
    )
    engine.bind(HotkeyKind.DICTATION, mode)
    return engine, clock, actions


def test_classify_mode_modifier_only_forces_hold():
    # hotkey.rs:62-78 — modifier-only combos can't register as toggles
    assert classify_mode(modifier_only=True, hold_preference=False) is HotkeyMode.HOLD
    assert classify_mode(modifier_only=False, hold_preference=False) is HotkeyMode.TOGGLE
    assert classify_mode(modifier_only=False, hold_preference=True) is HotkeyMode.HOLD


def test_toggle_press_starts_then_stops():
    engine, clock, actions = make_engine(HotkeyMode.TOGGLE)
    k = HotkeyKind.DICTATION
    engine.key_event(k, True)
    engine.key_event(k, False)
    clock.advance_ms(1000)
    engine.key_event(k, True)
    engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert actions == [(k, HotkeyAction.START), (k, HotkeyAction.STOP)]


def test_repress_debounce_drops_fast_second_press():
    engine, clock, actions = make_engine(HotkeyMode.TOGGLE)
    k = HotkeyKind.DICTATION
    engine.key_event(k, True)
    engine.key_event(k, False)
    clock.advance_ms(REPRESS_DEBOUNCE_MS / 2)  # bounce within the window
    engine.key_event(k, True)
    engine.flush()
    clock.advance_ms(REPRESS_DEBOUNCE_MS)  # past the window
    engine.key_event(k, True)
    engine.flush()
    engine.close()
    assert actions == [(k, HotkeyAction.START), (k, HotkeyAction.STOP)]
    stats = engine.stats()[k.value]
    assert stats["suppressed"] == 1


def test_hold_down_up_push_to_talk():
    engine, clock, actions = make_engine(HotkeyMode.HOLD)
    k = HotkeyKind.DICTATION
    engine.key_event(k, True)
    engine.key_event(k, True)  # OS key-repeat while held: ignored
    engine.key_event(k, True)
    clock.advance_ms(800)
    engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert actions == [(k, HotkeyAction.START), (k, HotkeyAction.STOP)]


def test_hold_too_short_cancels():
    engine, clock, actions = make_engine(HotkeyMode.HOLD, min_hold_ms=200)
    k = HotkeyKind.DICTATION
    engine.key_event(k, True)
    clock.advance_ms(100)  # released before min hold
    engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert actions == [(k, HotkeyAction.START), (k, HotkeyAction.CANCEL)]


def test_stray_keyup_and_unbound_kind_ignored():
    engine, clock, actions = make_engine(HotkeyMode.HOLD)
    engine.key_event(HotkeyKind.DICTATION, False)  # up without down
    engine.key_event(HotkeyKind.ASSISTANT, True)  # unbound kind
    engine.flush()
    engine.close()
    assert actions == []


def test_failed_start_does_not_wedge_the_binding():
    clock = Clock()
    calls = []

    def handler(kind, action):
        calls.append(action)
        if len(calls) == 1:
            raise RuntimeError("engine not ready")

    engine = HotkeyEngine(handler, clock=clock)
    k = HotkeyKind.DICTATION
    engine.bind(k, HotkeyMode.TOGGLE)
    engine.key_event(k, True)  # START raises
    engine.key_event(k, False)
    engine.flush()
    clock.advance_ms(1000)
    engine.key_event(k, True)  # must START again, not STOP
    engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert calls == [HotkeyAction.START, HotkeyAction.START]
    assert engine.stats()[k.value]["suppressed"] == 1


def test_three_kinds_independent():
    clock = Clock()
    actions = []
    engine = HotkeyEngine(lambda kind, a: actions.append((kind, a)), clock=clock)
    engine.bind(HotkeyKind.DICTATION, HotkeyMode.HOLD)
    engine.bind(HotkeyKind.ASSISTANT, HotkeyMode.TOGGLE)
    engine.key_event(HotkeyKind.DICTATION, True)
    engine.key_event(HotkeyKind.ASSISTANT, True)
    clock.advance_ms(500)
    engine.key_event(HotkeyKind.DICTATION, False)
    engine.flush()
    engine.close()
    assert (HotkeyKind.DICTATION, HotkeyAction.START) in actions
    assert (HotkeyKind.ASSISTANT, HotkeyAction.START) in actions
    assert actions[-1] == (HotkeyKind.DICTATION, HotkeyAction.STOP)


def test_dispatch_runs_off_the_event_thread():
    """Hook callbacks must never block on the handler (hotkey.rs:89-126)."""
    clock = Clock()
    release = threading.Event()
    started = threading.Event()

    def slow_handler(kind, action):
        started.set()
        release.wait(5)

    engine = HotkeyEngine(slow_handler, clock=clock)
    k = HotkeyKind.DICTATION
    engine.bind(k, HotkeyMode.TOGGLE)
    t0 = time.perf_counter()
    engine.key_event(k, True)
    enqueue_ms = (time.perf_counter() - t0) * 1000
    assert enqueue_ms < 50  # intake returned while the handler still runs
    assert started.wait(2)
    release.set()
    engine.close()


def test_hotkeys_drive_recording_controller():
    """Key-down → start dictation, key-up → finalize: the reference's
    hook → dispatch → audio-commands call stack (SURVEY §3), headless."""
    from types import SimpleNamespace

    from light_whisper_tpu.audio.capture import ScriptedSource
    from light_whisper_tpu.runtime.recording import RecordingController

    SR = 16_000

    class FakeTranscriber:
        def transcribe(self, audio):
            return SimpleNamespace(text=f"len={len(audio)}", language="zh")

    ctl = RecordingController(FakeTranscriber())
    results = []
    src_audio = np.full(SR, 0.1, dtype=np.float32)

    def handler(kind, action):
        if action is HotkeyAction.START:
            ctl.start_recording(
                ScriptedSource([src_audio], sample_rate=SR), interval_scale=50.0
            )
        elif action is HotkeyAction.STOP:
            results.append(ctl.stop_recording())
        else:
            ctl.cancel_recording()

    clock = Clock()
    engine = HotkeyEngine(handler, clock=clock)
    k = HotkeyKind.DICTATION
    engine.bind(k, HotkeyMode.HOLD)
    engine.key_event(k, True)
    engine.flush()
    deadline = time.time() + 5
    while time.time() < deadline:
        active = ctl._active
        if active is not None and len(active.ring) >= SR:
            break
        time.sleep(0.01)
    clock.advance_ms(1500)
    engine.key_event(k, False)
    engine.flush(timeout=10)
    engine.close()
    assert results and results[0].text == f"len={SR}"
    assert not results[0].too_short


def test_toggle_key_repeat_does_not_cycle_start_stop():
    # A held TOGGLE key delivers auto-repeat key-downs with no key-up; they
    # must not flip the recording ~30x/s.
    engine, clock, actions = make_engine(HotkeyMode.TOGGLE)
    k = HotkeyKind.DICTATION
    engine.key_event(k, True)
    for _ in range(10):  # OS auto-repeat
        clock.advance_ms(33)
        engine.key_event(k, True)
    engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert actions == [(k, HotkeyAction.START)]
    assert engine.stats()[k.value]["presses"] == 1


def test_failed_toggle_stop_rearms_for_retry():
    clock = Clock()
    calls = []

    def handler(kind, action):
        calls.append(action)
        if calls.count(HotkeyAction.STOP) == 1:
            raise RuntimeError("finalize hiccup")

    engine = HotkeyEngine(handler, clock=clock)
    k = HotkeyKind.DICTATION
    engine.bind(k, HotkeyMode.TOGGLE)
    for _ in range(3):  # START, STOP (fails), STOP (retry succeeds)
        clock.advance_ms(1000)
        engine.key_event(k, True)
        engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert calls == [HotkeyAction.START, HotkeyAction.STOP, HotkeyAction.STOP]


def test_failed_hold_stop_unwedges_on_next_press():
    clock = Clock()
    calls = []

    def handler(kind, action):
        calls.append(action)
        if calls.count(HotkeyAction.STOP) == 1:
            raise RuntimeError("finalize hiccup")

    engine = HotkeyEngine(handler, clock=clock)
    k = HotkeyKind.DICTATION
    engine.bind(k, HotkeyMode.HOLD)
    engine.key_event(k, True)
    clock.advance_ms(800)
    engine.key_event(k, False)  # STOP raises -> binding re-arms
    engine.flush()
    clock.advance_ms(1000)
    engine.key_event(k, True)  # unwedge: stop the leftover recording
    clock.advance_ms(800)
    engine.key_event(k, False)
    engine.flush()
    clock.advance_ms(1000)
    engine.key_event(k, True)  # fresh start works again
    clock.advance_ms(800)
    engine.key_event(k, False)
    engine.flush()
    engine.close()
    assert calls == [
        HotkeyAction.START,
        HotkeyAction.STOP,  # fails
        HotkeyAction.STOP,  # unwedge on next press
        HotkeyAction.START,
        HotkeyAction.STOP,
    ]
