"""Hotkey dispatch semantics: hold vs toggle, debounce, off-hook dispatch.

Portable core of the reference's hotkey engine (``hotkey.rs``). What stays
with the shell is Win32 plumbing — ``RegisterHotKey``, the
``WH_KEYBOARD_LL`` hook, synthetic key-up injection, stuck-modifier
release. What this module rebuilds is every decision that plumbing feeds:

- **backend/mode classification** (``classify_backend`` ``hotkey.rs:62-78``):
  a binding is TOGGLE (press starts, press again stops — the
  RegisterHotKey path) or HOLD (key-down starts, key-up stops — the
  low-level-hook path used for modifier-only combos);
- **re-press debounce** (``hotkey.rs:35``): a press within 180 ms of the
  previous release of the same binding is dropped (key-repeat and switch
  bounce must not re-trigger a recording);
- **dedicated dispatch thread** (``hotkey.rs:89-126``): hook callbacks
  must return immediately, so raw events enqueue and a worker dispatches
  the start/stop actions — reproduced here so action handlers (engine
  start, finalize) can block without stalling the event producer;
- **three hotkey kinds** (dictation / translation / assistant), each with
  its own binding and mode;
- **diagnostic state surface** (``app_state.rs:202-235``): per-kind
  press/release/suppressed counters and last-event timestamps.

Event producers call :meth:`HotkeyEngine.key_event` from any thread (a
test, an evdev reader, an OS hook); actions come out on the dispatch
thread via the registered handlers.
"""

from __future__ import annotations

import dataclasses
import enum
import queue
import threading
import time
from typing import Callable, Dict, Optional

REPRESS_DEBOUNCE_MS = 180  # hotkey.rs:35
# A HOLD press shorter than this is treated as an accidental tap and the
# recording it started is cancelled rather than finalized (the reference's
# too-short path rejects it downstream; cancelling earlier saves an ASR
# dispatch — same observable outcome: no text).
MIN_HOLD_MS = 0


class HotkeyKind(enum.Enum):
    DICTATION = "dictation"
    TRANSLATION = "translation"
    ASSISTANT = "assistant"


class HotkeyMode(enum.Enum):
    TOGGLE = "toggle"  # press starts; next press stops
    HOLD = "hold"  # key-down starts; key-up stops (push-to-talk)


class HotkeyAction(enum.Enum):
    START = "start"
    STOP = "stop"
    CANCEL = "cancel"


def classify_mode(modifier_only: bool, hold_preference: bool) -> HotkeyMode:
    """The portable rule inside ``classify_backend`` (``hotkey.rs:62-78``):
    modifier-only combos cannot use the toggle registration path and run
    as HOLD; key combos follow the user's hold/toggle preference."""
    if modifier_only:
        return HotkeyMode.HOLD
    return HotkeyMode.HOLD if hold_preference else HotkeyMode.TOGGLE


@dataclasses.dataclass
class HotkeyStats:
    presses: int = 0
    releases: int = 0
    suppressed: int = 0  # debounced or invalid-state events
    dispatched: int = 0
    last_event_ms: Optional[float] = None

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


class _Binding:
    def __init__(self, kind: HotkeyKind, mode: HotkeyMode) -> None:
        self.kind = kind
        self.mode = mode
        self.active = False  # a recording this binding started is live
        self.pressed = False  # physical key currently down (HOLD)
        self.last_release_ms: Optional[float] = None
        self.press_started_ms: Optional[float] = None
        self.stats = HotkeyStats()


class HotkeyEngine:
    """Turns raw key events into start/stop/cancel dispatches.

    ``handler(kind, action)`` runs on the dispatch thread. Exceptions it
    raises are swallowed into the binding's suppressed counter — a failing
    start must not kill the dispatch loop (the hook keeps feeding events,
    ``hotkey.rs:89-126``).
    """

    def __init__(
        self,
        handler: Callable[[HotkeyKind, HotkeyAction], None],
        clock: Callable[[], float] = time.monotonic,
        min_hold_ms: float = MIN_HOLD_MS,
    ) -> None:
        self._handler = handler
        self._clock = clock
        self._min_hold_ms = min_hold_ms
        self._bindings: Dict[HotkeyKind, _Binding] = {}
        self._lock = threading.Lock()
        self._queue: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._running = True
        self._worker.start()

    # -- configuration -------------------------------------------------

    def bind(self, kind: HotkeyKind, mode: HotkeyMode) -> None:
        with self._lock:
            self._bindings[kind] = _Binding(kind, mode)

    def unbind(self, kind: HotkeyKind) -> None:
        with self._lock:
            self._bindings.pop(kind, None)

    # -- event intake (hook-thread side: never blocks) -------------------

    def key_event(self, kind: HotkeyKind, down: bool) -> None:
        """Feed a raw key transition. Returns immediately; decisions and
        handler dispatch happen on the worker thread."""
        self._queue.put((kind, down, self._clock() * 1000.0))

    def close(self) -> None:
        self._running = False
        self._queue.put(None)
        self._worker.join(timeout=5)

    def flush(self, timeout: float = 5.0) -> None:
        """Wait until every queued event has been dispatched (tests)."""
        deadline = time.monotonic() + timeout
        while not self._queue.empty() and time.monotonic() < deadline:
            time.sleep(0.002)
        # one more beat for the in-flight item
        time.sleep(0.01)

    # -- stats -----------------------------------------------------------

    def stats(self) -> Dict[str, dict]:
        with self._lock:
            return {k.value: b.stats.to_dict() for k, b in self._bindings.items()}

    # -- worker ----------------------------------------------------------

    def _run(self) -> None:
        while self._running:
            item = self._queue.get()
            if item is None:
                return
            kind, down, now_ms = item
            self._process(kind, down, now_ms)

    def _process(self, kind: HotkeyKind, down: bool, now_ms: float) -> None:
        with self._lock:
            binding = self._bindings.get(kind)
            if binding is None:
                return
            binding.stats.last_event_ms = now_ms
            action = self._decide(binding, down, now_ms)
        if action is None:
            return
        try:
            self._handler(kind, action)
        except Exception:
            with self._lock:
                binding.stats.suppressed += 1
                if action is HotkeyAction.START:
                    # a failed START must not leave the binding claiming a
                    # live recording it never got
                    binding.active = False
                else:
                    # a failed STOP/CANCEL leaves the recording live — re-arm
                    # so the next press retries the stop instead of wedging
                    binding.active = True
        else:
            with self._lock:
                binding.stats.dispatched += 1

    def _decide(
        self, b: _Binding, down: bool, now_ms: float
    ) -> Optional[HotkeyAction]:
        if down:
            b.stats.presses += 1
            if b.pressed:
                # OS key-repeat while held: not a new press (a held TOGGLE
                # key must not cycle start/stop ~30×/s either)
                b.stats.presses -= 1
                return None
            if (
                b.last_release_ms is not None
                and now_ms - b.last_release_ms < REPRESS_DEBOUNCE_MS
            ):
                b.stats.suppressed += 1
                return None
            b.pressed = True
            if b.mode is HotkeyMode.TOGGLE:
                b.active = not b.active
                return HotkeyAction.START if b.active else HotkeyAction.STOP
            # HOLD
            b.press_started_ms = now_ms
            if b.active:
                # leftover live recording from a failed stop: unwedge by
                # stopping it; the next press starts fresh
                b.active = False
                return HotkeyAction.STOP
            b.active = True
            return HotkeyAction.START
        # key-up
        b.stats.releases += 1
        b.last_release_ms = now_ms
        was_pressed = b.pressed
        b.pressed = False
        if b.mode is HotkeyMode.TOGGLE:
            return None  # toggle acts on presses only
        if not was_pressed:
            return None  # stray key-up (e.g. pressed before binding)
        if not b.active:
            return None
        b.active = False
        held = now_ms - (b.press_started_ms or now_ms)
        if held < self._min_hold_ms:
            return HotkeyAction.CANCEL
        return HotkeyAction.STOP
