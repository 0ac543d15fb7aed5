"""Presentation-race guards: subtitle show-generations, pending paste.

The reference pre-creates a transparent always-on-top subtitle window and
pastes finalized text into the foreground app — both OS surfaces. The race
logic that keeps them correct is engine-adjacent state, rebuilt here:

- **Show-generation guard** (``window.rs:193-244``, ``audio.rs:101-109``):
  starting a recording *reserves* a show generation; the async task that
  later shows the window only wins if its (session_id, generation) is
  still current, and a scheduled hide only fires if no newer show
  superseded it (``schedule_subtitle_hide`` ``window.rs:367+``). Without
  this, a slow show task from a cancelled session flashes the overlay
  over a newer recording.
- **Pending-paste queue** (``do_paste`` ``finalize.rs:1060-1078``): if a
  new recording is already active when a finalize completes, its text is
  queued instead of pasted (typing into the foreground app mid-recording
  would interleave with the user's next dictation); queued texts deliver
  in order when recording goes idle. Paste itself waits the fixed 60 ms
  UX delay (``PASTE_DELAY_MS`` ``mod.rs:44``).
- **Subtitle layout resolution** (``window.rs:51-114``): the overlay
  covers the monitor the user is looking at — cursor monitor first, then
  the main window's monitor, the primary, the first available, and a
  1280×720 default when enumeration fails entirely; physical pixels are
  converted to logical coordinates through each monitor's scale factor.

The actual window/clipboard backends stay with the shell; these classes
drive any callback-shaped sink and are exercised headlessly in tests.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

PASTE_DELAY_MS = 60  # mod.rs:44 — fixed UX delay before typing

# window.rs:34-35 — layout when no monitor information is available at all.
DEFAULT_SUBTITLE_WIDTH = 1280.0
DEFAULT_SUBTITLE_HEIGHT = 720.0


@dataclass(frozen=True)
class MonitorInfo:
    """One monitor in physical pixels plus its DPI scale (tauri::Monitor)."""

    x: int
    y: int
    width: int
    height: int
    scale_factor: float = 1.0

    def contains(self, px: int, py: int) -> bool:
        """Point-in-rect over PHYSICAL coordinates (``window.rs:66-73``)."""
        return (
            self.x <= px < self.x + self.width
            and self.y <= py < self.y + self.height
        )


def find_cursor_monitor(
    cursor: Optional[Tuple[int, int]], monitors: Sequence[MonitorInfo]
) -> Optional[MonitorInfo]:
    """The monitor under the cursor, if any (``window.rs:51-74``)."""
    if cursor is None:
        return None
    px, py = cursor
    for monitor in monitors:
        if monitor.contains(px, py):
            return monitor
    return None


def resolve_subtitle_layout(
    monitors: Sequence[MonitorInfo],
    cursor: Optional[Tuple[int, int]] = None,
    main_window_monitor: Optional[MonitorInfo] = None,
    primary: Optional[MonitorInfo] = None,
) -> Tuple[float, float, float, float]:
    """Full-monitor subtitle layout as ``(logical_w, logical_h, x, y)``.

    Fallback ladder (``window.rs:81-114``): cursor monitor → the main
    window's monitor → the primary monitor → the first enumerated monitor
    → the 1280×720 origin default. Physical size/position divide by the
    winning monitor's scale factor; degenerate sizes clamp to ≥1 logical px.
    """
    monitor = (
        find_cursor_monitor(cursor, monitors)
        or main_window_monitor
        or primary
        or (monitors[0] if monitors else None)
    )
    if monitor is None:
        return DEFAULT_SUBTITLE_WIDTH, DEFAULT_SUBTITLE_HEIGHT, 0.0, 0.0
    scale = monitor.scale_factor or 1.0
    return (
        max(monitor.width / scale, 1.0),
        max(monitor.height / scale, 1.0),
        monitor.x / scale,
        monitor.y / scale,
    )


class SubtitleGuard:
    """(session_id, show_generation)-gated show/hide state.

    ``reserve()`` is called synchronously at recording start; the show and
    hide effects run later from async tasks and must re-validate."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._generation = 0
        self._current: Optional[Tuple[int, int]] = None  # reserved (sid, gen)
        self._visible_for: Optional[Tuple[int, int]] = None

    def reserve(self, session_id: int) -> int:
        """Reserve a show generation for a starting session
        (``audio.rs:101-109``). Any older reservation is superseded."""
        with self._lock:
            self._generation += 1
            self._current = (session_id, self._generation)
            return self._generation

    def show_if_current(self, session_id: int, generation: int) -> bool:
        """The async show task: wins only if still current
        (``window.rs:193-244``)."""
        with self._lock:
            if self._current != (session_id, generation):
                return False
            self._visible_for = (session_id, generation)
            return True

    def hide_if_current(self, session_id: int, generation: int) -> bool:
        """A scheduled hide: fires only if no newer show superseded it
        (``schedule_subtitle_hide`` ``window.rs:367+``)."""
        with self._lock:
            if self._visible_for != (session_id, generation):
                return False
            self._visible_for = None
            if self._current == (session_id, generation):
                self._current = None
            return True

    @property
    def visible(self) -> bool:
        with self._lock:
            return self._visible_for is not None

    def visible_session(self) -> Optional[int]:
        with self._lock:
            return self._visible_for[0] if self._visible_for else None


class PasteGate:
    """Orders finalized-text delivery around active recordings.

    ``paste(text)`` delivers through the sink unless a recording is
    active, in which case the text queues; ``set_recording(False)``
    flushes the queue in arrival order (``finalize.rs:1060-1078``).
    The sink receives ``(text, delay_ms)`` — the shell sleeps the delay
    before synthesizing input; headless sinks can ignore it."""

    def __init__(self, sink: Callable[[str, int], None]) -> None:
        self._sink = sink
        self._lock = threading.Lock()
        # Orders every sink call and makes recording-start WAIT for an
        # in-flight delivery: the recording-check and the sink call must be
        # atomic or finalized text types into a recording that started in
        # the gap (the sink sleeps ≥60 ms before synthesizing input, a wide
        # window). Lock order: _deliver_lock → _lock, never the reverse.
        self._deliver_lock = threading.Lock()
        self._recording = False
        self._pending: List[str] = []

    def set_recording(self, active: bool) -> None:
        if active:
            # Block the start until any in-flight paste finishes — the same
            # serialization the reference gets from its single-threaded
            # command loop around do_paste.
            with self._deliver_lock:
                with self._lock:
                    self._recording = True
            return
        with self._lock:
            self._recording = False
        self._flush_pending()

    def paste(self, text: str) -> bool:
        """Returns True if delivered now, False if queued."""
        if not text:
            return True
        with self._deliver_lock:
            with self._lock:
                if self._recording:
                    self._pending.append(text)
                    return False
            self._sink(text, PASTE_DELAY_MS)
        return True

    def _flush_pending(self) -> None:
        while True:
            with self._deliver_lock:
                with self._lock:
                    if self._recording:
                        return  # a new recording won; keep the rest queued
                    if not self._pending:
                        return
                    text = self._pending.pop(0)
                self._sink(text, PASTE_DELAY_MS)

    @property
    def pending_count(self) -> int:
        with self._lock:
            return len(self._pending)
