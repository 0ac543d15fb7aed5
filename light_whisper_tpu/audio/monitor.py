"""Microphone level monitor: peak meter for the settings page.

Portable core of ``monitor.rs`` (``monitor.rs:16-63``): a capture source
feeds frames; every 70 ms the monitor emits the period's peak mapped to
the 0-1000 integer meter the UI renders. The OS device stream itself is
the shell's; any :class:`~light_whisper_tpu.audio.capture.CaptureSource`
drives this identically.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np

from light_whisper_tpu.audio.capture import CaptureSource, mix_to_mono

MONITOR_INTERVAL_MS = 70
METER_MAX = 1000


def mono_peak(frames: np.ndarray, channels: int = 1) -> float:
    """Peak |amplitude| of a frame block, normalized to 0..1
    (``mono_peak_*``, ``monitor.rs:16-63``)."""
    mono = mix_to_mono(frames, channels)
    if len(mono) == 0:
        return 0.0
    return float(np.abs(mono.astype(np.float32)).max() / 32768.0)


class LevelMonitor:
    """Runs a capture source and emits ``int(peak * 1000)`` every 70 ms.

    The peak resets each emit — the meter shows the loudest moment of the
    last period, the reference's behavior for the settings-page level bar.
    """

    def __init__(
        self,
        source: CaptureSource,
        callback: Callable[[int], None],
        channels: int = 1,
        interval_ms: int = MONITOR_INTERVAL_MS,
    ) -> None:
        self.source = source
        self.callback = callback
        self.channels = channels
        self.interval_ms = interval_ms
        self._peak = 0.0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _on_frames(self, frames: np.ndarray) -> None:
        peak = mono_peak(frames, self.channels)
        with self._lock:
            if peak > self._peak:
                self._peak = peak

    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("monitor already started")
        self._stop.clear()
        self.source.start(self._on_frames)

        def run() -> None:
            while not self._stop.wait(self.interval_ms / 1000):
                with self._lock:
                    peak, self._peak = self._peak, 0.0
                self.callback(min(METER_MAX, int(round(peak * METER_MAX))))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self.source.stop()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
