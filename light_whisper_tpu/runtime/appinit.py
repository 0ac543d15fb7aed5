"""App-startup wiring: background engine start, daily maintenance, exit kill.

Portable core of the reference's app setup (``lib.rs``): everything there
that is not Tauri plugin/tray/window plumbing is engine-side lifecycle
policy, rebuilt here:

- **Background engine startup** (``spawn_funasr_startup`` ``lib.rs:320-367``):
  the engine starts on a background thread at app launch so the first
  dictation doesn't pay model init; failures retry with a short backoff
  and never crash startup (the first recording will surface the error).
- **Daily profile maintenance** (``lib.rs:390-459``): run
  ``cleanup_profile`` once at startup if the last run is older than a day,
  then on a daily cadence; the last-run timestamp persists next to the
  profile so restarts don't re-trigger it.
- **Graceful engine kill on exit** (``stop_funasr_on_exit``
  ``lib.rs:475-517``): a registered shutdown hook blocks new starts and
  stops whatever is running, bounded so exit can't hang.

All cadences/clocks are injectable; tests drive hours in milliseconds.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from typing import Callable, Optional

from light_whisper_tpu.runtime.lifecycle import EngineManager
from light_whisper_tpu.text.profile import ProfileStore, cleanup_profile

log = logging.getLogger(__name__)

STARTUP_RETRIES = 3  # lib.rs retries the background start before giving up
STARTUP_RETRY_DELAY_S = 5.0
MAINTENANCE_INTERVAL_S = 24 * 3600.0  # lib.rs:390-459 daily cadence


class BackgroundEngineStarter:
    """Start the engine off the startup path; retry transient failures."""

    def __init__(
        self,
        manager: EngineManager,
        retries: int = STARTUP_RETRIES,
        retry_delay_s: float = STARTUP_RETRY_DELAY_S,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.manager = manager
        self.retries = retries
        self.retry_delay_s = retry_delay_s
        self._sleep = sleep
        self._thread: Optional[threading.Thread] = None
        self.last_error: Optional[BaseException] = None
        self.attempts = 0

    def start(self, **spawn_kwargs) -> threading.Thread:
        def run() -> None:
            for attempt in range(self.retries):
                self.attempts = attempt + 1
                try:
                    self.manager.start(**spawn_kwargs)
                    self.last_error = None
                    return
                except Exception as exc:  # never crash app startup
                    self.last_error = exc
                    log.warning(
                        "background engine start failed (attempt %d/%d): %s",
                        attempt + 1,
                        self.retries,
                        exc,
                    )
                    if attempt + 1 < self.retries:
                        self._sleep(self.retry_delay_s)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self._thread

    def wait(self, timeout: Optional[float] = None) -> bool:
        if self._thread is None:
            return True
        self._thread.join(timeout)
        return not self._thread.is_alive()


class DailyMaintenance:
    """Run profile cleanup on a daily cadence with a persisted last-run.

    ``run_if_due()`` is cheap and safe to call any time (startup, timer
    fire); it no-ops unless ``interval`` has elapsed since the stamped
    last run. The stamp lives next to the profile file so a restart
    within the same day doesn't re-run maintenance (``lib.rs:390-459``)."""

    def __init__(
        self,
        store: ProfileStore,
        interval_s: float = MAINTENANCE_INTERVAL_S,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.store = store
        self.interval_s = interval_s
        self.clock = clock
        self.stamp_path = store.path + ".maintenance"
        self.runs = 0
        self._timer: Optional[threading.Timer] = None
        self._lock = threading.Lock()
        self._run_lock = threading.Lock()
        self._period = interval_s
        self._stopped = True

    def _last_run(self) -> float:
        try:
            with open(self.stamp_path, "r", encoding="utf-8") as f:
                return float(json.load(f)["last_run"])
        except (OSError, ValueError, KeyError, TypeError, json.JSONDecodeError):
            # TypeError: stamp holds non-dict JSON (null/list) — treat any
            # unreadable stamp as never-run so it gets repaired on the next run
            return 0.0

    def _stamp(self, now: float) -> None:
        tmp = self.stamp_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"last_run": now}, f)
        os.replace(tmp, self.stamp_path)

    def run_if_due(self) -> Optional[dict]:
        # The due-check/cleanup/stamp sequence is serialized: a host call
        # racing the timer fire must not double-run (save_now shares one
        # .tmp path — concurrent writers could install corrupt JSON).
        with self._run_lock:
            now = self.clock()
            if now - self._last_run() < self.interval_s:
                return None
            profile = self.store.load()
            removed = cleanup_profile(profile)
            self.store.save_now(profile)
            self._stamp(now)
            self.runs += 1
        log.info("profile maintenance: %s", removed)
        return removed

    def start_schedule(self, check_every_s: Optional[float] = None) -> None:
        """Startup entry: run if due now, then re-check periodically.

        The initial run is guarded like the timer fires — maintenance
        failures never crash startup, and the periodic timer is armed
        regardless (``lib.rs:390-459`` logs and proceeds)."""
        self._period = check_every_s if check_every_s is not None else self.interval_s
        self._stopped = False
        try:
            self.run_if_due()
        except Exception:
            log.warning("startup profile maintenance failed", exc_info=True)
        self._arm()

    def _arm(self) -> None:
        with self._lock:
            if self._stopped:
                return
            self._timer = threading.Timer(self._period, self._fire)
            self._timer.daemon = True
            self._timer.start()

    def _fire(self) -> None:
        try:
            self.run_if_due()
        except Exception:
            log.warning("scheduled profile maintenance failed", exc_info=True)
        self._arm()

    def stop_schedule(self) -> None:
        with self._lock:
            self._stopped = True
            timer, self._timer = self._timer, None
        if timer is not None:
            timer.cancel()


def install_exit_kill(manager: EngineManager, register=None) -> Callable[[], None]:
    """Register a shutdown hook that blocks new starts and stops the engine
    (``stop_funasr_on_exit`` ``lib.rs:475-517``). Returns the hook so hosts
    with their own lifecycle can call it directly; idempotent."""
    import atexit

    done = threading.Event()

    def hook() -> None:
        if done.is_set():
            return
        done.set()
        try:
            manager.shutdown()
        except Exception:
            log.warning("engine shutdown on exit failed", exc_info=True)

    (register or atexit.register)(hook)
    return hook
