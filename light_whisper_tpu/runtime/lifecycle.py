"""Cancellation-safe engine lifecycle: start tickets, owner CAS, generations.

The reference shell makes engine start/stop/switch race-free with three
pieces (``funasr_service.rs:210-297``, ``app_state.rs:420-457``):

- a **start owner** slot claimed by compare-and-swap — only one starter can
  be in flight; a second concurrent start fails fast instead of spawning a
  duplicate child;
- a **generation counter** bumped by every stop/switch — a starter whose
  ticket generation is stale by promote time kills its freshly spawned child
  instead of promoting it (the race: a stop() issued during a slow model
  load must not resurrect the engine a moment later);
- the **configured engine name** inside the ticket — switching engines
  invalidates an in-flight start of the previous engine.

Promotion happens under a commit lock with a ticket-currency re-check, and a
start guard kills the un-promoted child on *any* exit path (exception,
supersede), so no code path leaks a zombie engine process.
"""

from __future__ import annotations

import itertools
import threading
from typing import Any, Callable, Dict, Optional

from light_whisper_tpu.runtime.client import EngineClient

_BLOCKED_OWNER = -1  # analogous to the reference's u64::MAX sentinel


class EngineStartRejected(RuntimeError):
    """A start lost the owner CAS (another start is already in flight)."""


class EngineStartSuperseded(RuntimeError):
    """The ticket went stale (stop/switch happened) before promotion."""


class EngineStartBlocked(RuntimeError):
    """Starts are administratively blocked (host is shutting down)."""


class EngineManager:
    """Owns at most one :class:`EngineClient`; start/stop/switch are safe to
    call from any thread in any interleaving."""

    def __init__(
        self,
        spawn: Callable[..., EngineClient] = EngineClient.spawn,
        engine: str = "qwen3-asr-0.6b",
    ) -> None:
        self._spawn = spawn
        self._engine = engine
        self._lock = threading.Lock()          # owner/generation/config state
        self._commit_lock = threading.Lock()   # promote/stop serialization
        self._starting_owner = 0               # 0 = free, -1 = blocked
        self._generation = 0
        self._owner_ids = itertools.count(1)
        self._client: Optional[EngineClient] = None

    # -- state inspection ------------------------------------------------

    @property
    def engine(self) -> str:
        with self._lock:
            return self._engine

    def client(self) -> Optional[EngineClient]:
        with self._commit_lock:
            return self._client

    def is_starting(self) -> bool:
        with self._lock:
            return self._starting_owner not in (0, _BLOCKED_OWNER)

    # -- CAS primitives (app_state.rs:425-457) -----------------------------

    def _try_begin_start(self, owner: int) -> bool:
        with self._lock:
            if self._starting_owner == 0:
                self._starting_owner = owner
                return True
            return False

    def _finish_start(self, owner: int) -> None:
        with self._lock:
            if self._starting_owner == owner:
                self._starting_owner = 0

    def _owns_start(self, owner: int) -> bool:
        with self._lock:
            return self._starting_owner == owner

    def block_starts(self) -> None:
        """Shutdown mode: every subsequent start is rejected."""
        with self._lock:
            self._starting_owner = _BLOCKED_OWNER

    def unblock_starts(self) -> None:
        with self._lock:
            if self._starting_owner == _BLOCKED_OWNER:
                self._starting_owner = 0

    def _ticket_is_current(self, ticket: Dict[str, Any]) -> bool:
        with self._lock:
            return (
                self._starting_owner == ticket["owner"]
                and self._generation == ticket["generation"]
                and self._engine == ticket["engine"]
            )

    # -- lifecycle operations ---------------------------------------------

    def start(self, engine: Optional[str] = None, **spawn_kwargs) -> EngineClient:
        """Spawn and promote a new engine; at most one start in flight.

        Raises :class:`EngineStartRejected` if another start holds the owner
        slot, :class:`EngineStartBlocked` in shutdown mode, and
        :class:`EngineStartSuperseded` if a stop/switch invalidated this
        start while the child was loading (the child is killed)."""
        owner = next(self._owner_ids)
        with self._lock:
            if self._starting_owner == _BLOCKED_OWNER:
                raise EngineStartBlocked("引擎启动已被禁止（正在退出）")
            if self._starting_owner != 0:
                raise EngineStartRejected("引擎正在启动中")
            self._starting_owner = owner
            # Config only changes once the owner slot is WON — a rejected
            # start must not alter which engine later starts use.
            if engine is not None:
                self._engine = engine
            ticket = {
                "owner": owner,
                "generation": self._generation,
                "engine": self._engine,
            }

        child: Optional[EngineClient] = None
        promoted = False
        try:
            child = self._spawn(engine=ticket["engine"], **spawn_kwargs)
            with self._commit_lock:
                if not self._ticket_is_current(ticket):
                    raise EngineStartSuperseded(
                        "启动已被更新的 stop/switch 取消"
                    )
                previous, self._client = self._client, child
                promoted = True
            if previous is not None:
                previous.shutdown()
            return child
        finally:
            if child is not None and not promoted:
                try:
                    child.shutdown()
                except Exception:
                    pass
            self._finish_start(ticket["owner"])

    def stop(self) -> None:
        """Stop the engine AND invalidate any in-flight start."""
        with self._lock:
            self._generation += 1
        with self._commit_lock:
            client, self._client = self._client, None
        if client is not None:
            client.shutdown()

    def restart(self, engine: Optional[str] = None, **spawn_kwargs) -> EngineClient:
        self.stop()
        return self.start(engine, **spawn_kwargs)

    def switch_engine(self, engine: str, **spawn_kwargs) -> EngineClient:
        """Reconfigure + restart; an in-flight start of the old engine is
        invalidated by the generation bump (and, once the new start wins the
        owner slot, by the engine-name check too).

        The configured engine is NOT mutated here — ``start`` writes it only
        after winning the owner CAS, so a switch that loses the CAS (another
        start already in flight) raises :class:`EngineStartRejected` without
        altering which engine later starts use (start()'s own invariant)."""
        with self._lock:
            self._generation += 1
        with self._commit_lock:
            client, self._client = self._client, None
        if client is not None:
            client.shutdown()
        return self.start(engine, **spawn_kwargs)

    def shutdown(self) -> None:
        """Block future starts, then stop whatever is running."""
        self.block_starts()
        self.stop()
