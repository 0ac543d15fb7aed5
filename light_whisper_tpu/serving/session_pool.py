"""Per-stream streaming-session pool with bounded LRU eviction.

The reference engine holds ONE persistent C++ KV session because the shell
serves one recording at a time (``funasr_service.rs`` holds the process
mutex across write+read). This engine pipelines transcribes, so two
interleaved dictation streams sharing one :class:`SessionBridge` would reset
each other's KV prefix every tick — each request byte-differs from the
*other* stream's previous audio. Keying sessions by the request's
``options.stream`` keeps every stream on its own KV-reuse fast path.

Memory: each live session owns one device KV cache (~117 MB at 1.7B /
capacity 1024), so the pool is LRU-bounded (``LWT_MAX_SESSIONS``, default
4). Evicted sessions just reset — identical results to a stateless
transcribe, which is the contract ``SessionBridge`` already guarantees.

Requests that don't name a stream share the ``DEFAULT_STREAM`` session —
the single-user wire client that never sets ``options.stream`` keeps the
same KV-reuse behavior it had when the server held one session.
"""

from __future__ import annotations

import contextlib
import os
import threading
from collections import Counter, OrderedDict
from typing import Dict, Iterator, Optional, Sequence

from light_whisper_tpu.serving.session_bridge import SessionBridge

DEFAULT_STREAM = "__default__"
DEFAULT_MAX_SESSIONS = 4


def max_sessions() -> int:
    try:
        return max(1, int(os.environ.get("LWT_MAX_SESSIONS", DEFAULT_MAX_SESSIONS)))
    except ValueError:
        return DEFAULT_MAX_SESSIONS


class SessionPool:
    """LRU pool of per-stream :class:`SessionBridge` instances."""

    def __init__(self, model, limit: Optional[int] = None) -> None:
        self.model = model
        self.limit = limit if limit is not None else max_sessions()
        self._lock = threading.Lock()
        self._bridges: "OrderedDict[str, SessionBridge]" = OrderedDict()
        # Keys currently checked out for transcription: eviction must skip
        # them — reset() frees the device KV cache, and resetting a bridge
        # another thread is mid-decode with is a donated-buffer
        # use-after-free ("Array has been deleted").
        self._pinned: Counter = Counter()
        self.evictions = 0
        # Counters carried over from evicted/cleared bridges so the pool's
        # totals stay monotonic (stats readers see lifetime hit rates, not
        # just whatever streams happen to be live right now).
        self._retired_hits = 0
        self._retired_resets = 0

    def bridge_for(self, stream: Optional[str]) -> SessionBridge:
        key = stream or DEFAULT_STREAM
        with self._lock:
            return self._bridge_for_locked(key)

    def _bridge_for_locked(self, key: str) -> SessionBridge:
        bridge = self._bridges.get(key)
        if bridge is None:
            bridge = SessionBridge(self.model)
            self._bridges[key] = bridge
            # Evict oldest UNPINNED bridges; pinned ones are mid-transcribe
            # on another thread. The pool may transiently exceed the limit
            # when everything is pinned — correctness beats the bound.
            evictable = [
                k for k in self._bridges if k != key and not self._pinned[k]
            ]
            while len(self._bridges) > self.limit and evictable:
                evicted_key = evictable.pop(0)
                evicted = self._bridges.pop(evicted_key)
                evicted.reset()  # free the device KV cache
                self._retired_hits += evicted.session_hits
                self._retired_resets += evicted.session_resets
                self.evictions += 1
        else:
            self._bridges.move_to_end(key)
        return bridge

    @contextlib.contextmanager
    def checkout(
        self, streams: Sequence[Optional[str]]
    ) -> Iterator[list]:
        """Pin + fetch the bridges for ``streams`` for the duration of a
        transcription: eviction triggered by other threads' fresh streams
        skips pinned bridges."""
        keys = [s or DEFAULT_STREAM for s in streams]
        with self._lock:
            for key in keys:
                self._pinned[key] += 1
            bridges = [self._bridge_for_locked(key) for key in keys]
        try:
            yield bridges
        finally:
            with self._lock:
                for key in keys:
                    self._pinned[key] -= 1
                    if self._pinned[key] <= 0:
                        del self._pinned[key]

    def reset_all(self) -> None:
        with self._lock:
            for bridge in self._bridges.values():
                bridge.reset()
                self._retired_hits += bridge.session_hits
                self._retired_resets += bridge.session_resets
            self._bridges.clear()

    def stats(self) -> Dict[str, object]:
        with self._lock:
            per_stream = {
                key: {
                    "hits": bridge.session_hits,
                    "resets": bridge.session_resets,
                }
                for key, bridge in self._bridges.items()
            }
            hits = self._retired_hits + sum(s["hits"] for s in per_stream.values())
            resets = self._retired_resets + sum(s["resets"] for s in per_stream.values())
            parked = sum(b.retained_bytes for b in self._bridges.values())
        return {
            "session_hits": hits,
            "session_resets": resets,
            "session_hit_rate": round(hits / max(1, hits + resets), 4),
            "session_streams": per_stream,
            "session_evictions": self.evictions,
            # Host bytes parked for prefix memcmps — bounded per stream by
            # LWT_SESSION_PARK_MAX_BYTES and overall by it × the pool limit.
            "session_parked_audio_bytes": parked,
        }

    def __len__(self) -> int:
        with self._lock:
            return len(self._bridges)
