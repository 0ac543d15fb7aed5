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

import os
import threading
from collections import OrderedDict
from typing import Dict, Optional

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
        self.evictions = 0
        # Counters carried over from evicted/cleared bridges so the pool's
        # totals stay monotonic (stats readers see lifetime hit rates, not
        # just whatever streams happen to be live right now).
        self._retired_hits = 0
        self._retired_resets = 0

    def bridge_for(self, stream: Optional[str]) -> SessionBridge:
        key = stream or DEFAULT_STREAM
        with self._lock:
            bridge = self._bridges.get(key)
            if bridge is None:
                bridge = SessionBridge(self.model)
                self._bridges[key] = bridge
                while len(self._bridges) > self.limit:
                    _evicted_key, evicted = self._bridges.popitem(last=False)
                    evicted.reset()  # free the device KV cache
                    self._retired_hits += evicted.session_hits
                    self._retired_resets += evicted.session_resets
                    self.evictions += 1
            else:
                self._bridges.move_to_end(key)
            return bridge

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
        return {
            "session_hits": hits,
            "session_resets": resets,
            "session_hit_rate": round(hits / max(1, hits + resets), 4),
            "session_streams": per_stream,
            "session_evictions": self.evictions,
        }

    def __len__(self) -> int:
        with self._lock:
            return len(self._bridges)
