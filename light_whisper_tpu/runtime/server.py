"""Line-delimited JSON engine server.

External contract (kept wire-compatible with the reference engine so the
Tauri/Rust shell can drive this engine unmodified — see
``/root/reference/src-tauri/resources/server_common.py:339-437`` and the Rust
client ``funasr_service.rs:1353-1440``):

- One JSON object per line on stdin; one JSON object per line on stdout.
- Supported ``action`` values: ``transcribe`` / ``status`` / ``stats`` /
  ``cleanup`` / ``exit``.
- Every response echoes the integer ``request_id`` of its command when one was
  provided; responses to unparseable lines carry no ``request_id`` (the client
  falls back to its legacy correlation path).
- The very first line printed is the initialization result
  (``{"success": bool, ...}``), emitted before the dispatch loop starts.
- ``success: false`` responses carry ``error`` and usually a machine-readable
  ``type`` (``models_not_downloaded`` / ``import_error`` / ``init_error`` /
  ``transcription_error``) that the UI routes on.

Unlike the reference's inheritance design, the engine logic is injected as a
``ServerHooks`` value object so that protocol behavior can be tested with fakes
and in-memory pipes (the pattern the reference applies on the Rust side,
``funasr_service.rs:1978-2072``).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import sys
import traceback
from typing import Any, Callable, Dict, IO, Optional


# The reference schedules a GC/cache cleanup every N transcriptions
# (server_common.py:202, CLEANUP_EVERY_N).
CLEANUP_EVERY_N = 20


@dataclasses.dataclass
class ServerHooks:
    """Engine callbacks driven by the dispatch loop.

    Every hook returns a JSON-serializable dict that is written back verbatim
    (plus the echoed ``request_id``).
    """

    initialize: Callable[[], Dict[str, Any]]
    transcribe: Callable[..., Dict[str, Any]]
    status: Callable[[], Dict[str, Any]]
    stats: Callable[[], Dict[str, Any]]
    cleanup: Callable[[], None] = lambda: None
    shutdown: Callable[[], None] = lambda: None


class EngineServer:
    """Dispatch loop speaking the Light-Whisper engine protocol."""

    def __init__(
        self,
        hooks: ServerHooks,
        *,
        stdin: Optional[IO[str]] = None,
        stdout: Optional[IO[str]] = None,
        logger: Optional[logging.Logger] = None,
    ) -> None:
        self._hooks = hooks
        self._stdin = stdin if stdin is not None else sys.stdin
        self._stdout = stdout if stdout is not None else sys.stdout
        self._log = logger or logging.getLogger(__name__)
        self._running = True

    # ------------------------------------------------------------------

    def stop(self) -> None:
        self._running = False

    def _emit(self, payload: Dict[str, Any], request_id: Optional[int]) -> None:
        if request_id is not None and isinstance(payload, dict):
            payload = dict(payload)
            payload["request_id"] = request_id
        self._stdout.write(json.dumps(payload, ensure_ascii=False) + "\n")
        self._stdout.flush()

    # ------------------------------------------------------------------

    def run(self) -> None:
        """Emit the init result, then serve commands until EOF or ``exit``."""
        init_result = self._guard(self._hooks.initialize)
        self._emit(init_result, request_id=None)

        while self._running:
            line = self._stdin.readline()
            if not line:
                break
            line = line.strip()
            if not line:
                continue

            try:
                command = json.loads(line)
            except json.JSONDecodeError:
                # No request_id can be recovered from a line that failed to
                # parse; the client treats this as a legacy-protocol response.
                self._emit({"success": False, "error": "无效的JSON命令"}, None)
                continue

            request_id: Optional[int] = None
            if isinstance(command, dict):
                rid = command.get("request_id")
                if isinstance(rid, int) and not isinstance(rid, bool):
                    request_id = rid

            action = command.get("action") if isinstance(command, dict) else None
            try:
                if action == "exit":
                    self._emit({"success": True, "message": "服务器退出"}, request_id)
                    self._hooks.shutdown()
                    break
                result = self._dispatch(action, command)
            except Exception as exc:  # pragma: no cover - defensive parity path
                result = {
                    "success": False,
                    "error": str(exc),
                    "traceback": traceback.format_exc(),
                }
            self._emit(result, request_id)

    # ------------------------------------------------------------------

    def _dispatch(self, action: Any, command: Dict[str, Any]) -> Dict[str, Any]:
        if action == "transcribe":
            return self._hooks.transcribe(
                audio_path=command.get("audio_path"),
                options=command.get("options", {}),
                hot_words=command.get("hot_words"),
                audio_base64=command.get("audio_base64"),
                audio_format=command.get("audio_format"),
                sample_rate=command.get("sample_rate"),
            )
        if action == "status":
            return self._hooks.status()
        if action == "stats":
            return {"success": True, "stats": self._hooks.stats()}
        if action == "cleanup":
            self._hooks.cleanup()
            return {"success": True, "message": "内存清理完成"}
        return {"success": False, "error": f"未知命令: {action}"}

    @staticmethod
    def _guard(fn: Callable[[], Dict[str, Any]]) -> Dict[str, Any]:
        try:
            return fn()
        except Exception as exc:
            return {
                "success": False,
                "error": str(exc),
                "traceback": traceback.format_exc(),
            }
