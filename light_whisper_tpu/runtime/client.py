"""Engine process client: spawn, correlate, recover, detect crashes.

Python mirror of the Rust shell's IPC client (``funasr_service.rs``) so the
engine can be embedded from any host process, not just the Tauri shell:

- spawns the engine child with the reference environment contract
  (``LIGHT_WHISPER_DATA_DIR`` / ``LIGHT_WHISPER_ASR_ENGINE`` /
  ``HF_HUB_CACHE``), stderr routed to a log file (``funasr_service.rs:952-972``);
- waits for the init line within 120 s, skipping noise lines
  (``:1020-1036``);
- one in-flight command: a lock is held across write+read, monotonically
  increasing ``request_id``s, late/mismatched responses discarded
  (``:1353-1440``);
- noise-tolerant framing: non-UTF-8 tolerated, non-JSON lines skipped, JSON
  recovered from mixed lines by brace-slicing (``read_json_response_matching``
  ``:393-475``);
- inline PCM transport with sub-0.5 s zero padding (``:1146-1159``) and
  crash detection on failed IPC (``:1353-1388``);
- graceful shutdown: ``exit`` then kill after a 2 s grace (``:1578-1634``).
"""

from __future__ import annotations

import base64
import json
import os
import queue
import subprocess
import sys
import threading
import time
from typing import Any, Dict, IO, List, Optional

import numpy as np

INIT_TIMEOUT_SECONDS = 120.0
RESPONSE_TIMEOUT_SECONDS = 60.0
EXIT_GRACE_SECONDS = 2.0
MIN_INLINE_SECONDS = 0.5
MAX_AUDIO_BYTES = 64 * 1024 * 1024  # raw-audio IPC cap (commands/funasr.rs:17-25)


def _response_indicates_inline_unsupported(response: Dict[str, Any]) -> bool:
    """Did the engine answer an inline-PCM transcribe as if it got a path?

    Mirrors ``response_indicates_inline_unsupported``
    (``funasr_service.rs:1236-1251``) with one deliberate divergence: the
    reference treats ANY response without ``input_mode`` as a legacy runtime,
    but this engine's own generic error responses (init failures, worker
    tracebacks from ``server._run_transcribe``) also omit the field — one
    transient failure must not permanently downgrade the session to temp-WAV
    transport. A missing ``input_mode`` therefore only pins path transport
    when the engine actually *succeeded* without echoing it (a legacy runtime
    that silently treated the payload as a path) or when the error text shows
    the inline payload was mishandled as a filename. Generic errors leave the
    capability unprobed.
    """
    input_mode = response.get("input_mode")
    if input_mode == "memory":
        return False
    if input_mode == "path":
        return True
    error = response.get("error") or ""
    # Only the specific mishandled-as-filename signatures — a bare "NoneType"
    # match would also hit unrelated Python AttributeErrors from transient
    # engine failures and permanently demote the session (the TypeError a
    # legacy runtime raises for a missing path contains "os.PathLike").
    if any(
        marker in error
        for marker in (
            "音频文件不存在",
            "path should be string",
            "os.PathLike",
        )
    ):
        return True
    return input_mode is None and bool(response.get("success"))


class EngineCrashed(RuntimeError):
    pass


class EngineTimeout(RuntimeError):
    pass


def _extract_json(line: str) -> Optional[Dict[str, Any]]:
    """Parse a protocol line, recovering JSON embedded in noisy output."""
    trimmed = line.strip()
    if not trimmed:
        return None
    try:
        value = json.loads(trimmed)
        return value if isinstance(value, dict) else None
    except json.JSONDecodeError:
        pass
    start = trimmed.find("{")
    end = trimmed.rfind("}")
    if 0 <= start < end:
        try:
            value = json.loads(trimmed[start : end + 1])
            return value if isinstance(value, dict) else None
        except json.JSONDecodeError:
            return None
    return None


class EngineClient:
    """Drives one engine process (or any stdin/stdout pair) over the protocol."""

    def __init__(
        self,
        stdin: IO[str],
        stdout: IO[str],
        process: Optional[subprocess.Popen] = None,
    ) -> None:
        self._stdin = stdin
        self._stdout = stdout
        self._process = process
        self._lock = threading.Lock()
        # Timeouts must bound a HUNG engine, not just a slow one: a blocking
        # readline() on the caller thread can never honor a deadline, so a
        # daemon reader drains stdout into a queue and _read_matching polls
        # the queue with the remaining budget (None = EOF sentinel).
        self._lines: "queue.Queue[Optional[str]]" = queue.Queue()
        self._stdout_eof = False
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        self._next_request_id = 1
        self.init_result: Optional[Dict[str, Any]] = None
        # None = transport unprobed; True = inline PCM accepted; False = the
        # runtime wants file paths (funasr_service.rs inline_audio_transport).
        self._inline_transport: Optional[bool] = None
        # Consecutive inline generic failures whose path retry succeeded —
        # pin the path transport only at ≥2 (one is transient-blip noise).
        self._inline_generic_failures = 0

    # ------------------------------------------------------------------

    @classmethod
    def spawn(
        cls,
        engine: str = "qwen3-asr-0.6b",
        data_dir: Optional[str] = None,
        hf_cache: Optional[str] = None,
        command: Optional[List[str]] = None,
    ) -> "EngineClient":
        env = dict(os.environ)
        env["LIGHT_WHISPER_ASR_ENGINE"] = engine
        if data_dir:
            env["LIGHT_WHISPER_DATA_DIR"] = data_dir
        if hf_cache:
            env["HF_HUB_CACHE"] = hf_cache
        env.setdefault("PYTHONUTF8", "1")

        argv = command or [
            sys.executable,
            "-m",
            "light_whisper_tpu.runtime.engine_cli",
            "serve",
            "--engine",
            engine,
        ]
        stderr_target = subprocess.DEVNULL
        if data_dir:
            os.makedirs(data_dir, exist_ok=True)
            stderr_target = open(os.path.join(data_dir, "funasr_stderr.log"), "ab")
        try:
            process = subprocess.Popen(
                argv,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=stderr_target,
                env=env,
                text=True,
                encoding="utf-8",
                errors="replace",
                bufsize=1,
            )
        finally:
            # the child holds its own descriptor; keeping ours open leaks an
            # fd per respawn in supervisor loops
            if stderr_target is not subprocess.DEVNULL:
                stderr_target.close()
        client = cls(process.stdin, process.stdout, process)
        try:
            client.wait_for_init()
        except BaseException:
            # don't leave a zombie engine holding the device on init failure
            process.kill()
            process.wait(timeout=5)
            raise
        return client

    # ------------------------------------------------------------------

    def wait_for_init(self, timeout: float = INIT_TIMEOUT_SECONDS) -> Dict[str, Any]:
        result = self._read_matching(
            lambda value: "success" in value and "request_id" not in value,
            timeout,
            context="engine init",
        )
        self.init_result = result
        return result

    def _alive(self) -> bool:
        return self._process is None or self._process.poll() is None

    def _read_loop(self) -> None:
        try:
            for line in iter(self._stdout.readline, ""):
                self._lines.put(line)
        except (ValueError, OSError):
            pass  # stream closed under us
        self._lines.put(None)  # EOF sentinel

    def _read_matching(self, accept, timeout: float, context: str) -> Dict[str, Any]:
        deadline = time.monotonic() + timeout
        while True:
            if self._stdout_eof:
                if not self._alive():
                    raise EngineCrashed(f"{context}: engine process exited")
                raise EngineCrashed(f"{context}: stdout closed")
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise EngineTimeout(f"{context}: timed out")
            try:
                line = self._lines.get(timeout=remaining)
            except queue.Empty:
                raise EngineTimeout(f"{context}: timed out") from None
            if line is None:
                self._stdout_eof = True
                continue  # report via the EOF branch above
            value = _extract_json(line)
            if value is None:
                continue  # noise line
            if accept(value):
                return value
            # stale/mismatched response — discard and keep reading

    def request(
        self, command: Dict[str, Any], timeout: float = RESPONSE_TIMEOUT_SECONDS
    ) -> Dict[str, Any]:
        """Send one command and await its correlated response."""
        with self._lock:
            request_id = self._next_request_id
            self._next_request_id += 1
            payload = dict(command)
            payload["request_id"] = request_id
            try:
                self._stdin.write(json.dumps(payload, ensure_ascii=False) + "\n")
                self._stdin.flush()
            except (BrokenPipeError, OSError) as exc:
                raise EngineCrashed(f"engine stdin closed: {exc}") from exc

            def accept(value: Dict[str, Any]) -> bool:
                rid = value.get("request_id")
                if rid is None:
                    return True  # legacy engine without correlation
                return rid == request_id

            try:
                return self._read_matching(accept, timeout, context=payload.get("action", "request"))
            except EngineCrashed:
                raise
            except EngineTimeout:
                if not self._alive():
                    raise EngineCrashed("engine crashed while awaiting response")
                raise

    # ------------------------------------------------------------------

    def transcribe_pcm16(
        self,
        samples: np.ndarray,
        sample_rate: int,
        hot_words: Optional[List[str]] = None,
        timeout: float = RESPONSE_TIMEOUT_SECONDS,
    ) -> Dict[str, Any]:
        """Transcribe int16 samples, negotiating the audio transport.

        Inline PCM is the fast path, but not every engine runtime takes it
        (``funasr_service.rs:1162-1199``): the first inline response decides —
        ``input_mode == "memory"`` pins inline, an inline-unsupported shape
        pins the temp-WAV path transport for the rest of the session. Non-16k
        audio always rides the WAV path (the memory protocol carries raw
        samples whose rate the backends assume). Inputs below 0.5 s are
        zero-padded; raw audio above the 64 MB IPC cap (~33 min @16 kHz mono)
        is rejected before any base64/transport work.
        """
        samples = np.asarray(samples, dtype="<i2").reshape(-1)
        if samples.nbytes > MAX_AUDIO_BYTES:
            raise ValueError(
                f"audio too large: {samples.nbytes} bytes > {MAX_AUDIO_BYTES} cap"
            )
        min_samples = int(MIN_INLINE_SECONDS * sample_rate)
        if 0 < len(samples) < min_samples:
            samples = np.concatenate(
                [samples, np.zeros(min_samples - len(samples), dtype="<i2")]
            )

        if sample_rate != 16_000 or self._inline_transport is False:
            return self._transcribe_via_path(samples, sample_rate, hot_words, timeout)

        command: Dict[str, Any] = {
            "action": "transcribe",
            "audio_base64": base64.b64encode(samples.tobytes()).decode(),
            "audio_format": "pcm_s16le",
            "sample_rate": sample_rate,
        }
        if hot_words:
            command["hot_words"] = hot_words
        response = self.request(command, timeout)
        if response.get("input_mode") == "memory":
            self._inline_transport = True
            self._inline_generic_failures = 0
            return response
        if _response_indicates_inline_unsupported(response):
            self._inline_transport = False
            return self._transcribe_via_path(samples, sample_rate, hot_words, timeout)
        if response.get("success"):
            # Probed: the engine handled inline audio (echoed mode or not).
            self._inline_transport = True
            self._inline_generic_failures = 0
            return response
        # Generic error without input_mode: could be a transient engine
        # failure (ours) or a legacy runtime whose inline-rejection text we
        # don't recognize (the reference pins path for ANY missing
        # input_mode, funasr_service.rs:1236-1251). Retry this one request
        # via the path transport; pin the path transport only after TWO
        # consecutive inline failures that each succeeded via path — one
        # occurrence is indistinguishable from a transient engine blip that
        # recovered by retry time, and pinning on it would demote the whole
        # session to temp-WAV I/O forever.
        retried = self._transcribe_via_path(samples, sample_rate, hot_words, timeout)
        if retried.get("success"):
            self._inline_generic_failures += 1
            if self._inline_generic_failures >= 2:
                self._inline_transport = False
        return retried

    def _transcribe_via_path(
        self,
        samples: np.ndarray,
        sample_rate: int,
        hot_words: Optional[List[str]],
        timeout: float,
    ) -> Dict[str, Any]:
        """Temp-WAV transport: bit-exact 16-bit WAV, unlinked after the call."""
        import tempfile

        from light_whisper_tpu.audio.pcm import encode_wav_mono_pcm16

        wav_bytes = encode_wav_mono_pcm16(samples, sample_rate)
        fd, path = tempfile.mkstemp(
            prefix=f"light_whisper_audio_{os.getpid()}_", suffix=".wav"
        )
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(wav_bytes)
            command: Dict[str, Any] = {"action": "transcribe", "audio_path": path}
            if hot_words:
                command["hot_words"] = hot_words
            return self.request(command, timeout)
        finally:
            try:
                os.unlink(path)
            except OSError:
                pass

    def status(self) -> Dict[str, Any]:
        return self.request({"action": "status"})

    def stats(self) -> Dict[str, Any]:
        return self.request({"action": "stats"})

    def cleanup(self) -> Dict[str, Any]:
        return self.request({"action": "cleanup"})

    def shutdown(self) -> None:
        """Graceful exit, then kill after the grace period."""
        try:
            self.request({"action": "exit"}, timeout=EXIT_GRACE_SECONDS)
        except (EngineCrashed, EngineTimeout, OSError):
            pass
        if self._process is not None:
            try:
                self._process.wait(timeout=EXIT_GRACE_SECONDS)
            except subprocess.TimeoutExpired:
                self._process.kill()
