"""Qwen3-ASR engine server: the TPU engine behind the JSON line protocol.

Response-shape parity with the reference server
(``qwen3_asr_server.py:269-402``): duration floor, VAD-gated empty results,
outer-silence trimming that preserves inner pauses, per-request ``vad_ms`` /
``inference_ms``, cumulative stats, and typed init errors
(``models_not_downloaded`` / ``import_error`` / ``init_error``) the UI
routes on. The C++ GGUF session is replaced by ``Qwen3ASRModel`` (JAX) and
the ONNX VAD by ``FireRedVadTPU``; both warm up at init like the reference
(1 s of noise, ``qwen3_asr_server.py:135-150``).
"""

from __future__ import annotations

import itertools
import logging
import os
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from light_whisper_tpu import __version__
from light_whisper_tpu.audio.pcm import (
    decode_inline_audio,
    read_audio_file_mono_f32,
    resample_linear,
)
from light_whisper_tpu.download.cache import QWEN3_ASR_MODELS, find_snapshot_file
from light_whisper_tpu.runtime.server import CLEANUP_EVERY_N, EngineServer, ServerHooks

SAMPLE_RATE = 16_000
MIN_DURATION_SECONDS = 0.5
# Above this, transcription goes through the VAD-segmented long-form path
# (windows batched on device) instead of a single giant context. Can be
# forced either way per request via options={"long_form": bool}.
LONG_FORM_THRESHOLD_SECONDS = 120.0
# When a request's raw audio byte-extends the previous one (the shell's
# interim loop), leading-trim wobble within this many samples (150 ms) is
# pinned to the previous trim so KV session reuse survives VAD jitter.
TRIM_PIN_TOLERANCE_SAMPLES = 2400
# Trim pinning only matters for the interim loop's growing window (≤12 s plus
# a little pre/post padding). Retaining arbitrarily large request audio for
# the prefix compare would hold up to ~128 MB (33-min max request) for the
# process lifetime — cap what the pin remembers instead; longer audio simply
# re-trims fresh, which is the stateless behavior.
TRIM_PIN_MAX_SAMPLES = 30 * SAMPLE_RATE
# Hard byte budget across ALL trim pins (the per-entry sample cap bounds one
# entry; this bounds the dict — entry count scales with LWT_MAX_SESSIONS, so
# a count-only cap is a byte bound that silently grows with configuration).
DEFAULT_TRIM_PIN_MAX_BYTES = 16 << 20


def _trim_pin_budget_bytes() -> int:
    try:
        return max(0, int(os.environ.get("LWT_TRIM_PIN_MAX_BYTES", DEFAULT_TRIM_PIN_MAX_BYTES)))
    except ValueError:
        return DEFAULT_TRIM_PIN_MAX_BYTES


def _tick_degrades() -> int:
    """Batched ticks that raised and fell back per-stream (observability:
    a persistent batched-program failure pays a failed attempt per tick)."""
    try:
        from light_whisper_tpu.serving import incremental_batch

        return incremental_batch.degrade_count
    except Exception:
        return 0


def _tick_degrade_error() -> Optional[str]:
    """repr() of the most recent batched-tick failure, for stats consumers
    whose log files may already be gone (test harnesses, crash triage)."""
    try:
        from light_whisper_tpu.serving import incremental_batch

        return incremental_batch.last_degrade_error
    except Exception:
        return None


def _default_model_factory(model_path: str):
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    # LIGHT_WHISPER_PRECISE=1: dense f32 weights + f32 compute/KV — the
    # fidelity mode for bit-match comparisons against the reference's f32
    # CPU path (slower; not for production serving).
    precise = os.environ.get("LIGHT_WHISPER_PRECISE", "") not in ("", "0")
    return Qwen3ASRModel(model_path, precise=precise)


def _default_vad_factory():
    from light_whisper_tpu.models.vad.api import FireRedVadTPU

    return FireRedVadTPU()


def _device_info() -> Dict[str, Any]:
    try:
        import jax

        device = jax.devices()[0]
        return {"device": device.platform, "device_kind": device.device_kind}
    except Exception:
        return {"device": "cpu"}


def _detect_backend() -> str:
    """Actual accelerator backend (the reference reports cuda/vulkan/cpu)."""
    try:
        import jax

        platform = jax.devices()[0].platform
        return "tpu" if platform in ("tpu", "axon") else platform
    except Exception:
        return "cpu"


class Qwen3EngineServer:
    """Engine logic; plug into :class:`EngineServer` via :meth:`hooks`."""

    def __init__(
        self,
        engine: Optional[str] = None,
        model_factory: Callable[[str], Any] = _default_model_factory,
        vad_factory: Callable[[], Any] = _default_vad_factory,
        model_path: Optional[str] = None,
        apply_hot_words: bool = True,
        logger: Optional[logging.Logger] = None,
    ) -> None:
        import os

        engine = engine or os.environ.get("LIGHT_WHISPER_ASR_ENGINE", "qwen3-asr-0.6b")
        if engine not in QWEN3_ASR_MODELS:
            raise ValueError(f"不支持的 Qwen3-ASR 引擎: {engine}")
        self.engine = engine
        self.model_config = QWEN3_ASR_MODELS[engine]
        self.backend = "tpu"
        self.log = logger or logging.getLogger(__name__)
        self._model_factory = model_factory
        self._vad_factory = vad_factory
        self._explicit_model_path = model_path
        self._apply_hot_words = apply_hot_words

        self.model = None
        self.vad = None
        self._session_pool = None  # per-stream KV sessions (see _transcribe_model)
        self._scheduler = None  # device-serialization + batch coalescing
        self._bg_ladder_thread = None  # LWT_WARMUP_LADDER=bg walker
        self._bg_ladder_stop = None
        self._active_requests = 0  # live transcribes; bg ladder yields to them
        self._device_idle = threading.Event()
        self._device_idle.set()
        self._init_timings = {}  # per-phase warmup walls (cold-start attribution)
        self._stats_lock = threading.Lock()
        self._init_lock = threading.Lock()  # pipelined requests may race init
        self._anon_stream = itertools.count()
        self.initialized = False
        self.transcription_count = 0
        self.total_audio_duration = 0.0
        self._total_inference_ms = 0.0
        self._total_vad_ms = 0.0
        self._vad_calls = 0
        self._vad_rejected = 0
        self._batched_requests = 0
        self._batch_dispatches = 0
        self._batched_tick_dispatches = 0  # coalesced interim ticks, KV kept
        # Per-session-key trim pins: (raw_audio, start, end) of the last
        # request on that stream (bounded alongside the session pool).
        self._prev_trims: Dict[str, Any] = {}
        # Per-session-key incremental VAD (prefix-reuse across interim
        # ticks); bounded with the same LRU policy as the trim pins.
        self._vad_sessions: Dict[str, Any] = {}
        self._vad_prefix_reuse = 0
        self._last_load_error: Optional[str] = None
        self._hotword_corrector = None

    # ------------------------------------------------------------------

    def hooks(self) -> ServerHooks:
        return ServerHooks(
            initialize=self.initialize,
            transcribe=self.transcribe,
            status=self.check_status,
            stats=self.performance_stats,
            cleanup=self.cleanup,
            shutdown=self.shutdown,
        )

    def serve_forever(self) -> None:
        EngineServer(self.hooks(), logger=self.log).run()

    # ------------------------------------------------------------------

    def _resolve_model_path(self) -> Optional[str]:
        import os

        if self._explicit_model_path:
            return self._explicit_model_path
        # Explicit override for self-hosted / converted artifacts and tests.
        override = os.environ.get("LIGHT_WHISPER_MODEL_PATH")
        if override:
            return override if os.path.isfile(override) else None
        return find_snapshot_file(self.model_config["repo_id"], self.model_config["filename"])

    def initialize(self) -> Dict[str, Any]:
        with self._init_lock:
            return self._initialize_locked()

    def _initialize_locked(self) -> Dict[str, Any]:
        if self.initialized:
            return {"success": True, "message": "模型已初始化", "engine": self.engine}

        model_path = self._resolve_model_path()
        if not model_path:
            return {
                "success": False,
                "error": f"Qwen3-ASR Q8 模型未下载: {self.model_config['filename']}",
                "type": "models_not_downloaded",
                "engine": self.engine,
            }

        started = time.perf_counter()
        try:
            self.log.info("loading Qwen3-ASR: %s", model_path)
            t_load = time.perf_counter()
            self.model = self._model_factory(model_path)
            self._init_timings["model_load_s"] = round(
                time.perf_counter() - t_load, 3
            )
            # GGUF load attribution (parse / host dequant-prep / HBM
            # upload) from the loader, when the factory exposes it.
            for tag, value in getattr(self.model, "load_timings", {}).items():
                self._init_timings[f"model_load_{tag}"] = value
            self.vad = self._vad_factory()
            self._warmup()
            self.backend = _detect_backend()
            self.initialized = True
            self._last_load_error = None
            elapsed = time.perf_counter() - started
            return {
                "success": True,
                "message": f"Qwen3-ASR 初始化成功，耗时: {elapsed:.2f}秒",
                "model_loaded": True,
                "engine": self.engine,
                "backend": self.backend,
                **_device_info(),
            }
        except ImportError as exc:
            self._teardown(exc)
            return {
                "success": False,
                "error": f"Qwen3-ASR 依赖加载失败: {exc}",
                "type": "import_error",
                "engine": self.engine,
            }
        except Exception as exc:
            self._teardown(exc)
            return {
                "success": False,
                "error": f"Qwen3-ASR 初始化失败: {exc}",
                "type": "init_error",
                "engine": self.engine,
            }

    def _teardown(self, exc: Exception) -> None:
        self.model = None
        self.vad = None
        self._last_load_error = str(exc)
        self.log.exception("Qwen3-ASR init failed: %s", exc)

    def _warmup(self) -> None:
        try:
            started = time.perf_counter()
            # The warmup phases are independent program sets: VAD (host
            # cascade + one small device program), the offline transcribe
            # path (encoder/prefill/decode + the weight commit), and the
            # interim bucket ladder. Compile/load RPCs to the backend
            # overlap across Python threads (measured 3× on the tunneled
            # v5e relay) while device execution serializes — so run them
            # concurrently instead of serially; the shell's 120 s budget is
            # tight (funasr_service.rs:273).
            from concurrent.futures import ThreadPoolExecutor

            def _timed(tag, fn):
                def run():
                    t0 = time.perf_counter()
                    fn()
                    self._init_timings[tag] = round(time.perf_counter() - t0, 3)

                return run

            with ThreadPoolExecutor(2) as pool:
                futures = []
                if self.vad is not None and hasattr(self.vad, "warmup"):
                    futures.append(pool.submit(_timed("vad_warmup_s", self.vad.warmup)))
                if hasattr(self.model, "warmup"):
                    futures.append(
                        pool.submit(_timed("model_warmup_s", self.model.warmup))
                    )
                t_ladder = time.perf_counter()
                self._warmup_ladder()  # sync phase; bg walker starts after
                self._init_timings["ladder_sync_s"] = round(
                    time.perf_counter() - t_ladder, 3
                )
                for f in futures:
                    f.result()
            self._init_timings["warmup_total_s"] = round(
                time.perf_counter() - started, 3
            )
            self.log.info("warmup done in %.3fs", time.perf_counter() - started)
        except Exception as exc:
            self.log.warning("warmup failed (first request may be slow): %s", exc)

    def _warmup_ladder(self) -> None:
        """Precompile the interim shape-bucket ladder (``LWT_WARMUP_LADDER``).

        Opt-in because it trades init time for zero mid-dictation compile
        stalls: a real recording's growing window walks one 0.5 s audio
        bucket per ~0.5 s of speech, and a cold bucket costs a device
        recompile inside an interim tick (a ~25 s stall through the remote
        compiler, VERDICT r2 weak #2). Value: ``1`` → default 90 s budget,
        a number → that budget in seconds, ``bg`` or ``bg:<seconds>`` →
        warm the first 2 s of buckets synchronously (every dictation
        crosses them within its first ticks) and walk the rest on a
        background thread AFTER init returns — ready lands inside the
        shell's 120 s budget while the ladder still beats real dictations
        to the deeper buckets (ticks outpace speech once programs are
        cached/shipped). Buckets warm shortest-first so a partial budget
        still covers what every dictation crosses. The reference's init
        budget is 120 s (``funasr_service.rs:273``)."""
        import os

        raw = os.environ.get("LWT_WARMUP_LADDER", "").strip()
        if not raw or raw == "0":
            return
        background = raw == "bg" or raw.startswith("bg:")
        if background:
            raw = raw[3:] if raw.startswith("bg:") else "1"
        try:
            budget = 90.0 if raw in ("1", "") else float(raw)
        except ValueError:
            budget = 90.0
        # Ladder passes run on threads by default (compile RPCs overlap,
        # 3× measured through the relay); LWT_WARMUP_CONCURRENCY=1 → serial.
        try:
            conc = max(1, int(os.environ.get("LWT_WARMUP_CONCURRENCY", "3")))
        except ValueError:
            conc = 3
        try:
            from light_whisper_tpu.serving.incremental import warmup_ladder

            started = time.perf_counter()
            if background:
                # The sync phase must be bounded BY CONSTRUCTION: its ticks
                # ride the backend's compile/payload-population path, whose
                # per-program cost swings 1-30 s with server-side cache
                # temperature — unbounded, a cold backend blows the shell's
                # 120 s init window. Unwarmed sync buckets fall through to
                # the background walker (which yields to live requests).
                sync_budget = min(
                    budget,
                    float(os.environ.get("LWT_WARMUP_SYNC_BUDGET", "45") or 45),
                )
                sync_ticks = warmup_ladder(
                    self.model,
                    max_seconds=2.0,
                    budget_seconds=sync_budget,
                    log=lambda msg: self.log.info("ladder %s", msg),
                    concurrency=conc,
                )
                self.log.info(
                    "bucket-ladder warmup (sync ≤2 s): %d ticks in %.1fs",
                    sync_ticks,
                    time.perf_counter() - started,
                )
                import threading

                stop = threading.Event()

                def _gate() -> None:
                    # Yield to live requests: never start a warmup tick
                    # while one is in flight (a first request queuing
                    # behind three in-flight pass ticks measured +6.6 s).
                    while not stop.is_set() and not self._device_idle.wait(
                        timeout=0.5
                    ):
                        pass

                def _rest() -> None:
                    try:
                        t0 = time.perf_counter()
                        ticks = warmup_ladder(
                            self.model,
                            budget_seconds=budget,
                            log=lambda msg: self.log.info("ladder(bg) %s", msg),
                            should_stop=stop.is_set,
                            wait_turn=_gate,
                            concurrency=conc,
                        )
                        self.log.info(
                            "bucket-ladder warmup (background): %d ticks in %.1fs",
                            ticks,
                            time.perf_counter() - t0,
                        )
                    except Exception as exc:  # pragma: no cover - log only
                        self.log.warning("background ladder failed: %s", exc)

                # Tracked so shutdown can stop+join before teardown — a
                # daemon thread mid-device-call at interpreter exit aborts
                # the process (jax runtime teardown race).
                self._bg_ladder_stop = stop
                self._bg_ladder_thread = threading.Thread(target=_rest, daemon=True)
                self._bg_ladder_thread.start()
                return
            ticks = warmup_ladder(
                self.model,
                budget_seconds=budget,
                log=lambda msg: self.log.info("ladder %s", msg),
                concurrency=conc,
            )
            self.log.info(
                "bucket-ladder warmup: %d ticks in %.1fs",
                ticks,
                time.perf_counter() - started,
            )
        except Exception as exc:
            self.log.warning("bucket-ladder warmup failed: %s", exc)

    # ------------------------------------------------------------------

    def _load_audio(self, audio_path, audio_base64, audio_format, sample_rate):
        """Route a request's audio to 16 kHz float32 mono + (duration, mode).

        Inline payloads take priority over paths; this engine accepts only
        raw PCM inline (the WAV branch of ``decode_inline_audio`` exists for
        protocol completeness — rejecting it here with the contract string
        triggers the client's tempfile fallback, matching
        ``qwen3_asr_server.py:245-267``).
        """
        if audio_base64:
            decoded, duration = decode_inline_audio(audio_base64, audio_format, sample_rate)
            if not isinstance(decoded, np.ndarray):
                raise ValueError("Qwen3-ASR 内存输入仅支持 PCM")
            mode = "memory"
            audio = self._resample(decoded, sample_rate or SAMPLE_RATE)
        else:
            import os

            if not audio_path or not os.path.exists(audio_path):
                raise FileNotFoundError(f"音频文件不存在: {audio_path}")
            mode = "path"
            samples, source_rate = read_audio_file_mono_f32(audio_path)
            audio = self._resample(samples, source_rate)
            duration = audio.size / float(SAMPLE_RATE)
        return np.ascontiguousarray(audio, dtype=np.float32), duration, mode

    @staticmethod
    def _resample(audio: np.ndarray, source_rate: int) -> np.ndarray:
        try:  # native resampler when built; numpy parity fallback otherwise
            from light_whisper_tpu.native import binding

            return binding.resample_linear(audio, source_rate, SAMPLE_RATE)
        except Exception:
            return resample_linear(audio, source_rate, SAMPLE_RATE)

    def _filter_speech(self, audio: np.ndarray, session_key: str):
        """Trim leading/trailing silence only — inner pauses stay, so the
        model still sees natural phrase timing (``qwen3_asr_server.py:152-173``)."""
        started = time.perf_counter()
        segments = self._vad_timestamps(audio, session_key)
        vad_ms = (time.perf_counter() - started) * 1000
        with self._stats_lock:
            self._vad_calls += 1
            self._total_vad_ms += vad_ms

        if not segments:
            with self._stats_lock:
                self._vad_rejected += 1
                self._prev_trims.pop(session_key, None)
            return np.empty(0, dtype=np.float32), 0, vad_ms
        start = max(0, int(segments[0]["start"]))
        end = min(len(audio), int(segments[-1]["end"]))
        if end <= start:
            with self._stats_lock:
                self._vad_rejected += 1
                self._prev_trims.pop(session_key, None)
            return np.empty(0, dtype=np.float32), 0, vad_ms
        start, end = self._stabilize_trim(audio, start, end, session_key)
        return np.ascontiguousarray(audio[start:end]), len(segments), vad_ms

    def _vad_timestamps(self, audio: np.ndarray, session_key: str):
        """Segment via the stream's incremental VAD session when possible.

        Interim ticks re-send the same recording with ~0.5 s appended;
        :class:`VadPrefixSession` recomputes only the new tail plus a
        receptive-field halo and stitches it onto cached prefix
        probabilities (monolithic-equal, see its docstring). Anything the
        session can't extend — shrunk/different audio, long-form, session
        reuse disabled, or a custom VAD without ``probabilities`` — falls
        back to the stateless full pass.
        """
        if os.environ.get("LIGHT_WHISPER_DISABLE_SESSION_REUSE") or not hasattr(
            self.vad, "probabilities"
        ):
            return self.vad.speech_timestamps(audio)
        from light_whisper_tpu.models.vad.api import VadPrefixSession
        from light_whisper_tpu.serving.session_pool import max_sessions

        with self._stats_lock:
            session = self._vad_sessions.pop(session_key, None)
            if session is None:
                session = VadPrefixSession(self.vad)
            self._vad_sessions[session_key] = session  # LRU touch
            while len(self._vad_sessions) > 2 * max_sessions():
                self._vad_sessions.pop(next(iter(self._vad_sessions)))
            reused_before = session.reused_ticks
        segments = session.speech_timestamps(audio)
        with self._stats_lock:
            self._vad_prefix_reuse += session.reused_ticks - reused_before
        return segments

    def _stabilize_trim(self, raw: np.ndarray, start: int, end: int, session_key: str):
        """Pin the leading VAD trim across a growing interim window.

        Session KV reuse compares *post-trim* bytes (``SessionBridge``), so a
        trim start that wobbles by a VAD hop between ticks would silently
        degrade every interim request to a full prefill. When the raw audio
        byte-extends the previous request's raw audio and the new trim start
        is within :data:`TRIM_PIN_TOLERANCE_SAMPLES` of the previous one,
        reuse the previous start and keep the end monotone — semantics are
        unchanged (the pinned boundary still lies in VAD-confirmed outer
        silence, within 150 ms of this tick's own estimate), and the byte
        prefix stays stable. Genuinely different audio re-trims fresh.

        Retention is capped at :data:`TRIM_PIN_MAX_SAMPLES` and the O(n)
        prefix compare runs OUTSIDE ``_stats_lock`` (holding it across a
        multi-second array compare would stall stats reads and concurrent
        transcribe threads as interim windows grow)."""
        if os.environ.get("LIGHT_WHISPER_DISABLE_SESSION_REUSE"):
            return start, end
        if len(raw) > TRIM_PIN_MAX_SAMPLES:
            with self._stats_lock:
                self._prev_trims.pop(session_key, None)
            return start, end
        with self._stats_lock:
            prev = self._prev_trims.get(session_key)
        if prev is not None:
            prev_raw, prev_start, prev_end = prev
            if (
                len(raw) >= len(prev_raw)
                and abs(start - prev_start) <= TRIM_PIN_TOLERANCE_SAMPLES
                and prev_start < end
                and np.array_equal(raw[: len(prev_raw)], prev_raw)
            ):
                start = prev_start
                end = max(end, min(prev_end, len(raw)))
        from light_whisper_tpu.serving.session_pool import max_sessions

        cap = 2 * max_sessions()
        budget = _trim_pin_budget_bytes()
        with self._stats_lock:
            # Bounded alongside the session pool: pins for evicted/stale
            # streams age out once the dict outgrows 2× the session limit,
            # AND total retained bytes stay under LWT_TRIM_PIN_MAX_BYTES
            # (oldest-first eviction; the new pin itself is dropped if it
            # alone exceeds the budget — stateless behavior for that tick).
            self._prev_trims.pop(session_key, None)
            if raw.nbytes <= budget:
                self._prev_trims[session_key] = (raw, start, end)
            while len(self._prev_trims) > cap or (
                len(self._prev_trims) > 1
                and sum(r.nbytes for r, _s, _e in self._prev_trims.values()) > budget
            ):
                self._prev_trims.pop(next(iter(self._prev_trims)))
        return start, end

    def _retained_audio_bytes(self) -> Dict[str, int]:
        """Host bytes parked per retention surface: trim pins and VAD
        prefix sessions (the KV-session pool reports its own
        ``session_parked_audio_bytes``). Each surface is individually
        byte-bounded; this makes residency observable via ``stats``."""
        with self._stats_lock:
            trim = sum(r.nbytes for r, _s, _e in self._prev_trims.values())
            vad = sum(
                s.retained_bytes() if hasattr(s, "retained_bytes") else 0
                for s in self._vad_sessions.values()
            )
        return {
            "trim_pin_retained_bytes": int(trim),
            "vad_session_retained_bytes": int(vad),
        }

    def _transcribe_model(self, audio: np.ndarray, session_key: str):
        """Route through the stream's own KV session when this request
        extends that stream's previous one (the shell's interim loop
        re-sends a growing window every 140-460 ms, ``interim.rs:21-196``)
        — the session rolls its KV prefix back and self-speculatively
        verifies the previous transcript, so only new speech costs decode
        steps. Sessions are keyed per ``options.stream`` (bounded LRU pool),
        so N interleaved dictation streams each keep their own reuse path
        instead of resetting a shared one. Prefix equality is checked
        byte-for-byte; anything else resets to a full prefill, which is
        exactly the stateless behavior. Greedy-exact either way."""
        pool = self._streaming_sessions()
        if pool is None:
            return self.model.transcribe(audio)
        # checkout pins the bridge: concurrent fresh streams must not LRU-
        # evict (reset, freeing donated KV buffers) a session mid-decode.
        with pool.checkout([session_key]) as (bridge,):
            return bridge.transcribe_extending(audio)

    # -- multi-stream coalescing ---------------------------------------

    def _decode_scheduler(self):
        """One device program at a time, with batch coalescing on top.

        The protocol server pipelines transcribe commands onto worker
        threads (``runtime/server.py``); this scheduler re-serializes their
        device work — matching the reference's engine mutex
        (``funasr_service.rs:1353-1388``) — but requests that are queued
        together coalesce into ONE ``transcribe_batch`` dispatch, so N
        concurrent dictation streams pay one padded batched decode instead
        of N sequential ones."""
        # Lock the lazy init: simultaneous first requests racing here would
        # create TWO schedulers — two worker threads — and one stream's
        # ticks could then run concurrently, re-using donated KV buffers
        # (caught by tests/test_soak_serving.py as "Array has been deleted").
        if self._scheduler is None:
            with self._init_lock:
                if self._scheduler is None:
                    from light_whisper_tpu.serving.scheduler import EngineScheduler

                    self._scheduler = EngineScheduler()
        return self._scheduler

    def _submit_decode(self, audio: np.ndarray, stream: str, session_key: str):
        scheduler = self._decode_scheduler()
        job = scheduler.submit_batchable(
            stream,
            (session_key, audio),
            batch_key="transcribe",
            batch_runner=self._run_decode_batch,
            supersede=False,
            max_batch=8,
        )
        result = scheduler.wait(job)
        if isinstance(result, BaseException):
            # Per-stream failure shipped positionally through the batch
            # (tick_batch isolation) — re-raise so ONLY this request errors.
            raise result
        return result

    def _run_decode_batch(self, payloads):
        if len(payloads) == 1:
            # Solo request: keep the stream's KV-session fast path.
            session_key, audio = payloads[0]
            return [self._transcribe_model(audio, session_key)]
        with self._stats_lock:
            self._batched_requests += len(payloads)
            self._batch_dispatches += 1
        # Coalesced requests with distinct per-stream sessions (N concurrent
        # dictations ticking and/or starting) run ONE batched device tick
        # that keeps every stream's KV session — decode is weight-DMA bound,
        # so N sequential session ticks pay N weight reads per step where
        # the batch pays one. tick_batch groups extending sessions and fresh
        # sessions separately (batched segment tick vs batched full prefill)
        # and solos anything incompatible. Batches with DUPLICATE session
        # keys (anonymous one-shot storms share DEFAULT_STREAM) keep the
        # stateless batched path — two requests can't share one session
        # object in a single tick.
        pool = self._streaming_sessions()
        if pool is not None and os.environ.get("LWT_BATCH_TICKS", "1") not in ("", "0"):
            keys = [key for key, _audio in payloads]
            if len(set(keys)) == len(keys):
                from light_whisper_tpu.serving.session_bridge import (
                    transcribe_extending_batch,
                )

                with self._stats_lock:
                    self._batched_tick_dispatches += 1
                # the bridge owns audio normalization (one conversion site);
                # checkout pins every member against concurrent eviction
                with pool.checkout(keys) as bridges:
                    return transcribe_extending_batch(
                        bridges, [a for _k, a in payloads]
                    )
        audios = [audio for _key, audio in payloads]
        if hasattr(self.model, "transcribe_batch"):
            return self.model.transcribe_batch(audios)
        return [self.model.transcribe(a) for a in audios]

    def _streaming_sessions(self):
        import os

        if os.environ.get("LIGHT_WHISPER_DISABLE_SESSION_REUSE"):
            return None
        if self._session_pool is None:
            with self._init_lock:  # racing first requests must share ONE pool
                if self._session_pool is None:
                    try:
                        from light_whisper_tpu.serving.session_pool import SessionPool

                        pool = SessionPool(self.model)
                        pool.bridge_for(None)  # probe: fake models fail here
                        self._session_pool = pool
                    except Exception:
                        # e.g. injected fake models without the real param trees
                        self._session_pool = False
        return self._session_pool or None

    def _correct_hot_words(self, text: str, hot_words: Optional[List[str]]) -> str:
        if not text or not hot_words or not self._apply_hot_words:
            return text
        try:
            if self._hotword_corrector is None:
                with self._init_lock:  # worker threads race the first pass
                    if self._hotword_corrector is None:
                        from light_whisper_tpu.text.hotwords import HotWordCorrector

                        self._hotword_corrector = HotWordCorrector()
            return self._hotword_corrector.correct(text, hot_words)
        except Exception as exc:  # never fail a transcription over biasing
            self.log.warning("hot-word correction failed: %s", exc)
            return text

    def transcribe(
        self,
        audio_path=None,
        options=None,
        hot_words=None,
        audio_base64=None,
        audio_format=None,
        sample_rate=None,
    ) -> Dict[str, Any]:
        if not self.initialized:
            init_result = self.initialize()
            if not init_result["success"]:
                return init_result

        input_mode = "memory" if audio_base64 else "path"
        options = options or {}
        # Requests naming a stream share device-scheduler ordering; anonymous
        # requests each get their own so concurrent ones can batch together.
        named_stream = options.get("stream")
        stream = str(named_stream or f"req-{next(self._anon_stream)}")
        # KV sessions key on the NAMED stream; anonymous requests share the
        # default session (single-user wire clients never set options.stream
        # and must keep the interim KV-reuse path).
        from light_whisper_tpu.serving.session_pool import DEFAULT_STREAM

        session_key = str(named_stream) if named_stream else DEFAULT_STREAM
        # Mark a live request for the background-ladder gate: warmup ticks
        # must not start while real work is in flight (a first request
        # queuing behind three in-flight pass ticks measured +6.6 s).
        with self._stats_lock:
            self._active_requests += 1
            self._device_idle.clear()
        try:
            audio, duration, input_mode = self._load_audio(
                audio_path, audio_base64, audio_format, sample_rate
            )
            with self._stats_lock:
                self.total_audio_duration += duration
            if duration < MIN_DURATION_SECONDS:
                return {
                    "success": True,
                    "text": "",
                    "duration": duration,
                    "engine": self.engine,
                    "input_mode": input_mode,
                }

            use_long_form = options.get(
                "long_form", duration > LONG_FORM_THRESHOLD_SECONDS
            )
            if use_long_form and hasattr(self.model, "transcribe_batch"):
                return self._transcribe_long_form(
                    audio,
                    duration,
                    input_mode,
                    hot_words,
                    stream,
                    max_window_seconds=options.get("long_form_max_window_seconds"),
                )

            audio, vad_segments, vad_ms = self._filter_speech(audio, session_key)
            speech_duration = len(audio) / float(SAMPLE_RATE)
            if not vad_segments:
                return {
                    "success": True,
                    "text": "",
                    "raw_text": "",
                    "duration": duration,
                    "speech_duration": 0.0,
                    "language": "unknown",
                    "engine": self.engine,
                    "model_type": self.engine,
                    "backend": self.backend,
                    "input_mode": input_mode,
                    "vad_segments": 0,
                    "vad_ms": round(vad_ms, 3),
                    "inference_ms": 0.0,
                }

            # Convert to the device transport dtype ONCE (int16 for exact-s16
            # audio — every wire request); downstream session prefix checks
            # and per-tick paths then pass it through instead of re-checking
            # the s16 grid (two O(n) host passes per tick on a 1-core box).
            from light_whisper_tpu.models.qwen3_asr.model import as_device_audio

            audio = as_device_audio(audio)

            started = time.perf_counter()
            result = self._submit_decode(audio, stream, session_key)
            inference_ms = (time.perf_counter() - started) * 1000
            with self._stats_lock:
                self._total_inference_ms += inference_ms
                self.transcription_count += 1

            text = result.text.strip()
            text = self._correct_hot_words(text, hot_words)
            self._maybe_cleanup(duration)
            return {
                "success": True,
                "text": text,
                "raw_text": result.text.strip(),
                "confidence": 0.0,
                "duration": duration,
                "speech_duration": round(speech_duration, 3),
                "language": result.language or "unknown",
                "engine": self.engine,
                "model_type": self.engine,
                "backend": self.backend,
                "input_mode": input_mode,
                "vad_segments": vad_segments,
                "vad_ms": round(vad_ms, 3),
                "inference_ms": round(inference_ms, 3),
            }
        except Exception as exc:
            self.log.exception("transcription failed: %s", exc)
            return {
                "success": False,
                "error": f"音频转录失败: {exc}",
                "type": "transcription_error",
                "input_mode": input_mode,
            }
        finally:
            with self._stats_lock:
                self._active_requests -= 1
                if self._active_requests <= 0:
                    self._device_idle.set()

    def _transcribe_long_form(
        self, audio, duration, input_mode, hot_words, stream, max_window_seconds=None
    ):
        from light_whisper_tpu.serving.longform import (
            DEFAULT_MAX_WINDOW_SECONDS,
            transcribe_long_form,
        )

        try:
            window_s = float(max_window_seconds or DEFAULT_MAX_WINDOW_SECONDS)
        except (TypeError, ValueError):
            window_s = DEFAULT_MAX_WINDOW_SECONDS
        window_s = min(max(window_s, 1.0), DEFAULT_MAX_WINDOW_SECONDS)

        started = time.perf_counter()
        # Long-form work rides the same device scheduler (plain, unbatchable
        # job) so it never interleaves device programs with coalesced decodes.
        scheduler = self._decode_scheduler()
        job = scheduler.submit(
            stream,
            lambda: transcribe_long_form(
                self.model, self.vad, audio, max_window_seconds=window_s
            ),
            supersede=False,
        )
        result = scheduler.wait(job)
        total_ms = (time.perf_counter() - started) * 1000
        with self._stats_lock:
            self._vad_calls += 1
            self.transcription_count += 1
            self._total_inference_ms += total_ms
            if result.num_windows == 0:
                self._vad_rejected += 1
        text = self._correct_hot_words(result.text, hot_words)
        self._maybe_cleanup(duration)
        return {
            "success": True,
            "text": text,
            "raw_text": result.text,
            "confidence": 0.0,
            "duration": duration,
            "speech_duration": round(result.speech_seconds, 3),
            "language": result.language,
            "engine": self.engine,
            "model_type": self.engine,
            "backend": self.backend,
            "input_mode": input_mode,
            "vad_segments": result.num_windows,
            "vad_ms": round(result.vad_ms, 3),
            "inference_ms": round(total_ms, 3),
            "long_form": True,
            # per-window attribution: decode wall + planned window sizes
            "long_form_asr_ms": round(result.asr_ms, 3),
            "long_form_window_seconds": result.window_seconds,
        }

    # ------------------------------------------------------------------

    def _maybe_cleanup(self, duration: float) -> None:
        if self.transcription_count % CLEANUP_EVERY_N == 0 or duration > 120:
            import threading

            threading.Thread(target=self.cleanup, daemon=True).start()

    def cleanup(self) -> None:
        import gc

        gc.collect()

    def shutdown(self) -> None:
        thread = self._bg_ladder_thread
        if thread is not None and thread.is_alive():
            # Signal per-tick stop, then wait out the in-flight tick: jax
            # runtime teardown under a mid-dispatch warmup aborts the
            # process, but exit must not wait for the whole ladder.
            if self._bg_ladder_stop is not None:
                self._bg_ladder_stop.set()
            thread.join(timeout=60)
        self._bg_ladder_thread = None
        # Same teardown hazard for the model's load-overlapped shadow
        # warmup: normally joined by warmup()/the first transcribe, but a
        # failed/skipped warmup can leave it mid-dispatch at exit. Bounded
        # join — exit must not wait out a wedged relay compile.
        prewarm = getattr(self.model, "_prewarm_thread", None)
        if prewarm is not None and prewarm.is_alive():
            prewarm.join(timeout=60)
        if self._scheduler is not None:
            self._scheduler.shutdown()
            self._scheduler = None

    def performance_stats(self) -> Dict[str, Any]:
        import os

        # Truthful: extending-window requests ride the self-speculative
        # session path unless disabled or unsupported (fake models).
        speculative = (
            not os.environ.get("LIGHT_WHISPER_DISABLE_SESSION_REUSE")
            and self._session_pool is not False
        )
        stats = {
            "transcription_count": self.transcription_count,
            "total_audio_duration": round(self.total_audio_duration, 2),
            "average_inference_ms": round(
                self._total_inference_ms / max(1, self.transcription_count), 3
            ),
            "average_vad_ms": round(self._total_vad_ms / max(1, self._vad_calls), 3),
            "vad_calls": self._vad_calls,
            "vad_rejected": self._vad_rejected,
            "vad_prefix_reuse": self._vad_prefix_reuse,
            "batch_dispatches": self._batch_dispatches,
            "batched_requests": self._batched_requests,
            "batched_tick_dispatches": self._batched_tick_dispatches,
            "batched_tick_degrades": _tick_degrades(),
            "batched_tick_last_error": _tick_degrade_error(),
            "initialized": self.initialized,
            "engine": self.engine,
            "backend": self.backend,
            "speculative_decoding": speculative,
            "models_loaded": {
                "asr": self.model is not None,
                "vad": self.vad is not None,
                "punc": True,
            },
            # Cold-start attribution: GGUF load phases (parse / host
            # dequant-prep / HBM upload) + warmup phase walls — observable
            # over the wire so install rehearsals don't need in-process
            # access (scripts/rehearse_real_artifact.py).
            "init_phases": dict(self._init_timings),
        }
        stats.update(self._retained_audio_bytes())
        pool = self._session_pool
        if pool:  # surface KV-reuse effectiveness (interim-loop health)
            stats.update(pool.stats())
        if self._scheduler is not None:
            stats["scheduler"] = self._scheduler.stats()
        return stats

    def check_status(self) -> Dict[str, Any]:
        model_loaded = self.model is not None
        return {
            "success": True,
            "installed": True,
            "initialized": self.initialized,
            "version": __version__,
            "engine": self.engine,
            "backend": self.backend,
            "model_loaded": model_loaded,
            "models": {
                "asr": model_loaded,
                "vad": self.vad is not None,
                "punc": True,
            },
            **_device_info(),
        }
