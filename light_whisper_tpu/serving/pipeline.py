"""End-to-end dictation pipeline: VAD → ASR → hot words → polish → history.

BASELINE config #5 ("end-to-end voice pipeline, concurrent multi-stream
serving"): the engine-side orchestration that the reference spreads across
the Rust finalize pipeline (``finalize.rs:175-756``) — ASR with VAD gating,
hot-word biasing, optional LLM polish with vocabulary learning, timing
capture (``asr_ms`` / ``polish_ms`` / ``total_ms``) and history persistence.

ASR serializes on the accelerator through the priority scheduler; polish is
network-bound and runs on worker threads, so multiple streams overlap their
LLM latency while the TPU stays busy with the next utterance.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

from light_whisper_tpu.serving.scheduler import PRIORITY_FINALIZE, EngineScheduler

# finalize gates (reference: audio_service/mod.rs:7,20 and finalize.rs:315-345)
MIN_AUDIO_DURATION_SEC = 0.5
# Single source: the interim session's window/tail-gap constants — the
# finalize-reuse gate here and StreamingSession.finalize encode the SAME
# reference behavior (finalize.rs:313-345) and must not drift apart.
from light_whisper_tpu.serving.streaming import (
    FINALIZE_REUSE_TAIL_GAP_SECONDS as INTERIM_TAIL_GAP_SEC,
    WINDOW_SECONDS as INTERIM_MAX_AUDIO_WINDOW_SEC,
)


@dataclasses.dataclass
class InterimCache:
    """Last interim tick's transcript, for finalize reuse."""

    text: str
    language: str
    sample_count: int


@dataclasses.dataclass
class PipelineResult:
    text: str
    raw_text: str
    language: str
    asr_ms: float
    polish_ms: float
    total_ms: float
    polished: bool
    history_id: Optional[int] = None
    outcome: str = "success"  # success | too_short | no_speech | asr_error | processing_error
    workflow: str = "dictation"  # dictation | edit | assistant
    reused_interim: bool = False
    error: Optional[str] = None


class DictationPipeline:
    def __init__(
        self,
        transcriber,
        vad=None,
        hotword_corrector=None,
        polisher: Optional[Callable[[str], Any]] = None,
        history=None,
        scheduler: Optional[EngineScheduler] = None,
        engine_name: str = "qwen3-asr-0.6b",
    ) -> None:
        """``polisher``: callable(text) → object with ``.polished`` (e.g. a
        bound ``llm.polish.polish_text``); absent → raw transcript ships."""
        self.transcriber = transcriber
        self.vad = vad
        self.hotword_corrector = hotword_corrector
        self.polisher = polisher
        self.history = history
        self.scheduler = scheduler or EngineScheduler()
        self._owns_scheduler = scheduler is None
        self.engine_name = engine_name

    def close(self) -> None:
        if self._owns_scheduler:
            self.scheduler.shutdown()

    # ------------------------------------------------------------------

    def _asr(self, audio, hot_words: Sequence[str]):
        import numpy as np

        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        if self.vad is not None:
            segments = self.vad.speech_timestamps(audio)
            if not segments:
                return "", "unknown"
            start = max(0, int(segments[0]["start"]))
            end = min(len(audio), int(segments[-1]["end"]))
            audio = audio[start:end]
        result = self.transcriber.transcribe(audio)
        text = result.text.strip()
        if text and hot_words and self.hotword_corrector is not None:
            text = self.hotword_corrector.correct(text, list(hot_words))
        return text, getattr(result, "language", "unknown")

    def process(
        self,
        audio,
        stream: str = "default",
        hot_words: Sequence[str] = (),
        session_id: int = 0,
        mode: str = "dictation",
        edit_context: Optional[str] = None,
        editor: Optional[Callable[[str, str], Any]] = None,
        assistant: Optional[Callable[[str], str]] = None,
        interim_cache: Optional[InterimCache] = None,
        sample_rate: int = 16000,
    ) -> PipelineResult:
        """Run one utterance through the finalize orchestration (blocking).

        Mode routing follows the reference finalize pipeline
        (``finalize.rs:419-600``):

        - ``dictation`` + ``edit_context`` → **edit**: the transcript is a
          voice instruction applied to the selected text via ``editor``;
          an edit failure keeps the selection untouched (processing_error).
        - ``assistant`` → the transcript is a question answered by
          ``assistant``.
        - plain ``dictation`` → optional polish (never loses the text).

        ``interim_cache`` enables finalize reuse (``finalize.rs:315-345``):
        when the recording fits inside the interim window and the un-ticked
        tail is ≤ 250 ms, the cached transcript stands in for a fresh ASR
        pass. Sub-0.5 s recordings short-circuit as ``too_short``.
        """
        import numpy as np

        started = time.perf_counter()
        samples = np.asarray(audio, dtype=np.float32).reshape(-1)
        duration_sec = len(samples) / float(sample_rate)
        workflow = (
            "assistant"
            if mode == "assistant"
            else ("edit" if edit_context is not None else "dictation")
        )

        def finish(
            outcome, text, raw_text, language, asr_ms, polish_ms, polished,
            reused=False, error=None, status=None,
        ):
            total_ms = (time.perf_counter() - started) * 1000
            history_id = None
            if self.history is not None:
                from light_whisper_tpu.storage.history import HistoryDraft

                history_id = self.history.insert(
                    HistoryDraft(
                        session_id=session_id,
                        mode=workflow,
                        status=status or outcome,
                        text=text,
                        original_text=raw_text,
                        language=language,
                        engine=self.engine_name,
                        asr_ms=int(asr_ms),
                        polish_ms=int(polish_ms) if polish_ms else None,
                        total_ms=int(total_ms),
                    )
                )
            return PipelineResult(
                text=text,
                raw_text=raw_text,
                language=language,
                asr_ms=asr_ms,
                polish_ms=polish_ms,
                total_ms=total_ms,
                polished=polished,
                history_id=history_id,
                outcome=outcome,
                workflow=workflow,
                reused_interim=reused,
                error=error,
            )

        if duration_sec < MIN_AUDIO_DURATION_SEC:
            return finish("too_short", "", "", "unknown", 0.0, 0.0, False)

        # -- ASR (or interim reuse) -------------------------------------
        reused = False
        max_window = int(sample_rate * INTERIM_MAX_AUDIO_WINDOW_SEC)
        tail_gap = int(sample_rate * INTERIM_TAIL_GAP_SEC)
        cache = interim_cache
        if (
            cache is not None
            and 0 < len(samples) <= max_window
            and cache.sample_count <= len(samples)
            and (len(samples) - cache.sample_count) <= tail_gap
            and cache.text.strip()
        ):
            raw_text, language = cache.text.strip(), cache.language
            reused = True
            asr_ms = 0.0
        else:
            try:
                job = self.scheduler.submit(
                    stream,
                    lambda: self._asr(samples, hot_words),
                    priority=PRIORITY_FINALIZE,
                    supersede=False,
                )
                raw_text, language = self.scheduler.wait(job)
            except Exception as exc:
                asr_ms = (time.perf_counter() - started) * 1000
                return finish(
                    "asr_error", "", "", "unknown", asr_ms, 0.0, False,
                    error=str(exc),
                )
            asr_ms = (time.perf_counter() - started) * 1000

        if not raw_text.strip():
            return finish("no_speech", "", "", language, asr_ms, 0.0, False)
        raw_text = raw_text.strip()

        # -- mode orchestration -----------------------------------------
        if workflow == "edit":
            if editor is None:
                return finish(
                    "processing_error", "", raw_text, language, asr_ms, 0.0,
                    False, reused, error="no editor configured",
                )
            edit_started = time.perf_counter()
            try:
                outcome = editor(edit_context or "", raw_text)
                text = getattr(outcome, "text", outcome)
                if not isinstance(text, str) or not text.strip():
                    raise RuntimeError("empty edit result")
            except Exception as exc:
                # edit failure must never replace the selection
                return finish(
                    "processing_error", "", raw_text, language, asr_ms,
                    (time.perf_counter() - edit_started) * 1000, False,
                    reused, error=str(exc),
                )
            return finish(
                "success", text.strip(), raw_text, language, asr_ms,
                (time.perf_counter() - edit_started) * 1000, True, reused,
            )

        if workflow == "assistant":
            if assistant is None:
                return finish(
                    "processing_error", "", raw_text, language, asr_ms, 0.0,
                    False, reused, error="no assistant configured",
                )
            ask_started = time.perf_counter()
            try:
                answer = assistant(raw_text)
                if not isinstance(answer, str) or not answer.strip():
                    raise RuntimeError("empty assistant answer")
            except Exception as exc:
                return finish(
                    "processing_error", "", raw_text, language, asr_ms,
                    (time.perf_counter() - ask_started) * 1000, False,
                    reused, error=str(exc),
                )
            return finish(
                "success", answer.strip(), raw_text, language, asr_ms,
                (time.perf_counter() - ask_started) * 1000, True, reused,
            )

        # -- dictation: polish never loses the transcript ----------------
        text = raw_text
        polish_ms = 0.0
        polished = False
        if self.polisher is not None:
            polish_started = time.perf_counter()
            try:
                outcome = self.polisher(raw_text)
                candidate = getattr(outcome, "polished", None)
                if isinstance(candidate, str) and candidate.strip():
                    text = candidate.strip()
                    polished = True
            except Exception:
                pass
            polish_ms = (time.perf_counter() - polish_started) * 1000
        return finish(
            "success", text, raw_text, language, asr_ms, polish_ms, polished,
            reused,
        )

    def process_concurrent(
        self,
        audios: Sequence,
        hot_words: Sequence[str] = (),
        mode: str = "dictation",
    ) -> List[PipelineResult]:
        """Serve several streams at once: ASR serializes on-device through
        the scheduler while each stream's polish overlaps on its own thread."""
        results: List[Optional[PipelineResult]] = [None] * len(audios)
        errors: List[Optional[BaseException]] = [None] * len(audios)

        def worker(index: int, audio) -> None:
            try:
                results[index] = self.process(
                    audio,
                    stream=f"stream-{index}",
                    hot_words=hot_words,
                    session_id=index,
                    mode=mode,
                )
            except BaseException as exc:  # surfaced below
                errors[index] = exc

        threads = [
            threading.Thread(target=worker, args=(i, a), daemon=True)
            for i, a in enumerate(audios)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for exc in errors:
            if exc is not None:
                raise exc
        return [r for r in results if r is not None]
