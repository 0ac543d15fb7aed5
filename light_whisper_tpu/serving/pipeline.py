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
    ) -> PipelineResult:
        """Run one utterance through the full pipeline (blocking)."""
        started = time.perf_counter()

        job = self.scheduler.submit(
            stream,
            lambda: self._asr(audio, hot_words),
            priority=PRIORITY_FINALIZE,
            supersede=False,
        )
        raw_text, language = self.scheduler.wait(job)
        asr_ms = (time.perf_counter() - started) * 1000

        text = raw_text
        polish_ms = 0.0
        polished = False
        if raw_text and self.polisher is not None:
            polish_started = time.perf_counter()
            try:
                outcome = self.polisher(raw_text)
                candidate = getattr(outcome, "polished", None)
                if isinstance(candidate, str) and candidate.strip():
                    text = candidate.strip()
                    polished = True
            except Exception:
                pass  # polish must never lose a dictation
            polish_ms = (time.perf_counter() - polish_started) * 1000

        total_ms = (time.perf_counter() - started) * 1000
        history_id = None
        if self.history is not None:
            from light_whisper_tpu.storage.history import HistoryDraft

            history_id = self.history.insert(
                HistoryDraft(
                    session_id=session_id,
                    mode=mode,
                    status="success" if raw_text or text else "empty",
                    text=text,
                    original_text=raw_text,
                    language=language,
                    engine=self.engine_name,
                    asr_ms=int(asr_ms),
                    polish_ms=int(polish_ms) if polished else None,
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
