"""Multi-stream serving: coalesce concurrent requests into batched decodes.

The reference serializes every engine request behind a process mutex
(``funasr_service.rs:1353-1388``) — N concurrent dictation streams pay N
sequential inferences. On TPU the MXU is happiest batched, so this front-end
turns requests that happen to be queued together into ONE
``transcribe_batch`` dispatch (padded to a common shape bucket), falling
back to the ordinary single-stream path when a request arrives alone.

Results are identical to per-stream :meth:`Qwen3ASRModel.transcribe` for the
same shape buckets (greedy decoding is deterministic and the batch path is
tested against the sequential one in ``tests/test_batch_transcribe.py``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from light_whisper_tpu.serving.scheduler import (
    EngineScheduler,
    PRIORITY_INTERIM,
)

BATCH_KEY_TRANSCRIBE = "transcribe"


class MultiStreamTranscriber:
    """Thread-safe transcription front-end for several concurrent streams.

    Each caller thread invokes :meth:`transcribe` with its stream id; calls
    that overlap in time ride one batched decode."""

    def __init__(self, model, scheduler: Optional[EngineScheduler] = None, max_batch: int = 8):
        self.model = model
        self.scheduler = scheduler or EngineScheduler()
        self._owns_scheduler = scheduler is None
        self.max_batch = max_batch

    def transcribe(
        self,
        stream: str,
        audio: np.ndarray,
        priority: int = PRIORITY_INTERIM,
        timeout: Optional[float] = None,
    ):
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        job = self.scheduler.submit_batchable(
            stream,
            audio,
            batch_key=BATCH_KEY_TRANSCRIBE,
            batch_runner=self._run_batch,
            priority=priority,
            max_batch=self.max_batch,
        )
        return self.scheduler.wait(job, timeout)

    def _run_batch(self, audios: List[np.ndarray]):
        return self.model.transcribe_batch(list(audios))

    def stats(self):
        return self.scheduler.stats()

    def shutdown(self) -> None:
        if self._owns_scheduler:
            self.scheduler.shutdown()
