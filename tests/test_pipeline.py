"""End-to-end dictation pipeline (VAD → ASR → hot words → polish → history)."""

import time
import types

import numpy as np
import pytest

from light_whisper_tpu.serving.pipeline import DictationPipeline
from light_whisper_tpu.storage.history import HistoryStore
from light_whisper_tpu.text.hotwords import HotWordCorrector


class FakeTranscriber:
    def __init__(self, text="we use pytorch here"):
        self.text = text
        self.calls = []

    def transcribe(self, audio):
        self.calls.append(np.asarray(audio))
        return types.SimpleNamespace(text=self.text, language="en")


class FakeVad:
    def __init__(self, segments):
        self.segments = segments

    def speech_timestamps(self, audio):
        return self.segments


class FakePolisher:
    def __init__(self, polished="We use PyTorch here.", delay=0.0, fail=False):
        self.polished_text = polished
        self.delay = delay
        self.fail = fail
        self.calls = 0

    def __call__(self, text):
        self.calls += 1
        if self.delay:
            time.sleep(self.delay)
        if self.fail:
            raise RuntimeError("llm down")
        return types.SimpleNamespace(polished=self.polished_text)


def test_full_pipeline_with_history(tmp_path):
    history = HistoryStore(str(tmp_path))
    pipeline = DictationPipeline(
        FakeTranscriber(),
        vad=FakeVad([{"start": 0, "end": 16000}]),
        hotword_corrector=HotWordCorrector(),
        polisher=FakePolisher(),
        history=history,
    )
    try:
        result = pipeline.process(
            np.zeros(16000, np.float32), hot_words=["PyTorch"], session_id=7
        )
    finally:
        pipeline.close()

    assert result.raw_text == "we use PyTorch here"  # hot-word corrected
    assert result.text == "We use PyTorch here."  # polished
    assert result.polished and result.polish_ms >= 0
    record = history.get(result.history_id)
    assert record["text"] == "We use PyTorch here."
    assert record["original_text"] == "we use PyTorch here"
    assert record["asr_ms"] is not None and record["total_ms"] is not None


def test_vad_silence_short_circuits():
    transcriber = FakeTranscriber()
    pipeline = DictationPipeline(transcriber, vad=FakeVad([]))
    try:
        result = pipeline.process(np.zeros(16000, np.float32))
    finally:
        pipeline.close()
    assert result.text == "" and transcriber.calls == []


def test_polish_failure_keeps_raw_text():
    pipeline = DictationPipeline(FakeTranscriber("raw"), polisher=FakePolisher(fail=True))
    try:
        result = pipeline.process(np.zeros(8000, np.float32))
    finally:
        pipeline.close()
    assert result.text == "raw" and not result.polished


def test_concurrent_streams_overlap_polish():
    """3 streams with 100 ms polish each: overlapped wall time must be well
    under the 300 ms serial sum."""
    polisher = FakePolisher(delay=0.1)
    pipeline = DictationPipeline(FakeTranscriber(), polisher=polisher)
    try:
        started = time.perf_counter()
        results = pipeline.process_concurrent(
            [np.zeros(8000, np.float32)] * 3
        )
        elapsed = time.perf_counter() - started
    finally:
        pipeline.close()
    assert len(results) == 3
    assert all(r.polished for r in results)
    assert elapsed < 0.28, elapsed


def test_concurrent_propagates_errors():
    class Boom:
        def transcribe(self, audio):
            raise RuntimeError("asr died")

    pipeline = DictationPipeline(Boom())
    try:
        with pytest.raises(RuntimeError):
            pipeline.process_concurrent([np.zeros(8000, np.float32)])
    finally:
        pipeline.close()
