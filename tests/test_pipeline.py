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


def test_asr_failure_is_typed_outcome():
    # finalize.rs:346-383: an ASR failure becomes an asr_error outcome with
    # history persistence, not a crash of the finalize task.
    class Boom:
        def transcribe(self, audio):
            raise RuntimeError("asr died")

    pipeline = DictationPipeline(Boom())
    try:
        [result] = pipeline.process_concurrent([np.zeros(16000, np.float32)])
    finally:
        pipeline.close()
    assert result.outcome == "asr_error"
    assert "asr died" in (result.error or "")
    assert result.text == ""


# -- finalize mode orchestration (finalize.rs:260-600) ------------------------


def test_too_short_recording_short_circuits():
    calls = []

    class CountingTranscriber(FakeTranscriber):
        def transcribe(self, audio):
            calls.append(1)
            return super().transcribe(audio)

    pipeline = DictationPipeline(CountingTranscriber())
    try:
        result = pipeline.process(np.zeros(4000, np.float32))  # 0.25 s
    finally:
        pipeline.close()
    assert result.outcome == "too_short"
    assert calls == []  # ASR never ran


def test_interim_cache_reuse_and_tail_gap_gate():
    from light_whisper_tpu.serving.pipeline import InterimCache

    calls = []

    class CountingTranscriber(FakeTranscriber):
        def transcribe(self, audio):
            calls.append(len(audio))
            return super().transcribe(audio)

    pipeline = DictationPipeline(CountingTranscriber())
    try:
        # 10 s recording, cache covers all but 100 ms → reuse
        n = 160000
        cache = InterimCache(text="cached words", language="zh", sample_count=n - 1600)
        result = pipeline.process(np.zeros(n, np.float32), interim_cache=cache)
        assert result.reused_interim and result.raw_text == "cached words"
        assert calls == []
        # tail gap too large (1 s) → fresh ASR
        stale = InterimCache(text="cached words", language="zh", sample_count=n - 16000)
        result2 = pipeline.process(np.zeros(n, np.float32), interim_cache=stale)
        assert not result2.reused_interim
        assert len(calls) == 1
        # recording longer than the interim window → fresh ASR even if gap ok
        long_n = 16000 * 13
        big = InterimCache(text="cached words", language="zh", sample_count=long_n - 100)
        result3 = pipeline.process(np.zeros(long_n, np.float32), interim_cache=big)
        assert not result3.reused_interim
    finally:
        pipeline.close()


def test_edit_mode_applies_editor_and_preserves_selection_on_failure():
    pipeline = DictationPipeline(FakeTranscriber(text="make it polite"))
    try:
        ok = pipeline.process(
            np.zeros(16000, np.float32),
            edit_context="this won't do",
            editor=lambda selection, instruction: f"POLITE({selection})<{instruction}>",
        )
        assert ok.workflow == "edit" and ok.outcome == "success"
        assert ok.text == "POLITE(this won't do)<make it polite>"

        def broken(selection, instruction):
            raise RuntimeError("llm down")

        bad = pipeline.process(
            np.zeros(16000, np.float32), edit_context="original", editor=broken
        )
        assert bad.outcome == "processing_error"
        assert bad.text == ""  # selection untouched — no replacement text
        assert "llm down" in bad.error
    finally:
        pipeline.close()


def test_assistant_mode_routes_question():
    pipeline = DictationPipeline(FakeTranscriber(text="what is the time"))
    try:
        result = pipeline.process(
            np.zeros(16000, np.float32),
            mode="assistant",
            assistant=lambda q: f"Answer to: {q}",
        )
    finally:
        pipeline.close()
    assert result.workflow == "assistant"
    assert result.text == "Answer to: what is the time"


def test_edit_text_llm_contract():
    from light_whisper_tpu.llm.polish import edit_text
    from light_whisper_tpu.llm.provider import endpoint_for_config

    class FakeTransport:
        def __init__(self, payloads):
            self.payloads = list(payloads)
            self.bodies = []

        def post(self, url, headers, body, timeout):
            self.bodies.append(body)
            return 200, False, {
                "choices": [{"message": {"content": self.payloads.pop(0)}}]
            }

    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(['{"result":"Hello, world"}'] * 2)
    out = edit_text(endpoint, "你好世界", "translate to english", transport=transport)
    assert out.text == "Hello, world"
    user = transport.bodies[0]["messages"][1]["content"]
    assert "<selected_text><![CDATA[你好世界]]></selected_text>" in user
    assert "<edit_instruction><![CDATA[translate to english]]></edit_instruction>" in user

    import pytest as _pytest

    bad = FakeTransport(["not json at all", "still not json"])
    with _pytest.raises(RuntimeError):
        edit_text(endpoint, "text", "do things", transport=bad)
