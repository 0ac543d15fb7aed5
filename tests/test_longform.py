"""Long-form VAD → batched ASR pipeline."""

import types

import numpy as np

from light_whisper_tpu.serving.longform import (
    SAMPLE_RATE,
    plan_windows,
    transcribe_long_form,
)


def seg(start_s, end_s):
    return {"start": int(start_s * SAMPLE_RATE), "end": int(end_s * SAMPLE_RATE)}


def test_plan_windows_merges_under_budget():
    segments = [seg(0, 5), seg(6, 10), seg(11, 15)]
    windows = plan_windows(segments, 20 * SAMPLE_RATE, max_window_seconds=28, pad_seconds=0)
    assert windows == [(0, 15 * SAMPLE_RATE)]


def test_plan_windows_splits_on_budget():
    segments = [seg(0, 20), seg(25, 45)]
    windows = plan_windows(segments, 60 * SAMPLE_RATE, max_window_seconds=28, pad_seconds=0)
    assert windows == [
        (0, 20 * SAMPLE_RATE),
        (25 * SAMPLE_RATE, 45 * SAMPLE_RATE),
    ]


def test_plan_windows_splits_oversized_single_segment():
    segments = [seg(0, 70)]
    windows = plan_windows(segments, 70 * SAMPLE_RATE, max_window_seconds=28, pad_seconds=0)
    assert len(windows) == 3
    assert windows[0] == (0, 28 * SAMPLE_RATE)
    assert windows[-1][1] == 70 * SAMPLE_RATE


def test_plan_windows_pads_and_clamps():
    segments = [seg(0.5, 2)]
    windows = plan_windows(segments, int(2.05 * SAMPLE_RATE), pad_seconds=0.12)
    (start, end), = windows
    assert start == int(0.5 * SAMPLE_RATE) - int(0.12 * SAMPLE_RATE)
    assert end == int(2.05 * SAMPLE_RATE)  # clamped to audio length


class FakeVad:
    def __init__(self, segments):
        self.segments = segments

    def speech_timestamps(self, audio):
        return self.segments


class FakeModel:
    def __init__(self, texts):
        self.texts = texts
        self.batches = []

    def transcribe_batch(self, clips):
        self.batches.append([len(c) for c in clips])
        return [
            types.SimpleNamespace(text=t, language="zh", tokens=[])
            for t in self.texts[: len(clips)]
        ]


def test_transcribe_long_form_joins_segments():
    audio = np.zeros(60 * SAMPLE_RATE, dtype=np.float32)
    vad = FakeVad([seg(1, 20), seg(30, 50)])
    model = FakeModel(["今天天气很好", "我们去公园"])
    result = transcribe_long_form(model, vad, audio)
    assert result.text == "今天天气很好我们去公园"
    assert result.num_windows == 2
    assert result.language == "zh"
    assert len(model.batches) == 1 and len(model.batches[0]) == 2


def test_join_respects_ascii_boundary():
    audio = np.zeros(80 * SAMPLE_RATE, dtype=np.float32)
    vad = FakeVad([seg(1, 25), seg(30, 60)])
    model = FakeModel(["hello world", "second part"])
    result = transcribe_long_form(model, vad, audio)
    assert result.text == "hello world second part"


def test_no_speech():
    result = transcribe_long_form(FakeModel([]), FakeVad([]), np.zeros(16000, np.float32))
    assert result.text == "" and result.num_windows == 0


def test_join_adds_space_after_sentence_punctuation():
    from light_whisper_tpu.serving.longform import _join_texts

    assert _join_texts(["I went home today.", "Then I slept."]) == (
        "I went home today. Then I slept."
    )
    assert _join_texts(["Hello,", "world"]) == "Hello, world"
    # CJK keeps direct joins on either side
    assert _join_texts(["你好。", "再见"]) == "你好。再见"
    assert _join_texts(["mixed.", "中文"]) == "mixed.中文"


def test_split_edges_are_not_padded_into_overlap():
    # One continuous 60 s segment splits at the budget; the split edges abut
    # mid-speech, so padding them would re-transcribe (and duplicate) the
    # boundary word. True segment edges still get the pad.
    segments = [seg(0, 60)]
    windows = plan_windows(
        segments, 61 * SAMPLE_RATE, max_window_seconds=28, pad_seconds=0.12
    )
    assert len(windows) == 3
    pad = int(0.12 * SAMPLE_RATE)
    # no overlap anywhere
    for (s0, e0), (s1, e1) in zip(windows, windows[1:]):
        assert e0 == s1, (e0, s1)
    # outer edges padded (clamped at 0)
    assert windows[0][0] == 0
    assert windows[-1][1] == 60 * SAMPLE_RATE + pad
