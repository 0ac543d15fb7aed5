"""Engine-server contract tests with injected fakes.

Mirrors the reference's fake-runtime strategy and its pinned behaviors
(``test_qwen3_asr_server.py``): single resident model, VAD silence rejection
without touching the model, exact outer-silence trimming, the 0.5 s duration
floor, typed init errors, and stats accumulation.
"""

import base64
import io
import json
import types

import numpy as np
import pytest

from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
from light_whisper_tpu.runtime.server import EngineServer


class FakeModel:
    def __init__(self):
        self.calls = []
        self.warmups = 0

    def transcribe(self, audio):
        self.calls.append(np.asarray(audio))
        return types.SimpleNamespace(text="  你好世界  ", language="zh", tokens=[1, 2])

    def warmup(self):
        self.warmups += 1


class FakeVad:
    def __init__(self, segments=None):
        self.segments = segments if segments is not None else []
        self.calls = 0

    def speech_timestamps(self, audio):
        self.calls += 1
        return self.segments

    def warmup(self):
        pass


def make_server(segments=None, model=None, vad=None, model_path="/fake/model.gguf"):
    model = model or FakeModel()
    vad = vad or FakeVad(segments)
    server = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda path: model,
        vad_factory=lambda: vad,
        model_path=model_path,
    )
    return server, model, vad


def pcm_b64(samples: np.ndarray) -> str:
    pcm = np.clip(samples * 32768, -32768, 32767).astype("<i2")
    return base64.b64encode(pcm.tobytes()).decode()


def test_init_loads_model_once_and_warms_up():
    server, model, _vad = make_server()
    r1 = server.initialize()
    assert r1["success"] and r1["model_loaded"] and r1["backend"] in ("tpu", "cpu")
    assert model.warmups == 1
    r2 = server.initialize()
    assert r2["success"] and "已初始化" in r2["message"]
    assert model.warmups == 1  # not reloaded


def test_missing_model_reports_models_not_downloaded(monkeypatch, tmp_path):
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
    server = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda p: FakeModel(),
        vad_factory=FakeVad,
        model_path=None,
    )
    result = server.initialize()
    assert result["success"] is False
    assert result["type"] == "models_not_downloaded"


def test_init_error_type_on_load_failure():
    def boom(path):
        raise RuntimeError("bad weights")

    server = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=boom,
        vad_factory=FakeVad,
        model_path="/fake/x.gguf",
    )
    result = server.initialize()
    assert result["success"] is False and result["type"] == "init_error"


def test_short_audio_returns_empty_without_vad_or_model():
    server, model, vad = make_server(segments=[{"start": 0, "end": 4000}])
    server.initialize()
    audio = np.zeros(4000, dtype=np.float32)  # 0.25 s < 0.5 s floor
    result = server.transcribe(audio_base64=pcm_b64(audio), audio_format="pcm_s16le", sample_rate=16000)
    assert result == {
        "success": True,
        "text": "",
        "duration": 0.25,
        "engine": "qwen3-asr-0.6b",
        "input_mode": "memory",
    }
    assert vad.calls == 0 and model.calls == []


def test_vad_silence_rejection_never_calls_model():
    server, model, vad = make_server(segments=[])
    server.initialize()
    audio = np.zeros(16000, dtype=np.float32)
    result = server.transcribe(audio_base64=pcm_b64(audio), audio_format="pcm_s16le", sample_rate=16000)
    assert result["success"] and result["text"] == ""
    assert result["vad_segments"] == 0 and result["speech_duration"] == 0.0
    assert result["inference_ms"] == 0.0
    assert model.calls == []
    assert vad.calls == 1


def test_outer_silence_trimming_preserves_inner_pauses():
    # Reference contract: segments [3200..8000] and [9600..16000] keep
    # audio[3200:16000] — 12,800 of 16,000 samples, pause included
    # (test_qwen3_asr_server.py:164-205).
    segments = [{"start": 3200, "end": 8000}, {"start": 9600, "end": 16000}]
    server, model, _vad = make_server(segments=segments)
    server.initialize()
    audio = np.arange(16000, dtype=np.float32) / 16000.0
    result = server.transcribe(audio_base64=pcm_b64(audio), audio_format="pcm_s16le", sample_rate=16000)
    assert result["success"]
    assert len(model.calls) == 1
    assert model.calls[0].shape == (12800,)
    assert result["speech_duration"] == 0.8
    assert result["vad_segments"] == 2
    assert result["text"] == "你好世界"
    assert result["raw_text"] == "你好世界"
    assert result["language"] == "zh"
    assert result["input_mode"] == "memory"


def test_resample_applied_to_non_16k_inline_audio():
    server, model, _vad = make_server(segments=[{"start": 0, "end": 16000}])
    server.initialize()
    audio48 = np.zeros(48000, dtype=np.float32)  # 1 s at 48 kHz
    result = server.transcribe(
        audio_base64=pcm_b64(audio48), audio_format="pcm_s16le", sample_rate=48000
    )
    assert result["success"]
    assert result["duration"] == 1.0
    assert len(model.calls[0]) == 16000


def test_missing_path_error_mentions_file_not_found():
    server, _model, _vad = make_server()
    server.initialize()
    result = server.transcribe(audio_path="/definitely/missing.wav")
    assert result["success"] is False
    assert "音频文件不存在" in result["error"]
    assert result["type"] == "transcription_error"
    assert result["input_mode"] == "path"


def test_stats_accumulate():
    server, _model, _vad = make_server(segments=[{"start": 0, "end": 16000}])
    server.initialize()
    audio = np.zeros(16000, dtype=np.float32)
    for _ in range(3):
        server.transcribe(audio_base64=pcm_b64(audio), audio_format="pcm_s16le", sample_rate=16000)
    stats = server.performance_stats()
    assert stats["transcription_count"] == 3
    assert stats["vad_calls"] == 3
    assert stats["total_audio_duration"] == 3.0
    assert stats["models_loaded"] == {"asr": True, "vad": True, "punc": True}


def test_status_shape():
    server, _model, _vad = make_server()
    server.initialize()
    status = server.check_status()
    assert status["success"] and status["installed"] and status["initialized"]
    assert status["models"]["asr"] is True
    assert status["engine"] == "qwen3-asr-0.6b"


def test_full_protocol_loop_with_fake_engine():
    """Serial client conversation: send a command, read its response, repeat.

    This matches the reference Rust client's actual usage (one in-flight
    command behind a process mutex, ``funasr_service.rs:1353-1388``); the
    pipelined server preserves byte-identical behavior for such a client.
    """
    import os as _os
    import threading

    server, _model, _vad = make_server(segments=[{"start": 0, "end": 16000}])
    audio = np.zeros(16000, dtype=np.float32)

    c2s_r, c2s_w = _os.pipe()
    s2c_r, s2c_w = _os.pipe()
    engine_server = EngineServer(
        server.hooks(), stdin=_os.fdopen(c2s_r, "r"), stdout=_os.fdopen(s2c_w, "w")
    )
    thread = threading.Thread(target=engine_server.run, daemon=True)
    thread.start()
    to_server = _os.fdopen(c2s_w, "w")
    from_server = _os.fdopen(s2c_r, "r")

    def roundtrip(command):
        to_server.write(json.dumps(command) + "\n")
        to_server.flush()
        return json.loads(from_server.readline())

    assert json.loads(from_server.readline())["success"]  # init line
    r1 = roundtrip(
        {
            "action": "transcribe",
            "request_id": 1,
            "audio_base64": pcm_b64(audio),
            "audio_format": "pcm_s16le",
            "sample_rate": 16000,
        }
    )
    assert r1["request_id"] == 1 and r1["text"] == "你好世界"
    assert r1["input_mode"] == "memory"
    r2 = roundtrip({"action": "stats", "request_id": 2})
    assert r2["stats"]["transcription_count"] == 1
    r3 = roundtrip({"action": "exit", "request_id": 3})
    assert r3["request_id"] == 3
    thread.join(timeout=5)
    assert not thread.is_alive()


def test_unsupported_engine_rejected():
    with pytest.raises(ValueError):
        Qwen3EngineServer(engine="whisper-large", model_factory=lambda p: None, vad_factory=FakeVad)


def test_long_form_option_routes_through_batched_pipeline():
    class BatchModel(FakeModel):
        def transcribe_batch(self, clips):
            self.calls.append([len(c) for c in clips])
            return [
                types.SimpleNamespace(text=f"seg{i}", language="zh", tokens=[])
                for i in range(len(clips))
            ]

    model = BatchModel()
    segments = [
        {"start": 0, "end": 16000},
        {"start": 32000, "end": 48000},
    ]
    server, _m, _v = make_server(segments=segments, model=model)
    server.initialize()
    audio = np.zeros(4 * 16000, dtype=np.float32)
    result = server.transcribe(
        audio_base64=pcm_b64(audio),
        audio_format="pcm_s16le",
        sample_rate=16000,
        options={"long_form": True},
    )
    assert result["success"] and result.get("long_form") is True
    # both VAD segments fit one ≤28 s window → a single batched clip
    assert result["text"] == "seg0"
    assert result["vad_segments"] == 1
    assert model.calls == [[49920]]  # one merged window + 120 ms pad


def test_long_form_window_cap_option_splits_windows():
    """options.long_form_max_window_seconds caps each transcription window,
    so the same audio that merged into one window above now splits."""

    class BatchModel(FakeModel):
        def transcribe_batch(self, clips):
            self.calls.append([len(c) for c in clips])
            return [
                types.SimpleNamespace(text=f"seg{i}", language="zh", tokens=[])
                for i in range(len(clips))
            ]

    model = BatchModel()
    segments = [
        {"start": 0, "end": 16000},
        {"start": 32000, "end": 48000},
    ]
    server, _m, _v = make_server(segments=segments, model=model)
    server.initialize()
    audio = np.zeros(4 * 16000, dtype=np.float32)
    result = server.transcribe(
        audio_base64=pcm_b64(audio),
        audio_format="pcm_s16le",
        sample_rate=16000,
        options={"long_form": True, "long_form_max_window_seconds": 1.5},
    )
    assert result["success"] and result.get("long_form") is True
    assert result["vad_segments"] == 2  # window budget forces a split
    assert result["text"] == "seg0 seg1"  # ASCII boundary join adds a space
    assert len(model.calls) == 1 and len(model.calls[0]) == 2

    # Out-of-range / garbage values fall back to the default budget.
    result = server.transcribe(
        audio_base64=pcm_b64(audio),
        audio_format="pcm_s16le",
        sample_rate=16000,
        options={"long_form": True, "long_form_max_window_seconds": "bogus"},
    )
    assert result["success"] and result["vad_segments"] == 1


def test_vad_prefix_reuse_on_growing_interim_stream():
    """A growing interim buffer on one stream rides the incremental VAD
    prefix path: only the new tail is re-scored and the stats counter
    reflects the reused ticks; a fresh stream key starts cold."""
    from light_whisper_tpu.audio import fbank as kfb

    class PrefixFakeVad:
        def __init__(self):
            self.scored_samples = []

        def probabilities(self, audio):
            audio = np.asarray(audio, dtype=np.float32).reshape(-1)
            self.scored_samples.append(len(audio))
            return np.ones(kfb.num_frames(len(audio)), dtype=np.float32)

        def speech_timestamps(self, audio, probs=None):
            n = len(np.asarray(audio).reshape(-1))
            return [{"start": 0, "end": n}]

        def warmup(self):
            pass

    vad = PrefixFakeVad()
    server, _model, _ = make_server(vad=vad)
    server.initialize()
    rng = np.random.default_rng(9)
    full = (rng.standard_normal(16000 * 7) * 0.3).astype(np.float32)

    for end in (96000, 104000, 112000):
        r = server.transcribe(
            audio_base64=pcm_b64(full[:end]),
            audio_format="pcm_s16le",
            sample_rate=16000,
            options={"stream": "s1"},
        )
        assert r["success"]

    stats = server.performance_stats()
    assert stats["vad_prefix_reuse"] == 2
    # Ticks 2 and 3 scored only the tail (+halo), not the whole buffer.
    assert vad.scored_samples[0] == 96000
    assert vad.scored_samples[1] < 104000 and vad.scored_samples[2] < 112000

    # A different stream key must not stitch onto s1's cache.
    r = server.transcribe(
        audio_base64=pcm_b64(full[:96000]),
        audio_format="pcm_s16le",
        sample_rate=16000,
        options={"stream": "s2"},
    )
    assert r["success"]
    assert server.performance_stats()["vad_prefix_reuse"] == 2


def test_corrupt_artifact_yields_typed_init_error(tmp_path):
    """A truncated/corrupt download must surface as a typed ``init_error``
    response (the UI routes on it — reference ``qwen3_asr_server.py:180-228``),
    never as an unhandled exception out of initialize()."""
    bad = tmp_path / "corrupt.gguf"
    bad.write_bytes(b"GGUF" + b"\x00" * 64)  # right magic, garbage after
    server = Qwen3EngineServer(engine="qwen3-asr-0.6b", model_path=str(bad))
    result = server.initialize()
    assert result["success"] is False
    assert result["type"] == "init_error"
    assert server.model is None
    # status keeps reporting the stored failure, not a crash
    status = server.check_status()
    assert status["initialized"] is False


def test_background_ladder_mode_defers_deep_buckets(monkeypatch):
    """LWT_WARMUP_LADDER=bg warms the ≤2 s buckets synchronously and walks
    the full ladder on a background thread AFTER init — the cold-start
    budget fix (the shell kills engines not ready in 120 s,
    funasr_service.rs:273)."""
    import threading
    import sys as _sys

    _sys.path.insert(0, "tests")
    from helpers.tiny_model import write_tiny_model
    import tempfile, os as _os

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
    import light_whisper_tpu.serving.incremental as inc_mod

    calls = []
    done = threading.Event()

    real_ladder = inc_mod.warmup_ladder

    def spy(model, **kw):
        calls.append((threading.current_thread().name, kw.get("max_seconds")))
        if kw.get("max_seconds") is None:
            done.set()
        return 0

    monkeypatch.setattr(inc_mod, "warmup_ladder", spy)
    monkeypatch.setenv("LWT_WARMUP_LADDER", "bg:5")

    path = _os.path.join(tempfile.gettempdir(), "lwt_bg_ladder_tiny.gguf")
    write_tiny_model(path, quantize=True)
    model = Qwen3ASRModel(path, max_new_tokens=4)
    server = Qwen3EngineServer(
        engine="qwen3-asr-0.6b", model_factory=lambda _p: model, model_path=path
    )
    assert server.initialize()["success"]
    assert done.wait(timeout=30), "background ladder never ran"
    # first call synchronous with the ≤2 s cap, second on a non-main thread
    assert calls[0][1] == 2.0
    assert calls[0][0] == "MainThread"
    assert calls[1][1] is None
    assert calls[1][0] != "MainThread"
    assert real_ladder is not inc_mod.warmup_ladder  # spy actually used


def test_bg_ladder_yields_to_live_requests():
    """The background ladder's gate: warmup ticks must not start while a
    transcribe is in flight (_device_idle clears on entry, sets on exit),
    and time spent yielding must not count against the ladder budget."""
    import threading

    server, model, _vad = make_server(segments=[{"start": 0, "end": 16000}])
    assert server.initialize()["success"]
    assert server._device_idle.is_set()

    entered = threading.Event()
    release = threading.Event()
    orig = model.transcribe

    def slow(audio):
        entered.set()
        release.wait(timeout=10)
        return orig(audio)

    model.transcribe = slow
    t = threading.Thread(
        target=server.transcribe,
        kwargs=dict(
            audio_base64=pcm_b64(np.random.default_rng(0).standard_normal(16000) * 0.1),
            audio_format="pcm_s16le",
            sample_rate=16000,
        ),
    )
    t.start()
    assert entered.wait(timeout=10)
    assert not server._device_idle.is_set()  # gate closed while in flight
    release.set()
    t.join(timeout=10)
    assert server._device_idle.is_set()  # gate reopens at exit


