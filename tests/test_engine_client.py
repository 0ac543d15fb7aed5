"""Engine client protocol robustness over in-memory pipes.

Mirrors the Rust client's pinned behaviors (``funasr_service.rs:1978-2072``):
noise-line skipping, mixed-line JSON recovery, non-UTF8 tolerance,
stale-request_id rejection, legacy no-request_id acceptance.
"""

import io
import json
import threading

import numpy as np
import pytest

from light_whisper_tpu.runtime.client import (
    EngineClient,
    EngineCrashed,
    EngineTimeout,
    _extract_json,
)


class ScriptedStdout:
    """Feeds pre-scripted lines, then blocks or EOFs."""

    def __init__(self, lines, eof=True):
        self.lines = list(lines)
        self.eof = eof

    def readline(self):
        if self.lines:
            return self.lines.pop(0)
        return "" if self.eof else ""


def make_client(out_lines):
    stdin = io.StringIO()
    stdout = ScriptedStdout(out_lines)
    return EngineClient(stdin, stdout), stdin


def test_extract_json_variants():
    assert _extract_json('{"a": 1}') == {"a": 1}
    assert _extract_json("") is None
    assert _extract_json("random noise") is None
    assert _extract_json('some lib spew {"ok": true} trailing') == {"ok": True}
    assert _extract_json("[1,2,3]") is None  # non-object JSON is not a response
    assert _extract_json("brace { but not json }") is None


def test_init_skips_noise_lines():
    client, _ = make_client(
        [
            "loading CUDA kernels...\n",
            "\n",
            'WARNING blah {"not": "matching"?\n',
            '{"success": true, "engine": "qwen3-asr-0.6b"}\n',
        ]
    )
    result = client.wait_for_init(timeout=5)
    assert result["success"] is True


def test_request_correlates_and_discards_stale():
    client, stdin = make_client(
        [
            '{"success": true, "text": "stale", "request_id": 99}\n',
            '{"success": true, "text": "fresh", "request_id": 1}\n',
        ]
    )
    result = client.request({"action": "status"}, timeout=5)
    assert result["text"] == "fresh"
    sent = json.loads(stdin.getvalue())
    assert sent["request_id"] == 1


def test_legacy_response_without_request_id_accepted():
    client, _ = make_client(['{"success": true, "text": "legacy"}\n'])
    result = client.request({"action": "status"}, timeout=5)
    assert result["text"] == "legacy"


def test_mixed_line_json_recovery():
    client, _ = make_client(
        ['[third-party noise] {"success": true, "request_id": 1} \n']
    )
    assert client.request({"action": "status"}, timeout=5)["success"] is True


def test_eof_raises_crash():
    client, _ = make_client([])
    with pytest.raises(EngineCrashed):
        client.request({"action": "status"}, timeout=5)


def test_request_ids_are_monotonic():
    client, stdin = make_client(
        [
            '{"success": true, "request_id": 1}\n',
            '{"success": true, "request_id": 2}\n',
        ]
    )
    client.request({"action": "status"}, timeout=5)
    client.request({"action": "stats"}, timeout=5)
    lines = stdin.getvalue().splitlines()
    assert [json.loads(l)["request_id"] for l in lines] == [1, 2]


def test_short_pcm_zero_padded():
    client, stdin = make_client(
        ['{"success": true, "request_id": 1, "input_mode": "memory"}\n']
    )
    samples = np.ones(1000, dtype="<i2")  # 1000 < 8000 (0.5 s @ 16 kHz)
    client.transcribe_pcm16(samples, 16000)
    sent = json.loads(stdin.getvalue())
    import base64

    decoded = np.frombuffer(base64.b64decode(sent["audio_base64"]), dtype="<i2")
    assert len(decoded) == 8000
    assert (decoded[:1000] == 1).all() and (decoded[1000:] == 0).all()


def test_end_to_end_against_real_server_over_pipes():
    """Client ↔ real EngineServer wired through OS pipes in one process."""
    import os

    import types

    from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
    from light_whisper_tpu.runtime.server import EngineServer

    class FakeModel:
        def transcribe(self, audio):
            return types.SimpleNamespace(text="hello", language="en", tokens=[])

        def warmup(self):
            pass

    class FakeVad:
        def __init__(self, segments):
            self.segments = segments

        def speech_timestamps(self, audio):
            return self.segments

        def warmup(self):
            pass

    # build server with fakes
    c2s_r, c2s_w = os.pipe()
    s2c_r, s2c_w = os.pipe()
    server_stdin = os.fdopen(c2s_r, "r")
    server_stdout = os.fdopen(s2c_w, "w")
    client_stdin = os.fdopen(c2s_w, "w")
    client_stdout = os.fdopen(s2c_r, "r")

    engine = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda p: FakeModel(),
        vad_factory=lambda: FakeVad([{"start": 0, "end": 16000}]),
        model_path="/fake/m.gguf",
    )
    server = EngineServer(engine.hooks(), stdin=server_stdin, stdout=server_stdout)
    thread = threading.Thread(target=server.run, daemon=True)
    thread.start()

    client = EngineClient(client_stdin, client_stdout)
    init = client.wait_for_init(timeout=10)
    assert init["success"]

    samples = (np.zeros(16000) * 32767).astype("<i2")
    result = client.transcribe_pcm16(samples, 16000, hot_words=["JAX"])
    assert result["success"] and result["input_mode"] == "memory"
    assert result["request_id"] == 1

    stats = client.stats()
    assert stats["stats"]["transcription_count"] == 1

    client.shutdown()
    thread.join(timeout=5)
    assert not thread.is_alive()


def test_transcribe_rejects_oversized_audio():
    """64 MB raw-audio IPC cap (reference commands/funasr.rs:17-25)."""
    import numpy as np
    import pytest

    from light_whisper_tpu.runtime.client import MAX_AUDIO_BYTES, EngineClient

    client = EngineClient.__new__(EngineClient)  # no process needed: cap precedes IO
    too_big = np.zeros(MAX_AUDIO_BYTES // 2 + 1, dtype="<i2")
    with pytest.raises(ValueError, match="audio too large"):
        client.transcribe_pcm16(too_big, 16000)


# -- inline→path transport negotiation (funasr_service.rs:1162-1251) ---------


def test_inline_accepted_pins_memory_transport():
    client, stdin = make_client(
        [
            '{"success": true, "request_id": 1, "input_mode": "memory"}\n',
            '{"success": true, "request_id": 2, "input_mode": "memory"}\n',
        ]
    )
    samples = np.ones(16000, dtype="<i2")
    client.transcribe_pcm16(samples, 16000)
    client.transcribe_pcm16(samples, 16000)
    sent = [json.loads(l) for l in stdin.getvalue().splitlines()]
    assert all("audio_base64" in s and "audio_path" not in s for s in sent)
    assert client._inline_transport is True


def test_legacy_path_only_runtime_triggers_wav_fallback(tmp_path):
    # First response has no input_mode (legacy runtime) → client retries via
    # temp WAV and pins the path transport for later calls.
    seen_paths = []

    class RecordingStdout(ScriptedStdout):
        pass

    client, stdin = make_client(
        [
            '{"success": true, "request_id": 1}\n',
            '{"success": true, "request_id": 2, "text": "via path"}\n',
            '{"success": true, "request_id": 3, "text": "still path"}\n',
        ]
    )
    samples = (np.sin(np.arange(16000) / 20) * 1000).astype("<i2")
    result = client.transcribe_pcm16(samples, 16000)
    assert result["text"] == "via path"
    sent = [json.loads(l) for l in stdin.getvalue().splitlines()]
    assert "audio_base64" in sent[0]
    assert "audio_path" in sent[1] and sent[1]["audio_path"].endswith(".wav")
    assert client._inline_transport is False
    # pinned: the next call goes straight to the path transport
    client.transcribe_pcm16(samples, 16000)
    sent = [json.loads(l) for l in stdin.getvalue().splitlines()]
    assert "audio_path" in sent[2]
    # temp WAVs are cleaned up
    import glob
    import tempfile

    leftovers = glob.glob(
        f"{tempfile.gettempdir()}/light_whisper_audio_*"
    )
    assert leftovers == []


def test_inline_error_shape_triggers_fallback():
    client, stdin = make_client(
        [
            '{"success": false, "request_id": 1, "input_mode": "other", '
            '"error": "expected str, bytes or os.PathLike object"}\n',
            '{"success": true, "request_id": 2, "text": "ok"}\n',
        ]
    )
    samples = np.ones(16000, dtype="<i2")
    result = client.transcribe_pcm16(samples, 16000)
    assert result["text"] == "ok"
    assert client._inline_transport is False


def test_unrecognized_inline_error_retries_via_path_and_pins_after_two():
    # A legacy runtime whose inline-rejection text matches none of the known
    # markers: the client must still reach it via the path transport (the
    # reference pins path for ANY missing input_mode) — but a single
    # occurrence is indistinguishable from a transient engine blip that
    # recovered by retry time, so the path verdict pins only after TWO
    # consecutive inline failures whose path retry succeeded.
    client, stdin = make_client(
        [
            '{"success": false, "request_id": 1, "error": "unbekannter Fehler"}\n',
            '{"success": true, "request_id": 2, "text": "via path"}\n',
            '{"success": false, "request_id": 3, "error": "unbekannter Fehler"}\n',
            '{"success": true, "request_id": 4, "text": "via path again"}\n',
            '{"success": true, "request_id": 5, "text": "pinned path"}\n',
        ]
    )
    samples = np.ones(16000, dtype="<i2")
    result = client.transcribe_pcm16(samples, 16000)
    assert result["text"] == "via path"
    assert client._inline_transport is None  # strike 1: could be transient
    result = client.transcribe_pcm16(samples, 16000)
    assert result["text"] == "via path again"
    assert client._inline_transport is False  # strike 2: pinned
    client.transcribe_pcm16(samples, 16000)
    sent = [json.loads(l) for l in stdin.getvalue().splitlines()]
    assert "audio_base64" in sent[0]
    assert "audio_path" in sent[1]
    assert "audio_base64" in sent[2]  # inline retried after one blip
    assert "audio_path" in sent[3]
    assert "audio_path" in sent[4]  # pinned: no inline attempt


def test_transient_engine_error_leaves_transport_unprobed():
    # Both the inline attempt and the path retry fail (a genuine engine
    # error, e.g. init failure): no verdict is pinned, and the next request
    # tries inline again rather than inheriting the failure.
    client, stdin = make_client(
        [
            '{"success": false, "request_id": 1, "error": "worker exploded"}\n',
            '{"success": false, "request_id": 2, "error": "worker exploded"}\n',
            '{"success": true, "request_id": 3, "input_mode": "memory", "text": "ok"}\n',
        ]
    )
    samples = np.ones(16000, dtype="<i2")
    result = client.transcribe_pcm16(samples, 16000)
    assert result["success"] is False
    assert client._inline_transport is None
    result2 = client.transcribe_pcm16(samples, 16000)
    assert result2["text"] == "ok"
    assert client._inline_transport is True
    sent = [json.loads(l) for l in stdin.getvalue().splitlines()]
    assert "audio_base64" in sent[0]
    assert "audio_path" in sent[1]
    assert "audio_base64" in sent[2]


def test_non_16k_audio_rides_wav_path_preserving_rate():
    client, stdin = make_client(
        ['{"success": true, "request_id": 1, "input_mode": "path"}\n']
    )
    samples = np.ones(48000, dtype="<i2")
    client.transcribe_pcm16(samples, 48000)
    sent = json.loads(stdin.getvalue().splitlines()[0])
    assert "audio_path" in sent and "audio_base64" not in sent


def test_wav_fallback_payload_is_bit_exact(tmp_path, monkeypatch):
    # Capture the WAV the client writes and confirm samples survive exactly.
    import wave

    captured = {}
    real_request = EngineClient.request

    def spy_request(self, command, timeout=60.0):
        if "audio_path" in command:
            with wave.open(command["audio_path"], "rb") as w:
                captured["rate"] = w.getframerate()
                captured["data"] = np.frombuffer(
                    w.readframes(w.getnframes()), dtype="<i2"
                ).copy()
        return real_request(self, command, timeout)

    monkeypatch.setattr(EngineClient, "request", spy_request)
    client, stdin = make_client(
        ['{"success": true, "request_id": 1, "input_mode": "path"}\n']
    )
    client._inline_transport = False
    samples = (np.arange(-16000, 0) % 32767).astype("<i2")
    client.transcribe_pcm16(samples, 16000)
    assert captured["rate"] == 16000
    np.testing.assert_array_equal(captured["data"], samples)


def test_timeout_bounds_a_silently_hung_engine():
    """A hung engine that prints NOTHING must still hit the timeout: a
    blocking readline on the caller thread can never honor a deadline."""
    import io
    import os
    import time

    from light_whisper_tpu.runtime.client import EngineClient, EngineTimeout

    r_fd, w_fd = os.pipe()  # never written: simulates a wedged engine
    stdout = os.fdopen(r_fd, "r")
    stdin = io.StringIO()
    client = EngineClient(stdin, stdout)
    t0 = time.monotonic()
    try:
        with pytest.raises(EngineTimeout):
            client.wait_for_init(timeout=0.3)
        assert time.monotonic() - t0 < 5.0
    finally:
        os.close(w_fd)
        stdout.close()


def test_generic_nonetype_error_does_not_pin_path_transport():
    """A transient AttributeError mentioning NoneType is NOT an
    inline-rejection signature; it must leave the transport unprobed."""
    from light_whisper_tpu.runtime.client import (
        _response_indicates_inline_unsupported,
    )

    assert not _response_indicates_inline_unsupported(
        {"success": False, "error": "'NoneType' object has no attribute 'get'"}
    )
    # the legacy mishandled-as-filename TypeError still pins
    assert _response_indicates_inline_unsupported(
        {
            "success": False,
            "error": "expected str, bytes or os.PathLike object, not NoneType",
        }
    )
