"""Cloud ASR backends over fake transports."""

import base64
import json

import numpy as np
import pytest

from light_whisper_tpu.audio.pcm import encode_wav_mono_s16
from light_whisper_tpu.cloud.asr import (
    CloudAsrError,
    alibaba_model_uses_omni_chat,
    dashscope_transcribe,
    exceeds_dashscope_limit,
    glm_transcribe,
)


def wav(seconds=1.0):
    return encode_wav_mono_s16(np.zeros(int(16000 * seconds), np.float32), 16000)


class FakeMultipart:
    def __init__(self, status=200, body='{"text": "你好"}'):
        self.status = status
        self.body = body
        self.calls = []

    def post_multipart(self, url, headers, fields, file_field, timeout):
        self.calls.append((url, headers, fields, file_field))
        return self.status, self.body


class FakeJson:
    def __init__(self, status=200, payload=None, stream_lines=None):
        self.status = status
        self.payload = payload
        self.stream_lines = stream_lines
        self.calls = []

    def post_json(self, url, headers, body, timeout):
        self.calls.append((url, headers, body))
        if self.stream_lines is not None:
            return self.status, True, self.stream_lines
        return self.status, False, json.dumps(self.payload)


def test_glm_happy_path_with_hotwords():
    transport = FakeMultipart()
    result = glm_transcribe(wav(), "key", hot_words=["JAX"], transport=transport)
    assert result.success and result.text == "你好"
    url, headers, fields, file_field = transport.calls[0]
    assert url.endswith("/api/paas/v4/audio/transcriptions")
    assert headers["Authorization"] == "Bearer key"
    assert fields["model"] == "glm-asr-2512"
    assert json.loads(fields["hotwords"]) == ["JAX"]
    assert file_field[1] == "audio.wav"


def test_glm_limits():
    with pytest.raises(CloudAsrError):
        glm_transcribe(wav(), "", transport=FakeMultipart())  # no key
    with pytest.raises(CloudAsrError):
        glm_transcribe(b"x" * (26 * 1024 * 1024), "key", transport=FakeMultipart())
    with pytest.raises(CloudAsrError):
        glm_transcribe(wav(seconds=31), "key", transport=FakeMultipart())


def test_glm_api_error_code_is_failed_result_not_exception():
    transport = FakeMultipart(body='{"code": 1210, "message": "invalid audio"}')
    result = glm_transcribe(wav(), "key", transport=transport)
    assert not result.success and result.error == "invalid audio"


def test_dashscope_limit_accounts_for_base64_inflation():
    assert not exceeds_dashscope_limit(7 * 1024 * 1024)
    assert exceeds_dashscope_limit(8 * 1024 * 1024)  # 8MB * 4/3 > 10MB


def test_dashscope_asr_path():
    payload = {
        "output": {
            "choices": [{"message": {"content": [{"text": "今天天气"}]}}]
        }
    }
    transport = FakeJson(payload=payload)
    result = dashscope_transcribe(wav(), "key", model="qwen3-asr-flash", transport=transport)
    assert result.success and result.text == "今天天气"
    url, headers, body = transport.calls[0]
    assert url.endswith("/multimodal-generation/generation")
    assert body["parameters"]["asr_options"]["enable_itn"] is True
    audio_url = body["input"]["messages"][1]["content"][0]["audio"]
    assert audio_url.startswith("data:audio/wav;base64,")
    base64.b64decode(audio_url.split(",", 1)[1])  # valid base64


def test_dashscope_api_error_code():
    transport = FakeJson(payload={"code": "InvalidParameter", "message": "bad"})
    result = dashscope_transcribe(wav(), "key", transport=transport)
    assert not result.success and result.error == "bad"


def test_omni_chat_streaming_path():
    assert alibaba_model_uses_omni_chat("qwen3-omni-flash")
    assert not alibaba_model_uses_omni_chat("qwen3-asr-flash")
    lines = [
        'data: {"choices":[{"delta":{"content":"你好"}}]}',
        "data: not-json-chunk",
        'data: {"choices":[{"delta":{"content":"世界"}}]}',
        "data: [DONE]",
    ]
    transport = FakeJson(stream_lines=lines)
    result = dashscope_transcribe(wav(), "key", model="qwen3-omni-flash", transport=transport)
    assert result.success and result.text == "你好世界"
    url, headers, body = transport.calls[0]
    assert url.endswith("/compatible-mode/v1/chat/completions")
    assert body["stream"] is True
    assert body["messages"][1]["content"][0]["type"] == "input_audio"


def test_omni_stream_error_fails_even_with_partial_text():
    """A stream error fails the whole request even if deltas arrived before
    it (alibaba_asr_service.rs:248-249 returns Err unconditionally)."""
    lines = [
        'data: {"choices":[{"delta":{"content":"你好"}}]}',
        'data: {"error":{"message":"quota exceeded"}}',
        "data: [DONE]",
    ]
    with pytest.raises(CloudAsrError, match="quota exceeded"):
        dashscope_transcribe(
            wav(), "key", model="qwen3-omni-flash",
            transport=FakeJson(stream_lines=lines),
        )


def test_omni_empty_stream_is_actionable_error_not_empty_success():
    """An empty stream usually means upstream refusal/quota — surface an
    actionable error, never a silent empty transcript
    (alibaba_asr_service.rs:252-258)."""
    with pytest.raises(CloudAsrError, match="为空"):
        dashscope_transcribe(
            wav(), "key", model="qwen3-omni-flash",
            transport=FakeJson(stream_lines=["data: [DONE]"]),
        )


def test_dashscope_http_error_includes_body():
    """HTTP-level failures carry the response body like the reference
    (alibaba_asr_service.rs:97-102)."""

    class FailTransport:
        def post_json(self, url, headers, body, timeout):
            return 400, False, '{"message":"InvalidParameter.audio"}'

    with pytest.raises(CloudAsrError, match="InvalidParameter.audio"):
        dashscope_transcribe(wav(), "key", transport=FailTransport())


def test_transcribe_online_resolves_config_and_secrets(tmp_path, monkeypatch):
    """The orchestration wires engine.json (engine/region/model/endpoint) and
    the secret store's engine+region key slot (funasr.rs:139-178)."""
    import json as _json

    from light_whisper_tpu.cloud.asr import CloudAsrError, transcribe_online
    from light_whisper_tpu.runtime import config
    from light_whisper_tpu.storage.secrets import SERVICE, SecretStore

    monkeypatch.setenv("LIGHT_WHISPER_DATA_DIR", str(tmp_path))
    store = SecretStore(str(tmp_path / "secrets.json"))

    # local engine configured → typed refusal
    config.write_engine_config("qwen3-asr-0.6b")
    with pytest.raises(CloudAsrError, match="在线"):
        transcribe_online(b"RIFF", secret_store=store)

    # alibaba domestic: key slot + model + endpoint all resolved from config
    config.write_engine_config("alibaba-asr")
    config.write_alibaba_region("domestic")
    config.write_alibaba_model("qwen3-asr-flash")
    store.set_password(SERVICE, "alibaba-asr-cn-api-key", "sk-ali")

    calls = {}

    class FakeJsonTransport:
        def post_json(self, url, headers, body, timeout):
            calls["url"] = url
            calls["auth"] = headers.get("Authorization")
            calls["model"] = body.get("model")
            return 200, False, {
                "output": {"choices": [{"message": {"content": [{"text": "你好"}]}}]}
            }

    wav_bytes = wav()
    result = transcribe_online(wav_bytes, secret_store=store, transport=FakeJsonTransport())
    assert result.text == "你好"
    assert calls["auth"] == "Bearer sk-ali"
    assert "dashscope.aliyuncs.com" in calls["url"]
    assert calls["model"] == "qwen3-asr-flash"

    # missing key → the backend's typed refusal
    store.delete_password(SERVICE, "alibaba-asr-cn-api-key")
    with pytest.raises(CloudAsrError, match="Key"):
        transcribe_online(wav_bytes, secret_store=store, transport=FakeJsonTransport())
