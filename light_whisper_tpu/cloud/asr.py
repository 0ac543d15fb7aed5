"""Cloud ASR backends: GLM-ASR and Alibaba DashScope.

Ports of the reference's online engines (``glm_asr_service.rs``,
``alibaba_asr_service.rs``) — the two alternatives the shell's engine
switcher offers alongside the local engines:

- **GLM**: multipart WAV upload to ``/api/paas/v4/audio/transcriptions``,
  model ``glm-asr-2512``, hot words as a JSON form field; limits 25 MiB /
  30 s of audio; API-level error codes surface as failed results, not
  exceptions.
- **DashScope**: two wire paths chosen by model id — ``qwen3-asr-*`` goes
  through the multimodal-generation endpoint with a base64 data-URL,
  ``*omni*`` models through the OpenAI-compatible chat endpoint with SSE
  streaming. The 10 MB request-body cap accounts for base64's 4/3 inflation
  *before* upload (a 9 MB local file would otherwise 400 server-side).

Transports are injectable for offline tests.
"""

from __future__ import annotations

import base64
import dataclasses
import io
import json
import wave
from typing import Any, Dict, List, Optional, Sequence

GLM_ASR_PATH = "/api/paas/v4/audio/transcriptions"
GLM_ASR_MODEL = "glm-asr-2512"
GLM_MAX_AUDIO_BYTES = 25 * 1024 * 1024
GLM_MAX_AUDIO_SECONDS = 30.0
GLM_DEFAULT_ENDPOINT = "https://open.bigmodel.cn"

DASHSCOPE_ASR_PATH = "/api/v1/services/aigc/multimodal-generation/generation"
DASHSCOPE_OMNI_PATH = "/compatible-mode/v1/chat/completions"
DASHSCOPE_MAX_BASE64_BYTES = 10 * 1024 * 1024
DASHSCOPE_DEFAULT_ENDPOINT = "https://dashscope.aliyuncs.com"
DASHSCOPE_DEFAULT_MODEL = "qwen3-asr-flash"


@dataclasses.dataclass
class CloudTranscription:
    text: str
    success: bool
    error: Optional[str] = None


class CloudAsrError(RuntimeError):
    pass


def _wav_duration_seconds(wav_bytes: bytes) -> Optional[float]:
    try:
        with wave.open(io.BytesIO(wav_bytes), "rb") as reader:
            rate = reader.getframerate()
            if rate > 0:
                return reader.getnframes() / rate
    except Exception:
        return None
    return None


def exceeds_dashscope_limit(raw_len: int) -> bool:
    """Base64-inflated size (raw·4/3, padded) against the body cap."""
    return (raw_len + 2) // 3 * 4 > DASHSCOPE_MAX_BASE64_BYTES


def alibaba_model_uses_omni_chat(model: str) -> bool:
    return "omni" in model


# ---------------------------------------------------------------------------
# GLM
# ---------------------------------------------------------------------------


def glm_transcribe(
    wav_bytes: bytes,
    api_key: str,
    hot_words: Sequence[str] = (),
    endpoint: str = GLM_DEFAULT_ENDPOINT,
    transport=None,
) -> CloudTranscription:
    if not api_key:
        raise CloudAsrError("GLM-ASR API Key 未配置")
    if len(wav_bytes) > GLM_MAX_AUDIO_BYTES:
        raise CloudAsrError(
            f"GLM-ASR 音频过大：{len(wav_bytes) / 1048576:.1f} MiB，超过 25 MiB 上传上限"
        )
    duration = _wav_duration_seconds(wav_bytes)
    if duration is not None and duration > GLM_MAX_AUDIO_SECONDS:
        raise CloudAsrError(f"GLM-ASR 音频时长过长：{duration:.1f} 秒，超过 30 秒上限")

    fields = {"model": GLM_ASR_MODEL, "stream": "false"}
    if hot_words:
        fields["hotwords"] = json.dumps(list(hot_words)[:100], ensure_ascii=False)

    transport = transport or _default_multipart_transport()
    status, body = transport.post_multipart(
        endpoint.rstrip("/") + GLM_ASR_PATH,
        {"Authorization": f"Bearer {api_key}"},
        fields,
        file_field=("file", "audio.wav", "audio/wav", wav_bytes),
        timeout=30.0,
    )
    if not 200 <= status < 300:
        raise CloudAsrError(f"GLM-ASR HTTP {status}: {body[:200]}")
    parsed = json.loads(body)
    code = parsed.get("code")
    if code not in (None, 0):
        return CloudTranscription(
            text="",
            success=False,
            error=parsed.get("message") or f"GLM-ASR 错误码: {code}",
        )
    return CloudTranscription(text=parsed.get("text") or "", success=True)


# ---------------------------------------------------------------------------
# DashScope
# ---------------------------------------------------------------------------


def dashscope_asr_request_body(model: str, wav_bytes: bytes) -> Dict[str, Any]:
    data_url = "data:audio/wav;base64," + base64.b64encode(wav_bytes).decode()
    return {
        "model": model,
        "input": {
            "messages": [
                {"role": "system", "content": [{"text": ""}]},
                {"role": "user", "content": [{"audio": data_url}]},
            ]
        },
        "parameters": {"asr_options": {"enable_itn": True}},
    }


def omni_chat_request_body(model: str, wav_bytes: bytes) -> Dict[str, Any]:
    data_url = "data:;base64," + base64.b64encode(wav_bytes).decode()
    return {
        "model": model,
        "stream": True,
        "stream_options": {"include_usage": False},
        "modalities": ["text"],
        "messages": [
            {
                "role": "system",
                "content": "You are a professional speech recognizer. Transcribe "
                "the audio verbatim. Output only the transcription with no extra "
                "commentary.",
            },
            {
                "role": "user",
                "content": [
                    {
                        "type": "input_audio",
                        "input_audio": {"data": data_url, "format": "wav"},
                    },
                    {
                        "type": "text",
                        "text": "Please transcribe this audio into text. Return "
                        "the transcription only.",
                    },
                ],
            },
        ],
    }


def _parse_dashscope_asr_response(body: str) -> CloudTranscription:
    parsed = json.loads(body)
    code = parsed.get("code")
    if code and code != "Success":
        return CloudTranscription(
            text="",
            success=False,
            error=parsed.get("message") or f"DashScope ASR 错误: {code}",
        )
    text = ""
    choices = (parsed.get("output") or {}).get("choices") or []
    if choices:
        content = (choices[0].get("message") or {}).get("content")
        if isinstance(content, str):
            text = content
        elif isinstance(content, list):
            text = "".join(
                part.get("text", "") for part in content if isinstance(part, dict)
            )
    return CloudTranscription(text=text, success=True)


def dashscope_transcribe(
    wav_bytes: bytes,
    api_key: str,
    model: str = DASHSCOPE_DEFAULT_MODEL,
    endpoint: str = DASHSCOPE_DEFAULT_ENDPOINT,
    transport=None,
) -> CloudTranscription:
    if not api_key:
        raise CloudAsrError("Alibaba DashScope API Key 未配置")
    if exceeds_dashscope_limit(len(wav_bytes)):
        raise CloudAsrError(
            f"音频过大：{len(wav_bytes) // 1048576} MB 经 base64 编码后超出 "
            f"DashScope 10 MB 请求体上限"
        )
    transport = transport or _default_json_transport()

    if alibaba_model_uses_omni_chat(model):
        status, is_stream, payload = transport.post_json(
            endpoint.rstrip("/") + DASHSCOPE_OMNI_PATH,
            {
                "Authorization": f"Bearer {api_key}",
                "Accept": "text/event-stream",
            },
            omni_chat_request_body(model, wav_bytes),
            timeout=60.0,
        )
        if not 200 <= status < 300:
            body_text = "\n".join(payload) if is_stream else str(payload)
            raise CloudAsrError(f"DashScope Omni HTTP {status}: {body_text[:200]}")
        pieces: List[str] = []
        error: Optional[str] = None
        lines = payload if is_stream else str(payload).splitlines()
        for line in lines:
            line = line.strip()
            if not line.startswith("data:"):
                continue
            data = line[5:].strip()
            if not data or data == "[DONE]":
                continue
            try:
                chunk = json.loads(data)
            except json.JSONDecodeError:
                continue  # skip one corrupt chunk, keep the stream
            if chunk.get("error"):
                error = (chunk["error"] or {}).get("message") or "DashScope Omni 错误"
                continue
            for choice in chunk.get("choices") or []:
                delta = (choice.get("delta") or {}).get("content")
                if isinstance(delta, str):
                    pieces.append(delta)
        # Reference semantics (alibaba_asr_service.rs:248-258): a stream
        # error fails the whole request even if partial deltas arrived, and
        # an empty stream is an actionable error (quota/refusal), never a
        # silent empty transcript.
        if error:
            raise CloudAsrError(f"DashScope Omni 返回错误: {error}")
        text = "".join(pieces).strip()
        if not text:
            raise CloudAsrError(
                "DashScope Omni 流式响应为空，请检查模型可用性、额度或控制台日志"
            )
        return CloudTranscription(text=text, success=True)

    status, _is_stream, payload = transport.post_json(
        endpoint.rstrip("/") + DASHSCOPE_ASR_PATH,
        {"Authorization": f"Bearer {api_key}"},
        dashscope_asr_request_body(model, wav_bytes),
        timeout=60.0,
    )
    body = payload if isinstance(payload, str) else json.dumps(payload)
    if not 200 <= status < 300:
        # Reference includes the response body (alibaba_asr_service.rs:97-102)
        raise CloudAsrError(f"DashScope ASR HTTP {status}: {body[:200]}")
    return _parse_dashscope_asr_response(body)


# ---------------------------------------------------------------------------
# default transports (urllib)
# ---------------------------------------------------------------------------


def _default_json_transport():
    class _T:
        def post_json(self, url, headers, body, timeout):
            import urllib.request

            req = urllib.request.Request(
                url,
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json", **headers},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                content_type = resp.headers.get("Content-Type", "")
                raw = resp.read().decode("utf-8", "replace")
                if "text/event-stream" in content_type:
                    return resp.status, True, raw.splitlines()
                return resp.status, False, raw

    return _T()


def _default_multipart_transport():
    class _T:
        def post_multipart(self, url, headers, fields, file_field, timeout):
            import urllib.request
            import uuid

            boundary = uuid.uuid4().hex
            name, filename, mime, data = file_field
            parts = []
            for key, value in fields.items():
                parts.append(
                    f'--{boundary}\r\nContent-Disposition: form-data; name="{key}"\r\n\r\n{value}\r\n'.encode()
                )
            parts.append(
                f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"; '
                f'filename="{filename}"\r\nContent-Type: {mime}\r\n\r\n'.encode()
                + data
                + b"\r\n"
            )
            parts.append(f"--{boundary}--\r\n".encode())
            body = b"".join(parts)
            req = urllib.request.Request(
                url,
                data=body,
                headers={
                    "Content-Type": f"multipart/form-data; boundary={boundary}",
                    **headers,
                },
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")

    return _T()


# ---------------------------------------------------------------------------
# config-driven orchestration (the shell's online transcribe path,
# funasr.rs:139-178 — engine/region from engine.json, key from the store)
# ---------------------------------------------------------------------------


def transcribe_online(
    wav_bytes: bytes,
    hot_words: Sequence[str] = (),
    secret_store=None,
    transport=None,
) -> CloudTranscription:
    """Transcribe via the CONFIGURED online engine.

    Resolves everything the Rust shell resolves before calling a cloud
    backend: the active engine and region from ``engine.json``, the matching
    endpoint, and the API key from the secret store's engine+region slot.
    """
    from light_whisper_tpu.runtime import config
    from light_whisper_tpu.storage.secrets import SecretStore

    engine = config.read_engine_config()
    if not config.is_online_engine(engine):
        raise CloudAsrError(f"当前引擎不是在线引擎: {engine}")
    store = secret_store or SecretStore()
    if engine == "alibaba-asr":
        region = config.read_alibaba_region()
        api_key = store.online_asr_api_key(engine, region)
        return dashscope_transcribe(
            wav_bytes,
            api_key,
            model=config.read_alibaba_model(),
            endpoint=config.read_alibaba_endpoint(),
            transport=transport,
        )
    api_key = store.online_asr_api_key(engine)
    return glm_transcribe(
        wav_bytes,
        api_key,
        hot_words=hot_words,
        endpoint=config.read_glm_endpoint(),
        transport=transport,
    )
