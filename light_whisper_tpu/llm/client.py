"""Provider-agnostic LLM request builder + SSE stream readers.

Port of the reference's client core (``llm_client.rs``): one body builder
covering the three wire dialects (OpenAI chat completions, OpenAI Responses,
Anthropic messages), JSON-output and web-search injection, input-scaled
dynamic timeouts, 429 retries with backoff, streaming via SSE with a
non-stream fallback, and text extraction for all three response shapes.

The HTTP transport is injectable (offline tests use fakes); the default uses
urllib. Streaming callbacks receive incremental text deltas.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

from light_whisper_tpu.llm.provider import (
    ApiFormat,
    LlmEndpoint,
    ReasoningMode,
    apply_reasoning_controls,
    uses_responses_api,
)

MAX_OUTPUT_TOKENS = 4096
RETRY_DELAYS_SECONDS = (1.0, 3.0)


@dataclasses.dataclass
class LlmRequestOptions:
    stream: bool = True
    json_output: bool = False
    web_search: bool = False
    reasoning_mode: ReasoningMode = ReasoningMode.PROVIDER_DEFAULT


@dataclasses.dataclass
class LlmResponse:
    text: str
    raw: Optional[Dict[str, Any]] = None
    streamed: bool = False


class LlmHttpError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


# ---------------------------------------------------------------------------
# body building
# ---------------------------------------------------------------------------


def _chat_output_limit_key(endpoint: LlmEndpoint) -> str:
    # Newer OpenAI-compatible backends reject max_tokens; the reference
    # memoizes per-endpoint capability — default to the modern key for
    # openai itself, legacy key elsewhere.
    return "max_completion_tokens" if endpoint.provider == "openai" else "max_tokens"


def build_llm_body(
    endpoint: LlmEndpoint,
    system_prompt: str,
    user_text: str,
    options: LlmRequestOptions,
) -> Dict[str, Any]:
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        body: Dict[str, Any] = {
            "model": endpoint.model,
            "max_tokens": MAX_OUTPUT_TOKENS,
            "system": [
                {
                    "type": "text",
                    "text": system_prompt,
                    "cache_control": {"type": "ephemeral"},
                }
            ],
            "messages": [{"role": "user", "content": user_text}],
            "stream": options.stream,
        }
        apply_reasoning_controls(endpoint, body, options.reasoning_mode)
        if options.web_search:
            body.setdefault("tools", []).append(
                {"type": "web_search_20250305", "name": "web_search", "max_uses": 3}
            )
        return body

    responses_api = uses_responses_api(endpoint)
    if responses_api:
        body = {
            "model": endpoint.model,
            "instructions": system_prompt,
            "input": [
                {
                    "role": "developer",
                    "content": [
                        {
                            "type": "input_text",
                            "text": "Output json."
                            if options.json_output
                            else "Follow the system instructions exactly.",
                        }
                    ],
                },
                {
                    "role": "user",
                    "content": [{"type": "input_text", "text": user_text}],
                },
            ],
        }
        if options.json_output:
            body["text"] = {"format": {"type": "json_object"}}
        body["max_output_tokens"] = MAX_OUTPUT_TOKENS
    else:
        body = {
            "model": endpoint.model,
            "messages": [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_text},
            ],
        }
        if options.json_output:
            body["response_format"] = {"type": "json_object"}
        body[_chat_output_limit_key(endpoint)] = MAX_OUTPUT_TOKENS

    apply_reasoning_controls(endpoint, body, options.reasoning_mode)

    # Cerebras can't combine json_object with streaming; structured output
    # wins and the request silently degrades to non-stream.
    cerebras_json = (
        options.json_output and not responses_api and endpoint.provider == "cerebras"
    )
    if options.stream and not cerebras_json:
        body["stream"] = True

    if options.web_search:
        tool = (
            {"type": "web_search"}
            if responses_api
            else {"type": "web_search_preview", "web_search_preview": {}}
        )
        body.setdefault("tools", []).append(tool)
    return body


def dynamic_timeout(base_secs: int, text_len: int, web_search: bool) -> float:
    extra = text_len // 200
    tool_extra = 45 if web_search else 0
    return float(min(base_secs + extra + tool_extra, max(base_secs, 240)))


# ---------------------------------------------------------------------------
# response parsing
# ---------------------------------------------------------------------------


def extract_text(endpoint: LlmEndpoint, payload: Dict[str, Any]) -> str:
    """Full-response (non-stream) text across the three dialects."""
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        parts = payload.get("content", [])
        return "".join(
            p.get("text", "") for p in parts if isinstance(p, dict) and p.get("type") == "text"
        )
    if uses_responses_api(endpoint):
        if isinstance(payload.get("output_text"), str):
            return payload["output_text"]
        out = []
        for item in payload.get("output", []):
            if isinstance(item, dict) and item.get("type") == "message":
                for part in item.get("content", []):
                    if isinstance(part, dict) and part.get("type") == "output_text":
                        out.append(part.get("text", ""))
        return "".join(out)
    choices = payload.get("choices", [])
    if choices:
        message = choices[0].get("message", {})
        return message.get("content") or ""
    return ""


def iter_sse_events(lines: Iterable[str]) -> Iterator[Dict[str, Any]]:
    """Parse ``data: {...}`` SSE lines into JSON events (skipping keepalives)."""
    for line in lines:
        line = line.strip()
        if not line or not line.startswith("data:"):
            continue
        data = line[len("data:") :].strip()
        if data == "[DONE]":
            return
        try:
            yield json.loads(data)
        except json.JSONDecodeError:
            continue


def stream_delta(endpoint: LlmEndpoint, event: Dict[str, Any]) -> str:
    """Incremental text from one SSE event, per dialect."""
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        if event.get("type") == "content_block_delta":
            delta = event.get("delta", {})
            if delta.get("type") == "text_delta":
                return delta.get("text", "")
        return ""
    if uses_responses_api(endpoint):
        if event.get("type") == "response.output_text.delta":
            return event.get("delta", "")
        return ""
    choices = event.get("choices", [])
    if choices:
        return (choices[0].get("delta") or {}).get("content") or ""
    return ""


# ---------------------------------------------------------------------------
# transport + send
# ---------------------------------------------------------------------------


class UrllibLlmTransport:
    def post(self, url: str, headers: Dict[str, str], body: Dict[str, Any], timeout: float):
        """Returns (status, is_stream, lines_or_payload)."""
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json", **headers},
            method="POST",
        )
        try:
            resp = urllib.request.urlopen(req, timeout=timeout)
        except urllib.error.HTTPError as err:
            raise LlmHttpError(err.code, err.read().decode("utf-8", "replace")) from err
        content_type = resp.headers.get("Content-Type", "")
        if "text/event-stream" in content_type:
            return resp.status, True, (l.decode("utf-8", "replace") for l in resp)
        return resp.status, False, json.loads(resp.read().decode("utf-8", "replace"))


def auth_headers(endpoint: LlmEndpoint, api_key: str) -> Dict[str, str]:
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        return {"x-api-key": api_key, "anthropic-version": "2023-06-01"}
    return {"Authorization": f"Bearer {api_key}"}


def send_llm_request(
    endpoint: LlmEndpoint,
    system_prompt: str,
    user_text: str,
    api_key: str = "",
    options: Optional[LlmRequestOptions] = None,
    transport=None,
    on_delta: Optional[Callable[[str], None]] = None,
) -> LlmResponse:
    """Send with 429 retries; streams when the server does, else collects."""
    options = options or LlmRequestOptions()
    transport = transport or UrllibLlmTransport()
    body = build_llm_body(endpoint, system_prompt, user_text, options)
    timeout = dynamic_timeout(endpoint.timeout_secs, len(user_text), options.web_search)
    headers = auth_headers(endpoint, api_key)

    last_error: Optional[Exception] = None
    for attempt in range(len(RETRY_DELAYS_SECONDS) + 1):
        try:
            status, is_stream, payload = transport.post(
                endpoint.api_url, headers, body, timeout
            )
            if is_stream:
                pieces: List[str] = []
                for event in iter_sse_events(payload):
                    delta = stream_delta(endpoint, event)
                    if delta:
                        pieces.append(delta)
                        if on_delta:
                            on_delta(delta)
                return LlmResponse(text="".join(pieces), streamed=True)
            return LlmResponse(
                text=extract_text(endpoint, payload), raw=payload, streamed=False
            )
        except LlmHttpError as err:
            last_error = err
            if err.status == 429 and attempt < len(RETRY_DELAYS_SECONDS):
                time.sleep(RETRY_DELAYS_SECONDS[attempt])
                continue
            raise
    raise last_error  # pragma: no cover
