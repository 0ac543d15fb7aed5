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
import threading
import time
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

from light_whisper_tpu.llm.provider import (
    ApiFormat,
    AutoStrategy,
    LlmEndpoint,
    ReasoningMode,
    apply_reasoning_controls,
    applied_auto_strategy,
    auto_reasoning_fallback_bodies,
    looks_like_reasoning_unsupported,
    remember_auto_strategy,
    strip_reasoning_controls,
    uses_responses_api,
)

MAX_OUTPUT_TOKENS = 4096
RETRY_DELAYS_SECONDS = (1.0, 3.0)

# ChatGPT-OAuth Codex sessions bypass the configured endpoint URL and post to
# the Codex Responses backend (codex_oauth_service.rs:22).
CHATGPT_CODEX_RESPONSES_URL = "https://chatgpt.com/backend-api/codex/responses"
# The product-facing name is "fast mode" but the legal wire value for the
# Responses API service_tier field is "priority" (llm_client.rs:140-162;
# official Codex CLI remaps ServiceTier::Fast → "priority").
OPENAI_FAST_MODE_SERVICE_TIER = "priority"
OPENAI_SERVICE_TIER_WHITELIST = ("auto", "default", "flex", "priority")
_CODEX_ORIGINATOR = "codex_cli_rs"
_CODEX_USER_AGENT = "codex-cli"


@dataclasses.dataclass
class LlmRequestOptions:
    stream: bool = True
    json_output: bool = False
    web_search: bool = False
    reasoning_mode: ReasoningMode = ReasoningMode.PROVIDER_DEFAULT
    # OAuth-origin OpenAI requests may opt into priority processing.
    openai_fast_mode: bool = False
    # Inline image inputs as (mime_type, base64) pairs — screenshot context
    # for vision-capable endpoints (assistant_service.rs:947-1010).
    images: List = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class LlmResponse:
    text: str
    raw: Optional[Dict[str, Any]] = None
    streamed: bool = False
    citations: List[Dict[str, str]] = dataclasses.field(default_factory=list)


class LlmHttpError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


# ---------------------------------------------------------------------------
# body building
# ---------------------------------------------------------------------------


def _chat_output_limit_key(endpoint: LlmEndpoint) -> str:
    # Newer OpenAI-compatible backends reject max_tokens — modern key for
    # openai itself, legacy key elsewhere (llm_client.rs:130-138).
    return "max_completion_tokens" if endpoint.provider == "openai" else "max_tokens"


# -- per-endpoint output-limit capability memoization -----------------------
# Some backends reject ANY output-token-limit field. After one successful
# stripped retry the endpoint is remembered so later requests skip the
# guaranteed-failing first attempt (llm_client.rs:199-252).

_OUTPUT_LIMIT_KEYS = ("max_output_tokens", "max_completion_tokens", "max_tokens")
_output_limit_unsupported: set = set()
_capability_lock = threading.Lock()


def _endpoint_capability_key(endpoint: LlmEndpoint) -> str:
    return f"{endpoint.api_format}|{endpoint.api_url}|{endpoint.model.strip().lower()}"


def output_limit_unsupported(endpoint: LlmEndpoint) -> bool:
    with _capability_lock:
        return _endpoint_capability_key(endpoint) in _output_limit_unsupported


def remember_output_limit_unsupported(endpoint: LlmEndpoint) -> None:
    with _capability_lock:
        _output_limit_unsupported.add(_endpoint_capability_key(endpoint))


def reset_capability_cache() -> None:
    """Test hook: forget every memoized endpoint capability."""
    from light_whisper_tpu.llm import provider as _provider

    with _capability_lock:
        _output_limit_unsupported.clear()
    _provider._AUTO_STRATEGY_CACHE.clear()


def strip_output_token_limits(body: Dict[str, Any]) -> None:
    for key in _OUTPUT_LIMIT_KEYS:
        body.pop(key, None)


def has_output_token_limit(body: Dict[str, Any]) -> bool:
    return any(key in body for key in _OUTPUT_LIMIT_KEYS)


def looks_like_output_limit_unsupported_error(message: str) -> bool:
    """Error-shape heuristic matching llm_client.rs:199-213."""
    lowered = message.lower()
    mentions_limit = any(
        phrase in lowered
        for phrase in (
            "max_output_tokens",
            "max_tokens",
            "max completion tokens",
            "max_completion_tokens",
            "maximum output tokens",
        )
    )
    mentions_unsupported = any(
        phrase in lowered
        for phrase in (
            "unsupported",
            "not supported",
            "unknown parameter",
            "unrecognized parameter",
            "not recognized",
        )
    )
    return mentions_limit and mentions_unsupported


# -- OAuth-origin backend adaptation ----------------------------------------


def uses_codex_chatgpt_backend(endpoint: LlmEndpoint, api_key: str) -> bool:
    from light_whisper_tpu.llm.codex_oauth import decode_chatgpt_bearer

    return endpoint.provider == "openai" and decode_chatgpt_bearer(api_key) is not None


def uses_openai_oauth_origin_auth(endpoint: LlmEndpoint, api_key: str) -> bool:
    from light_whisper_tpu.llm.codex_oauth import is_oauth_origin_auth

    return endpoint.provider == "openai" and is_oauth_origin_auth(api_key)


def adapt_body_for_backend(
    endpoint: LlmEndpoint,
    api_key: str,
    body: Dict[str, Any],
    fast_mode: bool = False,
) -> Dict[str, Any]:
    """ChatGPT-OAuth Codex body adaptation (llm_client.rs:165-196).

    The Codex backend rejects output-token-limit fields outright (strip them
    up front rather than pay a guaranteed failed first request), requires
    ``store: false`` and streaming on the Responses API, and — for any
    OAuth-origin auth — accepts the fast-mode ``service_tier``."""
    adapted = dict(body)
    if not uses_openai_oauth_origin_auth(endpoint, api_key):
        return adapted
    if uses_codex_chatgpt_backend(endpoint, api_key):
        strip_output_token_limits(adapted)
        adapted["store"] = False
        if uses_responses_api(endpoint):
            adapted["stream"] = True
    if fast_mode:
        adapted["service_tier"] = OPENAI_FAST_MODE_SERVICE_TIER
    return adapted


def build_llm_body(
    endpoint: LlmEndpoint,
    system_prompt: str,
    user_text: str,
    options: LlmRequestOptions,
) -> Dict[str, Any]:
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        if options.images:
            content: Any = [
                {
                    "type": "image",
                    "source": {"type": "base64", "media_type": mime, "data": data},
                }
                for mime, data in options.images
            ] + [{"type": "text", "text": user_text}]
        else:
            content = user_text
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
            "messages": [{"role": "user", "content": content}],
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
                    "content": [
                        {
                            "type": "input_image",
                            "image_url": f"data:{mime};base64,{data}",
                        }
                        for mime, data in options.images
                    ]
                    + [{"type": "input_text", "text": user_text}],
                },
            ],
        }
        if options.json_output:
            body["text"] = {"format": {"type": "json_object"}}
        body["max_output_tokens"] = MAX_OUTPUT_TOKENS
    else:
        if options.images:
            user_content: Any = [
                {
                    "type": "image_url",
                    "image_url": {"url": f"data:{mime};base64,{data}"},
                }
                for mime, data in options.images
            ] + [{"type": "text", "text": user_text}]
        else:
            user_content = user_text
        body = {
            "model": endpoint.model,
            "messages": [
                {"role": "system", "content": system_prompt},
                {"role": "user", "content": user_content},
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


def collect_url_citations(value: Any, _seen: Optional[set] = None) -> List[Dict[str, str]]:
    """Recursively harvest ``url_citation`` annotations from any response
    fragment, deduplicated by URL (llm_client.rs:473-510). Works on full
    payloads and on individual SSE events."""
    seen = _seen if _seen is not None else set()
    found: List[Dict[str, str]] = []
    if isinstance(value, dict):
        if value.get("type") == "url_citation":
            url = str(value.get("url") or "").strip()
            if url and url not in seen:
                seen.add(url)
                title = str(value.get("title") or "").strip()
                found.append({"title": title or url, "url": url})
        for child in value.values():
            found.extend(collect_url_citations(child, seen))
    elif isinstance(value, list):
        for child in value:
            found.extend(collect_url_citations(child, seen))
    return found


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
    # OAuth-origin encodings carry the real bearer inside the stored key
    # (llm_provider.rs:1306-1346): ChatGPT-session tokens also pin the
    # account id + originator headers; OAuth-exchanged API keys unwrap to a
    # plain bearer.
    from light_whisper_tpu.llm.codex_oauth import (
        decode_chatgpt_bearer,
        decode_oauth_api_key,
    )

    session = decode_chatgpt_bearer(api_key)
    if session is not None:
        headers = {
            "Authorization": f"Bearer {session.get('access_token', '')}",
            "originator": _CODEX_ORIGINATOR,
            "User-Agent": _CODEX_USER_AGENT,
        }
        account_id = (session.get("account_id") or "").strip()
        if account_id:
            headers["ChatGPT-Account-ID"] = account_id
        return headers
    unwrapped = decode_oauth_api_key(api_key)
    return {"Authorization": f"Bearer {unwrapped or api_key}"}


def send_llm_request(
    endpoint: LlmEndpoint,
    system_prompt: str,
    user_text: str,
    api_key: str = "",
    options: Optional[LlmRequestOptions] = None,
    transport=None,
    on_delta: Optional[Callable[[str], None]] = None,
    on_citation: Optional[Callable[[Dict[str, str]], None]] = None,
) -> LlmResponse:
    """Send with 429 retries; streams when the server does, else collects.

    Also handles the two capability negotiations the reference client does
    in-flight (llm_client.rs:1150-1290): OAuth-origin Codex body adaptation,
    and a strip-and-retry when the backend rejects output-token-limit fields
    (memoized per endpoint so the failing first attempt isn't repeated)."""
    options = options or LlmRequestOptions()
    transport = transport or UrllibLlmTransport()
    body = build_llm_body(endpoint, system_prompt, user_text, options)
    body = adapt_body_for_backend(endpoint, api_key, body, options.openai_fast_mode)
    if output_limit_unsupported(endpoint):
        strip_output_token_limits(body)
    timeout = dynamic_timeout(endpoint.timeout_secs, len(user_text), options.web_search)
    headers = auth_headers(endpoint, api_key)
    url = (
        CHATGPT_CODEX_RESPONSES_URL
        if uses_codex_chatgpt_backend(endpoint, api_key)
        else endpoint.api_url
    )

    def _notify(citations: List[Dict[str, str]]) -> None:
        if on_citation:
            for citation in citations:
                on_citation(citation)

    stripped_limits = False
    # Auto-probe ladder for thinking params on unknown OpenAI-compatible
    # backends (llm_provider.rs:1107-1140): on a reasoning-param rejection,
    # retry with the alternative strategies, then bare; memoize what stuck.
    reasoning_fallbacks: Optional[List] = None
    used_reasoning_strategy = applied_auto_strategy(body)
    reasoning_was_negotiated = False
    attempt = 0
    while True:
        try:
            status, is_stream, payload = transport.post(url, headers, body, timeout)
            if is_stream:
                pieces: List[str] = []
                citations: List[Dict[str, str]] = []
                seen_urls: set = set()
                for event in iter_sse_events(payload):
                    delta = stream_delta(endpoint, event)
                    if delta:
                        pieces.append(delta)
                        if on_delta:
                            on_delta(delta)
                    fresh = collect_url_citations(event, seen_urls)
                    citations.extend(fresh)
                    _notify(fresh)
                response = LlmResponse(
                    text="".join(pieces), streamed=True, citations=citations
                )
            else:
                citations = collect_url_citations(payload)
                _notify(citations)
                response = LlmResponse(
                    text=extract_text(endpoint, payload),
                    raw=payload,
                    streamed=False,
                    citations=citations,
                )
            if stripped_limits:
                remember_output_limit_unsupported(endpoint)
            if reasoning_was_negotiated:
                remember_auto_strategy(
                    endpoint,
                    options.reasoning_mode,
                    used_reasoning_strategy or AutoStrategy.NO_CONTROLS,
                )
            return response
        except LlmHttpError as err:
            if looks_like_reasoning_unsupported(err.message):
                if reasoning_fallbacks is None:
                    reasoning_fallbacks = auto_reasoning_fallback_bodies(
                        endpoint, body, options.reasoning_mode
                    )
                    if reasoning_fallbacks:
                        # Terminal rung: no controls at all.
                        bare = dict(body)
                        strip_reasoning_controls(bare)
                        reasoning_fallbacks.append((None, bare))
                if reasoning_fallbacks:
                    used_reasoning_strategy, body = reasoning_fallbacks.pop(0)
                    reasoning_was_negotiated = True
                    continue
            if (
                not stripped_limits
                and has_output_token_limit(body)
                and looks_like_output_limit_unsupported_error(err.message)
            ):
                strip_output_token_limits(body)
                stripped_limits = True
                continue
            if err.status == 429 and attempt < len(RETRY_DELAYS_SECONDS):
                time.sleep(RETRY_DELAYS_SECONDS[attempt])
                attempt += 1
                continue
            raise
