"""LLM stack: provider resolution, body building, SSE parsing, polish loop.

Mirrors the reference's reasoning-negotiation matrix strategy
(``llm_reasoning_negotiation_tests.rs``) at a reduced scale, plus polish
transport-fallback behavior (``ai_polish_transport_retry_tests.rs``).
"""

import json

import pytest

from light_whisper_tpu.llm.client import (
    LlmHttpError,
    LlmRequestOptions,
    build_llm_body,
    dynamic_timeout,
    extract_text,
    iter_sse_events,
    send_llm_request,
    stream_delta,
)
from light_whisper_tpu.llm.polish import (
    build_system_prompt,
    parse_structured_response,
    polish_text,
    relevant_corrections,
)
from light_whisper_tpu.llm.provider import (
    ApiFormat,
    ReasoningMode,
    apply_reasoning_controls,
    endpoint_for_config,
    gpt5_effort_for_mode,
    normalize_api_url,
    uses_responses_api,
)


# -- provider / URL normalization -------------------------------------------


def test_url_normalization_rules():
    assert (
        normalize_api_url(None, "https://api.cerebras.ai", "chat/completions")
        == "https://api.cerebras.ai/v1/chat/completions"
    )
    assert (
        normalize_api_url("https://x.example/v1", "", "chat/completions")
        == "https://x.example/v1/chat/completions"
    )
    assert (
        normalize_api_url("https://x.example/api/v3", "", "chat/completions")
        == "https://x.example/api/v3/chat/completions"
    )
    # explicit '#' suffix pins the URL verbatim
    assert normalize_api_url("https://x.example/weird/path#", "", "x") == "https://x.example/weird/path"
    # existing full path is kept
    assert (
        normalize_api_url("https://x.example/v1/chat/completions/", "", "x")
        == "https://x.example/v1/chat/completions"
    )


def test_endpoint_presets_and_responses_api_detection():
    openai = endpoint_for_config("openai")
    assert openai.api_url.endswith("/v1/responses")
    assert uses_responses_api(openai)
    cerebras = endpoint_for_config("cerebras")
    assert cerebras.api_url.endswith("/chat/completions")
    assert not uses_responses_api(cerebras)
    anthropic = endpoint_for_config("custom", api_format=ApiFormat.ANTHROPIC)
    assert anthropic.api_url.endswith("/v1/messages")


# -- reasoning negotiation ---------------------------------------------------


@pytest.mark.parametrize(
    "model,mode,expected",
    [
        ("gpt-5", ReasoningMode.OFF, "minimal"),
        ("gpt-5", ReasoningMode.DEEP, "high"),
        ("gpt-5.1", ReasoningMode.OFF, "none"),
        ("gpt-5.2", ReasoningMode.DEEP, "high"),
        ("gpt-5.6", ReasoningMode.DEEP, "xhigh"),
        ("gpt-5-pro", ReasoningMode.OFF, "high"),  # single-effort ladder clamps
        ("gpt-5.2-pro", ReasoningMode.OFF, "medium"),
        ("openai/gpt-5-mini", ReasoningMode.LIGHT, "low"),
        ("gpt-4.1-mini", ReasoningMode.DEEP, None),
    ],
)
def test_gpt5_effort_ladders(model, mode, expected):
    assert gpt5_effort_for_mode(model, mode) == expected


def test_reasoning_controls_chat_vs_responses():
    chat = endpoint_for_config("custom", model="gpt-5.1")
    body = {}
    apply_reasoning_controls(chat, body, ReasoningMode.BALANCED)
    assert body == {"reasoning_effort": "medium"}

    responses = endpoint_for_config("openai", model="gpt-5.1")
    body = {}
    apply_reasoning_controls(responses, body, ReasoningMode.BALANCED)
    assert body == {"reasoning": {"effort": "medium"}}


def test_reasoning_controls_provider_toggles():
    deepseek = endpoint_for_config("deepseek", model="deepseek-v4-flash")
    body = {}
    apply_reasoning_controls(deepseek, body, ReasoningMode.OFF)
    assert body == {"thinking": {"type": "disabled"}}

    silicon = endpoint_for_config("siliconflow", model="Qwen/Qwen3-32B")
    body = {}
    apply_reasoning_controls(silicon, body, ReasoningMode.DEEP)
    assert body == {"enable_thinking": True, "thinking_budget": 8192}

    cerebras = endpoint_for_config("cerebras", model="gpt-oss-120b")
    body = {}
    apply_reasoning_controls(cerebras, body, ReasoningMode.DEEP)
    assert body == {"reasoning_effort": "high"}

    anthropic = endpoint_for_config(
        "custom", model="claude-sonnet-4-20250514", api_format=ApiFormat.ANTHROPIC
    )
    body = {}
    apply_reasoning_controls(anthropic, body, ReasoningMode.BALANCED)
    assert body["thinking"]["type"] == "enabled"
    assert body["thinking"]["budget_tokens"] == 2048  # llm_provider.rs:1163-1168


def test_provider_default_mode_leaves_body_untouched():
    for provider, model in (("deepseek", "deepseek-chat"), ("openai", "gpt-5")):
        endpoint = endpoint_for_config(provider, model=model)
        body = {}
        apply_reasoning_controls(endpoint, body, ReasoningMode.PROVIDER_DEFAULT)
        assert body == {}


# -- body building -----------------------------------------------------------


def test_chat_body_shape():
    endpoint = endpoint_for_config("cerebras")
    body = build_llm_body(endpoint, "SYS", "hello", LlmRequestOptions(json_output=True))
    assert body["messages"][0] == {"role": "system", "content": "SYS"}
    assert body["response_format"] == {"type": "json_object"}
    assert body["max_tokens"] == 4096
    # cerebras json+stream incompatibility: stream dropped
    assert "stream" not in body


def test_chat_body_streams_when_allowed():
    endpoint = endpoint_for_config("deepseek")
    body = build_llm_body(endpoint, "SYS", "hello", LlmRequestOptions(json_output=True))
    assert body["stream"] is True


def test_responses_body_shape():
    endpoint = endpoint_for_config("openai", model="gpt-5.1")
    body = build_llm_body(
        endpoint, "SYS", "hi", LlmRequestOptions(json_output=True, web_search=True)
    )
    assert body["instructions"] == "SYS"
    assert body["text"] == {"format": {"type": "json_object"}}
    assert body["max_output_tokens"] == 4096
    assert {"type": "web_search"} in body["tools"]
    assert body["input"][0]["role"] == "developer"


def test_anthropic_body_shape():
    endpoint = endpoint_for_config("custom", model="claude-opus-4-1", api_format=ApiFormat.ANTHROPIC)
    body = build_llm_body(endpoint, "SYS", "hi", LlmRequestOptions(web_search=True))
    assert body["system"][0]["cache_control"] == {"type": "ephemeral"}
    assert body["tools"][0]["type"] == "web_search_20250305"


def test_dynamic_timeout_scaling():
    assert dynamic_timeout(10, 0, False) == 10
    assert dynamic_timeout(10, 2000, False) == 20
    assert dynamic_timeout(10, 0, True) == 55
    assert dynamic_timeout(10, 10_000_000, False) == 240  # capped


# -- SSE parsing -------------------------------------------------------------


def test_sse_chat_stream():
    endpoint = endpoint_for_config("cerebras")
    lines = [
        'data: {"choices":[{"delta":{"content":"Hel"}}]}',
        "",
        ": keepalive",
        'data: {"choices":[{"delta":{"content":"lo"}}]}',
        "data: [DONE]",
        'data: {"choices":[{"delta":{"content":"IGNORED"}}]}',
    ]
    text = "".join(stream_delta(endpoint, e) for e in iter_sse_events(lines))
    assert text == "Hello"


def test_sse_responses_and_anthropic_dialects():
    responses = endpoint_for_config("openai")
    event = {"type": "response.output_text.delta", "delta": "x"}
    assert stream_delta(responses, event) == "x"
    anthropic = endpoint_for_config("custom", api_format=ApiFormat.ANTHROPIC)
    event = {
        "type": "content_block_delta",
        "delta": {"type": "text_delta", "text": "y"},
    }
    assert stream_delta(anthropic, event) == "y"


def test_extract_text_nonstream_dialects():
    chat = endpoint_for_config("cerebras")
    assert extract_text(chat, {"choices": [{"message": {"content": "a"}}]}) == "a"
    responses = endpoint_for_config("openai")
    payload = {
        "output": [
            {"type": "message", "content": [{"type": "output_text", "text": "b"}]}
        ]
    }
    assert extract_text(responses, payload) == "b"
    anthropic = endpoint_for_config("custom", api_format=ApiFormat.ANTHROPIC)
    assert extract_text(anthropic, {"content": [{"type": "text", "text": "c"}]}) == "c"


# -- send with retries -------------------------------------------------------


class FakeTransport:
    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.requests = []

    def post(self, url, headers, body, timeout):
        self.requests.append((url, body))
        outcome = self.outcomes.pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        return outcome


def test_send_retries_on_429(monkeypatch):
    import light_whisper_tpu.llm.client as client_mod

    monkeypatch.setattr(client_mod.time, "sleep", lambda s: None)
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(
        [
            LlmHttpError(429, "rate limited"),
            (200, False, {"choices": [{"message": {"content": "done"}}]}),
        ]
    )
    result = send_llm_request(endpoint, "S", "U", transport=transport)
    assert result.text == "done"
    assert len(transport.requests) == 2


def test_send_surfaces_non_retryable():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport([LlmHttpError(401, "bad key")])
    with pytest.raises(LlmHttpError):
        send_llm_request(endpoint, "S", "U", transport=transport)


# -- polish ------------------------------------------------------------------


def test_parse_structured_response_variants():
    assert parse_structured_response('{"polished": "x", "corrections": [], "key_terms": []}')
    fenced = '```json\n{"polished": "y"}\n```'
    assert parse_structured_response(fenced)["polished"] == "y"
    wrapped = 'Here you go: {"polished": "z"} hope it helps'
    assert parse_structured_response(wrapped)["polished"] == "z"
    array = '[{"nope": 1}, {"polished": "w"}]'
    assert parse_structured_response(array)["polished"] == "w"
    assert parse_structured_response("not json") is None


def test_prompt_injects_vocab_and_policy():
    prompt = build_system_prompt(
        "strong", ["JAX", "Pallas"], [("安装", "安卓")], target_language="English"
    )
    assert "reorganize" in prompt
    assert "JAX" in prompt and "Pallas" in prompt
    assert "安装→安卓" in prompt
    assert "translation_requirement" in prompt


def test_relevant_corrections_filtering():
    pairs = relevant_corrections("这个安装生态", [("安装", "安卓"), ("光子", "量子")])
    assert pairs == [("安装", "安卓")]


def test_polish_learns_into_profile():
    from light_whisper_tpu.text.profile import UserProfile

    endpoint = endpoint_for_config("cerebras")
    payload = {
        "choices": [
            {
                "message": {
                    "content": json.dumps(
                        {
                            "polished": "这个功能要兼容安卓和苹果生态。",
                            "corrections": [
                                {"original": "安装", "corrected": "安卓", "type": "term"}
                            ],
                            "key_terms": ["安卓", "苹果"],
                        },
                        ensure_ascii=False,
                    )
                }
            }
        ]
    }
    transport = FakeTransport([(200, False, payload)])
    profile = UserProfile()
    result = polish_text(
        endpoint,
        "这个功能要兼容安装和苹果生态",
        transport=transport,
        profile=profile,
    )
    assert result.polished.startswith("这个功能要兼容安卓")
    assert ("安装", "安卓") in result.corrections
    assert profile.correction_patterns[0].original == "安装"
    assert "安卓" in profile.vocab_frequency


def test_polish_falls_back_to_original_on_failure():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(
        [LlmHttpError(500, "boom"), LlmHttpError(500, "boom again")]
    )
    result = polish_text(endpoint, "原文", transport=transport)
    assert result.polished == "原文"
    assert result.used_fallback


def test_polish_stream_garbage_retries_nonstream():
    endpoint = endpoint_for_config("deepseek")
    stream_lines = iter(['data: {"choices":[{"delta":{"content":"not json"}}]}'])
    good = {
        "choices": [{"message": {"content": '{"polished": "ok"}'}}]
    }
    transport = FakeTransport([(200, True, stream_lines), (200, False, good)])
    result = polish_text(endpoint, "text", transport=transport)
    assert result.polished == "ok"
    assert result.used_fallback
    # second request must be non-stream
    assert "stream" not in transport.requests[1][1]
