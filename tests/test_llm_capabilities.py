"""Provider capability matrix: endpoint classification, strategy taxonomy,
auto-probe memoization, unsupported-feature heuristics.

Reference: ``llm_provider.rs:554-1239`` — host-based "like" classifiers,
the reasoning-control priority chain, auto-strategy probe/cache for generic
OpenAI-compatible backends, and the error-message capability probes.
"""

import pytest

from light_whisper_tpu.llm.provider import (
    ApiFormat,
    AutoStrategy,
    LlmEndpoint,
    ReasoningControl,
    ReasoningMode,
    apply_reasoning_controls,
    applied_auto_strategy,
    auto_reasoning_fallback_bodies,
    cached_auto_strategy,
    endpoint_for_config,
    image_support_cache_key,
    is_cerebras_like,
    is_deepseek_like,
    is_volcengine_like,
    looks_like_image_input_unsupported,
    looks_like_json_output_unsupported,
    looks_like_reasoning_unsupported,
    reasoning_control_kind,
    reasoning_support,
    remember_auto_strategy,
    strip_reasoning_controls,
)


def _ep(url, model, provider="custom", fmt=ApiFormat.OPENAI_COMPAT):
    return LlmEndpoint(
        provider=provider, api_url=url, model=model, timeout_secs=10, api_format=fmt
    )


# --- host-based classification --------------------------------------------


def test_host_classifiers_match_subdomains_not_lookalikes():
    assert is_deepseek_like(_ep("https://api.deepseek.com/v1/chat/completions", "x"))
    assert is_deepseek_like(_ep("https://gw.eu.deepseek.com/v1/chat/completions", "x"))
    assert not is_deepseek_like(_ep("https://notdeepseek.com/v1/chat/completions", "x"))
    assert not is_deepseek_like(_ep("https://deepseek.com.evil.io/v1", "x"))
    assert is_cerebras_like(_ep("https://api.cerebras.ai/v1/chat/completions", "x"))


def test_volcengine_like_by_host_or_model():
    assert is_volcengine_like(_ep("https://ark.cn-beijing.volces.com/api/v3/chat/completions", "m"))
    assert is_volcengine_like(_ep("https://example.com/v1/chat/completions", "doubao-seed-1-6-flash"))
    assert not is_volcengine_like(
        _ep("https://example.com/v1/messages", "doubao-x", fmt=ApiFormat.ANTHROPIC)
    )


# --- reasoning control priority chain -------------------------------------


def test_control_kind_priority_chain():
    # volcengine beats the generic auto-probe for doubao models
    vol = _ep("https://ark.volces.com/api/v3/chat/completions", "doubao-seed-1-6-thinking")
    assert reasoning_control_kind(vol) == ReasoningControl.VOLCENGINE_THINKING_TYPE
    # deepseek.com custom endpoint → deepseek toggle
    ds = _ep("https://api.deepseek.com/v1/chat/completions", "deepseek-reasoner")
    assert reasoning_control_kind(ds) == ReasoningControl.DEEPSEEK_THINKING
    # cerebras GLM special-case
    glm = endpoint_for_config("cerebras", model="zai-glm-4.7")
    assert reasoning_control_kind(glm) == ReasoningControl.CEREBRAS_GLM_TOGGLE
    # unknown openai-compatible backend → auto probe
    vllm = _ep("http://127.0.0.1:8000/v1/chat/completions", "qwen-local")
    assert reasoning_control_kind(vllm) == ReasoningControl.AUTO_OPENAI_COMPAT
    # api.openai.com with a GPT-5 model → effort ladder
    oai = endpoint_for_config("openai", model="gpt-5.2")
    assert reasoning_control_kind(oai) == ReasoningControl.OPENAI_EFFORT
    # api.openai.com with a non-reasoning model → nothing
    oai4 = endpoint_for_config("openai", model="gpt-4.1-mini")
    assert reasoning_control_kind(oai4) is None


def test_reasoning_support_report():
    sup = reasoning_support(endpoint_for_config("openai", model="gpt-5.1"))
    assert sup["supported"] and sup["strategy"] == "openai_reasoning_effort"
    unsup = reasoning_support(
        _ep("https://api.anthropic.com/v1/messages", "claude-2.1", fmt=ApiFormat.ANTHROPIC)
    )
    assert not unsup["supported"] and "Anthropic" in unsup["summary"]


# --- per-mode wire params ---------------------------------------------------


def test_volcengine_mode_mapping():
    ep = _ep("https://ark.volces.com/api/v3/chat/completions", "doubao-seed-1-6-thinking")
    for mode, expected in [
        (ReasoningMode.OFF, "disabled"),
        (ReasoningMode.LIGHT, "auto"),
        (ReasoningMode.BALANCED, "auto"),
        (ReasoningMode.DEEP, "enabled"),
    ]:
        body = {}
        apply_reasoning_controls(ep, body, mode)
        assert body == {"thinking": {"type": expected}}


def test_cerebras_provider_default_pins_low_effort():
    ep = endpoint_for_config("cerebras", model="gpt-oss-120b")
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.PROVIDER_DEFAULT)
    assert body == {"reasoning_effort": "low"}  # llm_provider.rs:1153-1158


def test_cerebras_glm_disable_toggle():
    ep = endpoint_for_config("cerebras", model="zai-glm-4.7")
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.OFF)
    assert body == {"disable_reasoning": True}
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.DEEP)
    assert body == {"disable_reasoning": False}


def test_siliconflow_budget_ladder():
    ep = endpoint_for_config("siliconflow", model="Qwen/Qwen3-32B")
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.LIGHT)
    assert body == {"enable_thinking": True, "thinking_budget": 1024}
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.OFF)
    assert body == {"enable_thinking": False}


# --- auto-probe strategies --------------------------------------------------


def test_auto_probe_prefers_effort_then_falls_back(tmp_path):
    ep = _ep("http://127.0.0.1:8000/v1/chat/completions", "local-model-a")
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.BALANCED)
    assert body == {"reasoning_effort": "medium"}  # preferred for chat
    fallbacks = auto_reasoning_fallback_bodies(ep, body, ReasoningMode.BALANCED)
    assert [s for s, _ in fallbacks] == [AutoStrategy.TOP_LEVEL_THINKING]
    _, fb_body = fallbacks[0]
    assert fb_body == {"thinking": {"type": "enabled"}}  # controls swapped, base kept


def test_auto_probe_off_mode_uses_thinking_then_template():
    ep = _ep("http://127.0.0.1:8000/v1/chat/completions", "local-model-b")
    body = {"messages": []}
    apply_reasoning_controls(ep, body, ReasoningMode.OFF)
    assert body["thinking"] == {"type": "disabled"}
    fallbacks = auto_reasoning_fallback_bodies(ep, body, ReasoningMode.OFF)
    assert [s for s, _ in fallbacks] == [AutoStrategy.CHAT_TEMPLATE_THINKING]
    assert fallbacks[0][1]["chat_template_kwargs"] == {"thinking": False}
    assert fallbacks[0][1]["messages"] == []


def test_auto_strategy_memoization_reused_and_no_controls_terminal():
    ep = _ep("http://10.0.0.1:8000/v1/chat/completions", "memo-model")
    remember_auto_strategy(ep, ReasoningMode.DEEP, AutoStrategy.CHAT_TEMPLATE_THINKING)
    assert cached_auto_strategy(ep, ReasoningMode.DEEP) == AutoStrategy.CHAT_TEMPLATE_THINKING
    body = {}
    apply_reasoning_controls(ep, body, ReasoningMode.DEEP)
    assert body == {"chat_template_kwargs": {"thinking": True}}
    # a NO_CONTROLS verdict ends probing for that (endpoint, mode)
    remember_auto_strategy(ep, ReasoningMode.DEEP, AutoStrategy.NO_CONTROLS)
    assert auto_reasoning_fallback_bodies(ep, {}, ReasoningMode.DEEP) == []
    # other modes unaffected
    assert cached_auto_strategy(ep, ReasoningMode.OFF) is None


def test_applied_auto_strategy_detection_and_strip():
    body = {"messages": [], "thinking": {"type": "enabled"}, "thinking_budget": 2048}
    assert applied_auto_strategy(body) == AutoStrategy.TOP_LEVEL_THINKING
    strip_reasoning_controls(body)
    assert body == {"messages": []}


# --- unsupported-feature heuristics ----------------------------------------


@pytest.mark.parametrize(
    "message,expected",
    [
        ("Image input is not supported for this model", True),
        ("invalid content type: image_url", True),
        ("unknown variant `image_url`, expected `text`", True),
        ("unsupported modality: vision", True),
        ("image too large", False),  # size complaint ≠ capability miss
        ("rate limit exceeded", False),
    ],
)
def test_image_unsupported_heuristic(message, expected):
    assert looks_like_image_input_unsupported(message) is expected


def test_reasoning_and_json_heuristics():
    assert looks_like_reasoning_unsupported("unknown parameter: chat_template_kwargs")
    assert looks_like_reasoning_unsupported("budget_tokens is not supported")
    assert not looks_like_reasoning_unsupported("thinking hard about your request")
    assert looks_like_json_output_unsupported("response_format is not supported")
    assert looks_like_json_output_unsupported("text.format does not support json schema")
    assert not looks_like_json_output_unsupported("json parse error in your input")


def test_image_support_cache_key_distinguishes_models():
    a = image_support_cache_key(_ep("https://x.com/v1/chat/completions", "m1"))
    b = image_support_cache_key(_ep("https://x.com/v1/chat/completions", "M1 "))
    c = image_support_cache_key(_ep("https://x.com/v1/chat/completions", "m2"))
    assert a == b  # case/space-insensitive on model
    assert a != c


# --- in-flight negotiation through the client -------------------------------


class FakeTransport:
    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.requests = []

    def post(self, url, headers, body, timeout):
        import json as _json

        self.requests.append(_json.loads(_json.dumps(body)))
        outcome = self.outcomes.pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        return outcome


@pytest.fixture(autouse=True)
def _fresh_caches():
    from light_whisper_tpu.llm.client import reset_capability_cache

    reset_capability_cache()
    yield
    reset_capability_cache()


def _chat_ok(text="ok"):
    return (200, False, {"choices": [{"message": {"content": text}}]})


def test_client_negotiates_reasoning_strategy_and_memoizes():
    from light_whisper_tpu.llm.client import (
        LlmHttpError,
        LlmRequestOptions,
        send_llm_request,
    )

    ep = _ep("http://127.0.0.1:9000/v1/chat/completions", "vllm-model")
    opts = LlmRequestOptions(reasoning_mode=ReasoningMode.BALANCED)
    transport = FakeTransport(
        [
            LlmHttpError(400, "unknown parameter: reasoning_effort"),
            _chat_ok("negotiated"),
        ]
    )
    result = send_llm_request(ep, "S", "U", options=opts, transport=transport)
    assert result.text == "negotiated"
    assert "reasoning_effort" in transport.requests[0]
    assert transport.requests[1]["thinking"] == {"type": "enabled"}
    # memoized: the next request leads with the strategy that stuck
    assert cached_auto_strategy(ep, ReasoningMode.BALANCED) == AutoStrategy.TOP_LEVEL_THINKING
    transport2 = FakeTransport([_chat_ok()])
    send_llm_request(ep, "S", "U", options=opts, transport=transport2)
    assert transport2.requests[0]["thinking"] == {"type": "enabled"}
    assert "reasoning_effort" not in transport2.requests[0]


def test_client_falls_through_to_no_controls():
    from light_whisper_tpu.llm.client import (
        LlmHttpError,
        LlmRequestOptions,
        send_llm_request,
    )

    ep = _ep("http://127.0.0.1:9001/v1/chat/completions", "plain-model")
    opts = LlmRequestOptions(reasoning_mode=ReasoningMode.BALANCED)
    transport = FakeTransport(
        [
            LlmHttpError(400, "reasoning_effort is not supported"),
            LlmHttpError(400, "thinking is not supported"),
            _chat_ok("bare"),
        ]
    )
    result = send_llm_request(ep, "S", "U", options=opts, transport=transport)
    assert result.text == "bare"
    final = transport.requests[-1]
    assert "thinking" not in final and "reasoning_effort" not in final
    assert cached_auto_strategy(ep, ReasoningMode.BALANCED) == AutoStrategy.NO_CONTROLS
    # with NO_CONTROLS cached, errors no longer trigger fallback churn
    transport2 = FakeTransport([LlmHttpError(400, "thinking is not supported")])
    with pytest.raises(LlmHttpError):
        send_llm_request(ep, "S", "U", options=opts, transport=transport2)
    assert len(transport2.requests) == 1
