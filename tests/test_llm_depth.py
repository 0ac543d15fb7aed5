"""LLM client depth: output-limit capability memoization, citation
extraction, ChatGPT-OAuth Codex adaptation, fast mode, and user-correction
pair extraction (reference: llm_client.rs:140-290,473-533,1150-1290 and
commands/profile.rs:15-199) — all against offline fake transports.
"""

import json

import pytest

import light_whisper_tpu.llm.client as client_mod
from light_whisper_tpu.llm.client import (
    CHATGPT_CODEX_RESPONSES_URL,
    OPENAI_FAST_MODE_SERVICE_TIER,
    OPENAI_SERVICE_TIER_WHITELIST,
    LlmHttpError,
    LlmRequestOptions,
    collect_url_citations,
    looks_like_output_limit_unsupported_error,
    reset_capability_cache,
    send_llm_request,
)
from light_whisper_tpu.llm.codex_oauth import encode_chatgpt_bearer, encode_oauth_api_key
from light_whisper_tpu.llm.corrections import (
    parse_correction_pairs,
    submit_user_correction,
)
from light_whisper_tpu.llm.provider import endpoint_for_config


class FakeTransport:
    def __init__(self, outcomes):
        self.outcomes = list(outcomes)
        self.requests = []

    def post(self, url, headers, body, timeout):
        self.requests.append((url, dict(headers), json.loads(json.dumps(body))))
        outcome = self.outcomes.pop(0)
        if isinstance(outcome, Exception):
            raise outcome
        return outcome


@pytest.fixture(autouse=True)
def _fresh_capability_cache():
    reset_capability_cache()
    yield
    reset_capability_cache()


def chat_ok(text="ok"):
    return (200, False, {"choices": [{"message": {"content": text}}]})


# -- output-limit capability memoization -------------------------------------


def test_unsupported_output_limit_strips_retries_and_memoizes():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(
        [
            LlmHttpError(400, "max_tokens is unsupported for this model"),
            chat_ok("second"),
        ]
    )
    result = send_llm_request(endpoint, "S", "U", transport=transport)
    assert result.text == "second"
    assert len(transport.requests) == 2
    first_body, retry_body = transport.requests[0][2], transport.requests[1][2]
    assert "max_tokens" in first_body
    assert not any(
        k in retry_body for k in ("max_tokens", "max_completion_tokens", "max_output_tokens")
    )

    # Memoized: a later request to the same endpoint never sends the limit.
    transport2 = FakeTransport([chat_ok("third")])
    send_llm_request(endpoint, "S", "U", transport=transport2)
    assert "max_tokens" not in transport2.requests[0][2]

    # A different model is a different capability key.
    other = endpoint_for_config("cerebras", model="another-model")
    transport3 = FakeTransport([chat_ok()])
    send_llm_request(other, "S", "U", transport=transport3)
    assert "max_tokens" in transport3.requests[0][2]


def test_unrelated_400_is_not_treated_as_limit_unsupported():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport([LlmHttpError(400, "context_length_exceeded")])
    with pytest.raises(LlmHttpError):
        send_llm_request(endpoint, "S", "U", transport=transport)
    assert len(transport.requests) == 1


def test_limit_unsupported_heuristic():
    assert looks_like_output_limit_unsupported_error(
        "Unknown parameter: 'max_completion_tokens'"
    )
    assert looks_like_output_limit_unsupported_error(
        "max_output_tokens is not supported with this model"
    )
    assert not looks_like_output_limit_unsupported_error("max_tokens too large")
    assert not looks_like_output_limit_unsupported_error("unsupported model")


# -- citation extraction ------------------------------------------------------


def test_collect_url_citations_dedupes_and_falls_back_to_url_title():
    payload = {
        "output": [
            {
                "type": "message",
                "content": [
                    {
                        "type": "output_text",
                        "text": "hi",
                        "annotations": [
                            {"type": "url_citation", "url": "https://a.io", "title": "A"},
                            {"type": "url_citation", "url": "https://a.io", "title": "dup"},
                            {"type": "url_citation", "url": "https://b.io", "title": "  "},
                            {"type": "url_citation", "url": "   "},
                        ],
                    }
                ],
            }
        ]
    }
    citations = collect_url_citations(payload)
    assert citations == [
        {"title": "A", "url": "https://a.io"},
        {"title": "https://b.io", "url": "https://b.io"},
    ]


def test_send_collects_citations_nonstream_and_invokes_callback():
    endpoint = endpoint_for_config("cerebras")
    payload = {
        "choices": [
            {
                "message": {
                    "content": "answer",
                    "annotations": [
                        {"type": "url_citation", "url": "https://x.io", "title": "X"}
                    ],
                }
            }
        ]
    }
    seen = []
    result = send_llm_request(
        endpoint,
        "S",
        "U",
        transport=FakeTransport([(200, False, payload)]),
        on_citation=seen.append,
    )
    assert result.citations == [{"title": "X", "url": "https://x.io"}]
    assert seen == result.citations


def test_send_collects_citations_from_stream_events():
    endpoint = endpoint_for_config("openai")
    events = [
        'data: {"type": "response.output_text.delta", "delta": "he"}',
        'data: {"type": "response.output_text.annotation.added", '
        '"annotation": {"type": "url_citation", "url": "https://s.io", "title": "S"}}',
        'data: {"type": "response.output_text.delta", "delta": "llo"}',
        'data: {"type": "response.output_text.annotation.added", '
        '"annotation": {"type": "url_citation", "url": "https://s.io", "title": "S"}}',
        "data: [DONE]",
    ]
    result = send_llm_request(
        endpoint, "S", "U", transport=FakeTransport([(200, True, iter(events))])
    )
    assert result.text == "hello"
    assert result.citations == [{"title": "S", "url": "https://s.io"}]


# -- ChatGPT-OAuth Codex adaptation + fast mode -------------------------------


def test_codex_backend_reroutes_and_adapts_body():
    endpoint = endpoint_for_config("openai")
    key = encode_chatgpt_bearer("tok-123", "acct-9")
    transport = FakeTransport(
        [(200, True, iter(['data: {"type":"response.output_text.delta","delta":"y"}'])) ]
    )
    result = send_llm_request(endpoint, "S", "U", api_key=key, transport=transport)
    url, headers, body = transport.requests[0]
    assert result.text == "y"
    assert url == CHATGPT_CODEX_RESPONSES_URL
    assert body["store"] is False and body["stream"] is True
    assert "max_output_tokens" not in body  # Codex rejects limits: pre-stripped
    assert headers["Authorization"] == "Bearer tok-123"
    assert headers["ChatGPT-Account-ID"] == "acct-9"
    assert headers["originator"] == "codex_cli_rs"


def test_fast_mode_injects_priority_tier_for_oauth_auth_only():
    endpoint = endpoint_for_config("openai")
    opts = LlmRequestOptions(openai_fast_mode=True)

    oauth_key = encode_oauth_api_key("sk-real")
    transport = FakeTransport([chat_ok()])
    send_llm_request(endpoint, "S", "U", api_key=oauth_key, options=opts, transport=transport)
    url, headers, body = transport.requests[0]
    assert body["service_tier"] == OPENAI_FAST_MODE_SERVICE_TIER
    assert body["service_tier"] in OPENAI_SERVICE_TIER_WHITELIST
    assert url == endpoint.api_url  # plain OAuth API key: normal endpoint
    assert headers["Authorization"] == "Bearer sk-real"  # unwrapped

    plain = FakeTransport([chat_ok()])
    send_llm_request(endpoint, "S", "U", api_key="sk-plain", options=opts, transport=plain)
    assert "service_tier" not in plain.requests[0][2]


# -- user-correction pair extraction ------------------------------------------


def test_parse_correction_pairs_variants():
    assert parse_correction_pairs('[{"from":"安装","to":"安卓"}]') == [("安装", "安卓")]
    wrapped = '{"corrections": [{"from":"a","to":"b"}, {"from":"x","to":"x"}]}'
    assert parse_correction_pairs(wrapped) == [("a", "b")]
    assert parse_correction_pairs("[]") == []
    assert parse_correction_pairs("not json") == []
    assert parse_correction_pairs('[{"from":"", "to":"b"}]') == []
    # markdown-fenced output (models ignore json_output more often than not)
    fenced = '```json\n[{"from":"安装","to":"安卓"}]\n```'
    assert parse_correction_pairs(fenced) == [("安装", "安卓")]


def _llm_pairs_transport(pairs):
    content = json.dumps([{"from": a, "to": b} for a, b in pairs], ensure_ascii=False)
    return FakeTransport([chat_ok(content)])


def test_submit_user_correction_prefers_llm_pairs():
    from light_whisper_tpu.text.profile import UserProfile

    profile = UserProfile()
    endpoint = endpoint_for_config("cerebras")
    out = submit_user_correction(
        profile,
        "打开安装手机",
        "打开安卓手机",
        raw_original="打开按桌手机",
        endpoint=endpoint,
        api_key="k",
        transport=_llm_pairs_transport([("安装", "安卓"), ("按桌", "安卓")]),
    )
    assert out["strategy"] == "llm"
    learned = {(p.original, p.corrected) for p in profile.correction_patterns}
    assert ("安装", "安卓") in learned and ("按桌", "安卓") in learned
    # User-sourced corrections start at count 3 (immediately active).
    assert all(p.count == 3 for p in profile.correction_patterns)


def test_submit_user_correction_falls_back_to_diff_on_llm_failure():
    from light_whisper_tpu.text.profile import UserProfile

    profile = UserProfile()
    endpoint = endpoint_for_config("cerebras")
    out = submit_user_correction(
        profile,
        "我想用安装手机",
        "我想用安卓手机",
        endpoint=endpoint,
        api_key="k",
        transport=FakeTransport([LlmHttpError(500, "boom")]),
    )
    assert out["strategy"] == "diff"
    assert ("装", "卓") in {(p.original, p.corrected) for p in profile.correction_patterns} or (
        "安装",
        "安卓",
    ) in {(p.original, p.corrected) for p in profile.correction_patterns}


def test_submit_user_correction_without_llm_uses_raw_original_baseline():
    from light_whisper_tpu.text.profile import UserProfile

    profile = UserProfile()
    out = submit_user_correction(
        profile, "显示文本", "显示文本", raw_original="显是文本"
    )
    assert out["strategy"] == "diff"
    assert out["pairs"]  # raw ASR → corrected pair extracted


def test_submit_user_correction_no_difference_still_ticks_counters():
    from light_whisper_tpu.text.profile import UserProfile

    profile = UserProfile()
    before = profile.total_transcriptions
    out = submit_user_correction(profile, "一样", "一样")
    assert out["strategy"] == "none"
    assert profile.total_transcriptions == before + 1
    assert profile.correction_patterns == []
