"""Per-function provider resolution (user_profile.rs:415-680)."""

from light_whisper_tpu.llm.provider import (
    ApiFormat,
    CustomProvider,
    LlmProviderConfig,
    ReasoningMode,
)


def test_active_provider_falls_back_when_unknown():
    cfg = LlmProviderConfig(active="ghost")
    assert cfg.resolve_active_provider() == "cerebras"
    cfg2 = LlmProviderConfig(
        active="ghost",
        custom_providers=[CustomProvider(id="mine", base_url="http://x/v1")],
    )
    assert cfg2.resolve_active_provider() == "mine"  # last custom wins


def test_fallback_after_removal_prefers_previous_entry():
    cfg = LlmProviderConfig(
        active="b",
        custom_providers=[
            CustomProvider(id="a", base_url="http://a/v1"),
            CustomProvider(id="b", base_url="http://b/v1"),
            CustomProvider(id="c", base_url="http://c/v1"),
        ],
    )
    assert cfg.fallback_provider_after_removal("b") == "a"
    first = LlmProviderConfig(active="a", custom_providers=cfg.custom_providers)
    assert first.fallback_provider_after_removal("a") == "c"  # no previous → last other
    lone = LlmProviderConfig(active="x", custom_providers=[CustomProvider(id="x")])
    assert lone.fallback_provider_after_removal("x") == "cerebras"


def test_selection_requires_complete_separate_config():
    # separate model on but provider unknown → everything falls back to active
    cfg = LlmProviderConfig(
        active="deepseek",
        selection_use_separate_model=True,
        selection_provider="nope",
        selection_model_name="m",
    )
    assert cfg.resolve_selection_provider() == "deepseek"
    assert cfg.selection_model() is None
    # complete config → separate provider + model + its reasoning mode
    good = LlmProviderConfig(
        active="deepseek",
        reasoning_mode=ReasoningMode.DEEP,
        polish_reasoning_mode_override=ReasoningMode.LIGHT,
        selection_use_separate_model=True,
        selection_provider="openai",
        selection_model_name="gpt-5-mini",
        selection_reasoning_mode_override=ReasoningMode.BALANCED,
    )
    assert good.resolve_selection_provider() == "openai"
    assert good.selection_model() == "gpt-5-mini"
    assert good.selection_reasoning_mode() == ReasoningMode.BALANCED
    # without an override, selection inherits POLISH's mode, not the global
    noovr = LlmProviderConfig(
        active="deepseek",
        reasoning_mode=ReasoningMode.DEEP,
        polish_reasoning_mode_override=ReasoningMode.LIGHT,
        selection_use_separate_model=True,
        selection_provider="openai",
        selection_model_name="gpt-5-mini",
    )
    assert noovr.selection_reasoning_mode() == ReasoningMode.LIGHT


def test_assistant_and_validation_resolution():
    cfg = LlmProviderConfig(
        active="cerebras",
        assistant_use_separate_model=True,
        assistant_provider="openai",
        assistant_model_name="gpt-5.1",
        validation_use_separate_model=True,
        validation_provider="deepseek",
        validation_model_name="deepseek-v4-flash",
    )
    assert cfg.resolve_assistant_provider() == "openai"
    assert cfg.assistant_model() == "gpt-5.1"
    assert cfg.resolve_validation_provider() == "deepseek"
    # toggles off → fall back, models hidden
    off = LlmProviderConfig(active="cerebras", assistant_model_name="gpt-5.1")
    assert off.resolve_assistant_provider() == "cerebras"
    assert off.assistant_model() is None


def test_endpoint_for_function_uses_custom_provider_url():
    cfg = LlmProviderConfig(
        active="vllm",
        custom_providers=[
            CustomProvider(id="vllm", base_url="http://127.0.0.1:8000", model="qwen3")
        ],
        assistant_use_separate_model=True,
        assistant_provider="vllm",
        assistant_model_name="qwen3-bigger",
    )
    polish = cfg.endpoint_for("polish")
    assert polish.api_url == "http://127.0.0.1:8000/v1/chat/completions"
    assert polish.model == "qwen3"
    assistant = cfg.endpoint_for("assistant")
    assert assistant.model == "qwen3-bigger"  # separate model overrides


def test_roundtrip_serialization():
    cfg = LlmProviderConfig(
        active="mine",
        reasoning_mode=ReasoningMode.BALANCED,
        polish_reasoning_mode_override=ReasoningMode.OFF,
        assistant_use_separate_model=True,
        assistant_provider="openai",
        assistant_model_name="gpt-5.2",
        custom_providers=[
            CustomProvider(
                id="mine", name="Mine", base_url="http://h/v1", model="m",
                api_format=ApiFormat.ANTHROPIC,
            )
        ],
    )
    again = LlmProviderConfig.from_dict(cfg.to_dict())
    assert again == cfg
    # hostile/legacy input degrades instead of raising
    junk = LlmProviderConfig.from_dict(
        {"active": "x", "reasoning_mode": "??", "custom_providers": [{"no_id": 1}, "str"]}
    )
    assert junk.reasoning_mode == ReasoningMode.PROVIDER_DEFAULT
    assert junk.custom_providers == []
