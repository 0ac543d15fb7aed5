"""LLM provider registry: endpoints, URL normalization, reasoning controls.

Port of the reference's provider layer (``llm_provider.rs``): preset
providers (cerebras / openai / deepseek / siliconflow / custom + anthropic
format), URL normalization that respects explicit ``#`` suffixes and known
path tails, per-model reasoning-mode → wire-parameter mapping (GPT-5 effort
ladders, Anthropic thinking budgets, DeepSeek / SiliconFlow / Volcengine /
Cerebras toggles), and the capability-probe error heuristics the client uses
to degrade gracefully.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Dict, List, Optional


class ApiFormat(enum.Enum):
    OPENAI_COMPAT = "openai_compat"
    ANTHROPIC = "anthropic"


class ReasoningMode(enum.Enum):
    PROVIDER_DEFAULT = "provider_default"
    OFF = "off"
    LIGHT = "light"
    BALANCED = "balanced"
    DEEP = "deep"


@dataclasses.dataclass(frozen=True)
class LlmEndpoint:
    provider: str
    api_url: str
    model: str
    timeout_secs: int
    api_format: ApiFormat


_PRESETS = {
    "cerebras": ("https://api.cerebras.ai", "gpt-oss-120b", 5),
    "openai": ("https://api.openai.com", "gpt-4.1-mini", 10),
    "deepseek": ("https://api.deepseek.com", "deepseek-v4-flash", 10),
    "siliconflow": ("https://api.siliconflow.cn", "Qwen/Qwen3-32B", 10),
    "custom": ("http://127.0.0.1:8000", "gpt-4.1-mini", 10),
}


def _default_api_suffix(provider: str) -> str:
    return "responses" if provider == "openai" else "chat/completions"


def normalize_api_url(raw: Optional[str], default_base: str, api_suffix: str) -> str:
    value = (raw or "").strip() or default_base
    if value.endswith("#"):
        return value[:-1].rstrip("/")
    trimmed = value.rstrip("/")
    lower = trimmed.lower()
    if lower.endswith("/chat/completions") or lower.endswith("/responses"):
        return trimmed
    if lower.endswith("/v1") or lower.endswith("/api/v3"):
        return f"{trimmed}/{api_suffix}"
    return f"{trimmed}/v1/{api_suffix}"


def normalize_anthropic_url(raw: Optional[str]) -> str:
    value = (raw or "").strip().rstrip("/")
    if not value:
        return "https://api.anthropic.com/v1/messages"
    if value.endswith("#"):
        return value[:-1].rstrip("/")
    lower = value.lower()
    if lower.endswith("/messages"):
        return value
    if lower.endswith("/v1"):
        return f"{value}/messages"
    return f"{value}/v1/messages"


def endpoint_for_config(
    provider: str = "cerebras",
    base_url: Optional[str] = None,
    model: Optional[str] = None,
    api_format: ApiFormat = ApiFormat.OPENAI_COMPAT,
    timeout_secs: Optional[int] = None,
) -> LlmEndpoint:
    default_base, default_model, default_timeout = _PRESETS.get(
        provider, _PRESETS["custom"]
    )
    if api_format == ApiFormat.ANTHROPIC:
        url = normalize_anthropic_url(base_url)
    else:
        url = normalize_api_url(base_url, default_base, _default_api_suffix(provider))
    return LlmEndpoint(
        provider=provider,
        api_url=url,
        model=model or default_model,
        timeout_secs=timeout_secs or default_timeout,
        api_format=api_format,
    )


def uses_responses_api(endpoint: LlmEndpoint) -> bool:
    return (
        endpoint.api_format == ApiFormat.OPENAI_COMPAT
        and endpoint.api_url.lower().rstrip("/").endswith("/responses")
    )


# ---------------------------------------------------------------------------
# endpoint classification (llm_provider.rs:622-668)
#
# "like" classifiers look at the URL host and model name, not just the
# configured provider id — a custom endpoint pointed at deepseek.com gets
# DeepSeek's wire params.
# ---------------------------------------------------------------------------


def endpoint_host(endpoint: LlmEndpoint) -> Optional[str]:
    from urllib.parse import urlparse

    try:
        host = urlparse(endpoint.api_url).hostname
    except ValueError:
        return None
    return host.lower() if host else None


def _host_matches(endpoint: LlmEndpoint, domain: str) -> bool:
    host = endpoint_host(endpoint)
    return host is not None and (host == domain or host.endswith("." + domain))


def is_volcengine_like(endpoint: LlmEndpoint) -> bool:
    if endpoint.api_format != ApiFormat.OPENAI_COMPAT:
        return False
    model = endpoint.model.strip().lower()
    return (
        _host_matches(endpoint, "volces.com")
        or _host_matches(endpoint, "volcengine.com")
        or "doubao" in model
        or "seed-" in model
    )


def is_deepseek_like(endpoint: LlmEndpoint) -> bool:
    return endpoint.provider == "deepseek" or _host_matches(endpoint, "deepseek.com")


def is_siliconflow_like(endpoint: LlmEndpoint) -> bool:
    return endpoint.provider == "siliconflow" or _host_matches(endpoint, "siliconflow.com")


def is_cerebras_like(endpoint: LlmEndpoint) -> bool:
    return endpoint.provider == "cerebras" or _host_matches(endpoint, "cerebras.ai")


def is_openai_like(endpoint: LlmEndpoint) -> bool:
    return endpoint.provider == "openai" or endpoint_host(endpoint) == "api.openai.com"


# ---------------------------------------------------------------------------
# reasoning controls
# ---------------------------------------------------------------------------

_GPT5_EFFORTS = ["minimal", "low", "medium", "high"]
_GPT5_1_EFFORTS = ["none", "low", "medium", "high"]
_GPT5_2_54_EFFORTS = ["none", "low", "medium", "high", "xhigh"]
_GPT5_5_EFFORTS = ["low", "medium", "high", "xhigh"]
_GPT5_6_EFFORTS = ["low", "medium", "high", "xhigh", "max"]
_GPT5_PRO_EFFORTS = ["high"]
_GPT5_2_54_PRO_EFFORTS = ["medium", "high", "xhigh"]
_GPT5_2_3_CODEX_EFFORTS = ["low", "medium", "high", "xhigh"]
_GPT5_1_CODEX_MAX_EFFORTS = ["none", "medium", "high", "xhigh"]


def gpt5_reasoning_efforts(model: str) -> Optional[List[str]]:
    tail = model.strip().lower().rsplit("/", 1)[-1]

    def is_(name: str) -> bool:
        return tail == name or tail.startswith(name + "-")

    if is_("gpt-5-pro"):
        return _GPT5_PRO_EFFORTS
    if is_("gpt-5.2-pro") or is_("gpt-5.4-pro") or is_("gpt-5.5-pro"):
        return _GPT5_2_54_PRO_EFFORTS
    if is_("gpt-5.2-codex") or is_("gpt-5.3-codex"):
        return _GPT5_2_3_CODEX_EFFORTS
    if is_("gpt-5.1-codex-max"):
        return _GPT5_1_CODEX_MAX_EFFORTS
    if is_("gpt-5-mini") or is_("gpt-5-nano"):
        return _GPT5_EFFORTS
    if is_("gpt-5.1"):
        return _GPT5_1_EFFORTS
    if is_("gpt-5.2") or is_("gpt-5.4"):
        return _GPT5_2_54_EFFORTS
    if is_("gpt-5.5"):
        return _GPT5_5_EFFORTS
    if is_("gpt-5.6"):
        return _GPT5_6_EFFORTS
    if is_("gpt-5"):
        return _GPT5_EFFORTS
    return None


_MODE_INDEX = {
    ReasoningMode.OFF: 0,
    ReasoningMode.LIGHT: 1,
    ReasoningMode.BALANCED: 2,
    ReasoningMode.DEEP: 3,
}


def gpt5_effort_for_mode(model: str, mode: ReasoningMode) -> Optional[str]:
    efforts = gpt5_reasoning_efforts(model)
    if efforts is None or mode == ReasoningMode.PROVIDER_DEFAULT:
        return None
    return efforts[min(_MODE_INDEX[mode], len(efforts) - 1)]


def supports_anthropic_thinking(model: str) -> bool:
    m = model.strip().lower()
    return any(
        key in m for key in ("claude-3-7-sonnet", "claude-sonnet-4", "claude-opus-4")
    )


def supports_deepseek_thinking(model: str) -> bool:
    tail = model.strip().lower().rsplit("/", 1)[-1]
    return tail in ("deepseek-v4-flash", "deepseek-v4-pro", "deepseek-chat", "deepseek-reasoner")


def supports_siliconflow_reasoning(model: str) -> bool:
    m = model.strip().lower()
    tail = m.rsplit("/", 1)[-1]
    return (
        any(
            key in m
            for key in (
                "qwen/qwen3-",
                "qwen/qwq-",
                "thudm/glm-z1-",
                "deepseek-ai/deepseek-r1",
            )
        )
        or tail.startswith(("qwen3-", "qwq-", "glm-z1-"))
        or "deepseek-r1" in tail
        or "thinking" in tail
    )


def supports_cerebras_reasoning(model: str) -> bool:
    return model.strip().lower().rsplit("/", 1)[-1] == "gpt-oss-120b"


def supports_volcengine_thinking(model: str) -> bool:
    m = model.strip().lower()
    doubao_family = (
        "doubao-seed-1-6-" in m
        or "doubao-seed-2-0-" in m
        or "doubao-1.5-thinking-pro" in m
        or "doubao" in m
    )
    return doubao_family and any(
        key in m
        for key in ("thinking", "flash", "seed-2-0-mini", "seed-2-0-lite", "seed-2-0-pro")
    )


# --- strategy taxonomy (llm_provider.rs:778-883) ---------------------------


class ReasoningControl(enum.Enum):
    """Which wire-parameter family controls thinking on this endpoint."""

    OPENAI_EFFORT = "openai_reasoning_effort"
    ANTHROPIC_THINKING = "anthropic_thinking"
    DEEPSEEK_THINKING = "deepseek_thinking"
    SILICONFLOW_THINKING_BUDGET = "siliconflow_thinking_budget"
    CEREBRAS_REASONING_EFFORT = "cerebras_reasoning_effort"
    CEREBRAS_GLM_TOGGLE = "cerebras_disable_reasoning"
    VOLCENGINE_THINKING_TYPE = "volcengine_thinking_type"
    AUTO_OPENAI_COMPAT = "auto_openai_compat_probe"


_CONTROL_SUMMARY = {
    ReasoningControl.OPENAI_EFFORT: "当前模型支持 reasoning effort；关闭/轻量/标准/深度会映射为对应的推理强度。",
    ReasoningControl.ANTHROPIC_THINKING: "当前模型支持 extended thinking；会映射为 thinking + budget_tokens。",
    ReasoningControl.DEEPSEEK_THINKING: "当前模型支持 thinking.type；关闭会下发 disabled，其余档位会启用 thinking。",
    ReasoningControl.SILICONFLOW_THINKING_BUDGET: "当前模型支持 thinking_budget；不同档位会映射为不同预算。",
    ReasoningControl.CEREBRAS_REASONING_EFFORT: "当前模型支持 reasoning_effort；不同档位会映射为不同强度。",
    ReasoningControl.CEREBRAS_GLM_TOGGLE: "当前模型支持 disable_reasoning；关闭会禁用推理，其余档位会启用推理。",
    ReasoningControl.VOLCENGINE_THINKING_TYPE: "当前模型支持 thinking.type；关闭=disabled，轻量/标准=auto，深度=enabled。",
    ReasoningControl.AUTO_OPENAI_COMPAT: "当前是 OpenAI-compatible 后端；会自动探测可用的思考控制参数并缓存成功策略。",
}


def reasoning_control_kind(endpoint: LlmEndpoint) -> Optional[ReasoningControl]:
    """Classify the endpoint's reasoning control (llm_provider.rs:834-879).

    Priority order matters: a custom endpoint can match several families
    (e.g. a doubao model behind a custom URL); the reference resolves
    anthropic → volcengine → deepseek → siliconflow → cerebras → auto-probe
    → gpt-5 ladder.
    """
    model = endpoint.model.strip()
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        return ReasoningControl.ANTHROPIC_THINKING if supports_anthropic_thinking(model) else None
    if (
        is_volcengine_like(endpoint)
        and not uses_responses_api(endpoint)
        and supports_volcengine_thinking(model)
    ):
        return ReasoningControl.VOLCENGINE_THINKING_TYPE
    if is_deepseek_like(endpoint) and supports_deepseek_thinking(model):
        return ReasoningControl.DEEPSEEK_THINKING
    if is_siliconflow_like(endpoint) and supports_siliconflow_reasoning(model):
        return ReasoningControl.SILICONFLOW_THINKING_BUDGET
    if is_cerebras_like(endpoint):
        if supports_cerebras_reasoning(model):
            return ReasoningControl.CEREBRAS_REASONING_EFFORT
        if model.lower().rsplit("/", 1)[-1] == "zai-glm-4.7":
            return ReasoningControl.CEREBRAS_GLM_TOGGLE
    if endpoint.api_format == ApiFormat.OPENAI_COMPAT and not is_openai_like(endpoint):
        return ReasoningControl.AUTO_OPENAI_COMPAT
    if gpt5_reasoning_efforts(model) is not None:
        return ReasoningControl.OPENAI_EFFORT
    return None


def reasoning_support(endpoint: LlmEndpoint) -> Dict[str, Any]:
    """Capability report for the settings UI (llm_provider.rs:891-925)."""
    kind = reasoning_control_kind(endpoint)
    if kind is not None:
        return {
            "supported": True,
            "strategy": kind.value,
            "summary": _CONTROL_SUMMARY[kind],
        }
    if endpoint.api_format == ApiFormat.ANTHROPIC:
        summary = "当前 Anthropic 模型不在官方支持 extended thinking 的型号内，思考模式不可用。"
    elif is_volcengine_like(endpoint):
        summary = "当前火山方舟模型不在官方支持 thinking.type 的型号内，思考模式不可用。"
    elif is_deepseek_like(endpoint):
        summary = "当前 DeepSeek 模型未识别到官方 thinking 控制能力，思考模式不可用。"
    elif is_siliconflow_like(endpoint):
        summary = "当前 SiliconFlow 模型不在官方支持 thinking_budget 的推理模型范围内，思考模式不可用。"
    elif is_cerebras_like(endpoint):
        summary = "当前 Cerebras 模型未识别到官方 reasoning_effort 支持，思考模式不可用。"
    elif gpt5_reasoning_efforts(endpoint.model) is not None:
        summary = "当前模型名看起来属于 GPT-5，但当前接口路径不支持对应的思考控制参数。"
    else:
        summary = "当前模型未识别到官方思考控制参数，思考模式不可用。"
    return {"supported": False, "strategy": None, "summary": summary}


# --- auto-probe strategies for generic OpenAI-compatible backends ----------
#
# Unknown OpenAI-compatible servers (vLLM, sglang, one-api gateways…) accept
# different thinking params. The client tries a preferred strategy, falls
# back on an "unsupported parameter" error, and memoizes what stuck
# (llm_provider.rs:955-1140).


class AutoStrategy(enum.Enum):
    OPENAI_RESPONSES_REASONING = "openai_responses_reasoning"
    OPENAI_CHAT_REASONING_EFFORT = "openai_chat_reasoning_effort"
    TOP_LEVEL_THINKING = "top_level_thinking"
    CHAT_TEMPLATE_THINKING = "chat_template_thinking"
    NO_CONTROLS = "no_controls"


_AUTO_STRATEGY_CACHE: Dict[str, AutoStrategy] = {}


def _auto_cache_key(endpoint: LlmEndpoint, mode: ReasoningMode) -> str:
    return "|".join(
        (
            endpoint.api_format.value,
            endpoint.api_url,
            endpoint.model.strip().lower(),
            str(uses_responses_api(endpoint)),
            mode.value,
        )
    )


def cached_auto_strategy(endpoint: LlmEndpoint, mode: ReasoningMode) -> Optional[AutoStrategy]:
    return _AUTO_STRATEGY_CACHE.get(_auto_cache_key(endpoint, mode))


def remember_auto_strategy(
    endpoint: LlmEndpoint, mode: ReasoningMode, strategy: AutoStrategy
) -> None:
    _AUTO_STRATEGY_CACHE[_auto_cache_key(endpoint, mode)] = strategy


def _preferred_auto_strategy(endpoint: LlmEndpoint, mode: ReasoningMode) -> AutoStrategy:
    if mode == ReasoningMode.OFF:
        return AutoStrategy.TOP_LEVEL_THINKING
    if uses_responses_api(endpoint):
        return AutoStrategy.OPENAI_RESPONSES_REASONING
    return AutoStrategy.OPENAI_CHAT_REASONING_EFFORT


def _auto_fallback_strategies(endpoint: LlmEndpoint, mode: ReasoningMode) -> List[AutoStrategy]:
    if mode == ReasoningMode.OFF:
        return [AutoStrategy.CHAT_TEMPLATE_THINKING]
    if uses_responses_api(endpoint):
        return [AutoStrategy.OPENAI_CHAT_REASONING_EFFORT]
    return [AutoStrategy.TOP_LEVEL_THINKING]


_AUTO_EFFORTS = {
    ReasoningMode.LIGHT: "low",
    ReasoningMode.BALANCED: "medium",
    ReasoningMode.DEEP: "high",
}


def _apply_auto_strategy(
    body: Dict[str, Any], strategy: AutoStrategy, mode: ReasoningMode
) -> None:
    if strategy == AutoStrategy.OPENAI_RESPONSES_REASONING:
        effort = _AUTO_EFFORTS.get(mode)
        if effort is not None:
            body["reasoning"] = {"effort": effort}
    elif strategy == AutoStrategy.OPENAI_CHAT_REASONING_EFFORT:
        effort = _AUTO_EFFORTS.get(mode)
        if effort is not None:
            body["reasoning_effort"] = effort
    elif strategy == AutoStrategy.TOP_LEVEL_THINKING:
        body["thinking"] = {"type": "disabled" if mode == ReasoningMode.OFF else "enabled"}
    elif strategy == AutoStrategy.CHAT_TEMPLATE_THINKING:
        body["chat_template_kwargs"] = {"thinking": mode != ReasoningMode.OFF}
    # NO_CONTROLS: leave the body alone.


def applied_auto_strategy(body: Dict[str, Any]) -> Optional[AutoStrategy]:
    """Which strategy a prepared body carries (for fallback dedup)."""
    if "thinking" in body:
        return AutoStrategy.TOP_LEVEL_THINKING
    if "chat_template_kwargs" in body:
        return AutoStrategy.CHAT_TEMPLATE_THINKING
    if "reasoning" in body:
        return AutoStrategy.OPENAI_RESPONSES_REASONING
    if "reasoning_effort" in body:
        return AutoStrategy.OPENAI_CHAT_REASONING_EFFORT
    return None


def auto_reasoning_fallback_bodies(
    endpoint: LlmEndpoint, request_body: Dict[str, Any], mode: ReasoningMode
) -> List[tuple]:
    """Alternative (strategy, body) pairs to retry after a param rejection.

    Empty when the endpoint isn't an auto-probe one, the mode is provider
    default, or a prior probe concluded the backend takes no controls.
    """
    if (
        reasoning_control_kind(endpoint) != ReasoningControl.AUTO_OPENAI_COMPAT
        or mode == ReasoningMode.PROVIDER_DEFAULT
    ):
        return []
    cached = cached_auto_strategy(endpoint, mode)
    if cached == AutoStrategy.NO_CONTROLS:
        return []
    current = applied_auto_strategy(request_body) or cached
    base = dict(request_body)
    strip_reasoning_controls(base)
    out = []
    for strategy in _auto_fallback_strategies(endpoint, mode):
        if strategy == current:
            continue
        body = dict(base)
        _apply_auto_strategy(body, strategy, mode)
        out.append((strategy, body))
    return out


# --- per-mode wire-parameter application (llm_provider.rs:1142-1239) -------

_ANTHROPIC_THINKING_BUDGETS = {
    ReasoningMode.LIGHT: 1024,
    ReasoningMode.BALANCED: 2048,
    ReasoningMode.DEEP: 4096,
}

_SILICONFLOW_THINKING_BUDGETS = {
    ReasoningMode.LIGHT: 1024,
    ReasoningMode.BALANCED: 4096,
    ReasoningMode.DEEP: 8192,
}

_CEREBRAS_EFFORTS = {
    ReasoningMode.LIGHT: "low",
    ReasoningMode.BALANCED: "medium",
    ReasoningMode.DEEP: "high",
}


def apply_reasoning_controls(
    endpoint: LlmEndpoint, body: Dict[str, Any], mode: ReasoningMode
) -> None:
    """Mutate a request body with the provider's reasoning wire params."""
    kind = reasoning_control_kind(endpoint)
    if kind is None:
        return

    if mode == ReasoningMode.PROVIDER_DEFAULT:
        # Cerebras default effort is pinned low: the server-side default is
        # aggressive enough to visibly hurt TTFT (llm_provider.rs:1153-1158).
        if kind == ReasoningControl.CEREBRAS_REASONING_EFFORT:
            body["reasoning_effort"] = "low"
        return

    if kind == ReasoningControl.ANTHROPIC_THINKING:
        if mode != ReasoningMode.OFF:
            budget = _ANTHROPIC_THINKING_BUDGETS[mode]
            body["thinking"] = {"type": "enabled", "budget_tokens": budget}
            # The Anthropic API requires max_tokens strictly greater than
            # thinking.budget_tokens (thinking spends from the same budget).
            # build_llm_body pins max_tokens to the visible-output cap, so a
            # DEEP budget equal to it would 400 every request — grow the cap
            # by the budget so the answer keeps its full allowance. (The
            # reference carries this as a latent defect; fixed here.)
            max_tokens = body.get("max_tokens")
            if isinstance(max_tokens, int) and max_tokens <= budget:
                body["max_tokens"] = budget + max_tokens
    elif kind == ReasoningControl.VOLCENGINE_THINKING_TYPE:
        body["thinking"] = {
            "type": {
                ReasoningMode.OFF: "disabled",
                ReasoningMode.LIGHT: "auto",
                ReasoningMode.BALANCED: "auto",
                ReasoningMode.DEEP: "enabled",
            }[mode]
        }
    elif kind == ReasoningControl.DEEPSEEK_THINKING:
        body["thinking"] = {"type": "disabled" if mode == ReasoningMode.OFF else "enabled"}
    elif kind == ReasoningControl.SILICONFLOW_THINKING_BUDGET:
        if mode == ReasoningMode.OFF:
            body["enable_thinking"] = False
        else:
            body["enable_thinking"] = True
            body["thinking_budget"] = _SILICONFLOW_THINKING_BUDGETS[mode]
    elif kind == ReasoningControl.CEREBRAS_REASONING_EFFORT:
        if mode != ReasoningMode.OFF:
            body["reasoning_effort"] = _CEREBRAS_EFFORTS[mode]
    elif kind == ReasoningControl.CEREBRAS_GLM_TOGGLE:
        body["disable_reasoning"] = mode == ReasoningMode.OFF
    elif kind == ReasoningControl.AUTO_OPENAI_COMPAT:
        strategy = cached_auto_strategy(endpoint, mode) or _preferred_auto_strategy(
            endpoint, mode
        )
        _apply_auto_strategy(body, strategy, mode)
    elif kind == ReasoningControl.OPENAI_EFFORT:
        effort = gpt5_effort_for_mode(endpoint.model, mode)
        if effort is not None:
            if uses_responses_api(endpoint):
                body["reasoning"] = {"effort": effort}
            else:
                body["reasoning_effort"] = effort


def strip_reasoning_controls(body: Dict[str, Any]) -> None:
    for key in (
        "reasoning",
        "reasoning_effort",
        "thinking",
        "chat_template_kwargs",
        "thinking_budget",
        "enable_thinking",
        "disable_reasoning",
    ):
        body.pop(key, None)


# ---------------------------------------------------------------------------
# capability-probe heuristics (degrade instead of failing hard)
# ---------------------------------------------------------------------------


def _indicates_unsupported(m: str) -> bool:
    """Shared "the server rejected a parameter" signal (llm_provider.rs:557-566)."""
    return any(
        key in m
        for key in (
            "not supported",
            "unsupported",
            "does not support",
            "not permitted",
            "are not valid",
            "invalidparameter",
            "invalid parameter",
            "badrequest",
        )
    )


def looks_like_json_output_unsupported(message: str) -> bool:
    m = message.lower()
    mentions = any(
        key in m
        for key in (
            "response_format",
            "json_object",
            "text.format",
            "json schema",
            "structured output",
        )
    )
    return (mentions and _indicates_unsupported(m)) or (
        ("response_format" in m or "json_object" in m)
        and ("unknown" in m or "invalid" in m)
    )


def looks_like_reasoning_unsupported(message: str) -> bool:
    m = message.lower()
    mentions = any(
        key in m
        for key in (
            "reasoning",
            "reasoning_effort",
            "thinking",
            "chat_template_kwargs",
            "budget_tokens",
            "reasoning_content",
            "enable_thinking",
        )
    )
    return mentions and (
        _indicates_unsupported(m)
        or "unknown parameter" in m
        or "unknown" in m
        or "invalid" in m
        or "unexpected" in m
    )


def looks_like_web_search_unsupported(message: str) -> bool:
    m = message.lower()
    mentions = any(
        key in m for key in ("web_search", "web search", "websearch", "search_preview", "tool")
    )
    return mentions and (
        _indicates_unsupported(m) or "unknown" in m or "invalid" in m
    )


def looks_like_image_input_unsupported(message: str) -> bool:
    """Vision capability probe: does this error mean "no image input"?

    Reference: ``looks_like_image_input_unsupported_error``
    (``llm_provider.rs:568-585``) — used to drop screenshot context and retry
    text-only instead of failing the assistant request.
    """
    m = message.lower()
    mentions_image = any(
        key in m for key in ("image", "vision", "multimodal", "input_image", "image_url")
    )
    if not mentions_image:
        return False
    return (
        _indicates_unsupported(m)
        or "invalid image" in m
        or "invalid content type" in m
        or "unsupported content type" in m
        or "unsupported modality" in m
        or "modalities are not supported" in m
        or ("unknown variant" in m and "expected" in m and "text" in m)
        or "invalid_value" in m
    )


def image_support_cache_key(endpoint: LlmEndpoint) -> str:
    """Memoization key for a probed "does this endpoint take images" bit."""
    return "|".join(
        (
            endpoint.api_format.value,
            endpoint.provider,
            endpoint.api_url,
            endpoint.model.strip().lower(),
        )
    )


# ---------------------------------------------------------------------------
# provider configuration: per-function model/provider resolution
# (user_profile.rs:415-680 — the portable half of the settings model)
# ---------------------------------------------------------------------------

_BUILTIN_PROVIDERS = ("cerebras", "openai", "deepseek", "siliconflow", "custom")


@dataclasses.dataclass
class CustomProvider:
    id: str
    name: str = ""
    base_url: str = ""
    model: str = ""
    api_format: ApiFormat = ApiFormat.OPENAI_COMPAT


@dataclasses.dataclass
class LlmProviderConfig:
    """Which backend each LLM-powered function talks to.

    Polish rides the ``active`` provider; assistant / selection / validation
    can opt into a separate (provider, model) pair. Every resolver degrades
    to the active provider when the separate config is incomplete or names
    an unknown provider — a half-filled settings form must never break the
    pipeline (user_profile.rs:598-668).
    """

    active: str = "cerebras"
    custom_base_url: Optional[str] = None  # legacy migration fields
    custom_model: Optional[str] = None
    reasoning_mode: ReasoningMode = ReasoningMode.PROVIDER_DEFAULT
    polish_reasoning_mode_override: Optional[ReasoningMode] = None
    assistant_reasoning_mode_override: Optional[ReasoningMode] = None
    assistant_use_separate_model: bool = False
    assistant_model_name: Optional[str] = None
    assistant_provider: Optional[str] = None
    selection_reasoning_mode_override: Optional[ReasoningMode] = None
    selection_use_separate_model: bool = False
    selection_model_name: Optional[str] = None
    selection_provider: Optional[str] = None
    validation_use_separate_model: bool = False
    validation_provider: Optional[str] = None
    validation_model_name: Optional[str] = None
    custom_providers: List[CustomProvider] = dataclasses.field(default_factory=list)

    # -- provider identity --------------------------------------------------

    @staticmethod
    def is_builtin(provider: str) -> bool:
        return provider in _BUILTIN_PROVIDERS

    def _known(self, provider: Optional[str]) -> bool:
        if not provider:
            return False
        return self.is_builtin(provider) or any(
            p.id == provider for p in self.custom_providers
        )

    def resolve_active_provider(self) -> str:
        if self._known(self.active):
            return self.active
        if self.custom_providers:
            return self.custom_providers[-1].id
        return "cerebras"

    def fallback_provider_after_removal(self, removed_id: str) -> str:
        """Which provider becomes active when ``removed_id`` is deleted:
        the previous custom entry, else any other, else cerebras."""
        if self.active != removed_id:
            return self.resolve_active_provider()
        ids = [p.id for p in self.custom_providers]
        if removed_id in ids:
            index = ids.index(removed_id)
            if index > 0:
                return ids[index - 1]
            others = [pid for i, pid in enumerate(ids) if i != index]
            if others:
                return others[-1]
        return "cerebras"

    # -- per-function reasoning modes ---------------------------------------

    def polish_reasoning_mode(self) -> ReasoningMode:
        return self.polish_reasoning_mode_override or self.reasoning_mode

    def assistant_reasoning_mode(self) -> ReasoningMode:
        return self.assistant_reasoning_mode_override or self.reasoning_mode

    def selection_reasoning_mode(self) -> ReasoningMode:
        if self._has_valid_separate_selection():
            return self.selection_reasoning_mode_override or self.polish_reasoning_mode()
        return self.polish_reasoning_mode()

    # -- per-function models/providers --------------------------------------

    def _has_valid_separate_selection(self) -> bool:
        if not self.selection_use_separate_model:
            return False
        provider = (self.selection_provider or "").strip()
        model = (self.selection_model_name or "").strip()
        return bool(model) and self._known(provider)

    def assistant_model(self) -> Optional[str]:
        if not self.assistant_use_separate_model:
            return None
        model = (self.assistant_model_name or "").strip()
        return model or None

    def selection_model(self) -> Optional[str]:
        if not self._has_valid_separate_selection():
            return None
        model = (self.selection_model_name or "").strip()
        return model or None

    def validation_model(self) -> Optional[str]:
        if not self.validation_use_separate_model:
            return None
        model = (self.validation_model_name or "").strip()
        return model or None

    def resolve_assistant_provider(self) -> str:
        if self.assistant_use_separate_model and self._known(self.assistant_provider):
            return self.assistant_provider  # type: ignore[return-value]
        return self.resolve_active_provider()

    def resolve_selection_provider(self) -> str:
        if self._has_valid_separate_selection():
            return (self.selection_provider or "").strip()
        return self.resolve_active_provider()

    def resolve_validation_provider(self) -> str:
        if self.validation_use_separate_model and self._known(self.validation_provider):
            return self.validation_provider  # type: ignore[return-value]
        return self.resolve_active_provider()

    # -- endpoint construction ----------------------------------------------

    def endpoint_for(self, function: str = "polish") -> LlmEndpoint:
        """Build the endpoint a given function ("polish" | "assistant" |
        "selection" | "validation") actually talks to."""
        if function == "assistant":
            provider, model = self.resolve_assistant_provider(), self.assistant_model()
        elif function == "selection":
            provider, model = self.resolve_selection_provider(), self.selection_model()
        elif function == "validation":
            provider, model = self.resolve_validation_provider(), self.validation_model()
        else:
            provider, model = self.resolve_active_provider(), None

        custom = next((p for p in self.custom_providers if p.id == provider), None)
        if custom is not None:
            return endpoint_for_config(
                "custom",
                base_url=custom.base_url,
                model=model or custom.model or None,
                api_format=custom.api_format,
            )
        return endpoint_for_config(
            provider,
            base_url=self.custom_base_url if provider == "custom" else None,
            model=model or (self.custom_model if provider == "custom" else None),
        )

    # -- serialization (engine.json / profile storage) ----------------------

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {"active": self.active, "reasoning_mode": self.reasoning_mode.value}
        for key, value in (
            ("custom_base_url", self.custom_base_url),
            ("custom_model", self.custom_model),
            ("assistant_model", self.assistant_model_name),
            ("assistant_provider", self.assistant_provider),
            ("selection_model", self.selection_model_name),
            ("selection_provider", self.selection_provider),
            ("validation_model", self.validation_model_name),
            ("validation_provider", self.validation_provider),
        ):
            if value is not None:
                out[key] = value
        for key, mode in (
            ("polish_reasoning_mode", self.polish_reasoning_mode_override),
            ("assistant_reasoning_mode", self.assistant_reasoning_mode_override),
            ("selection_reasoning_mode", self.selection_reasoning_mode_override),
        ):
            if mode is not None:
                out[key] = mode.value
        for key, flag in (
            ("assistant_use_separate_model", self.assistant_use_separate_model),
            ("selection_use_separate_model", self.selection_use_separate_model),
            ("validation_use_separate_model", self.validation_use_separate_model),
        ):
            if flag:
                out[key] = True
        if self.custom_providers:
            out["custom_providers"] = [
                {
                    "id": p.id,
                    "name": p.name,
                    "base_url": p.base_url,
                    "model": p.model,
                    "api_format": p.api_format.value,
                }
                for p in self.custom_providers
            ]
        return out

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "LlmProviderConfig":
        def mode(key):
            raw = data.get(key)
            try:
                return ReasoningMode(raw) if raw is not None else None
            except ValueError:
                return None

        providers = []
        for item in data.get("custom_providers", []) or []:
            if not isinstance(item, dict) or not item.get("id"):
                continue
            try:
                fmt = ApiFormat(item.get("api_format", "openai_compat"))
            except ValueError:
                fmt = ApiFormat.OPENAI_COMPAT
            providers.append(
                CustomProvider(
                    id=item["id"],
                    name=item.get("name", ""),
                    base_url=item.get("base_url", ""),
                    model=item.get("model", ""),
                    api_format=fmt,
                )
            )
        return cls(
            active=data.get("active", "cerebras"),
            custom_base_url=data.get("custom_base_url"),
            custom_model=data.get("custom_model"),
            reasoning_mode=mode("reasoning_mode") or ReasoningMode.PROVIDER_DEFAULT,
            polish_reasoning_mode_override=mode("polish_reasoning_mode"),
            assistant_reasoning_mode_override=mode("assistant_reasoning_mode"),
            assistant_use_separate_model=bool(data.get("assistant_use_separate_model")),
            assistant_model_name=data.get("assistant_model"),
            assistant_provider=data.get("assistant_provider"),
            selection_reasoning_mode_override=mode("selection_reasoning_mode"),
            selection_use_separate_model=bool(data.get("selection_use_separate_model")),
            selection_model_name=data.get("selection_model"),
            selection_provider=data.get("selection_provider"),
            validation_use_separate_model=bool(data.get("validation_use_separate_model")),
            validation_provider=data.get("validation_provider"),
            validation_model_name=data.get("validation_model"),
            custom_providers=providers,
        )
