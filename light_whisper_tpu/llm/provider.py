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


_ANTHROPIC_THINKING_BUDGETS = {
    ReasoningMode.LIGHT: 2048,
    ReasoningMode.BALANCED: 6144,
    ReasoningMode.DEEP: 16384,
}


def apply_reasoning_controls(
    endpoint: LlmEndpoint, body: Dict[str, Any], mode: ReasoningMode
) -> None:
    """Mutate a request body with the provider's reasoning wire params."""
    if mode == ReasoningMode.PROVIDER_DEFAULT:
        return

    if endpoint.api_format == ApiFormat.ANTHROPIC:
        if not supports_anthropic_thinking(endpoint.model):
            return
        if mode == ReasoningMode.OFF:
            body["thinking"] = {"type": "disabled"}
        else:
            body["thinking"] = {
                "type": "enabled",
                "budget_tokens": _ANTHROPIC_THINKING_BUDGETS[mode],
            }
        return

    effort = gpt5_effort_for_mode(endpoint.model, mode)
    if effort is not None:
        if uses_responses_api(endpoint):
            body["reasoning"] = {"effort": effort}
        else:
            body["reasoning_effort"] = effort
        return

    enabled = mode != ReasoningMode.OFF
    if endpoint.provider == "deepseek" and supports_deepseek_thinking(endpoint.model):
        body["thinking"] = {"type": "enabled" if enabled else "disabled"}
    elif endpoint.provider == "siliconflow" and supports_siliconflow_reasoning(endpoint.model):
        body["enable_thinking"] = enabled
    elif endpoint.provider == "cerebras" and supports_cerebras_reasoning(endpoint.model):
        body["reasoning_effort"] = {
            ReasoningMode.OFF: "low",
            ReasoningMode.LIGHT: "low",
            ReasoningMode.BALANCED: "medium",
            ReasoningMode.DEEP: "high",
        }[mode]


def strip_reasoning_controls(body: Dict[str, Any]) -> None:
    for key in ("reasoning", "reasoning_effort", "thinking", "enable_thinking"):
        body.pop(key, None)


# ---------------------------------------------------------------------------
# capability-probe heuristics (degrade instead of failing hard)
# ---------------------------------------------------------------------------


def looks_like_json_output_unsupported(message: str) -> bool:
    m = message.lower()
    return (
        "response_format" in m
        or "json_object" in m
        or ("json" in m and ("not supported" in m or "unsupported" in m or "invalid" in m))
    )


def looks_like_reasoning_unsupported(message: str) -> bool:
    m = message.lower()
    return any(
        key in m
        for key in ("reasoning_effort", "reasoning.", "enable_thinking", "thinking")
    ) and any(key in m for key in ("unsupported", "not supported", "unknown", "invalid", "unexpected"))


def looks_like_web_search_unsupported(message: str) -> bool:
    m = message.lower()
    return ("web_search" in m or "tool" in m) and any(
        key in m for key in ("unsupported", "not supported", "unknown", "invalid")
    )
