"""Selected-text actions: translate / explain / improve / summarize.

The portable core of the reference's selection assistant
(``selection_service.rs``) — the Win32 mouse hooks, UIAutomation text grabs
and floating toolbar windows stay shell concerns; what the engine offers is
the action semantics: given a grabbed selection and an action, produce the
replacement/answer text via the LLM stack, in the selection's language.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

from light_whisper_tpu.llm.client import LlmRequestOptions, send_llm_request
from light_whisper_tpu.llm.provider import LlmEndpoint, ReasoningMode

_ACTION_PROMPTS: Dict[str, str] = {
    "translate": (
        "Translate <selection> into {target}. Output only the translation — "
        "no explanations, no quotes. Preserve formatting and line breaks."
    ),
    "explain": (
        "Explain <selection> clearly and concisely in {target}. If it is "
        "code, explain what it does and any notable pitfalls."
    ),
    "improve": (
        "Rewrite <selection> with better clarity, grammar and flow in its "
        "original language. Preserve meaning, tone, formatting and length "
        "class. Output only the rewritten text."
    ),
    "summarize": (
        "Summarize <selection> in {target} in at most three sentences, "
        "keeping every load-bearing fact."
    ),
}

DEFAULT_TARGET_LANGUAGE = "the user's language (mirror the selection's language)"


@dataclasses.dataclass
class SelectionActionResult:
    action: str
    text: str
    replace_selection: bool  # improve/translate replace; explain/summarize display


def run_selection_action(
    endpoint: LlmEndpoint,
    action: str,
    selection: str,
    target_language: Optional[str] = None,
    api_key: str = "",
    transport=None,
    reasoning_mode: ReasoningMode = ReasoningMode.PROVIDER_DEFAULT,
    on_delta: Optional[Callable[[str], None]] = None,
) -> SelectionActionResult:
    if action not in _ACTION_PROMPTS:
        raise ValueError(f"unknown selection action: {action!r}")
    selection = selection.strip()
    if not selection:
        raise ValueError("empty selection")

    system_prompt = _ACTION_PROMPTS[action].format(
        target=target_language or DEFAULT_TARGET_LANGUAGE
    )
    response = send_llm_request(
        endpoint,
        system_prompt,
        f"<selection>{selection}</selection>",
        api_key=api_key,
        options=LlmRequestOptions(stream=True, reasoning_mode=reasoning_mode),
        transport=transport,
        on_delta=on_delta,
    )
    return SelectionActionResult(
        action=action,
        text=response.text.strip(),
        replace_selection=action in ("translate", "improve"),
    )
