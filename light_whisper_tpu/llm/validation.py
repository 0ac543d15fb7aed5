"""LLM audit of AI-learned correction rules.

Port of the reference's daily validation pass
(``commands/profile.rs:720-826``): AI-sourced correction patterns are
reviewed in chunks of 40 by an LLM that returns a JSON array of the
unreasonable rule numbers; only AI-sourced rules are ever removed —
user-confirmed corrections are untouchable. A failed LLM call skips the
chunk (rules get another chance next run) rather than failing the audit.
"""

from __future__ import annotations

import json
import re
from typing import List, Sequence, Set, Tuple

from light_whisper_tpu.llm.client import LlmRequestOptions, send_llm_request
from light_whisper_tpu.llm.provider import LlmEndpoint, ReasoningMode
from light_whisper_tpu.text.hotwords import Source
from light_whisper_tpu.text.profile import UserProfile

CHUNK_SIZE = 40

_SYSTEM_PROMPT = "You are a correction-rule quality auditor. Output JSON only."


def _audit_prompt(chunk: Sequence[Tuple[str, str]]) -> str:
    rules = "".join(
        f'{i + 1}. "{orig}" → "{corrected}"\n'
        for i, (orig, corrected) in enumerate(chunk)
    )
    return (
        f"The following {len(chunk)} correction rules were learned "
        "automatically by an ASR auto-correction system. Review each one.\n\n"
        "Reasonable: homophone/near-homophone fixes, proper-noun casing, "
        "common ASR misrecognition repairs.\n"
        "Unreasonable: semantically unrelated replacements, accidentally "
        "learned conversation fragments, over-generalizations (common words "
        "mapped to unrelated words).\n\n"
        f"Rules:\n{rules}\n"
        "Output a JSON array of the unreasonable rule numbers, e.g. [2,5,7]. "
        "If all are reasonable output []. Output JSON only."
    )


def parse_invalid_indices(raw: str) -> List[int]:
    """Extract a JSON int array, tolerating fences and surrounding prose."""
    text = raw.strip()
    match = re.search(r"\[[^\]]*\]", text, re.DOTALL)
    if not match:
        return []
    try:
        value = json.loads(match.group())
    except json.JSONDecodeError:
        return []
    return [int(v) for v in value if isinstance(v, (int, float))]


def validate_corrections(
    profile: UserProfile,
    endpoint: LlmEndpoint,
    api_key: str = "",
    reasoning_mode: ReasoningMode = ReasoningMode.PROVIDER_DEFAULT,
    transport=None,
) -> int:
    """Audit AI-sourced rules; returns how many were removed."""
    ai_rules = [
        (p.original, p.corrected)
        for p in profile.correction_patterns
        if p.source == Source.AI
    ]
    if not ai_rules:
        return 0

    invalid: Set[Tuple[str, str]] = set()
    for start in range(0, len(ai_rules), CHUNK_SIZE):
        chunk = ai_rules[start : start + CHUNK_SIZE]
        try:
            response = send_llm_request(
                endpoint,
                _SYSTEM_PROMPT,
                _audit_prompt(chunk),
                api_key=api_key,
                options=LlmRequestOptions(
                    stream=False, json_output=True, reasoning_mode=reasoning_mode
                ),
                transport=transport,
            )
        except Exception:
            continue  # chunk gets re-audited next run
        for index in parse_invalid_indices(response.text):
            if 1 <= index <= len(chunk):
                invalid.add(chunk[index - 1])

    if not invalid:
        return 0
    before = len(profile.correction_patterns)
    profile.correction_patterns = [
        p
        for p in profile.correction_patterns
        if p.source == Source.USER or (p.original, p.corrected) not in invalid
    ]
    return before - len(profile.correction_patterns)
