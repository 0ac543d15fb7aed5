"""User-correction learning: LLM word-pair extraction with char-diff fallback.

Behavior parity with ``submit_user_correction`` and its helpers
(``commands/profile.rs:15-199``): when the user edits a transcription, ask
the configured LLM to extract stable word-level correction pairs — given the
raw ASR text, the displayed (possibly AI-polished) text, and the user's
final text — and feed them into the profile as user-sourced corrections.
Any LLM failure (no key, transport error, empty/unparseable output) falls
back to the local char-diff pair collection, and finally to a bare learning
tick, so correction learning never depends on network availability.

The Chinese extraction prompts in :func:`build_extraction_prompt` are kept
VERBATIM from ``commands/profile.rs:96-121`` — acknowledged copied text. The
prompt IS the feature's behavior spec: it determines exactly which pair
shapes the LLM returns, and the replay fixtures assert those outputs.
Rewording it would change what the feature learns, which is parity risk
with no upside; the surrounding architecture (fallback ladder, JSON
parsing, profile integration) is original.
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, List, Optional, Tuple

from light_whisper_tpu.text import profile as profile_lib
from light_whisper_tpu.text.hotwords import Source

log = logging.getLogger(__name__)

EXTRACTION_SYSTEM_PROMPT = "你是文本差异提取工具，只输出 JSON。"


def build_extraction_prompt(before: str, after: str, raw_original: Optional[str]) -> str:
    """Three-way prompt when the raw ASR text is known, two-way otherwise
    (commands/profile.rs:96-121)."""
    if raw_original and raw_original.strip():
        return (
            "对比以下三段文本，提取应该写入学习规则的词级纠错。\n"
            f"ASR 原文（润色前）：{raw_original}\n"
            f"当前显示文本：{before}\n"
            f"用户修改后：{after}\n\n"
            '以 JSON 数组输出，每项 {"from":"原词","to":"改后词"}。\n'
            "优先提取稳定、可复用的识别纠错或术语纠错。\n"
            "如果用户最终文本已经和 ASR 原文一致，说明是当前显示文本把内容改坏了，"
            "此时提取“当前显示文本 -> 用户修改后”。\n"
            "如果用户最终文本修正了 ASR 原文里的错误，也提取“ASR 原文 -> 用户修改后”。\n"
            "同一处只保留最直接的一条映射，不要输出整句。如无有效差异输出空数组 []。"
        )
    return (
        "对比以下两句话，提取用户修改的词级别纠错。\n"
        f"修改前：{before}\n修改后：{after}\n\n"
        '以 JSON 数组输出，每项 {"from":"原词","to":"改后词"}。\n'
        "只输出被改动的词/短语，不要输出整句。如无差异输出空数组 []。"
    )


def parse_correction_pairs(raw: str) -> List[Tuple[str, str]]:
    """Accept a bare JSON array of ``{"from","to"}`` items, or any object
    whose values contain such an array (commands/profile.rs:171-199)."""

    def from_array(items: Any) -> List[Tuple[str, str]]:
        pairs: List[Tuple[str, str]] = []
        if not isinstance(items, list):
            return pairs
        for item in items:
            if not isinstance(item, dict):
                continue
            src, dst = item.get("from"), item.get("to")
            if isinstance(src, str) and isinstance(dst, str) and src and dst and src != dst:
                pairs.append((src, dst))
        return pairs

    from light_whisper_tpu.llm.polish import _normalize_payload

    try:
        payload = json.loads(_normalize_payload(raw))
    except json.JSONDecodeError:
        return []
    if isinstance(payload, list):
        return from_array(payload)
    if isinstance(payload, dict):
        for value in payload.values():
            pairs = from_array(value)
            if pairs:
                return pairs
    return []


def extract_corrections_via_llm(
    endpoint,
    api_key: str,
    before: str,
    after: str,
    raw_original: Optional[str] = None,
    transport=None,
) -> List[Tuple[str, str]]:
    """Best-effort LLM extraction; every failure path returns [] so callers
    always have the local diff fallback."""
    if endpoint is None or not api_key:
        return []
    from light_whisper_tpu.llm.client import LlmRequestOptions, send_llm_request

    prompt = build_extraction_prompt(before, after, raw_original)
    try:
        response = send_llm_request(
            endpoint,
            EXTRACTION_SYSTEM_PROMPT,
            prompt,
            api_key=api_key,
            options=LlmRequestOptions(stream=False, json_output=True),
            transport=transport,
        )
    except Exception as exc:
        log.warning("用户纠错 LLM 请求失败: %s", exc)
        return []
    raw = response.text.strip()
    if not raw:
        log.warning("用户纠错 LLM 响应中未找到文本内容")
        return []
    pairs = parse_correction_pairs(raw)
    if not pairs:
        log.info("LLM 未提取到词级纠错，回退到本地 diff 学习")
    return pairs


def submit_user_correction(
    profile,
    original: str,
    corrected: str,
    raw_original: Optional[str] = None,
    *,
    endpoint=None,
    api_key: str = "",
    transport=None,
) -> Dict[str, Any]:
    """Learn from a user's manual edit, preferring LLM word pairs.

    Returns telemetry: which strategy applied and the pairs learned."""
    pairs = extract_corrections_via_llm(
        endpoint, api_key, original, corrected, raw_original, transport=transport
    )
    strategy = "llm"
    if not pairs:
        baselines = [b for b in (raw_original, original) if b]
        pairs = profile_lib.collect_diff_correction_pairs(baselines, corrected)
        strategy = "diff"
    if pairs:
        profile_lib.learn_from_structured(profile, pairs, [], Source.USER)
    else:
        # Nothing segmentable — still a learning tick (profile_service.rs:677-707
        # semantics for an empty diff: counters advance, no patterns).
        strategy = "none"
        profile_lib.learn_from_structured(profile, [], [], Source.USER)
    return {"strategy": strategy, "pairs": pairs}
