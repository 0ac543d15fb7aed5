"""Voice assistant: contextual Q&A with memory and a web-search gate.

Port of the reference's assistant core (``assistant_service.rs``): the
engine-agnostic logic — 12-turn conversation memory, context assembly
(selected text, foreground-app info, optional search results), and the
heuristic web-search decision ladder:

    empty → no | explicit "don't search" → no | explicit "search ..." → yes
    | generation/editing request → no | realtime/freshness cue → yes
    | factual-verification cue → yes | otherwise → no

Window management, screenshots and event emission stay host-shell concerns.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

from light_whisper_tpu.llm.client import LlmRequestOptions, send_llm_request
from light_whisper_tpu.llm.provider import LlmEndpoint, ReasoningMode

MAX_CONVERSATION_TURNS = 12

_NO_SEARCH_CUES = (
    "不要联网", "不用联网", "别联网", "不要搜索", "不用搜索", "别搜索",
    "不要查", "不用查", "别查",
    "no search", "without searching", "do not search", "don't search",
)
_EXPLICIT_SEARCH_CUES = (
    "查一下", "查下", "帮我查", "搜一下", "搜下", "搜索", "联网查", "上网查",
    "网上查", "检索",
    "look up", "search", "google", "browse",
)
_GENERATION_CUES = (
    "帮我写", "写一", "写封", "写个", "写段", "改写", "润色", "翻译", "总结",
    "扩写", "缩写", "回复", "草拟",
    "write a", "write an", "write me", "draft", "rewrite", "polish",
    "translate", "summarize", "reply to",
)
_REALTIME_CUES = (
    "天气", "温度", "气温", "预报", "下雨", "实时", "当前", "现在", "今天",
    "今日", "明天", "昨天", "最近", "最新", "新闻", "价格", "股价", "汇率",
    "利率", "航班", "路况", "比赛", "赛程", "结果",
    "weather", "temperature", "forecast", "current", "today", "tomorrow",
    "yesterday", "recent", "latest", "news", "price", "stock",
    "exchange rate", "flight", "traffic", "score", "schedule",
)
_VERIFICATION_CUES = (
    "现任", "是谁", "还有效吗", "是否有效", "是真的吗", "核实", "查证",
    "官方来源", "给个来源", "这个来源", "哪个版本", "发布了吗", "支持了吗",
    "who is ", "is it still valid", "is this true", "verify", "fact check",
    "official source", "which version", "has been released",
)


@dataclasses.dataclass
class WebSearchDecision:
    should_search: bool
    reason: str


def decide_web_search(asr_text: str, selected_text: Optional[str] = None) -> WebSearchDecision:
    query = asr_text.strip().lower()
    has_selection = bool(selected_text and selected_text.strip())
    if not query:
        return WebSearchDecision(False, "empty_request")
    if any(cue in query for cue in _NO_SEARCH_CUES):
        return WebSearchDecision(False, "explicit_no_search")
    if any(cue in query for cue in _EXPLICIT_SEARCH_CUES):
        return WebSearchDecision(True, "explicit_search")
    if any(cue in query for cue in _GENERATION_CUES) or (
        has_selection and any(cue in query for cue in ("这段", "上面", "选中"))
    ):
        return WebSearchDecision(False, "generation_or_editing")
    if any(cue in query for cue in _REALTIME_CUES):
        return WebSearchDecision(True, "realtime_or_freshness")
    if any(cue in query for cue in _VERIFICATION_CUES):
        return WebSearchDecision(True, "factual_verification")
    return WebSearchDecision(False, "no_search_intent")


SYSTEM_PROMPT = (
    "You are a fast, precise voice assistant. The user speaks; their words "
    "arrive as ASR text — tolerate recognition noise and infer intent. Answer "
    "directly and concisely in the user's language. When <selected_text> is "
    "present, the request is about it. <app_context> describes where the "
    "user is working; use it for formatting only. When <search_results> are "
    "present, ground factual claims in them and cite inline as [n]."
)


@dataclasses.dataclass
class AssistantTurn:
    role: str  # "user" | "assistant"
    text: str


class AssistantSession:
    """One conversation: bounded memory + context assembly + LLM calls."""

    def __init__(
        self,
        endpoint: LlmEndpoint,
        api_key: str = "",
        transport=None,
        search_fn: Optional[Callable[[str], str]] = None,
        reasoning_mode: ReasoningMode = ReasoningMode.PROVIDER_DEFAULT,
    ) -> None:
        self.endpoint = endpoint
        self.api_key = api_key
        self.transport = transport
        self.search_fn = search_fn  # query → rendered <search_results> block
        self.reasoning_mode = reasoning_mode
        self.history: List[AssistantTurn] = []

    def _context_block(
        self,
        question: str,
        selected_text: Optional[str],
        app_context: Optional[str],
    ) -> Tuple[str, WebSearchDecision]:
        decision = decide_web_search(question, selected_text)
        parts: List[str] = []
        for turn in self.history[-MAX_CONVERSATION_TURNS:]:
            parts.append(f"<{turn.role}>{turn.text}</{turn.role}>")
        if selected_text and selected_text.strip():
            parts.append(f"<selected_text>{selected_text.strip()}</selected_text>")
        if app_context:
            parts.append(f"<app_context>{app_context}</app_context>")
        if decision.should_search and self.search_fn is not None:
            try:
                rendered = self.search_fn(question)
                if rendered:
                    parts.append(rendered)
            except Exception:
                pass  # search failure degrades to unaided answering
        parts.append(f"<question>{question.strip()}</question>")
        return "\n".join(parts), decision

    def ask(
        self,
        question: str,
        selected_text: Optional[str] = None,
        app_context: Optional[str] = None,
        on_delta: Optional[Callable[[str], None]] = None,
    ) -> str:
        user_text, _decision = self._context_block(question, selected_text, app_context)
        response = send_llm_request(
            self.endpoint,
            SYSTEM_PROMPT,
            user_text,
            api_key=self.api_key,
            options=LlmRequestOptions(stream=True, reasoning_mode=self.reasoning_mode),
            transport=self.transport,
            on_delta=on_delta,
        )
        answer = response.text.strip()
        self.history.append(AssistantTurn("user", question.strip()))
        self.history.append(AssistantTurn("assistant", answer))
        # bounded memory: keep the most recent turns only
        if len(self.history) > 2 * MAX_CONVERSATION_TURNS:
            self.history = self.history[-2 * MAX_CONVERSATION_TURNS :]
        return answer

    def reset(self) -> None:
        self.history.clear()
