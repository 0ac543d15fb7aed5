"""Voice assistant: contextual Q&A with memory and a web-search gate.

Port of the reference's assistant core (``assistant_service.rs``): the
engine-agnostic logic — 12-turn conversation memory anchored to the
conversation's initial request/response pair, CDATA-wrapped context assembly
(selected text, foreground-app info, screenshots, optional search results),
contextual search-query composition across turns, per-endpoint image-support
memoization with text-only degradation, and the heuristic web-search
decision ladder:

    empty → no | explicit "don't search" → no | explicit "search ..." → yes
    | generation/editing request → no | realtime/freshness cue → yes
    | factual-verification cue → yes | otherwise → no

Window management, screenshot capture and event emission stay host-shell
concerns; this layer consumes whatever context the shell hands it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

from light_whisper_tpu.llm.client import (
    LlmHttpError,
    LlmRequestOptions,
    send_llm_request,
)
from light_whisper_tpu.llm.provider import (
    LlmEndpoint,
    ReasoningMode,
    image_support_cache_key,
    looks_like_image_input_unsupported,
)

MAX_CONVERSATION_TURNS = 12


def wrap_xml_cdata(tag: str, value: str) -> str:
    """``<tag><![CDATA[...]]></tag>`` with ``]]>`` made inert.

    Reference: ``foreground.rs:25-27`` — untrusted text (ASR output, window
    titles, web results) goes into the prompt as CDATA so markup inside it
    can't masquerade as context structure.
    """
    escaped = value.replace("]]>", "]]]]><![CDATA[>")
    return f"<{tag}><![CDATA[{escaped}]]></{tag}>"

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
    "present, ground factual claims in them and cite inline as [n]. When a "
    "<conversation_context> is present, use its initial request, initial "
    "response and turns to resolve references, but answer ONLY the newest "
    "<user_request> — never restate the history."
)


# ---------------------------------------------------------------------------
# search-query composition (assistant_service.rs:291-355)
# ---------------------------------------------------------------------------

_SEARCH_PREFIXES = (
    "请你帮我查一下",
    "请帮我查一下",
    "你帮我查一下",
    "帮我查一下",
    "请你搜索一下",
    "请搜索一下",
    "搜索一下",
    "查一下",
    "look up ",
    "search for ",
    "search ",
)
_EDGE_PUNCT = " \t\r\n，。！？,.!?：:"


def normalized_search_query(request: str) -> str:
    """Strip imperative search prefixes and edge punctuation from a query."""
    trimmed = request.strip(_EDGE_PUNCT)
    lower = trimmed.lower()
    for prefix in _SEARCH_PREFIXES:
        if lower.startswith(prefix):
            candidate = trimmed[len(prefix) :].strip(_EDGE_PUNCT)
            if candidate:
                return candidate
    return trimmed


def _truncate(value: str, max_chars: int) -> str:
    value = value.strip()
    return value if len(value) <= max_chars else value[:max_chars]


def contextual_search_query(
    request: str,
    initial_request: Optional[str] = None,
    recent_user: Optional[str] = None,
) -> str:
    """Compose a search query that keeps the conversation's subject.

    A follow-up like "那明天呢" is useless as a standalone search; the
    reference joins the (normalized, truncated) initial request, the most
    recent distinct user turn, and the latest request with a follow-up
    separator (``assistant_service.rs:329-355``).
    """
    latest = normalized_search_query(request)
    if initial_request is None:
        return latest
    initial = normalized_search_query(initial_request)
    parts = [_truncate(initial, 280)]
    if recent_user:
        recent = normalized_search_query(recent_user)
        if recent.lower() != initial.lower():
            parts.append(_truncate(recent, 220))
    if latest.lower() != initial.lower():
        parts.append(_truncate(latest, 360))
    return "；后续问题：".join(p for p in parts if p)


@dataclasses.dataclass
class AssistantTurn:
    role: str  # "user" | "assistant"
    text: str


# Per-endpoint probed image support: True/False once known, absent while
# unprobed (assistant_service.rs:919-945 holds this on AppState).
_image_support: Dict[str, bool] = {}


def reset_image_support_cache() -> None:
    _image_support.clear()


class AssistantSession:
    """One conversation: anchored memory + context assembly + LLM calls.

    Memory discipline (``assistant_service.rs:245-289``): the FIRST
    request/response pair is pinned for the life of the session — it names
    the conversation's subject — while later turns ride a sliding
    ``MAX_CONVERSATION_TURNS`` window. Follow-ups therefore keep resolving
    "它/那个" against the original topic even after the window slides.
    """

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
        self.initial_request: Optional[str] = None
        self.initial_response: Optional[str] = None
        self.history: List[AssistantTurn] = []

    # -- context assembly ---------------------------------------------------

    def _conversation_context(self) -> Optional[str]:
        if self.initial_request is None:
            return None
        out = ["<conversation_context>"]
        out.append(wrap_xml_cdata("initial_request", self.initial_request))
        out.append(wrap_xml_cdata("initial_response", self.initial_response or ""))
        for turn in self.history[-MAX_CONVERSATION_TURNS:]:
            role = "assistant" if turn.role == "assistant" else "user"
            out.append(
                f'<turn role="{role}">'
                + wrap_xml_cdata("content", turn.text.strip())
                + "</turn>"
            )
        out.append("</conversation_context>")
        return "\n".join(out)

    def _search_query(self, question: str) -> str:
        recent_user = next(
            (t.text for t in reversed(self.history) if t.role == "user"), None
        )
        return contextual_search_query(question, self.initial_request, recent_user)

    def _context_block(
        self,
        question: str,
        selected_text: Optional[str],
        app_context: Optional[str],
        has_images: bool,
    ) -> Tuple[str, WebSearchDecision]:
        decision = decide_web_search(question, selected_text)
        parts: List[str] = []
        conversation = self._conversation_context()
        if conversation:
            parts.append(conversation)
        if selected_text and selected_text.strip():
            parts.append(wrap_xml_cdata("selected_text", selected_text.strip()))
        if app_context:
            parts.append(wrap_xml_cdata("app_context", app_context))
        if has_images:
            parts.append(
                "<screen_context>附带的截图是用户当前屏幕；当请求涉及"
                "「屏幕上/这个页面/这里」时以截图为准。</screen_context>"
            )
        if decision.should_search and self.search_fn is not None:
            try:
                rendered = self.search_fn(self._search_query(question))
                if rendered:
                    parts.append(rendered)
            except Exception:
                pass  # search failure degrades to unaided answering
        parts.append(wrap_xml_cdata("user_request", question.strip()))
        return "\n".join(parts), decision

    # -- request ------------------------------------------------------------

    def ask(
        self,
        question: str,
        selected_text: Optional[str] = None,
        app_context: Optional[str] = None,
        images: Optional[List[Tuple[str, str]]] = None,
        on_delta: Optional[Callable[[str], None]] = None,
    ) -> str:
        """One assistant turn; ``images`` are (mime, base64) screenshots.

        Image context degrades instead of failing: endpoints memoized as
        text-only never receive images, and an image-input rejection retries
        the same request text-only and records the verdict
        (``assistant_service.rs:1038-1060``).
        """
        cache_key = image_support_cache_key(self.endpoint)
        if images and _image_support.get(cache_key) is False:
            images = None
        user_text, _decision = self._context_block(
            question, selected_text, app_context, bool(images)
        )
        options = LlmRequestOptions(
            stream=True,
            reasoning_mode=self.reasoning_mode,
            images=list(images) if images else [],
        )
        try:
            response = send_llm_request(
                self.endpoint,
                SYSTEM_PROMPT,
                user_text,
                api_key=self.api_key,
                options=options,
                transport=self.transport,
                on_delta=on_delta,
            )
            if images:
                _image_support[cache_key] = True
        except LlmHttpError as err:
            if not images or not looks_like_image_input_unsupported(err.message):
                raise
            _image_support[cache_key] = False
            user_text, _decision = self._context_block(
                question, selected_text, app_context, False
            )
            response = send_llm_request(
                self.endpoint,
                SYSTEM_PROMPT,
                user_text,
                api_key=self.api_key,
                options=LlmRequestOptions(
                    stream=True, reasoning_mode=self.reasoning_mode
                ),
                transport=self.transport,
                on_delta=on_delta,
            )
        answer = response.text.strip()
        if self.initial_request is None:
            self.initial_request = question.strip()
            self.initial_response = answer
        else:
            self.history.append(AssistantTurn("user", question.strip()))
            self.history.append(AssistantTurn("assistant", answer))
            # bounded memory: the render takes the last MAX_CONVERSATION_TURNS
            # anyway; cap storage at the same horizon.
            if len(self.history) > 2 * MAX_CONVERSATION_TURNS:
                self.history = self.history[-2 * MAX_CONVERSATION_TURNS :]
        return answer

    def reset(self) -> None:
        self.initial_request = None
        self.initial_response = None
        self.history.clear()
