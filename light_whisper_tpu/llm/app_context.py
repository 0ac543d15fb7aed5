"""Foreground-app prompt context: the portable half of ``utils/foreground.rs``.

The reference reads the foreground window (Win32) and condenses it into an
``<app_context>`` block that the polish/assistant prompts use to infer the
TARGET FORMAT of dictated text (chat app → casual, editor → markdown, …).
The OS read stays with the shell; everything after it — whitespace
normalization, window-title summarization, char-capped truncation, and the
exact block format including the anti-overcorrection note — is pure string
logic rebuilt here (``foreground.rs:1-99``).

Behavior preserved:

- window titles split at the first separator among ``" - "``, ``" | "``,
  ``" — "``, ``" – "`` that yields >1 non-empty parts, keeping the FIRST
  part ("RELEASE_GUIDE.md - repo - VS Code" → "RELEASE_GUIDE.md",
  ``foreground.rs:66-85``);
- titles cap at 80 chars, process names at 48, with a trimmed ``...``
  suffix (``:7-8, 91-99``);
- empty process+title yields ``None`` — no empty context block (``:44-46``);
- values are CDATA-wrapped (via :func:`~light_whisper_tpu.llm.assistant.
  wrap_xml_cdata`) so titles containing markup can't break the prompt; the
  trailing ``<note>`` warns the model not to "correct" ASR words toward
  words that merely appear in the app name (prompt behavior spec, kept
  verbatim like the polish wire strings; ``foreground.rs:47-49``).
"""
from __future__ import annotations

from typing import Optional

from .assistant import wrap_xml_cdata

__all__ = [
    "normalize_whitespace",
    "truncate_chars",
    "summarize_window_title",
    "format_prompt_context",
    "WINDOW_TITLE_MAX_CHARS",
    "PROCESS_NAME_MAX_CHARS",
]

WINDOW_TITLE_MAX_CHARS = 80
PROCESS_NAME_MAX_CHARS = 48

_TITLE_SEPARATORS = (" - ", " | ", " — ", " – ")

_CONTEXT_NOTE = (
    "<note>以上仅用于推断格式风格。不要仅因为程序名或窗口标题中出现某个词，"
    "就将 ASR 文本中的其他词纠正为它。</note>"
)


def normalize_whitespace(value: str) -> str:
    """Collapse all whitespace runs to single spaces (``foreground.rs:87-89``)."""
    return " ".join(value.split())


def truncate_chars(value: str, max_chars: int) -> str:
    """Char-capped truncation with a trimmed ``...`` suffix (``:91-99``)."""
    if len(value) <= max_chars:
        return value
    return value[:max_chars].rstrip() + "..."


def summarize_window_title(title: str) -> str:
    """Keep the document part of an "doc - app" title (``:66-85``).

    The first separator that splits the title into more than one non-empty
    part wins and the FIRST part is kept — editors and browsers put the
    document first and the application name last.
    """
    normalized = normalize_whitespace(title)
    if not normalized:
        return normalized
    summary = normalized
    for sep in _TITLE_SEPARATORS:
        parts = [part.strip() for part in normalized.split(sep)]
        parts = [part for part in parts if part]
        if len(parts) > 1:
            summary = parts[0]
            break
    return truncate_chars(summary, WINDOW_TITLE_MAX_CHARS)


def format_prompt_context(
    process_name: str, window_title: str
) -> Optional[str]:
    """The ``<app_context>`` prompt block, or ``None`` when empty (``:29-64``)."""
    process = truncate_chars(
        normalize_whitespace(process_name), PROCESS_NAME_MAX_CHARS
    )
    title = summarize_window_title(window_title)

    lines = []
    if process:
        lines.append(wrap_xml_cdata("process_name", process))
    if title:
        lines.append(wrap_xml_cdata("window_title", title))
    if not lines:
        return None
    body = "\n".join(lines)
    return f"<app_context>\n{body}\n{_CONTEXT_NOTE}\n</app_context>"
