"""Foreground prompt-context formatting (utils/foreground.rs parity)."""
from __future__ import annotations

from light_whisper_tpu.llm.app_context import (
    PROCESS_NAME_MAX_CHARS,
    WINDOW_TITLE_MAX_CHARS,
    format_prompt_context,
    normalize_whitespace,
    summarize_window_title,
    truncate_chars,
)


def test_editor_titles_keep_the_document_part():
    ctx = format_prompt_context(
        "Code.exe", "RELEASE_GUIDE.md - light-whisper - Visual Studio Code"
    )
    assert "<process_name><![CDATA[Code.exe]]></process_name>" in ctx
    assert "<window_title><![CDATA[RELEASE_GUIDE.md]]></window_title>" in ctx
    assert "Visual Studio Code" not in ctx


def test_xml_sensitive_characters_survive_via_cdata():
    ctx = format_prompt_context("<Code.exe>", "</window_title> & more")
    assert "<process_name><![CDATA[<Code.exe>]]></process_name>" in ctx
    assert (
        "<window_title><![CDATA[</window_title> & more]]></window_title>" in ctx
    )


def test_cdata_terminator_is_split_safely():
    ctx = format_prompt_context("a]]>b", "")
    assert "<![CDATA[a]]]]><![CDATA[>b]]>" in ctx


def test_empty_context_is_none():
    assert format_prompt_context("", "") is None
    assert format_prompt_context("   ", " \t ") is None


def test_context_includes_anti_overcorrection_note():
    ctx = format_prompt_context("WeChat.exe", "")
    assert ctx.startswith("<app_context>\n")
    assert ctx.endswith("\n</app_context>")
    assert "<note>" in ctx and "不要仅因为" in ctx


def test_title_separator_priority_and_pipe():
    # " - " splits first even when " | " also appears later.
    assert summarize_window_title("doc - a | b") == "doc"
    assert summarize_window_title("inbox | mail.app") == "inbox"
    assert summarize_window_title("报告 — 编辑器") == "报告"
    assert summarize_window_title("draft – notes") == "draft"


def test_title_without_separator_passes_through():
    assert summarize_window_title("plain title") == "plain title"


def test_separator_with_empty_side_does_not_split():
    # "- trailing" pattern: only one non-empty part -> no split.
    assert summarize_window_title("solo - ") == "solo -"  # normalized, unsplit


def test_truncation_caps_and_marks():
    long_title = "x" * 100
    out = summarize_window_title(long_title)
    assert out == "x" * WINDOW_TITLE_MAX_CHARS + "..."
    long_proc = "p" * 60
    ctx = format_prompt_context(long_proc, "")
    assert "p" * PROCESS_NAME_MAX_CHARS + "..." in ctx


def test_truncate_trims_trailing_space_before_ellipsis():
    assert truncate_chars("word " + "y" * 10, 5) == "word..."


def test_normalize_whitespace_collapses_runs():
    assert normalize_whitespace("  a\t\tb\n c  ") == "a b c"
