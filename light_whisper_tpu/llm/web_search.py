"""Web search backends: Exa MCP (keyless), Tavily, Gemini grounding.

Port of the reference's search layer (``web_search_service.rs``): three
providers with one normalized ``SearchResult`` shape, result de-duplication
by URL, and a size-capped context renderer (10 results / 14 KB total, 1 KB
per result) that assistant/polish prompts embed. The HTTP transport is
injectable for offline tests.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, List, Sequence

SEARCH_TIMEOUT_SECONDS = 15.0
GOOGLE_TIMEOUT_SECONDS = 30.0
GOOGLE_GROUNDING_MODEL = "gemini-3.1-flash-lite"
MAX_CONTEXT_RESULTS = 10
MAX_CONTEXT_BYTES = 14_000
MAX_RESULT_CONTENT_BYTES = 1_000

EXA_MCP_URL = "https://mcp.exa.ai/mcp"
TAVILY_URL = "https://api.tavily.com/search"
GOOGLE_INTERACTIONS_URL = "https://generativelanguage.googleapis.com/v1beta/interactions"


@dataclasses.dataclass
class SearchResult:
    title: str = ""
    url: str = ""
    content: str = ""
    published: str = ""


class JsonPostTransport:
    def post(self, url: str, headers: Dict[str, str], body: Dict[str, Any], timeout: float) -> str:
        import urllib.request

        req = urllib.request.Request(
            url,
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json", **headers},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read().decode("utf-8", "replace")


# ---------------------------------------------------------------------------
# Exa MCP (keyless JSON-RPC; responses may arrive as SSE)
# ---------------------------------------------------------------------------


def _final_sse_data(raw: str) -> str:
    data_lines = [l[5:].strip() for l in raw.splitlines() if l.startswith("data:")]
    return data_lines[-1] if data_lines else raw.strip()


def _parse_exa_block(block: str) -> SearchResult:
    result = SearchResult()
    content_lines: List[str] = []
    for line in block.splitlines():
        stripped = line.strip()
        for label, field in (
            ("Title:", "title"),
            ("URL:", "url"),
            ("Published Date:", "published"),
        ):
            if stripped.startswith(label):
                setattr(result, field, stripped[len(label) :].strip())
                break
        else:
            if stripped.startswith(("Text:", "Highlights:")):
                content_lines.append(stripped.split(":", 1)[1].strip())
            elif stripped and content_lines:
                content_lines.append(stripped)
    result.content = " ".join(content_lines)
    return result


def _split_exa_blocks(text: str) -> List[str]:
    # Results can only be split at fresh "Title:" lines — Highlights/Text
    # bodies legitimately contain blank lines.
    starts = [m.start() for m in re.finditer(r"^Title:", text, flags=re.MULTILINE)]
    if not starts:
        return [text] if text.strip() else []
    starts.append(len(text))
    return [text[a:b] for a, b in zip(starts[:-1], starts[1:])]


def exa_search(query: str, max_results: int = 5, transport=None) -> List[SearchResult]:
    transport = transport or JsonPostTransport()
    body = {
        "jsonrpc": "2.0",
        "id": 1,
        "method": "tools/call",
        "params": {
            "name": "web_search_exa",
            "arguments": {"query": query, "numResults": max_results, "type": "auto"},
        },
    }
    raw = transport.post(
        EXA_MCP_URL,
        {"Accept": "application/json, text/event-stream"},
        body,
        SEARCH_TIMEOUT_SECONDS,
    )
    payload = json.loads(_final_sse_data(raw))
    blocks = payload.get("result", {}).get("content", [])
    results: List[SearchResult] = []
    for block in blocks:
        for entry in _split_exa_blocks(block.get("text", "")):
            parsed = _parse_exa_block(entry)
            if parsed.title or parsed.url:
                results.append(parsed)
    return results


# ---------------------------------------------------------------------------
# Tavily
# ---------------------------------------------------------------------------


def tavily_search(
    query: str, api_key: str, max_results: int = 5, transport=None
) -> List[SearchResult]:
    transport = transport or JsonPostTransport()
    raw = transport.post(
        TAVILY_URL,
        {"Authorization": f"Bearer {api_key}"},
        {"query": query, "max_results": max_results},
        SEARCH_TIMEOUT_SECONDS,
    )
    payload = json.loads(raw)
    return [
        SearchResult(
            title=item.get("title", ""),
            url=item.get("url", ""),
            content=item.get("content", ""),
        )
        for item in payload.get("results", [])
    ]


# ---------------------------------------------------------------------------
# Google Gemini grounding (interactions API)
# ---------------------------------------------------------------------------


def google_grounding_request(query: str) -> Dict[str, Any]:
    return {
        "model": GOOGLE_GROUNDING_MODEL,
        "input": query,
        "tools": [{"type": "google_search"}],
        "store": False,
    }


def parse_google_interaction(payload: Dict[str, Any]) -> tuple:
    """→ (answer_text, [SearchResult]); https citations only, deduped."""
    answer_parts: List[str] = []
    citations: List[SearchResult] = []
    seen = set()
    for item in payload.get("outputs", payload.get("output", [])) or []:
        if not isinstance(item, dict):
            continue
        for part in item.get("content", []) or []:
            if not isinstance(part, dict):
                continue
            if isinstance(part.get("text"), str):
                answer_parts.append(part["text"])
            for annotation in part.get("annotations", []) or []:
                url = (annotation or {}).get("url", "")
                if not url.startswith("https://"):
                    continue
                key = url.rstrip("/")
                if key in seen:
                    continue
                seen.add(key)
                citations.append(
                    SearchResult(title=annotation.get("title", ""), url=url)
                )
    return "".join(answer_parts), citations


def google_grounded_search(
    query: str, api_key: str, transport=None
) -> tuple:
    transport = transport or JsonPostTransport()
    raw = transport.post(
        GOOGLE_INTERACTIONS_URL,
        {"x-goog-api-key": api_key},
        google_grounding_request(query),
        GOOGLE_TIMEOUT_SECONDS,
    )
    return parse_google_interaction(json.loads(raw))


# ---------------------------------------------------------------------------
# shared post-processing
# ---------------------------------------------------------------------------


def dedupe_results(results: Sequence[SearchResult]) -> List[SearchResult]:
    seen = set()
    out: List[SearchResult] = []
    for r in results:
        key = r.url.rstrip("/") or r.title
        if key and key not in seen:
            seen.add(key)
            out.append(r)
    return out


def _truncate_bytes(text: str, limit: int) -> str:
    raw = text.encode("utf-8")
    if len(raw) <= limit:
        return text
    return raw[:limit].decode("utf-8", "ignore")


def render_search_context(results: Sequence[SearchResult]) -> str:
    """Size-capped context block for prompt embedding."""
    lines: List[str] = ["<search_results>"]
    total = 0
    for index, r in enumerate(dedupe_results(results)[:MAX_CONTEXT_RESULTS], 1):
        content = _truncate_bytes(r.content, MAX_RESULT_CONTENT_BYTES)
        entry = f"[{index}] {r.title}\n{r.url}\n{content}\n"
        total += len(entry.encode("utf-8"))
        if total > MAX_CONTEXT_BYTES:
            break
        lines.append(entry)
    lines.append("</search_results>")
    return "\n".join(lines)
