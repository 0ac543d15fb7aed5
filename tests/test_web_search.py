"""Web search backends over fake transports."""

import json

from light_whisper_tpu.llm.web_search import (
    MAX_CONTEXT_BYTES,
    SearchResult,
    _parse_exa_block,
    dedupe_results,
    exa_search,
    google_grounded_search,
    google_grounding_request,
    render_search_context,
    tavily_search,
)


class FakeTransport:
    def __init__(self, response):
        self.response = response
        self.calls = []

    def post(self, url, headers, body, timeout):
        self.calls.append((url, headers, body))
        return self.response


def test_parse_exa_block():
    block = (
        "Title: Rust Programming\nURL: https://rust-lang.org\n"
        "Published Date: 2024-01-01\nText: Rust is a systems language."
    )
    result = _parse_exa_block(block)
    assert result.title == "Rust Programming"
    assert result.url == "https://rust-lang.org"
    assert "systems language" in result.content


def test_exa_search_sse_and_multi_blocks():
    rpc = {
        "result": {
            "content": [
                {
                    "text": "Title: A\nURL: https://a.example\nText: first\n\n"
                    "Title: B\nURL: https://b.example\nHighlights: second\nmore lines"
                }
            ]
        }
    }
    sse = f"event: message\ndata: {json.dumps(rpc)}\n\n"
    transport = FakeTransport(sse)
    results = exa_search("query", transport=transport)
    assert [r.title for r in results] == ["A", "B"]
    assert results[1].content == "second more lines"
    body = transport.calls[0][2]
    assert body["params"]["name"] == "web_search_exa"


def test_tavily_search():
    payload = {"results": [{"title": "T", "url": "https://t.example", "content": "c"}]}
    transport = FakeTransport(json.dumps(payload))
    results = tavily_search("q", api_key="key", transport=transport)
    assert results[0].url == "https://t.example"
    assert transport.calls[0][1]["Authorization"] == "Bearer key"


def test_google_grounding_contract():
    body = google_grounding_request("what is jax")
    assert body["model"] == "gemini-3.1-flash-lite"
    assert body["tools"] == [{"type": "google_search"}]

    payload = {
        "outputs": [
            {
                "content": [
                    {
                        "text": "JAX is a library.",
                        "annotations": [
                            {"url": "https://jax.dev", "title": "JAX"},
                            {"url": "http://insecure.example", "title": "nope"},
                            {"url": "https://jax.dev/", "title": "dup"},
                        ],
                    }
                ]
            }
        ]
    }
    transport = FakeTransport(json.dumps(payload))
    answer, citations = google_grounded_search("q", "key", transport=transport)
    assert answer == "JAX is a library."
    assert [c.url for c in citations] == ["https://jax.dev"]  # https-only, deduped


def test_dedupe_and_context_caps():
    results = [
        SearchResult(title=f"R{i}", url=f"https://r{i}.example", content="x" * 2000)
        for i in range(20)
    ] + [SearchResult(title="dup", url="https://r0.example/")]
    context = render_search_context(results)
    assert len(context.encode()) <= MAX_CONTEXT_BYTES + 200
    assert context.count("https://r0.example") == 1
    # per-result content capped at 1 KB
    assert "x" * 1001 not in context
