"""Assistant session: web-search gating, memory, context assembly."""

import json

from light_whisper_tpu.llm.assistant import (
    MAX_CONVERSATION_TURNS,
    AssistantSession,
    decide_web_search,
)
from light_whisper_tpu.llm.provider import endpoint_for_config


def test_web_search_decision_ladder():
    assert decide_web_search("").reason == "empty_request"
    assert decide_web_search("帮我查一下不要联网").reason == "explicit_no_search"
    assert decide_web_search("search for jax docs").should_search
    assert decide_web_search("帮我查一下今天的汇率").reason == "explicit_search"
    assert decide_web_search("what's the weather today").reason == "realtime_or_freshness"
    assert decide_web_search("who is the current CEO of OpenAI").should_search
    assert decide_web_search("帮我写一封邮件").reason == "generation_or_editing"
    assert not decide_web_search("解释这段代码", "def f(): pass").should_search
    assert decide_web_search("讲个笑话").reason == "no_search_intent"


class FakeTransport:
    def __init__(self, answers):
        self.answers = list(answers)
        self.bodies = []

    def post(self, url, headers, body, timeout):
        self.bodies.append(body)
        return 200, False, {
            "choices": [{"message": {"content": self.answers.pop(0)}}]
        }


def test_session_memory_and_context():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(["Answer one", "Answer two"])
    searches = []

    def search(query):
        searches.append(query)
        return "<search_results>[1] Something</search_results>"

    session = AssistantSession(endpoint, transport=transport, search_fn=search)

    a1 = session.ask("what's the latest jax version", app_context="app=Terminal")
    assert a1 == "Answer one"
    assert searches == ["what's the latest jax version"]  # freshness cue
    body1 = transport.bodies[0]
    user1 = body1["messages"][1]["content"]
    assert "<search_results>" in user1
    assert "<app_context>app=Terminal</app_context>" in user1

    a2 = session.ask("tell me a joke")
    assert a2 == "Answer two"
    user2 = transport.bodies[1]["messages"][1]["content"]
    # memory carries the previous exchange
    assert "<user>what's the latest jax version</user>" in user2
    assert "<assistant>Answer one</assistant>" in user2
    assert len(searches) == 1  # no search for the joke


def test_memory_is_bounded():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport([f"a{i}" for i in range(40)])
    session = AssistantSession(endpoint, transport=transport)
    for i in range(30):
        session.ask(f"question {i}")
    assert len(session.history) <= 2 * MAX_CONVERSATION_TURNS
    session.reset()
    assert session.history == []


def test_search_failure_degrades_gracefully():
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(["ok"])

    def broken_search(q):
        raise RuntimeError("offline")

    session = AssistantSession(endpoint, transport=transport, search_fn=broken_search)
    assert session.ask("what's the weather today") == "ok"


# -- selection actions -------------------------------------------------------


def test_selection_actions():
    import pytest

    from light_whisper_tpu.llm.selection import run_selection_action

    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(["Bonjour le monde"])
    result = run_selection_action(
        endpoint, "translate", "Hello world", target_language="French", transport=transport
    )
    assert result.text == "Bonjour le monde"
    assert result.replace_selection
    assert "French" in transport.bodies[0]["messages"][0]["content"]
    assert "<selection>Hello world</selection>" in transport.bodies[0]["messages"][1]["content"]

    transport2 = FakeTransport(["It prints hi."])
    explain = run_selection_action(endpoint, "explain", "print('hi')", transport=transport2)
    assert not explain.replace_selection

    with pytest.raises(ValueError):
        run_selection_action(endpoint, "dance", "x", transport=FakeTransport([""]))
    with pytest.raises(ValueError):
        run_selection_action(endpoint, "explain", "   ", transport=FakeTransport([""]))
