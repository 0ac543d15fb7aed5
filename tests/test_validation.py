"""LLM audit of learned correction rules."""

import json

from light_whisper_tpu.llm.provider import endpoint_for_config
from light_whisper_tpu.llm.validation import parse_invalid_indices, validate_corrections
from light_whisper_tpu.text.hotwords import CorrectionPattern, Source
from light_whisper_tpu.text.profile import UserProfile


class FakeTransport:
    def __init__(self, replies):
        self.replies = list(replies)
        self.bodies = []

    def post(self, url, headers, body, timeout):
        self.bodies.append(body)
        return 200, False, {
            "choices": [{"message": {"content": self.replies.pop(0)}}]
        }


def make_profile(n_ai, n_user=1):
    profile = UserProfile()
    for i in range(n_ai):
        profile.correction_patterns.append(
            CorrectionPattern(f"a{i}", f"b{i}", count=2, source=Source.AI)
        )
    for i in range(n_user):
        profile.correction_patterns.append(
            CorrectionPattern(f"u{i}", f"v{i}", count=2, source=Source.USER)
        )
    return profile


def test_parse_invalid_indices():
    assert parse_invalid_indices("[2,5,7]") == [2, 5, 7]
    assert parse_invalid_indices("```json\n[1]\n```") == [1]
    assert parse_invalid_indices("Here: [3, 4] done") == [3, 4]
    assert parse_invalid_indices("[]") == []
    assert parse_invalid_indices("no json at all") == []


def test_validation_removes_only_flagged_ai_rules():
    profile = make_profile(3)
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(["[2]"])
    removed = validate_corrections(profile, endpoint, transport=transport)
    assert removed == 1
    remaining = {(p.original, p.corrected) for p in profile.correction_patterns}
    assert ("a1", "b1") not in remaining
    assert ("a0", "b0") in remaining and ("u0", "v0") in remaining


def test_validation_chunks_by_40():
    profile = make_profile(85)
    endpoint = endpoint_for_config("cerebras")
    transport = FakeTransport(["[]", "[]", "[1]"])
    removed = validate_corrections(profile, endpoint, transport=transport)
    assert len(transport.bodies) == 3
    assert removed == 1  # first rule of the third chunk = a80
    assert all(p.original != "a80" for p in profile.correction_patterns)


def test_user_rules_never_removed_even_if_flagged():
    profile = make_profile(1, n_user=1)
    endpoint = endpoint_for_config("cerebras")
    # model flags everything it sees (only AI rules are ever sent)
    transport = FakeTransport(["[1]"])
    validate_corrections(profile, endpoint, transport=transport)
    assert any(p.source == Source.USER for p in profile.correction_patterns)


def test_llm_failure_skips_chunk():
    class BoomTransport:
        def post(self, url, headers, body, timeout):
            raise RuntimeError("down")

    profile = make_profile(5)
    endpoint = endpoint_for_config("cerebras")
    removed = validate_corrections(profile, endpoint, transport=BoomTransport())
    assert removed == 0 and len(profile.correction_patterns) == 6


def test_no_ai_rules_short_circuits():
    profile = make_profile(0, n_user=2)
    endpoint = endpoint_for_config("cerebras")
    assert validate_corrections(profile, endpoint, transport=None) == 0
