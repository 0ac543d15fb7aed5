"""Profile store + vocabulary learning semantics."""

import time

from light_whisper_tpu.text.hotwords import CorrectionPattern, HotWord, Source
from light_whisper_tpu.text.profile import (
    MAX_CORRECTION_PATTERNS,
    MAX_HOT_WORDS,
    ProfileStore,
    UserProfile,
    add_hot_word,
    cleanup_profile,
    collect_diff_correction_pairs,
    extract_diff_segments,
    is_reasonable_hot_word,
    learn_from_structured,
    remove_hot_word,
    sanitize_hot_words,
)


def test_reasonable_hot_word_rules():
    assert is_reasonable_hot_word("Kubernetes", Source.LEARNED)
    assert is_reasonable_hot_word("光子计算", Source.LEARNED)
    assert not is_reasonable_hot_word("a", Source.LEARNED)  # too short
    assert not is_reasonable_hot_word("你好，世界", Source.LEARNED)  # punctuation
    assert not is_reasonable_hot_word("one two three four", Source.LEARNED)  # >3 words
    assert not is_reasonable_hot_word("请帮我写一个程序", Source.LEARNED)  # sentence-like
    assert not is_reasonable_hot_word("的", Source.AI)  # stopword
    # user entries are nearly unrestricted
    assert is_reasonable_hot_word("x", Source.USER)
    assert is_reasonable_hot_word("请帮我写一个程序", Source.USER)


def test_learning_promotes_at_threshold():
    profile = UserProfile()
    for _ in range(2):
        learn_from_structured(profile, [], ["LightWhisper"], Source.AI)
    assert all(h.text != "LightWhisper" for h in profile.hot_words)
    learn_from_structured(profile, [], ["LightWhisper"], Source.AI)
    promoted = [h for h in profile.hot_words if h.text == "LightWhisper"]
    assert promoted and promoted[0].source == Source.LEARNED
    assert promoted[0].weight == 2


def test_learning_corrections_upsert_and_contradictions():
    profile = UserProfile()
    learn_from_structured(profile, [("光子", "量子")], [], Source.AI)
    learn_from_structured(profile, [("光子", "量子")], [], Source.AI)
    assert profile.correction_patterns[0].count == 2
    # reverse mapping rejected
    learn_from_structured(profile, [("量子", "光子")], [], Source.AI)
    assert len(profile.correction_patterns) == 1
    # user upsert upgrades source
    learn_from_structured(profile, [("光子", "量子")], [], Source.USER)
    assert profile.correction_patterns[0].source == Source.USER


def test_learning_rejects_bad_segments():
    profile = UserProfile()
    learn_from_structured(
        profile,
        [
            ("他", "它们三个"),  # 1 char → many
            ("aa", "a" * 12),  # ratio > 3x
            ("same", "same"),  # identical
            ("x" * 13, "y"),  # too long
        ],
        [],
        Source.AI,
    )
    assert profile.correction_patterns == []


def test_blocked_words_suppress_relearning():
    profile = UserProfile()
    for _ in range(3):
        learn_from_structured(profile, [], ["BlockMe"], Source.AI)
    assert any(h.text == "BlockMe" for h in profile.hot_words)
    remove_hot_word(profile, "BlockMe")
    assert "blockme" in profile.blocked_hot_words
    assert all(h.text != "BlockMe" for h in profile.hot_words)
    # vocab frequency was purged; relearning starts over and stays blocked
    for _ in range(5):
        learn_from_structured(profile, [], ["BlockMe"], Source.AI)
    assert all(h.text != "BlockMe" for h in profile.hot_words)
    # explicit add un-blacklists and upgrades
    add_hot_word(profile, "BlockMe", weight=4)
    entry = next(h for h in profile.hot_words if h.text == "BlockMe")
    assert entry.source == Source.USER and entry.weight == 4
    assert "blockme" not in profile.blocked_hot_words


def test_sanitize_dedup_merges_case_insensitive():
    profile = UserProfile(
        hot_words=[
            HotWord("pytorch", weight=1, use_count=5, source=Source.LEARNED),
            HotWord("PyTorch", weight=3, use_count=2, source=Source.USER),
        ]
    )
    sanitize_hot_words(profile)
    assert len(profile.hot_words) == 1
    merged = profile.hot_words[0]
    assert merged.text == "PyTorch"  # user entry wins the text
    assert merged.weight == 3 and merged.use_count == 5
    assert merged.source == Source.USER


def test_caps_enforced():
    profile = UserProfile()
    profile.hot_words = [
        HotWord(f"Word{i}", weight=(i % 5) + 1, source=Source.USER) for i in range(400)
    ]
    sanitize_hot_words(profile)
    assert len(profile.hot_words) == MAX_HOT_WORDS
    profile.correction_patterns = [
        CorrectionPattern(f"a{i}", f"b{i}", count=i, last_seen=i) for i in range(600)
    ]
    cleanup_profile(profile)
    assert len(profile.correction_patterns) <= MAX_CORRECTION_PATTERNS


def test_cleanup_drops_stale_singletons_and_contradictions():
    now = int(time.time())
    profile = UserProfile(
        correction_patterns=[
            CorrectionPattern("aa", "bb", count=1, last_seen=now - 48 * 3600, source=Source.AI),
            CorrectionPattern("cc", "dd", count=5, last_seen=now, source=Source.AI),
            CorrectionPattern("dd", "cc", count=2, last_seen=now, source=Source.AI),
            CorrectionPattern("ee", "ff", count=1, last_seen=now - 48 * 3600, source=Source.USER),
        ]
    )
    cleanup_profile(profile)
    kept = {(p.original, p.corrected) for p in profile.correction_patterns}
    assert ("aa", "bb") not in kept  # stale AI singleton
    assert ("cc", "dd") in kept  # contradiction winner
    assert ("dd", "cc") not in kept  # contradiction loser
    assert ("ee", "ff") in kept  # user rules always survive


def test_diff_segments():
    pairs = extract_diff_segments("今天天器很好", "今天天气很好")
    assert ("器", "气") in pairs
    pairs2 = collect_diff_correction_pairs(["今天天器很好"], "今天天气很好")
    assert pairs2 == [("器", "气")]
    assert collect_diff_correction_pairs([""], "x") == []
    assert collect_diff_correction_pairs(["same"], "same") == []


def test_store_roundtrip_and_debounce(tmp_path):
    path = str(tmp_path / "profile.json")
    store = ProfileStore(path, debounce_seconds=0.05)
    profile = UserProfile()
    add_hot_word(profile, "JAX", weight=5)
    learn_from_structured(profile, [("光子", "量子")], [], Source.USER)

    store.schedule_save(profile)
    store.schedule_save(profile)  # coalesces
    # The debounce timer fires on its own; poll rather than a fixed sleep so
    # scheduler delay under a loaded test machine can't flake the assertion.
    deadline = time.monotonic() + 10.0
    loaded = store.load()
    while not loaded.hot_words and time.monotonic() < deadline:
        time.sleep(0.05)
        loaded = store.load()
    assert loaded.hot_words[0].text == "JAX"
    assert loaded.correction_patterns[0].original == "光子"
    assert loaded.correction_patterns[0].source == Source.USER


def test_store_load_missing_or_corrupt(tmp_path):
    store = ProfileStore(str(tmp_path / "nope.json"))
    assert store.load().hot_words == []
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    assert ProfileStore(str(bad)).load().hot_words == []


def test_one_malformed_entry_does_not_wipe_the_profile(tmp_path):
    """A single bad hot word (unknown source from a newer version) must lose
    only itself — an empty-profile load gets persisted by the next save."""
    import json

    from light_whisper_tpu.text.profile import ProfileStore

    path = str(tmp_path / "profile.json")
    data = {
        "hot_words": [
            {"text": "好词", "weight": 2, "use_count": 1, "source": "user"},
            {"text": "坏词", "weight": 2, "use_count": 1, "source": "from-the-future"},
            {"text": "又好", "weight": "not-a-number", "source": "user"},
        ],
        "correction_patterns": [
            {"original": "a", "corrected": "b", "count": 3,
             "last_seen": int(__import__("time").time()), "source": "ai"},
            {"original": "c", "corrected": "d", "count": "x", "source": "ai"},
        ],
        "vocab_frequency": {"ok": {"count": 3, "last_seen": 0}, "bad": {"count": "?"}},
        "blocked_hot_words": [],
        "total_transcriptions": 7,
        "last_updated": 0,
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(data, f)
    profile = ProfileStore(path).load()
    assert [h.text for h in profile.hot_words] == ["好词"]
    assert len(profile.correction_patterns) == 1
    assert list(profile.vocab_frequency) == ["ok"]
    assert profile.total_transcriptions == 7


def test_non_dict_profile_json_loads_empty(tmp_path):
    from light_whisper_tpu.text.profile import ProfileStore

    path = str(tmp_path / "profile.json")
    for bad in ("null", "[1,2]", '"str"'):
        with open(path, "w") as f:
            f.write(bad)
        assert ProfileStore(path).load().hot_words == []


def test_concurrent_save_now_is_serialized(tmp_path):
    import json
    import threading

    from light_whisper_tpu.text.profile import ProfileStore, UserProfile, add_hot_word

    store = ProfileStore(str(tmp_path / "profile.json"))
    profiles = []
    for i in range(4):
        p = UserProfile()
        add_hot_word(p, f"词{i}")
        profiles.append(p)
    barrier = threading.Barrier(4)
    errors = []

    def save(p):
        barrier.wait()
        try:
            store.save_now(p)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=save, args=(p,)) for p in profiles]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    # whatever won, the installed file is valid JSON of a full profile
    with open(store.path, encoding="utf-8") as f:
        data = json.load(f)
    assert len(data["hot_words"]) == 1
