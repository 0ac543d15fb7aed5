"""Hot-word correction behavior (port of qwen_hotword_service semantics)."""

import pytest

from light_whisper_tpu.text.hotwords import (
    CorrectionPattern,
    CorrectionResult,
    HotWord,
    HotWordCorrector,
    Source,
    correct_hot_words,
    correct_known_aliases,
    correct_profile_terms,
    levenshtein,
)
from light_whisper_tpu.text.prefix import StablePrefixTracker, interim_segments


def manual(text, weight=3):
    return HotWord(text=text, weight=weight, source=Source.USER)


def learned(text, weight=1):
    return HotWord(text=text, weight=weight, source=Source.LEARNED)


# -- levenshtein -------------------------------------------------------------


def test_levenshtein_basics():
    assert levenshtein("", "") == 0
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "xyz") == 3


# -- ASCII matching ----------------------------------------------------------


def test_ascii_exact_normalized_match_canonical_style():
    # canonical style (≥2 uppercase) lets even learned words match at d=0
    result = correct_hot_words("we use pytorch here", [learned("PyTorch")])
    assert result.text == "we use PyTorch here"
    assert result.replacements == 1


def test_ascii_no_canonical_style_learned_word_ignored():
    result = correct_hot_words("we use pytorch here", [learned("pytorch2")])
    assert result.replacements == 0


def test_ascii_fuzzy_match_needs_manual_word():
    # distance 1, hot word length >= 5, manual → replaced
    result = correct_hot_words("open the kubernates dashboard", [manual("kubernetes")])
    assert result.text == "open the kubernetes dashboard"
    # learned word with same distance → not replaced
    result2 = correct_hot_words("open the kubernates dashboard", [learned("kubernetes")])
    assert result2.replacements == 0


def test_ascii_simple_inflections_not_corrected():
    result = correct_hot_words("running many dockers today", [manual("docker")])
    assert result.text == "running many dockers today"


def test_ascii_multiword_window():
    result = correct_hot_words("using light whisper now", [manual("LightWhisper")])
    assert result.text == "using LightWhisper now"


def test_ascii_already_present_untouched():
    result = correct_hot_words("JAX is fast", [manual("JAX")])
    assert result.replacements == 0
    assert result.text == "JAX is fast"


def test_distance_two_requires_length_ten():
    result = correct_hot_words("tensorflaw graph", [manual("tensorflow")])
    assert result.text == "tensorflow graph"
    res2 = correct_hot_words("i love tansorflaw a lot", [manual("tensorflow")])
    assert res2.text == "i love tensorflow a lot"  # d=2, len 10 → allowed


# -- Han matching ------------------------------------------------------------


def test_han_homophone_replacement():
    # 智能 vs 志能: zhi-neng == zhi-neng, shares 1 char (能) ≥ min_shared 1
    result = correct_hot_words("这个志能系统", [manual("智能")])
    assert result.text == "这个智能系统"
    assert result.replacements == 1


def test_han_different_pinyin_not_replaced():
    result = correct_hot_words("这个很好系统", [manual("智能")])
    assert result.replacements == 0


def test_han_learned_needs_three_chars():
    # learned words require length ≥3
    result = correct_hot_words("这个志能系统", [learned("智能")])
    assert result.replacements == 0


def test_han_shared_char_floor():
    # learned 3-char word needs ceil(3/2)=2 shared chars
    hot = learned("人工智")  # ren-gong-zhi
    result = correct_hot_words("这是人公志的事", [hot])
    # candidate 人公志 shares only 人 and... 人(=) 公(≠) 志(≠) → 1 shared < 2
    assert result.replacements == 0


# -- overlap resolution ------------------------------------------------------


def test_overlapping_candidates_highest_score_wins():
    # Two hot words targeting overlapping spans; exact-normalized (1000+len)
    # must beat fuzzy (800+len-50d).
    text = "deploy lightwhisper now"
    result = correct_hot_words(text, [manual("LightWhisper"), manual("lightwhispers")])
    assert result.text == "deploy LightWhisper now"


# -- alias replay ------------------------------------------------------------


def test_alias_replay_applies_learned_pattern():
    hot = [manual("Kubernetes")]
    patterns = [CorrectionPattern("库伯内提斯", "Kubernetes", count=5, source=Source.AI)]
    # same-script gate: 库伯内提斯(han) → Kubernetes(ascii) is cross-script → rejected
    result = correct_known_aliases("部署库伯内提斯集群", hot, patterns)
    assert result.replacements == 0

    patterns = [CorrectionPattern("kubernates", "Kubernetes", count=5, source=Source.AI)]
    result = correct_known_aliases("deploy kubernates now", hot, patterns)
    assert result.text == "deploy Kubernetes now"


def test_alias_requires_hot_target():
    patterns = [CorrectionPattern("kubernates", "Kubernetes", count=5, source=Source.AI)]
    result = correct_known_aliases("deploy kubernates now", [manual("Docker")], patterns)
    assert result.replacements == 0


def test_alias_ascii_boundaries_respected():
    hot = [manual("Git")]
    patterns = [CorrectionPattern("git", "Git", count=9, source=Source.AI)]
    result = correct_known_aliases("digital git repo", hot, patterns)
    assert result.text == "digital Git repo"  # 'digital' untouched


def test_user_alias_gates():
    hot = [manual("LightWhisper")]
    # user-sourced single-word alias with distance > 1 → rejected
    patterns = [CorrectionPattern("litewhisp", "LightWhisper", count=9, source=Source.USER)]
    assert correct_known_aliases("use litewhisp", hot, patterns).replacements == 0
    # multi-word user alias → allowed
    patterns = [CorrectionPattern("light whisper", "LightWhisper", count=9, source=Source.USER)]
    assert (
        correct_known_aliases("use light whisper now", hot, patterns).text
        == "use LightWhisper now"
    )


def test_full_pipeline_counts_both_passes():
    hot = [manual("LightWhisper"), manual("Kubernetes")]
    patterns = [CorrectionPattern("kubernates", "Kubernetes", count=3, source=Source.AI)]
    result = correct_profile_terms("run lightwhisper on kubernates", hot, patterns)
    assert result.text == "run LightWhisper on Kubernetes"
    assert result.replacements == 2


def test_corrector_adapter():
    corrector = HotWordCorrector()
    assert corrector.correct("we use pytorch", ["PyTorch"]) == "we use PyTorch"
    assert corrector.correct("", ["X"]) == ""
    assert corrector.correct("hello", []) == "hello"


# -- perf contract (reference: p95 < 1 ms at 100 words + 100 aliases in
#    Rust, qwen_hotword_service.rs:780-798 — ours: 5 ms on shared CI hosts;
#    measured ~1.9 ms p95 after the window-index rewrite, so a regression to
#    the pre-index ~16 ms per-tick cost fails loudly) -----------------------


def test_hotword_latency_budget():
    import time

    hot = [manual(f"Word{i}X{i}") for i in range(100)]
    patterns = [
        CorrectionPattern(f"word{i}y{i}", f"Word{i}X{i}", count=3, source=Source.AI)
        for i in range(100)
    ]
    text = "this is a fairly long dictated sentence about word3y3 systems " * 3
    correct_profile_terms(text, hot, patterns)  # warm the normalization caches
    # CPU thread time, not wall clock: the budget is about the WORK a
    # hot-word pass costs per interim tick, and wall time on a loaded
    # single-core CI host measures the scheduler instead (this test flaked
    # under concurrent suite runs while passing alone). Retries absorb the
    # residual noise (GC pauses land in thread time too).
    for attempt in range(3):
        times = []
        for _ in range(60):
            start = time.thread_time()
            correct_profile_terms(text, hot, patterns)
            times.append(time.thread_time() - start)
        times.sort()
        p95 = times[int(len(times) * 0.95)]
        if p95 < 0.005:
            return
    assert p95 < 0.005, f"p95 {p95 * 1e3:.1f} ms after {attempt + 1} attempts"


# -- stable prefix -----------------------------------------------------------


def test_interim_segments_basic():
    assert interim_segments("hello wor", "hello world") == ("hello wor", "ld")
    assert interim_segments("", "hi") == ("", "hi")
    assert interim_segments("abc", "abd") == ("ab", "d")
    assert interim_segments("你好世界", "你好地球") == ("你好", "地球")


def test_tracker_carries_state():
    tracker = StablePrefixTracker()
    s1 = tracker.update("今天天气")
    assert s1.stable == "" and s1.tentative == "今天天气"
    s2 = tracker.update("今天天气很好")
    assert s2.stable == "今天天气" and s2.tentative == "很好"
    s3 = tracker.update("今天天没")
    assert s3.stable == "今天天" and s3.tentative == "没"
    tracker.reset()
    assert tracker.update("新话").stable == ""
