"""WER/CER metric correctness."""

import pytest

from light_whisper_tpu.eval.wer import (
    Corpus,
    cer,
    evaluate_pairs,
    mer_mixed,
    mixed_tokens,
    wer,
    word_tokens,
)


def test_exact_match_zero():
    assert wer("hello world", "hello world") == 0.0
    assert cer("你好世界", "你好世界") == 0.0
    assert mer_mixed("hello 世界", "hello 世界") == 0.0


def test_known_wer_values():
    # 1 substitution over 4 words
    assert wer("the cat sat down", "the dog sat down") == pytest.approx(0.25)
    # 1 deletion
    assert wer("a b c d", "a b c") == pytest.approx(0.25)
    # 1 insertion
    assert wer("a b c", "a b x c") == pytest.approx(1 / 3)
    # empty reference, non-empty hyp
    assert wer("", "something") == 1.0
    assert wer("", "") == 0.0


def test_normalization_case_and_punctuation():
    assert wer("Hello, World!", "hello world") == 0.0
    assert cer("你好，世界。", "你好世界") == 0.0


def test_mixed_tokenization():
    tokens = mixed_tokens("用JAX写flash attention内核")
    assert tokens == ["用", "jax", "写", "flash", "attention", "内", "核"]
    # one CJK char wrong = 1/7
    assert mer_mixed("用JAX写flash attention内核", "用JAX写flash attention内和") == pytest.approx(1 / 7)


def test_cer_chinese():
    # 1 char substitution over 4
    assert cer("今天天气", "今天天器") == pytest.approx(0.25)


def test_corpus_aggregation():
    corpus = evaluate_pairs(
        [
            ("你好世界", "你好世界"),
            ("今天天气很好", "今天天器很好"),
        ]
    )
    assert corpus.sentences == 2
    assert corpus.exact == 1
    assert corpus.error_rate == pytest.approx(1 / 10)
    assert corpus.sentence_accuracy == 0.5


def test_word_tokens():
    assert word_tokens("  The   quick  FOX ") == ["the", "quick", "fox"]
