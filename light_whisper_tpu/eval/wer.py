"""ASR quality metrics: WER / CER / mixed-script error rate.

Evaluation tooling the reference lacks (it ships no eval harness); a serving
framework needs it to validate converted checkpoints and kernel changes
against reference transcripts:

- ``wer``: word error rate over whitespace-delimited tokens,
- ``cer``: character error rate,
- ``mer_mixed``: mixed-script tokenization — CJK characters count as single
  tokens, Latin/digit runs as words — the natural unit for Chinese/English
  dictation (the reference's target domain).

All rates are substitution+insertion+deletion edit distances over reference
token counts. ``Corpus`` accumulates pairs and reports aggregate rates.
"""

from __future__ import annotations

import dataclasses
import re
import unicodedata
from typing import Iterable, List, Sequence, Tuple


def _edit_distance(ref: Sequence, hyp: Sequence) -> int:
    previous = list(range(len(hyp) + 1))
    current = [0] * (len(hyp) + 1)
    for i, r in enumerate(ref):
        current[0] = i + 1
        for j, h in enumerate(hyp):
            cost = previous[j] + (r != h)
            current[j + 1] = min(previous[j + 1] + 1, current[j] + 1, cost)
        previous, current = current, previous
    return previous[len(hyp)]


_PUNCT = re.compile(r"[^\w\s一-鿿㐀-䶿]", re.UNICODE)
_CJK = re.compile(r"[一-鿿㐀-䶿]")
_MIXED_TOKEN = re.compile(r"[一-鿿㐀-䶿]|[a-z0-9]+(?:'[a-z]+)?")


def normalize(text: str, strip_punctuation: bool = True) -> str:
    text = unicodedata.normalize("NFKC", text).lower().strip()
    if strip_punctuation:
        text = _PUNCT.sub(" ", text)
    return " ".join(text.split())


def word_tokens(text: str) -> List[str]:
    return normalize(text).split()


def char_tokens(text: str) -> List[str]:
    return [ch for ch in normalize(text) if not ch.isspace()]


def mixed_tokens(text: str) -> List[str]:
    """CJK chars as units, latin/digit runs as words."""
    return _MIXED_TOKEN.findall(normalize(text))


def _rate(ref_tokens: List, hyp_tokens: List) -> float:
    if not ref_tokens:
        return 0.0 if not hyp_tokens else 1.0
    return _edit_distance(ref_tokens, hyp_tokens) / len(ref_tokens)


def wer(reference: str, hypothesis: str) -> float:
    return _rate(word_tokens(reference), word_tokens(hypothesis))


def cer(reference: str, hypothesis: str) -> float:
    return _rate(char_tokens(reference), char_tokens(hypothesis))


def mer_mixed(reference: str, hypothesis: str) -> float:
    return _rate(mixed_tokens(reference), mixed_tokens(hypothesis))


@dataclasses.dataclass
class Corpus:
    """Aggregate error rates over many (reference, hypothesis) pairs."""

    errors: int = 0
    tokens: int = 0
    sentences: int = 0
    exact: int = 0

    def add(self, reference: str, hypothesis: str, tokenizer=mixed_tokens) -> None:
        ref = tokenizer(reference)
        hyp = tokenizer(hypothesis)
        self.errors += _edit_distance(ref, hyp)
        self.tokens += len(ref)
        self.sentences += 1
        self.exact += int(ref == hyp)

    @property
    def error_rate(self) -> float:
        if self.tokens == 0:
            return 0.0
        return self.errors / self.tokens

    @property
    def sentence_accuracy(self) -> float:
        if self.sentences == 0:
            return 0.0
        return self.exact / self.sentences


def evaluate_pairs(
    pairs: Iterable[Tuple[str, str]], tokenizer=mixed_tokens
) -> Corpus:
    corpus = Corpus()
    for reference, hypothesis in pairs:
        corpus.add(reference, hypothesis, tokenizer)
    return corpus


def main() -> None:  # pragma: no cover - thin CLI
    import argparse
    import json
    import sys

    parser = argparse.ArgumentParser(
        description="WER/CER over TSV lines: reference<TAB>hypothesis"
    )
    parser.add_argument("file", nargs="?", default="-")
    args = parser.parse_args()
    stream = sys.stdin if args.file == "-" else open(args.file, "r", encoding="utf-8")
    pairs = []
    for line in stream:
        if "\t" in line:
            ref, hyp = line.rstrip("\n").split("\t", 1)
            pairs.append((ref, hyp))
    corpus = evaluate_pairs(pairs)
    print(
        json.dumps(
            {
                "sentences": corpus.sentences,
                "mixed_error_rate": round(corpus.error_rate, 4),
                "sentence_accuracy": round(corpus.sentence_accuracy, 4),
            }
        )
    )


if __name__ == "__main__":  # pragma: no cover
    main()
