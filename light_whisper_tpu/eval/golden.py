"""Golden-transcript regression harness.

Compares this engine's transcripts against reference outputs — shaped so
transcribe.cpp goldens drop straight in once real artifacts are obtainable
(BASELINE.md: "transcripts bit-matching vs reference GGUF engine"; reference
runtime call: ``qwen3_asr_server.py:318-321``).

Manifest format (JSONL, one utterance per line)::

    {"audio": "utt1.wav", "text": "expected transcript", "language": "en"}

``audio`` paths are resolved relative to the manifest file. ``language`` is
optional. The report gives per-utterance exact-match plus corpus-level
mixed-token error rate (CER for Han, WER for space-delimited scripts).

Typical use::

    python -m light_whisper_tpu.eval.golden manifest.jsonl model.gguf \
        [--precise] [--json]

``--precise`` runs the f32 fidelity mode, the right configuration when the
golden side is transcribe.cpp's f32 CPU output.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterable, List, Optional

from light_whisper_tpu.eval.wer import Corpus, normalize


@dataclasses.dataclass
class GoldenCase:
    audio: str  # resolved path
    text: str
    language: Optional[str] = None


@dataclasses.dataclass
class CaseResult:
    audio: str
    expected: str
    actual: str
    exact: bool
    normalized_match: bool
    language_expected: Optional[str]
    language_actual: Optional[str]


@dataclasses.dataclass
class GoldenReport:
    cases: List[CaseResult]
    error_rate: float  # corpus mixed-token error rate

    @property
    def total(self) -> int:
        return len(self.cases)

    @property
    def exact_matches(self) -> int:
        return sum(c.exact for c in self.cases)

    @property
    def bit_match(self) -> bool:
        return self.exact_matches == self.total

    def to_dict(self) -> dict:
        return {
            "total": self.total,
            "exact_matches": self.exact_matches,
            "bit_match": self.bit_match,
            "error_rate": round(self.error_rate, 5),
            "mismatches": [
                {"audio": c.audio, "expected": c.expected, "actual": c.actual}
                for c in self.cases
                if not c.exact
            ],
        }


def load_manifest(path: str) -> List[GoldenCase]:
    base = os.path.dirname(os.path.abspath(path))
    cases = []
    with open(path, "r", encoding="utf-8") as f:
        for line_no, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError as exc:
                raise ValueError(f"{path}:{line_no}: invalid JSON: {exc}") from exc
            audio = obj.get("audio")
            if not audio or "text" not in obj:
                raise ValueError(f"{path}:{line_no}: need 'audio' and 'text'")
            if not os.path.isabs(audio):
                audio = os.path.join(base, audio)
            cases.append(GoldenCase(audio=audio, text=obj["text"], language=obj.get("language")))
    if not cases:
        raise ValueError(f"{path}: empty manifest")
    return cases


def load_transcribe_cpp_fixture(path: str) -> List[GoldenCase]:
    """Ingest externally produced transcribe.cpp outputs VERBATIM.

    The reference runtime returns ``{"text": ..., "language": ...}`` per
    utterance (``session.run`` consumed at ``qwen3_asr_server.py:318-321``).
    A fixture recorded on a machine that can run the real artifacts is one
    JSON object per line::

        {"audio": "utt1.wav", "result": {"text": "...", "language": "zh"}}

    ``result`` may also be inlined (``{"audio": ..., "text": ..., "language":
    ...}`` — the shape the reference server emits on the wire). Audio paths
    resolve relative to the fixture file, exactly like :func:`load_manifest`.
    """
    base = os.path.dirname(os.path.abspath(path))
    cases: List[GoldenCase] = []
    with open(path, "r", encoding="utf-8") as f:
        for line_no, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError as exc:
                raise ValueError(f"{path}:{line_no}: invalid JSON: {exc}") from exc
            audio = obj.get("audio")
            result = obj.get("result", obj)
            if not audio or not isinstance(result, dict) or "text" not in result:
                raise ValueError(
                    f"{path}:{line_no}: need 'audio' and a result with 'text'"
                )
            if not os.path.isabs(audio):
                audio = os.path.join(base, audio)
            cases.append(
                GoldenCase(
                    audio=audio,
                    text=result["text"],
                    language=result.get("language"),
                )
            )
    if not cases:
        raise ValueError(f"{path}: empty fixture")
    return cases


def run_golden(cases: Iterable[GoldenCase], transcribe) -> GoldenReport:
    """``transcribe(audio_f32_16k) -> object with .text / .language``.

    Decoupled from the model class so the same harness can grade any engine
    (this one, a precise-mode run, or recorded transcribe.cpp outputs fed
    through a stub).
    """
    from light_whisper_tpu.audio.pcm import read_audio_file_mono_f32, resample_linear

    corpus = Corpus()
    results = []
    for case in cases:
        audio, rate = read_audio_file_mono_f32(case.audio)
        if rate != 16_000:
            audio = resample_linear(audio, rate, 16_000)
        out = transcribe(audio)
        actual = out.text
        exact = actual == case.text
        corpus.add(case.text, actual)
        results.append(
            CaseResult(
                audio=case.audio,
                expected=case.text,
                actual=actual,
                exact=exact,
                normalized_match=normalize(actual) == normalize(case.text),
                language_expected=case.language,
                language_actual=getattr(out, "language", None),
            )
        )
    return GoldenReport(cases=results, error_rate=corpus.error_rate)


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    parser.add_argument("manifest", help="JSONL golden manifest")
    parser.add_argument("model", help="GGUF model path")
    parser.add_argument("--precise", action="store_true", help="f32 fidelity mode")
    parser.add_argument("--json", action="store_true", help="machine-readable output")
    parser.add_argument(
        "--format",
        choices=["manifest", "transcribe-cpp"],
        default="manifest",
        help="manifest: {audio, text}; transcribe-cpp: recorded "
        "{audio, result:{text, language}} outputs ingested verbatim",
    )
    args = parser.parse_args(argv)

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    loader = (
        load_transcribe_cpp_fixture if args.format == "transcribe-cpp" else load_manifest
    )
    model = Qwen3ASRModel(args.model, precise=args.precise)
    report = run_golden(loader(args.manifest), model.transcribe)

    if args.json:
        print(json.dumps(report.to_dict(), ensure_ascii=False))
    else:
        for c in report.cases:
            mark = "OK " if c.exact else "DIFF"
            print(f"[{mark}] {os.path.basename(c.audio)}")
            if not c.exact:
                print(f"   expected: {c.expected!r}")
                print(f"   actual:   {c.actual!r}")
        print(
            f"{report.exact_matches}/{report.total} exact, "
            f"error_rate={report.error_rate:.4f}, bit_match={report.bit_match}"
        )
    return 0 if report.bit_match else 1


if __name__ == "__main__":
    raise SystemExit(main())
