"""User profile store + vocabulary learning pipeline.

Port of the reference's profile service semantics
(``profile_service.rs:1-853``): the engine-side learning loop that turns
polish corrections and key terms into hot words the biasing pass
(``text.hotwords``) consumes.

Behaviors kept:

- caps: 300 hot words, 500 correction patterns, 12-char learned segments,
  24-char learned hot words, 80-char user hot words;
- ``learn_from_structured``: corrections upserted (user-sourced seed count
  3, AI count 1, single-char originals only as 1:1 swaps, >3× length-ratio
  pairs and reverse-mapping contradictions rejected); key terms tallied in a
  vocab-frequency map and **promoted to Learned hot words at count ≥ 3**;
- char-diff fallback learning (``collect_diff_correction_pairs``);
- hot-word sanitation: stopword filter, sentence-punctuation filter,
  >3-word ASCII filter, "looks like a sentence" action-char heuristic for
  learned Han words; case-insensitive dedup with weight/source merge;
- user-deleted words enter a ``blocked_hot_words`` blacklist that suppresses
  re-learning; ``add_hot_word`` un-blacklists and upgrades to User source;
- cleanup: contradictory correction pairs drop the lower count, stale
  single-occurrence AI rules expire after 24 h;
- persistence: atomic JSON writes with a debounced scheduler.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from light_whisper_tpu.text.hotwords import CorrectionPattern, HotWord, Source

MAX_CORRECTION_PATTERNS = 500
MAX_HOT_WORDS = 300
MAX_SEGMENT_CHARS = 12
MAX_HOT_WORD_CHARS = 24
MAX_USER_HOT_WORD_CHARS = 80
PROFILE_SAVE_DEBOUNCE_SECONDS = 0.35
PROMOTE_THRESHOLD = 3

_STOPWORDS = {
    "的", "了", "是", "在", "我", "有", "和", "就", "不", "人", "都", "一", "一个", "上", "也",
    "很", "到", "说", "要", "去", "你", "会", "着", "没有", "看", "好", "自己", "这", "他",
    "她", "它", "们", "那", "个", "什么", "怎么", "这个", "那个", "但是", "因为", "所以",
    "如果", "可以", "已经", "还是", "或者", "然后", "其实", "应该", "可能", "比较", "现在",
    "知道", "觉得", "时候", "这样", "那样",
}
_SENTENCE_PUNCT = set("，。！？；：、,.!?;:\n\r\t")
_ACTION_CHARS = set("请帮写说问想要给把做发改")


@dataclasses.dataclass
class VocabEntry:
    count: int = 0
    last_seen: int = 0


@dataclasses.dataclass
class UserProfile:
    hot_words: List[HotWord] = dataclasses.field(default_factory=list)
    correction_patterns: List[CorrectionPattern] = dataclasses.field(default_factory=list)
    vocab_frequency: Dict[str, VocabEntry] = dataclasses.field(default_factory=dict)
    blocked_hot_words: List[str] = dataclasses.field(default_factory=list)
    total_transcriptions: int = 0
    last_updated: int = 0

    # -- serialization -------------------------------------------------

    def to_dict(self) -> Dict:
        return {
            "hot_words": [
                {
                    "text": h.text,
                    "weight": h.weight,
                    "use_count": h.use_count,
                    "source": h.source.value,
                }
                for h in self.hot_words
            ],
            "correction_patterns": [
                {
                    "original": p.original,
                    "corrected": p.corrected,
                    "count": p.count,
                    "last_seen": p.last_seen,
                    "source": p.source.value,
                }
                for p in self.correction_patterns
            ],
            "vocab_frequency": {
                w: {"count": e.count, "last_seen": e.last_seen}
                for w, e in self.vocab_frequency.items()
            },
            "blocked_hot_words": list(self.blocked_hot_words),
            "total_transcriptions": self.total_transcriptions,
            "last_updated": self.last_updated,
        }

    @classmethod
    def from_dict(cls, data: Dict) -> "UserProfile":
        # Per-entry tolerance: ONE malformed entry (unknown source string
        # from a newer version, a non-numeric weight) must lose that entry,
        # not wipe 300 hot words — a load that returns an empty profile gets
        # permanently persisted by the next debounced save.
        profile = cls()
        for h in data.get("hot_words", []):
            try:
                profile.hot_words.append(
                    HotWord(
                        text=h.get("text", ""),
                        weight=int(h.get("weight", 1)),
                        use_count=int(h.get("use_count", 0)),
                        source=Source(h.get("source", "user")),
                    )
                )
            except (ValueError, TypeError, AttributeError):
                continue
        for p in data.get("correction_patterns", []):
            try:
                profile.correction_patterns.append(
                    CorrectionPattern(
                        original=p.get("original", ""),
                        corrected=p.get("corrected", ""),
                        count=int(p.get("count", 1)),
                        last_seen=int(p.get("last_seen", 0)),
                        source=Source(p.get("source", "ai")),
                    )
                )
            except (ValueError, TypeError, AttributeError):
                continue
        for word, entry in data.get("vocab_frequency", {}).items():
            try:
                profile.vocab_frequency[word] = VocabEntry(
                    count=int(entry.get("count", 0)),
                    last_seen=int(entry.get("last_seen", 0)),
                )
            except (ValueError, TypeError, AttributeError):
                continue
        profile.blocked_hot_words = list(data.get("blocked_hot_words", []))
        try:
            profile.total_transcriptions = int(data.get("total_transcriptions", 0))
            profile.last_updated = int(data.get("last_updated", 0))
        except (ValueError, TypeError):
            pass
        return profile


def _now() -> int:
    return int(time.time())


# ---------------------------------------------------------------------------
# text helpers
# ---------------------------------------------------------------------------


def normalize_whitespace(text: str) -> str:
    return " ".join(text.split())


def _normalize_key(text: str) -> Optional[Tuple[str, str]]:
    normalized = normalize_whitespace(text)
    if not normalized:
        return None
    return normalized, normalized.lower()


def contains_sentence_punctuation(text: str) -> bool:
    return any(ch in _SENTENCE_PUNCT for ch in text)


def looks_like_sentence(text: str) -> bool:
    action = sum(1 for ch in text if ch in _ACTION_CHARS)
    has_ascii = any(ch.isascii() and ch.isalnum() for ch in text)
    return not has_ascii and len(text) >= 6 and action >= 2


def is_potential_hot_word(word: str) -> bool:
    if word in _STOPWORDS:
        return False
    return any(ch.isalnum() or "一" <= ch <= "鿿" for ch in word)


def is_reasonable_hot_word(text: str, source: Source) -> bool:
    n = len(text)
    if source == Source.USER:
        return 1 <= n <= MAX_USER_HOT_WORD_CHARS and not any(
            ch in "\n\r\t" for ch in text
        )
    if not (2 <= n <= MAX_HOT_WORD_CHARS):
        return False
    if contains_sentence_punctuation(text):
        return False
    if len(text.split()) > 3:
        return False
    if source == Source.LEARNED and looks_like_sentence(text):
        return False
    return is_potential_hot_word(text)


# ---------------------------------------------------------------------------
# hot words
# ---------------------------------------------------------------------------


def _merge_hot_word(existing: HotWord, candidate: HotWord) -> None:
    def priority(w: HotWord):
        return (w.source == Source.USER, w.weight, w.use_count, len(w.text))

    if priority(candidate) > priority(existing):
        existing.text = candidate.text
    existing.weight = max(existing.weight, max(1, min(5, candidate.weight)))
    existing.use_count = max(existing.use_count, candidate.use_count)
    if candidate.source == Source.USER:
        existing.source = Source.USER


def sanitize_hot_words(profile: UserProfile) -> int:
    before = len(profile.hot_words)
    blocked = set(profile.blocked_hot_words)
    deduped: Dict[str, HotWord] = {}
    for hw in profile.hot_words:
        normalized = _normalize_key(hw.text)
        if normalized is None:
            continue
        hw.text, key = normalized
        hw.weight = max(1, min(5, hw.weight))
        if key in blocked:
            continue
        if not is_reasonable_hot_word(hw.text, hw.source):
            continue
        if key in deduped:
            _merge_hot_word(deduped[key], hw)
        else:
            deduped[key] = hw
    profile.hot_words = sorted(
        deduped.values(), key=lambda h: (-h.weight, -h.use_count)
    )[:MAX_HOT_WORDS]
    return max(0, before - len(profile.hot_words))


def add_hot_word(profile: UserProfile, text: str, weight: int = 3) -> None:
    normalized = _normalize_key(text)
    if normalized is None:
        return
    text, key = normalized
    profile.blocked_hot_words = [b for b in profile.blocked_hot_words if b != key]
    for existing in profile.hot_words:
        existing_key = _normalize_key(existing.text)
        if existing_key and existing_key[1] == key:
            existing.text = text
            existing.weight = max(1, min(5, weight))
            existing.source = Source.USER
            break
    else:
        profile.hot_words.append(
            HotWord(text=text, weight=max(1, min(5, weight)), source=Source.USER)
        )
    sanitize_hot_words(profile)
    profile.last_updated = _now()


def remove_hot_word(profile: UserProfile, text: str) -> None:
    """Removal blacklists the word so learning can never resurrect it."""
    normalized = _normalize_key(text)
    if normalized is None:
        profile.hot_words = [h for h in profile.hot_words if h.text != text]
        return
    _, key = normalized
    if key not in profile.blocked_hot_words:
        profile.blocked_hot_words.append(key)

    def keeps(word_text: str) -> bool:
        k = _normalize_key(word_text)
        return k is None or k[1] != key

    profile.hot_words = [h for h in profile.hot_words if keeps(h.text)]
    profile.vocab_frequency = {
        w: e for w, e in profile.vocab_frequency.items() if keeps(w)
    }
    sanitize_hot_words(profile)
    profile.last_updated = _now()


# ---------------------------------------------------------------------------
# corrections + learning
# ---------------------------------------------------------------------------


def _upsert_correction(
    patterns: List[CorrectionPattern],
    orig: str,
    corrected: str,
    initial_count: int,
    source: Source,
    now: int,
) -> None:
    orig_len, corrected_len = len(orig), len(corrected)
    if (
        not orig
        or not corrected
        or orig == corrected
        or orig_len > MAX_SEGMENT_CHARS
        or corrected_len > MAX_SEGMENT_CHARS
    ):
        return
    if orig_len == 1 and corrected_len != 1:
        return  # single-char originals only as 1:1 swaps
    longer, shorter = max(orig_len, corrected_len), min(orig_len, corrected_len)
    if shorter >= 2 and longer > shorter * 3:
        return  # likely a bad diff across a sentence rewrite
    if any(p.original == corrected and p.corrected == orig for p in patterns):
        return  # reverse mapping exists → contradiction
    for p in patterns:
        if p.original == orig and p.corrected == corrected:
            p.count += 1
            p.last_seen = now
            if source == Source.USER:
                p.source = Source.USER
            return
    patterns.append(
        CorrectionPattern(orig, corrected, count=initial_count, last_seen=now, source=source)
    )


def _update_vocab(profile: UserProfile, words: Iterable[str], now: int) -> None:
    for word in words:
        if len(word) < 2 or not is_potential_hot_word(word):
            continue
        entry = profile.vocab_frequency.setdefault(word, VocabEntry())
        entry.count += 1
        entry.last_seen = now


def _promote_vocab(profile: UserProfile, threshold: int) -> None:
    existing = {h.text for h in profile.hot_words}
    blocked = set(profile.blocked_hot_words)
    for word, entry in profile.vocab_frequency.items():
        key = _normalize_key(word)
        if (
            entry.count >= threshold
            and word not in existing
            and (key is None or key[1] not in blocked)
            and len(word) >= 2
            and is_potential_hot_word(word)
        ):
            profile.hot_words.append(
                HotWord(
                    text=word,
                    weight=2,
                    source=Source.LEARNED,
                    use_count=entry.count,
                )
            )


def limit_correction_patterns(profile: UserProfile) -> int:
    if len(profile.correction_patterns) <= MAX_CORRECTION_PATTERNS:
        return 0
    before = len(profile.correction_patterns)
    profile.correction_patterns.sort(key=lambda p: (-p.count, -p.last_seen))
    del profile.correction_patterns[MAX_CORRECTION_PATTERNS:]
    return before - len(profile.correction_patterns)


def learn_from_structured(
    profile: UserProfile,
    corrections: Sequence[Tuple[str, str]],
    key_terms: Sequence[str],
    source: Source = Source.AI,
) -> None:
    """Feed the polish pipeline's structured output back into the profile."""
    now = _now()
    initial_count = 3 if source == Source.USER else 1
    profile.total_transcriptions += 1
    profile.last_updated = now

    for orig, corrected in corrections:
        _upsert_correction(
            profile.correction_patterns, orig, corrected, initial_count, source, now
        )

    reasonable = (
        normalize_whitespace(term)
        for term in key_terms
        if is_reasonable_hot_word(normalize_whitespace(term), Source.LEARNED)
    )
    _update_vocab(profile, reasonable, now)
    _promote_vocab(profile, PROMOTE_THRESHOLD)
    limit_correction_patterns(profile)
    sanitize_hot_words(profile)


def extract_diff_segments(original: str, polished: str) -> List[Tuple[str, str]]:
    """Greedy char-diff segment pairs (fallback learning without an LLM)."""
    orig, pol = list(original), list(polished)
    diffs: List[Tuple[str, str]] = []
    i = j = 0
    while i < len(orig) and j < len(pol):
        if orig[i] == pol[j]:
            i += 1
            j += 1
            continue
        max_search = 20
        found = None
        for di in range(min(max_search, len(orig) - i)):
            for dj in range(min(max_search, len(pol) - j)):
                if (di or dj) and orig[i + di] == pol[j + dj]:
                    found = (i + di, j + dj)
                    break
            if found:
                break
        if not found:
            break
        oi, oj = found
        if (oi, oj) == (i, j):
            i += 1
            j += 1
            continue
        orig_seg = "".join(orig[i:oi])
        pol_seg = "".join(pol[j:oj])
        if orig_seg and pol_seg and len(orig_seg.encode()) <= 30:
            diffs.append((orig_seg, pol_seg))
        i, j = oi, oj
    return diffs


def collect_diff_correction_pairs(
    baselines: Sequence[str], corrected: str
) -> List[Tuple[str, str]]:
    if not corrected:
        return []
    seen = set()
    pairs: List[Tuple[str, str]] = []
    for baseline in baselines:
        if not baseline or baseline == corrected:
            continue
        for pair in extract_diff_segments(baseline, corrected):
            if pair not in seen:
                seen.add(pair)
                pairs.append(pair)
    return pairs


def cleanup_profile(profile: UserProfile) -> Dict[str, int]:
    """Periodic maintenance: contradictions, stale AI rules, caps."""
    now = _now()
    before = len(profile.correction_patterns)

    victims = set()
    for p in profile.correction_patterns:
        key = (p.original, p.corrected)
        if key in victims:
            continue
        rev = next(
            (
                q
                for q in profile.correction_patterns
                if q.original == p.corrected and q.corrected == p.original
            ),
            None,
        )
        if rev is not None:
            if rev.count >= p.count:
                victims.add(key)
            if p.count >= rev.count:
                victims.add((rev.original, rev.corrected))

    def keep(p: CorrectionPattern) -> bool:
        if p.source == Source.USER:
            return True
        o, c = len(p.original), len(p.corrected)
        if o > 15 or c > 15:
            return False
        if o == 1 and c != 1:
            return False
        longer, shorter = max(o, c), min(o, c)
        if shorter >= 2 and longer > shorter * 3:
            return False
        if (p.original, p.corrected) in victims:
            return False
        if p.count <= 1 and now - p.last_seen > 24 * 3600:
            return False
        return True

    profile.correction_patterns = [p for p in profile.correction_patterns if keep(p)]
    removed_corrections = (
        before - len(profile.correction_patterns) + limit_correction_patterns(profile)
    )
    removed_hot_words = sanitize_hot_words(profile)
    return {
        "removed_hot_words": removed_hot_words,
        "removed_corrections": removed_corrections,
    }


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------


class ProfileStore:
    """Atomic JSON persistence with debounced background saves."""

    def __init__(self, path: str, debounce_seconds: float = PROFILE_SAVE_DEBOUNCE_SECONDS):
        self.path = path
        self.debounce = debounce_seconds
        self._lock = threading.Lock()
        # serializes the actual file write: the debounce timer thread, a
        # flush(), and DailyMaintenance can otherwise run save_now
        # concurrently over ONE shared .tmp path (interleaved JSON installed
        # as the profile; FileNotFoundError from the losing os.replace)
        self._io_lock = threading.Lock()
        self._timer: Optional[threading.Timer] = None
        self._generation = 0

    def load(self) -> UserProfile:
        try:
            with open(self.path, "r", encoding="utf-8") as f:
                profile = UserProfile.from_dict(json.load(f))
        except (OSError, json.JSONDecodeError, ValueError, TypeError, AttributeError):
            # non-dict JSON (null/list) lands here; malformed ENTRIES are
            # skipped individually inside from_dict instead
            return UserProfile()
        cleanup_profile(profile)
        return profile

    def save_now(self, profile: UserProfile) -> None:
        with self._io_lock:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            tmp = self.path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(profile.to_dict(), f, ensure_ascii=False, indent=2)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)

    def schedule_save(self, profile: UserProfile) -> None:
        """Debounced: rapid successive edits collapse into one write."""
        snapshot = UserProfile.from_dict(profile.to_dict())
        with self._lock:
            self._generation += 1
            generation = self._generation
            if self._timer is not None:
                self._timer.cancel()

            def fire() -> None:
                with self._lock:
                    if generation != self._generation:
                        return
                self.save_now(snapshot)

            self._timer = threading.Timer(self.debounce, fire)
            self._timer.daemon = True
            self._timer.start()

    def flush(self) -> None:
        with self._lock:
            timer = self._timer
            self._timer = None
        if timer is not None:
            timer.cancel()
            # fire synchronously with whatever was scheduled last
            fn = timer.function
        else:
            return
        fn()
