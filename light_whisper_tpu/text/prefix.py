"""Stable-prefix smoothing for streaming hypotheses.

Port of the interim loop's display logic (``interim.rs:198-215``): the
common prefix between the previous and current hypothesis renders as stable
text; the divergent tail is tentative. The reference computes the prefix on
UTF-8 byte positions but only ever cuts at character boundaries
(``utf8_common_prefix_len`` walks char-by-char); operating on code points
here is equivalent.
"""

from __future__ import annotations

from typing import NamedTuple


class InterimSegments(NamedTuple):
    stable: str
    tentative: str


def common_prefix_len(a: str, b: str) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def interim_segments(previous: str, current: str) -> InterimSegments:
    """Split the current hypothesis into (stable, tentative) vs the previous."""
    cut = common_prefix_len(previous, current)
    return InterimSegments(stable=current[:cut], tentative=current[cut:])


class StablePrefixTracker:
    """Carries hypothesis state across interim ticks.

    The stable prefix is monotone across ticks relative to the *previous*
    hypothesis only (exactly like the reference — a regression in the new
    hypothesis shrinks the stable region).
    """

    def __init__(self) -> None:
        self._previous = ""

    def update(self, hypothesis: str) -> InterimSegments:
        segments = interim_segments(self._previous, hypothesis)
        self._previous = hypothesis
        return segments

    def reset(self) -> None:
        self._previous = ""

    @property
    def last_hypothesis(self) -> str:
        return self._previous
