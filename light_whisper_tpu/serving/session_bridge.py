"""Protocol-level streaming session reuse.

The reference shell drives its interim loop by re-sending the (VAD-trimmed)
rolling window through plain ``transcribe`` commands — the C++ engine's
persistent KV session is what made that cheap. This bridge restores (and
beats) that property for the TPU engine without any protocol change:

- if the incoming audio **byte-exactly extends** the previous request's
  audio, the incremental transcriber continues its KV prefix and verifies
  the previous transcript speculatively (greedy-exact);
- any other audio resets the session — identical results to a stateless
  ``transcribe`` with a fresh cache.

The prefix check is a memcmp over the overlap (sub-millisecond for ≤30 min
of 16 kHz float32); VAD trim offsets shifting between ticks simply fail the
check and reset, so correctness never depends on VAD stability.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from light_whisper_tpu.serving.incremental import IncrementalTranscriber

# Per-stream cap on the host audio parked for the next tick's prefix
# memcmp. Interim windows are ≤12 s (≤768 KB f32) so any real streaming
# traffic parks far below this; what the cap excludes is the one-shot long
# finalize (a 30-min request is ~115 MB f32 — the reference bounds the same
# surface with its 64 MB IPC cap, ``commands/funasr.rs:17-25``). Audio over
# the cap is simply not parked: the next tick resets the session, which is
# exactly the stateless behavior, and nothing ever byte-extends a finalize.
DEFAULT_PARK_MAX_BYTES = 8 << 20


def park_max_bytes() -> int:
    try:
        return max(0, int(os.environ.get("LWT_SESSION_PARK_MAX_BYTES", DEFAULT_PARK_MAX_BYTES)))
    except ValueError:
        return DEFAULT_PARK_MAX_BYTES


def _parkable(audio: Optional[np.ndarray]) -> Optional[np.ndarray]:
    if audio is None or audio.nbytes > park_max_bytes():
        return None
    return audio


class SessionBridge:
    def __init__(self, model) -> None:
        self.model = model
        self._inc = IncrementalTranscriber(model, max_new_tokens=model.max_new_tokens)
        self._prev: Optional[np.ndarray] = None
        self.session_hits = 0
        self.session_resets = 0

    def _extends_previous(self, audio: np.ndarray) -> bool:
        prev = self._prev
        return (
            prev is not None
            and len(audio) >= len(prev)
            and np.array_equal(audio[: len(prev)], prev)
        )

    def transcribe_extending(self, audio: np.ndarray):
        # dtype preserved: the server hands int16 for exact-s16 audio (the
        # device transport dtype); prefix memcmp works on either.
        audio = np.asarray(audio).reshape(-1)
        if self._extends_previous(audio):
            self.session_hits += 1
        else:
            self._inc.reset()
            self.session_resets += 1
        result = self._inc.transcribe_window(audio, window_start_sample=0)
        self._prev = _parkable(audio)
        return result

    def reset(self) -> None:
        self._inc.reset()
        self._prev = None

    @property
    def retained_bytes(self) -> int:
        prev = self._prev
        return 0 if prev is None else int(prev.nbytes)


def transcribe_extending_batch(bridges, audios):
    """One batched device tick for N per-stream sessions.

    The batched twin of :meth:`SessionBridge.transcribe_extending`: each
    stream keeps its own extends-previous check and KV session; compatible
    extending sessions run in one device program
    (``serving/incremental_batch.tick_batch``), the rest fall back to their
    per-stream path inside it. Token-identical to calling each bridge's
    ``transcribe_extending`` sequentially."""
    from light_whisper_tpu.serving.incremental_batch import tick_batch

    incs, windows = [], []
    for bridge, audio in zip(bridges, audios):
        audio = np.asarray(audio).reshape(-1)
        if bridge._extends_previous(audio):
            bridge.session_hits += 1
        else:
            bridge._inc.reset()
            bridge.session_resets += 1
        incs.append(bridge._inc)
        windows.append(audio)
    results = tick_batch(incs, windows)
    for bridge, window, result in zip(bridges, windows, results):
        if isinstance(result, BaseException):
            # transcribe_window reset the failing session (donated-buffer
            # rule); _prev must not outrun what the session consumed — a
            # stale _prev over an ADVANCED session would let a diverging
            # window skip the reset and extend KV built from other audio.
            bridge._prev = None
        else:
            bridge._prev = _parkable(window)
    return results
