"""Recording snapshot state machine: revisions, stale rejection, clears.

Reference invariants: ``app_state.rs:308-370`` — session-gated transitions,
strictly increasing revisions, outcome-only detail payloads.
"""

import threading

from light_whisper_tpu.runtime.recording_state import (
    RecordingOutcomeKind,
    RecordingPhase,
    RecordingSessionState,
)


def test_phase_progression_mints_increasing_revisions():
    state = RecordingSessionState()
    sid = state.begin_session("dictation")
    revisions = [state.snapshot().revision]
    for phase in (
        RecordingPhase.RECORDING,
        RecordingPhase.PROCESSING,
        RecordingPhase.OUTCOME,
    ):
        snap = state.transition_if_current(
            sid,
            phase,
            "dictation",
            outcome=RecordingOutcomeKind.NO_SPEECH if phase == RecordingPhase.OUTCOME else None,
        )
        assert snap is not None
        revisions.append(snap.revision)
    assert revisions == sorted(revisions) and len(set(revisions)) == len(revisions)
    final = state.snapshot()
    assert final.phase == RecordingPhase.OUTCOME
    assert final.outcome == RecordingOutcomeKind.NO_SPEECH


def test_stale_session_transition_rejected():
    state = RecordingSessionState()
    old = state.begin_session()
    new = state.begin_session("assistant")
    # a finalize task from the old session loses the race
    assert state.transition_if_current(old, RecordingPhase.PROCESSING, "dictation") is None
    assert state.snapshot().session_id == new
    # the new session still transitions fine
    assert state.transition_if_current(new, RecordingPhase.RECORDING, "assistant") is not None


def test_outcome_detail_only_on_outcome_phase():
    state = RecordingSessionState()
    sid = state.begin_session()
    snap = state.transition_if_current(
        sid, RecordingPhase.PROCESSING, "dictation",
        outcome=RecordingOutcomeKind.ASR_ERROR, detail="ignored",
    )
    assert snap.outcome is None and snap.detail is None  # non-terminal phase
    done = state.transition_if_current(
        sid, RecordingPhase.OUTCOME, "dictation",
        outcome=RecordingOutcomeKind.ASR_ERROR, detail="engine crashed",
    )
    assert done.outcome == RecordingOutcomeKind.ASR_ERROR
    assert done.detail == "engine crashed"
    event = done.to_event()
    assert event["outcome"] == "asr_error" and event["phase"] == "outcome"


def test_clear_is_session_gated():
    state = RecordingSessionState()
    old = state.begin_session()
    new = state.begin_session()
    assert not state.clear_if_session(old)  # stale task can't blank newer UI
    assert state.snapshot() is not None
    assert state.clear_if_session(new)
    assert state.snapshot() is None


def test_concurrent_transitions_keep_revisions_strict():
    state = RecordingSessionState()
    sid = state.begin_session()
    seen = []
    lock = threading.Lock()

    def hammer():
        for _ in range(200):
            snap = state.transition_if_current(sid, RecordingPhase.RECORDING, "dictation")
            if snap is not None:
                with lock:
                    seen.append(snap.revision)

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(seen) == 800
    assert len(set(seen)) == 800  # every transition minted a unique revision
