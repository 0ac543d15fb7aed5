"""Subtitle show-generation guard + pending-paste queue (portable race
semantics of window.rs:193-244,367+ and finalize.rs:1060-1078)."""

from light_whisper_tpu.runtime.presentation import (
    PASTE_DELAY_MS,
    PasteGate,
    SubtitleGuard,
)


def test_show_wins_only_when_current():
    g = SubtitleGuard()
    gen1 = g.reserve(session_id=1)
    assert g.show_if_current(1, gen1)
    assert g.visible and g.visible_session() == 1


def test_stale_show_from_superseded_session_cannot_flash():
    g = SubtitleGuard()
    gen1 = g.reserve(1)
    gen2 = g.reserve(2)  # newer recording started before session 1's show ran
    assert not g.show_if_current(1, gen1)  # stale task loses
    assert not g.visible
    assert g.show_if_current(2, gen2)
    assert g.visible_session() == 2


def test_scheduled_hide_only_fires_for_its_own_show():
    g = SubtitleGuard()
    gen1 = g.reserve(1)
    g.show_if_current(1, gen1)
    gen2 = g.reserve(2)
    g.show_if_current(2, gen2)
    # session 1's delayed hide must not blank session 2's overlay
    assert not g.hide_if_current(1, gen1)
    assert g.visible and g.visible_session() == 2
    assert g.hide_if_current(2, gen2)
    assert not g.visible


def test_same_session_new_generation_supersedes():
    g = SubtitleGuard()
    gen1 = g.reserve(7)
    gen2 = g.reserve(7)  # re-show for the same session
    assert not g.show_if_current(7, gen1)
    assert g.show_if_current(7, gen2)


def test_paste_delivers_immediately_when_idle():
    got = []
    gate = PasteGate(lambda text, delay: got.append((text, delay)))
    assert gate.paste("hello")
    assert got == [("hello", PASTE_DELAY_MS)]


def test_paste_queues_while_recording_and_flushes_in_order():
    got = []
    gate = PasteGate(lambda text, delay: got.append(text))
    gate.set_recording(True)
    assert not gate.paste("first")
    assert not gate.paste("second")
    assert got == [] and gate.pending_count == 2
    gate.set_recording(False)
    assert got == ["first", "second"]
    assert gate.pending_count == 0
    # subsequent pastes deliver directly again
    assert gate.paste("third")
    assert got == ["first", "second", "third"]


def test_empty_text_never_queues():
    got = []
    gate = PasteGate(lambda text, delay: got.append(text))
    gate.set_recording(True)
    assert gate.paste("")
    assert gate.pending_count == 0
