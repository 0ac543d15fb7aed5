"""Text-injection core: paste + selection-grab semantics (clipboard.rs parity)."""
from __future__ import annotations

from typing import List, Optional, Sequence

import pytest

from light_whisper_tpu.runtime.inject import (
    CLIPBOARD_RESTORE_DELAY_S,
    MODIFIER_VKS,
    SENDINPUT_CHUNK_SIZE,
    VK_C,
    VK_CONTROL,
    VK_RETURN,
    VK_TAB,
    VK_V,
    InjectError,
    KeyEvent,
    TextInjector,
    build_unicode_events,
    release_stuck_modifiers,
    send_events,
    should_restore_clipboard_after_paste,
    snapshot_with_fallback,
)


class FakeClipboard:
    def __init__(self, text: Optional[str] = None):
        self.text = text
        self.snapshots: List[str] = []
        self.restored: List[object] = []
        self.log: List[str] = []
        self.fail_all_formats = False
        self.fail_standard = False
        self.fail_write = False
        self.fail_restore = False
        self.read_script: List[Optional[str]] = []

    def snapshot(self, all_formats: bool) -> object:
        if all_formats and self.fail_all_formats:
            raise RuntimeError("registered format unavailable")
        if not all_formats and self.fail_standard:
            raise RuntimeError("standard formats failed")
        snap = ("snap", self.text, all_formats)
        self.log.append(f"snapshot(all={all_formats})")
        return snap

    def restore(self, snapshot: object) -> None:
        if self.fail_restore:
            raise RuntimeError("restore failed")
        self.restored.append(snapshot)
        self.text = snapshot[1]
        self.log.append("restore")

    def write_text(self, text: str) -> None:
        if self.fail_write:
            raise RuntimeError("write failed")
        self.text = text
        self.log.append(f"write({text[:24]})")

    def read_text(self) -> Optional[str]:
        if self.read_script:
            self.text = self.read_script.pop(0)
        self.log.append("read")
        return self.text


class FakeKeys:
    def __init__(self, short_send_at: Optional[int] = None):
        self.events: List[KeyEvent] = []
        self.calls: List[int] = []
        self.short_send_at = short_send_at

    def send(self, events: Sequence[KeyEvent]) -> int:
        self.calls.append(len(events))
        if self.short_send_at is not None and len(self.calls) >= self.short_send_at:
            self.events.extend(events[:-1])
            return len(events) - 1
        self.events.extend(events)
        return len(events)


class FakeIme:
    def __init__(self, open_: bool):
        self._open = open_
        self.transitions: List[bool] = []

    def is_open(self) -> bool:
        return self._open

    def set_open(self, open_: bool) -> None:
        self._open = open_
        self.transitions.append(open_)


def make_injector(clipboard, keys, **kw):
    sleeps: List[float] = []
    inj = TextInjector(clipboard, keys, sleep=sleeps.append, **kw)
    return inj, sleeps


# -- snapshot fallback ladder (clipboard.rs:36-68) -------------------------

def test_snapshot_keeps_full_formats_when_readable():
    attempts = []

    def capture(all_formats):
        attempts.append(all_formats)
        return "full"

    snap, degraded = snapshot_with_fallback(capture)
    assert snap == "full" and degraded is None
    assert attempts == [True]


def test_snapshot_falls_back_to_standard_formats():
    attempts = []

    def capture(all_formats):
        attempts.append(all_formats)
        if all_formats:
            raise RuntimeError("registered format unavailable")
        return "standard"

    snap, degraded = snapshot_with_fallback(capture)
    assert snap == "standard" and "registered" in str(degraded)
    assert attempts == [True, False]


def test_snapshot_reports_both_failures():
    def capture(all_formats):
        raise RuntimeError("all" if all_formats else "standard")

    with pytest.raises(InjectError) as err:
        snapshot_with_fallback(capture)
    assert "all" in str(err.value) and "standard" in str(err.value)


# -- restore guard (clipboard.rs:276-281) -----------------------------------

def test_restore_guard_allows_only_app_written_text():
    assert should_restore_clipboard_after_paste("dictated", "dictated")
    assert not should_restore_clipboard_after_paste("user change", "dictated")
    assert not should_restore_clipboard_after_paste(None, "dictated")


# -- unicode event building (clipboard.rs:390-413) --------------------------

def test_unicode_events_map_control_characters():
    events = build_unicode_events("a\r\n\tb")
    # 'a' down/up, \r dropped, Return down/up, Tab down/up, 'b' down/up.
    kinds = [(e.vk, e.scan, e.up, e.unicode) for e in events]
    assert kinds == [
        (0, ord("a"), False, True), (0, ord("a"), True, True),
        (VK_RETURN, 0, False, False), (VK_RETURN, 0, True, False),
        (VK_TAB, 0, False, False), (VK_TAB, 0, True, False),
        (0, ord("b"), False, True), (0, ord("b"), True, True),
    ]


def test_unicode_events_split_surrogate_pairs():
    events = build_unicode_events("\U0001F600")  # emoji, 2 UTF-16 units
    assert len(events) == 4
    units = [e.scan for e in events]
    assert units[0] == units[1] and units[2] == units[3]
    assert 0xD800 <= units[0] <= 0xDBFF and 0xDC00 <= units[2] <= 0xDFFF
    assert all(e.unicode for e in events)


def test_unicode_events_cjk_single_unit():
    events = build_unicode_events("你好")
    assert [e.scan for e in events] == [0x4F60, 0x4F60, 0x597D, 0x597D]


# -- chunked send + partial-send failure (clipboard.rs:71-92) ----------------

def test_send_events_chunks_long_sequences():
    keys = FakeKeys()
    events = build_unicode_events("x" * 200)  # 400 events
    send_events(keys, events)
    assert keys.calls == [SENDINPUT_CHUNK_SIZE] * 3 + [400 - 3 * SENDINPUT_CHUNK_SIZE]
    assert len(keys.events) == 400


def test_send_events_partial_send_is_failure():
    keys = FakeKeys(short_send_at=1)
    with pytest.raises(InjectError):
        send_events(keys, build_unicode_events("hello"))


# -- stuck modifier release (clipboard.rs:96-117) ----------------------------

def test_release_stuck_modifiers_emits_keyups_for_held_keys():
    held = {MODIFIER_VKS[0], MODIFIER_VKS[5]}
    events = release_stuck_modifiers(lambda vk: vk in held)
    assert {e.vk for e in events} == held
    assert all(e.up for e in events)


# -- clipboard-mode paste (clipboard.rs:293-354) -----------------------------

def test_clipboard_paste_snapshots_before_write_and_restores_after_guard():
    clip = FakeClipboard(text="user clipboard")
    keys = FakeKeys()
    inj, sleeps = make_injector(clip, keys)

    inj.paste_text("dictated text", method="clipboard")

    # Order: snapshot -> write -> (events) -> read -> restore.
    assert clip.log.index("snapshot(all=True)") < clip.log.index("write(dictated text)")
    assert clip.log.index("write(dictated text)") < clip.log.index("read")
    assert clip.log.index("read") < clip.log.index("restore")
    # Ctrl+V went down/up.
    vks = [(e.vk, e.up) for e in keys.events]
    assert vks == [(VK_CONTROL, False), (VK_V, False), (VK_V, True), (VK_CONTROL, True)]
    # The restore delay ran between paste and the guard read.
    assert CLIPBOARD_RESTORE_DELAY_S in sleeps
    # The user's clipboard came back.
    assert clip.text == "user clipboard"


def test_clipboard_paste_preserves_user_clipboard_change():
    clip = FakeClipboard(text="old")
    clip.read_script = ["user pasted something new"]
    keys = FakeKeys()
    inj, _ = make_injector(clip, keys)

    inj.paste_text("dictated", method="clipboard")

    assert clip.restored == []
    assert clip.text == "user pasted something new"


def test_clipboard_paste_restore_failure_after_success_raises():
    clip = FakeClipboard(text="old")
    clip.fail_restore = True
    inj, _ = make_injector(clip, FakeKeys())

    with pytest.raises(InjectError):
        inj.paste_text("dictated", method="clipboard")


def test_clipboard_paste_send_failure_propagates_but_still_restores():
    clip = FakeClipboard(text="old")
    keys = FakeKeys(short_send_at=1)
    inj, _ = make_injector(clip, keys)

    with pytest.raises(InjectError):
        inj.paste_text("dictated", method="clipboard")
    # Restore still ran (clipboard holds our text since Ctrl+V never landed).
    assert clip.restored and clip.text == "old"


def test_clipboard_paste_uses_degraded_snapshot_when_full_capture_fails():
    clip = FakeClipboard(text="old")
    clip.fail_all_formats = True
    logs: List[str] = []
    inj, _ = make_injector(clip, FakeKeys(), log=logs.append)

    inj.paste_text("dictated", method="clipboard")

    assert any("回退到标准格式" in m for m in logs)
    assert clip.text == "old"


# -- send-input paste (clipboard.rs:355-429) ---------------------------------

def test_sendinput_paste_releases_modifiers_then_sends_unicode():
    clip = FakeClipboard()
    keys = FakeKeys()
    held = {VK_CONTROL & 0, MODIFIER_VKS[6]}  # LCONTROL held
    inj, _ = make_injector(clip, keys, modifier_pressed=lambda vk: vk in held)

    inj.paste_text("hi", method="sendInput")

    assert keys.events[0] == KeyEvent(vk=MODIFIER_VKS[6], up=True)
    assert [e.scan for e in keys.events[1:]] == [ord("h"), ord("h"), ord("i"), ord("i")]


def test_sendinput_paste_suppresses_and_restores_ime():
    ime = FakeIme(open_=True)
    inj, _ = make_injector(FakeClipboard(), FakeKeys(), ime=ime)

    inj.paste_text("你好", method="sendInput")

    assert ime.transitions == [False, True]


def test_sendinput_paste_restores_ime_even_on_send_failure():
    ime = FakeIme(open_=True)
    keys = FakeKeys(short_send_at=1)
    inj, _ = make_injector(FakeClipboard(), keys, ime=ime)

    with pytest.raises(InjectError):
        inj.paste_text("你好", method="sendInput")
    assert ime.transitions == [False, True]


def test_sendinput_paste_leaves_closed_ime_alone():
    ime = FakeIme(open_=False)
    inj, _ = make_injector(FakeClipboard(), FakeKeys(), ime=ime)
    inj.paste_text("hi", method="sendInput")
    assert ime.transitions == []


def test_sendinput_paste_empty_text_sends_nothing():
    keys = FakeKeys()
    inj, _ = make_injector(FakeClipboard(), keys)
    inj.paste_text("\r", method="sendInput")  # only a dropped CR
    assert keys.events == []


# -- selection grab (clipboard.rs:120-232) -----------------------------------

class FakeSelection:
    def __init__(self, text: Optional[str]):
        self.text = text

    def selected_text(self) -> Optional[str]:
        return self.text


def test_grab_prefers_accessibility_provider():
    clip = FakeClipboard(text="untouched")
    keys = FakeKeys()
    inj, _ = make_injector(clip, keys, selection=FakeSelection("  selected  "))

    assert inj.grab_selected_text_robust() == "selected"
    assert keys.events == [] and clip.log == []  # zero side effects


def test_grab_fallback_copies_and_restores():
    clip = FakeClipboard(text="user clipboard")
    # After Ctrl+C lands, the app's copy replaced our marker.
    clip.read_script = ["the selection", "the selection"]
    keys = FakeKeys()
    inj, _ = make_injector(clip, keys, selection=FakeSelection(None))

    assert inj.grab_selected_text_robust() == "the selection"
    # Ctrl+C went out.
    vks = [(e.vk, e.up) for e in keys.events]
    assert vks == [(VK_CONTROL, False), (VK_C, False), (VK_C, True), (VK_CONTROL, True)]
    # Snapshot restored — the user's clipboard survives the grab.
    assert clip.text == "user clipboard"


def test_grab_fallback_no_selection_leaves_marker_restored_and_returns_none():
    clip = FakeClipboard(text="user clipboard")
    keys = FakeKeys()
    inj, _ = make_injector(clip, keys)  # no selection provider at all

    # Nothing replaces the marker: reads return the marker itself.
    assert inj.grab_selected_text_robust() is None
    assert clip.text == "user clipboard"  # restored


def test_grab_fallback_preserves_concurrent_clipboard_change():
    clip = FakeClipboard(text="user clipboard")
    # First read: our copy; second read: another app changed it again.
    clip.read_script = ["the selection", "clipboard manager content"]
    inj, _ = make_injector(clip, FakeKeys())

    assert inj.grab_selected_text_robust() == "the selection"
    assert clip.restored == []
    assert clip.text == "clipboard manager content"


def test_grab_fallback_skips_when_snapshot_fails():
    clip = FakeClipboard(text="user clipboard")
    clip.fail_all_formats = True
    clip.fail_standard = True
    keys = FakeKeys()
    inj, _ = make_injector(clip, keys)

    assert inj.grab_selected_text_robust() is None
    assert keys.events == []  # no Ctrl+C without a safe snapshot


def test_grab_fallback_write_failure_restores_and_returns_none():
    clip = FakeClipboard(text="user clipboard")
    clip.fail_write = True
    keys = FakeKeys()
    inj, _ = make_injector(clip, keys)

    assert inj.grab_selected_text_robust() is None
    assert clip.restored  # snapshot put back
    assert keys.events == []


def test_grab_fallback_copy_failure_returns_none():
    clip = FakeClipboard(text="user clipboard")
    keys = FakeKeys(short_send_at=1)
    inj, _ = make_injector(clip, keys)

    assert inj.grab_selected_text_robust() is None
    assert clip.text == "user clipboard"
