"""Portable text-injection core (paste / selection-grab semantics).

This is the engine-relevant decision logic of the reference's clipboard
command layer (``src-tauri/src/commands/clipboard.rs``), rebuilt as a
headless core over injectable OS backends. Everything that decides *what*
to do — event sequences, ordering contracts, fallback ladders, restore
guards — lives here and is unit-testable; only the raw OS calls (Win32
``SendInput``, clipboard API, IMM) stay behind the backend protocols.

Reference semantics preserved:

- clipboard-snapshot capture tries all formats then falls back to the
  standard formats (``clipboard.rs:36-68``);
- the post-paste restore guard only restores the user's clipboard when the
  current clipboard still holds the text *we* wrote (``clipboard.rs:276-281``);
- ``paste`` in clipboard mode: snapshot -> write -> settle -> release stuck
  modifiers -> Ctrl+V -> restore-delay -> guarded restore
  (``clipboard.rs:293-354``, including "restore failure after a successful
  paste is an error; after a failed paste it is only logged");
- ``paste`` in send-input mode: release stuck modifiers -> temporarily close
  the foreground IME -> send Unicode key events (``\\r`` dropped, ``\\n`` ->
  Return, ``\\t`` -> Tab, everything else as UTF-16 code units) -> ALWAYS
  restore the IME, even when sending failed (``clipboard.rs:355-429``);
- key events go to the sink in chunks of 128 and a partial send is a
  failure, never a silent success (``clipboard.rs:71-92``);
- selection grab prefers the zero-side-effect accessibility provider and
  only then falls back to marker-based Ctrl+C with snapshot restore
  (``clipboard.rs:137-206``): write a random marker, copy, and restore the
  snapshot only when the clipboard still holds the marker or the copied
  text — a concurrent user/app clipboard change is preserved.
"""
from __future__ import annotations

import secrets
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Protocol, Sequence, Tuple

__all__ = [
    "KeyEvent",
    "ClipboardBackend",
    "KeySink",
    "ImeController",
    "SelectionProvider",
    "InjectError",
    "snapshot_with_fallback",
    "should_restore_clipboard_after_paste",
    "build_unicode_events",
    "release_stuck_modifiers",
    "send_events",
    "TextInjector",
    "SENDINPUT_CHUNK_SIZE",
    "CLIPBOARD_RESTORE_DELAY_S",
    "MODIFIER_VKS",
    "VK_CONTROL",
    "VK_C",
    "VK_V",
    "VK_RETURN",
    "VK_TAB",
]

# Virtual-key codes the core reasons about (clipboard.rs:99-104, 162-163,
# 327-328, 358-359). Values are the Win32 ones; a non-Windows sink is free
# to map them.
VK_LWIN, VK_RWIN = 0x5B, 0x5C
VK_LMENU, VK_RMENU = 0xA4, 0xA5
VK_LSHIFT, VK_RSHIFT = 0xA0, 0xA1
VK_LCONTROL, VK_RCONTROL = 0xA2, 0xA3
MODIFIER_VKS: Tuple[int, ...] = (
    VK_LWIN, VK_RWIN, VK_LMENU, VK_RMENU,
    VK_LSHIFT, VK_RSHIFT, VK_LCONTROL, VK_RCONTROL,
)
VK_CONTROL = 0x11
VK_C = 0x43
VK_V = 0x56
VK_RETURN = 0x0D
VK_TAB = 0x09

SENDINPUT_CHUNK_SIZE = 128
# clipboard.rs:33 — milliseconds the reference waits between Ctrl+V and the
# restore guard so the target app has consumed the clipboard text.
CLIPBOARD_RESTORE_DELAY_S = 0.200
_PRE_PASTE_SETTLE_S = 0.010
_POST_RELEASE_SETTLE_S = 0.020
_COPY_SETTLE_S = 0.070
_DOUBLE_READ_GAP_S = 0.005
_IME_RESTORE_SETTLE_S = 0.010


@dataclass(frozen=True)
class KeyEvent:
    """One keyboard event as the reference builds them (clipboard.rs:17-30).

    ``vk`` is the virtual-key code (0 for Unicode injection), ``scan`` the
    UTF-16 code unit for Unicode injection (0 otherwise), ``up`` the
    key-up flag, ``unicode`` the KEYEVENTF_UNICODE flag.
    """

    vk: int = 0
    scan: int = 0
    up: bool = False
    unicode: bool = False


class ClipboardBackend(Protocol):
    """Raw clipboard operations (Tauri clipboard plugin + uiautomation)."""

    def snapshot(self, all_formats: bool) -> object:
        """Capture the clipboard; may raise."""

    def restore(self, snapshot: object) -> None:
        """Restore a snapshot; may raise."""

    def write_text(self, text: str) -> None:
        """Replace the clipboard with ``text``; may raise."""

    def read_text(self) -> Optional[str]:
        """Current clipboard text, or ``None`` if unavailable/non-text."""


class KeySink(Protocol):
    """Delivers key events to the OS (``SendInput`` analogue).

    Returns the number of events actually delivered — the core treats a
    short count as failure (clipboard.rs:82-89).
    """

    def send(self, events: Sequence[KeyEvent]) -> int: ...


class ImeController(Protocol):
    """Foreground-window IME gate (``ImmGetDefaultIMEWnd`` + WM_IME_CONTROL)."""

    def is_open(self) -> bool: ...

    def set_open(self, open_: bool) -> None: ...


class SelectionProvider(Protocol):
    """Zero-side-effect selected-text reader (UIA TextPattern analogue)."""

    def selected_text(self) -> Optional[str]: ...


class InjectError(RuntimeError):
    """Raised when injection fails in a way the caller must see."""


def snapshot_with_fallback(
    capture: Callable[[bool], object],
) -> Tuple[object, Optional[Exception]]:
    """All-formats snapshot with standard-formats fallback.

    Mirrors ``try_all_then_standard`` (clipboard.rs:36-47): returns
    ``(snapshot, None)`` on a clean full capture, ``(snapshot, first_error)``
    when only the standard-formats capture succeeded, and raises
    :class:`InjectError` carrying both errors when both fail.
    """
    try:
        return capture(True), None
    except Exception as all_formats_error:  # noqa: BLE001 — backend-defined
        try:
            return capture(False), all_formats_error
        except Exception as standard_error:  # noqa: BLE001
            raise InjectError(
                "创建剪贴板快照失败"
                f"（完整格式: {all_formats_error}; 标准格式: {standard_error}）"
            ) from standard_error


def should_restore_clipboard_after_paste(
    current_clipboard_text: Optional[str], paste_text: str
) -> bool:
    """Restore only when the clipboard still holds OUR text (clipboard.rs:276-281).

    ``None`` (unavailable or non-text clipboard) and any differing text mean
    the user or another app changed the clipboard mid-paste; their content
    wins and the snapshot is NOT restored.
    """
    return current_clipboard_text == paste_text


def build_unicode_events(text: str) -> List[KeyEvent]:
    """Key-event sequence for direct Unicode injection (clipboard.rs:390-413).

    ``\\r`` is dropped (CRLF collapses to one Return), ``\\n`` becomes a
    Return press, ``\\t`` a Tab press, and every other character is injected
    as its UTF-16 code units with KEYEVENTF_UNICODE (surrogate pairs produce
    two down/up pairs, as the reference's ``encode_utf16`` loop does).
    """
    events: List[KeyEvent] = []
    for ch in text:
        if ch == "\r":
            continue
        if ch == "\n":
            events.append(KeyEvent(vk=VK_RETURN))
            events.append(KeyEvent(vk=VK_RETURN, up=True))
        elif ch == "\t":
            events.append(KeyEvent(vk=VK_TAB))
            events.append(KeyEvent(vk=VK_TAB, up=True))
        else:
            raw = ch.encode("utf-16-le")
            for i in range(0, len(raw), 2):
                unit = int.from_bytes(raw[i : i + 2], "little")
                events.append(KeyEvent(scan=unit, unicode=True))
                events.append(KeyEvent(scan=unit, up=True, unicode=True))
    return events


def release_stuck_modifiers(
    is_pressed: Callable[[int], bool],
) -> List[KeyEvent]:
    """Key-up events for every currently held modifier (clipboard.rs:96-117).

    Prevents the OS from reading the injected sequence as a hotkey chord
    while the user still physically holds the dictation hotkey's modifiers.
    """
    return [KeyEvent(vk=vk, up=True) for vk in MODIFIER_VKS if is_pressed(vk)]


def send_events(sink: KeySink, events: Sequence[KeyEvent]) -> None:
    """Chunked delivery with partial-send detection (clipboard.rs:71-92)."""
    for start in range(0, len(events), SENDINPUT_CHUNK_SIZE):
        chunk = events[start : start + SENDINPUT_CHUNK_SIZE]
        sent = sink.send(chunk)
        if sent != len(chunk):
            raise InjectError(
                f"SendInput 调用失败：只发送了 {sent}/{len(chunk)} 个输入事件"
            )


def _ctrl_combo(vk: int) -> List[KeyEvent]:
    return [
        KeyEvent(vk=VK_CONTROL),
        KeyEvent(vk=vk),
        KeyEvent(vk=vk, up=True),
        KeyEvent(vk=VK_CONTROL, up=True),
    ]


class TextInjector:
    """Headless driver for paste and selection-grab flows.

    Wire the four backends to the host OS (or to fakes in tests); ``sleep``
    is injectable so tests run instantly while the production timings match
    the reference's settle delays.
    """

    def __init__(
        self,
        clipboard: ClipboardBackend,
        keys: KeySink,
        ime: Optional[ImeController] = None,
        selection: Optional[SelectionProvider] = None,
        modifier_pressed: Callable[[int], bool] = lambda _vk: False,
        sleep: Callable[[float], None] = time.sleep,
        log: Callable[[str], None] = lambda _msg: None,
    ) -> None:
        self._clipboard = clipboard
        self._keys = keys
        self._ime = ime
        self._selection = selection
        self._modifier_pressed = modifier_pressed
        self._sleep = sleep
        self._log = log

    # -- paste ---------------------------------------------------------

    def paste_text(self, text: str, method: str = "sendInput") -> None:
        """Inject ``text`` into the foreground app (clipboard.rs:283-445).

        ``method == "clipboard"`` routes through the clipboard + Ctrl+V with
        snapshot restore; anything else uses direct Unicode key events with
        IME suppression.
        """
        if method == "clipboard":
            self._paste_via_clipboard(text)
        else:
            self._paste_via_send_input(text)

    def _paste_via_clipboard(self, text: str) -> None:
        # Order contract (clipboard.rs:314-354): snapshot BEFORE writing the
        # paste text; the restore runs after the delay and only through the
        # restore guard.
        snapshot, degraded = snapshot_with_fallback(self._clipboard.snapshot)
        if degraded is not None:
            self._log(f"完整剪贴板快照失败，已回退到标准格式快照: {degraded}")
        self._clipboard.write_text(text)

        paste_error: Optional[Exception] = None
        try:
            self._sleep(_PRE_PASTE_SETTLE_S)
            self._release_stuck_modifiers()
            self._sleep(_POST_RELEASE_SETTLE_S)
            send_events(self._keys, _ctrl_combo(VK_V))
        except Exception as exc:  # noqa: BLE001 — sink/backend-defined
            paste_error = exc
        else:
            self._sleep(CLIPBOARD_RESTORE_DELAY_S)

        current = self._clipboard.read_text()
        if should_restore_clipboard_after_paste(current, text):
            try:
                self._clipboard.restore(snapshot)
            except Exception as exc:  # noqa: BLE001
                self._log(f"恢复剪贴板快照失败: {exc}")
                if paste_error is None:
                    # A successful paste that leaves the user's clipboard
                    # clobbered must surface (clipboard.rs:344-349).
                    raise InjectError(f"恢复剪贴板快照失败: {exc}") from exc
        else:
            self._log("剪贴板内容已变化，跳过恢复以保留用户的新剪贴板内容")

        if paste_error is not None:
            raise InjectError(str(paste_error)) from paste_error

    def _paste_via_send_input(self, text: str) -> None:
        self._release_stuck_modifiers()
        self._sleep(_POST_RELEASE_SETTLE_S)

        ime_was_open = False
        if self._ime is not None and self._ime.is_open():
            # Close the foreground IME so Unicode events are not intercepted
            # (clipboard.rs:368-387).
            self._ime.set_open(False)
            ime_was_open = True
            self._log("已临时关闭前台窗口输入法")

        send_error: Optional[Exception] = None
        events = build_unicode_events(text)
        if events:
            try:
                send_events(self._keys, events)
            except Exception as exc:  # noqa: BLE001
                send_error = exc

        # The IME restore is unconditional — a stuck-closed IME is worse
        # than a failed paste (clipboard.rs:420-427).
        if ime_was_open:
            self._sleep(_IME_RESTORE_SETTLE_S)
            self._ime.set_open(True)  # type: ignore[union-attr]
            self._log("已恢复前台窗口输入法")

        if send_error is not None:
            raise InjectError(str(send_error)) from send_error

    # -- selection grab --------------------------------------------------

    def grab_selected_text(self) -> Optional[str]:
        """Zero-side-effect read via the accessibility provider (clipboard.rs:120-130)."""
        if self._selection is None:
            return None
        text = self._selection.selected_text()
        if text is None:
            return None
        trimmed = text.strip()
        return trimmed or None

    def grab_selected_text_robust(self) -> Optional[str]:
        """Selection grab with marker-based Ctrl+C fallback (clipboard.rs:137-206).

        The fallback snapshots the clipboard, writes a random marker, sends
        Ctrl+C, and restores the snapshot only when the clipboard still holds
        the marker (copy produced nothing) or the text we just copied — a
        concurrent clipboard change by the user or another app is preserved.
        """
        direct = self.grab_selected_text()
        if direct is not None:
            return direct

        try:
            snapshot, degraded = snapshot_with_fallback(self._clipboard.snapshot)
        except InjectError as exc:
            self._log(f"划词读取无法保存当前剪贴板，跳过 Ctrl+C 回退: {exc}")
            return None
        if degraded is not None:
            self._log(f"完整剪贴板快照失败，已回退到标准格式快照: {degraded}")

        marker = f"__light_whisper_selection_{secrets.randbits(64):016x}__"
        try:
            self._clipboard.write_text(marker)
        except Exception:  # noqa: BLE001
            self._try_restore(snapshot)
            return None

        copy_ok = True
        try:
            self._release_stuck_modifiers()
            send_events(self._keys, _ctrl_combo(VK_C))
        except Exception:  # noqa: BLE001
            copy_ok = False
        if copy_ok:
            self._sleep(_COPY_SETTLE_S)

        copied = self._clipboard.read_text()
        self._sleep(_DOUBLE_READ_GAP_S)
        current = self._clipboard.read_text()
        # Restore decision (clipboard.rs:178-190): the double read detects a
        # clipboard that is STILL changing (e.g. a clipboard manager racing
        # us) — restore only when it settled on our marker or our copy.
        should_restore = current == marker or (
            copied is not None and current == copied
        )
        if should_restore:
            self._try_restore(snapshot)
        else:
            self._log("划词读取期间剪贴板已变化，保留新的剪贴板内容")

        if not copy_ok or copied is None or copied == marker:
            return None
        trimmed = copied.strip()
        return trimmed or None

    # -- internals -------------------------------------------------------

    def _release_stuck_modifiers(self) -> None:
        release = release_stuck_modifiers(self._modifier_pressed)
        if release:
            self._log(f"释放 {len(release)} 个残留修饰键")
            send_events(self._keys, release)

    def _try_restore(self, snapshot: object) -> None:
        try:
            self._clipboard.restore(snapshot)
        except Exception as exc:  # noqa: BLE001
            self._log(f"恢复划词读取前的剪贴板失败: {exc}")
