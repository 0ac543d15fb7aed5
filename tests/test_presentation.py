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


# -- subtitle layout resolution (window.rs:51-114) ---------------------------

from light_whisper_tpu.runtime.presentation import (  # noqa: E402
    DEFAULT_SUBTITLE_HEIGHT,
    DEFAULT_SUBTITLE_WIDTH,
    MonitorInfo,
    find_cursor_monitor,
    resolve_subtitle_layout,
)

LEFT = MonitorInfo(x=0, y=0, width=2560, height=1440, scale_factor=1.25)
RIGHT = MonitorInfo(x=2560, y=0, width=3840, height=2160, scale_factor=2.0)


def test_cursor_monitor_point_in_rect_is_physical_and_half_open():
    assert find_cursor_monitor((2559, 10), [LEFT, RIGHT]) is LEFT
    assert find_cursor_monitor((2560, 10), [LEFT, RIGHT]) is RIGHT
    assert find_cursor_monitor((2560 + 3840, 10), [LEFT, RIGHT]) is None
    assert find_cursor_monitor(None, [LEFT, RIGHT]) is None


def test_layout_prefers_cursor_monitor_and_converts_to_logical():
    w, h, x, y = resolve_subtitle_layout(
        [LEFT, RIGHT], cursor=(3000, 100), main_window_monitor=LEFT, primary=LEFT
    )
    assert (w, h) == (3840 / 2.0, 2160 / 2.0)
    assert (x, y) == (2560 / 2.0, 0.0)


def test_layout_fallback_ladder():
    # No cursor hit -> main window monitor wins over primary.
    w, _, _, _ = resolve_subtitle_layout(
        [LEFT, RIGHT], cursor=(-5, -5), main_window_monitor=RIGHT, primary=LEFT
    )
    assert w == 3840 / 2.0
    # No main window monitor -> primary.
    w, _, _, _ = resolve_subtitle_layout([LEFT, RIGHT], primary=RIGHT)
    assert w == 3840 / 2.0
    # Nothing but the enumeration -> first monitor.
    w, h, x, y = resolve_subtitle_layout([LEFT, RIGHT])
    assert (w, h) == (2560 / 1.25, 1440 / 1.25)


def test_layout_default_when_no_monitor_info():
    assert resolve_subtitle_layout([]) == (
        DEFAULT_SUBTITLE_WIDTH,
        DEFAULT_SUBTITLE_HEIGHT,
        0.0,
        0.0,
    )


def test_layout_clamps_degenerate_sizes():
    tiny = MonitorInfo(x=0, y=0, width=1, height=1, scale_factor=4.0)
    w, h, _, _ = resolve_subtitle_layout([tiny])
    assert (w, h) == (1.0, 1.0)


def test_paste_and_recording_start_are_serialized():
    # A recording that starts while a paste is mid-delivery must WAIT for
    # the delivery (else the sink types into the new recording).
    import threading
    import time as _time

    in_sink = threading.Event()
    release = threading.Event()
    delivered = []

    def slow_sink(text, delay):
        in_sink.set()
        release.wait(5)
        delivered.append(text)

    gate = PasteGate(slow_sink)
    t = threading.Thread(target=lambda: gate.paste("finalized text"))
    t.start()
    assert in_sink.wait(5)

    started = []

    def start_recording():
        gate.set_recording(True)
        started.append(_time.monotonic())

    t2 = threading.Thread(target=start_recording)
    t2.start()
    _time.sleep(0.05)
    assert not started, "recording start did not wait for the in-flight paste"
    release.set()
    t.join(5)
    t2.join(5)
    assert delivered == ["finalized text"] and started


def test_flush_preempted_by_new_recording_keeps_rest_queued():
    delivered = []
    gate = PasteGate(lambda text, delay: delivered.append(text))
    gate.set_recording(True)
    gate.paste("one")
    gate.paste("two")
    gate.paste("three")

    # A sink that starts a new recording after the first flush item:
    # remaining texts must stay queued for the NEXT idle, in order.
    def preempting_sink(text, delay):
        delivered.append(text)
        if text == "one":
            # simulate the user hammering the hotkey mid-flush
            with gate._lock:
                gate._recording = True

    gate._sink = preempting_sink
    gate.set_recording(False)
    assert delivered == ["one"]
    assert gate.pending_count == 2
    gate._sink = lambda text, delay: delivered.append(text)
    gate.set_recording(False)
    assert delivered == ["one", "two", "three"]
