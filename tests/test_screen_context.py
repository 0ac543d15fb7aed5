"""Screen-context pipeline: resize/encode/budget semantics (screen_capture_service.rs parity)."""
from __future__ import annotations

import base64
import io
import time
from typing import List, Optional

import numpy as np
import pytest

from light_whisper_tpu.utils.screen_context import (
    CapturedScreen,
    ScreenCaptureError,
    ScreenCaptureOptions,
    capture_full_screen_context,
    capture_monitors,
    capture_screen_context_at_point,
    capture_with_timeout,
    encode_screen,
)


class FakeMonitor:
    def __init__(self, pixels: np.ndarray, name: Optional[str] = None,
                 fail: bool = False):
        self.pixels = pixels
        self.name = name
        self.fail = fail

    def friendly_name(self) -> Optional[str]:
        return self.name

    def capture_image(self) -> np.ndarray:
        if self.fail:
            raise RuntimeError("DXGI lost")
        return self.pixels


class FakeGrabber:
    def __init__(self, monitors: List[FakeMonitor]):
        self._monitors = monitors

    def monitors(self):
        return self._monitors

    def monitor_at(self, x: int, y: int):
        return self._monitors[x]


def rgba(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 4), dtype=np.uint8)


def decoded_size(screen: CapturedScreen):
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(screen.data_base64)))
    return img.width, img.height, img.format


def test_encode_small_image_keeps_dimensions():
    screen = encode_screen(rgba(600, 800))
    w, h, fmt = decoded_size(screen)
    assert (w, h, fmt) == (800, 600, "JPEG")
    assert screen.mime_type == "image/jpeg"


def test_encode_downscales_to_max_edge_preserving_aspect():
    screen = encode_screen(rgba(1080, 3840))  # ultrawide
    w, h, _ = decoded_size(screen)
    assert w == 1600  # max edge hit on width
    assert h == round(1080 * 1600 / 3840)


def test_encode_rejects_non_uint8():
    with pytest.raises(ScreenCaptureError):
        encode_screen(np.zeros((10, 10, 3), dtype=np.float32))


def test_capture_monitors_names_fall_back():
    mon = FakeMonitor(rgba(10, 10), name="  ", fail=True)
    with pytest.raises(ScreenCaptureError) as err:
        capture_monitors([mon])
    assert "显示器 1" in str(err.value)


def test_capture_monitors_named_failure_uses_name():
    mon = FakeMonitor(rgba(10, 10), name="DELL U2720Q", fail=True)
    with pytest.raises(ScreenCaptureError) as err:
        capture_monitors([mon])
    assert "DELL U2720Q" in str(err.value)


def test_first_screen_over_budget_is_error():
    mon = FakeMonitor(rgba(800, 800, seed=1))
    with pytest.raises(ScreenCaptureError) as err:
        capture_monitors([mon], ScreenCaptureOptions(max_total_base64_bytes=100))
    assert "超过上下文预算" in str(err.value)


def test_later_screen_over_budget_stops_quietly():
    mons = [FakeMonitor(rgba(800, 800, seed=i)) for i in range(3)]
    one = capture_monitors([mons[0]])[0]
    budget = len(one.data_base64) + 10  # fits exactly one screen
    screens = capture_monitors(mons, ScreenCaptureOptions(max_total_base64_bytes=budget))
    assert len(screens) == 1


def test_max_images_caps_the_sweep():
    mons = [FakeMonitor(rgba(50, 50, seed=i)) for i in range(4)]
    screens = capture_monitors(mons, ScreenCaptureOptions(max_images=2))
    assert len(screens) == 2


def test_full_screen_context_walks_all_monitors():
    grabber = FakeGrabber([FakeMonitor(rgba(40, 60, seed=i)) for i in range(3)])
    screens = capture_full_screen_context(grabber)
    assert len(screens) == 3
    assert all(s.mime_type == "image/jpeg" for s in screens)
    # The LLM-facing tuple shape.
    mime, data = screens[0].as_image_tuple()
    assert mime == "image/jpeg" and base64.b64decode(data)


def test_at_point_captures_exactly_one():
    grabber = FakeGrabber([FakeMonitor(rgba(40, 40, seed=i)) for i in range(2)])
    screens = capture_screen_context_at_point(grabber, 1, 0)
    assert len(screens) == 1


def test_at_point_failure_is_typed():
    class Broken(FakeGrabber):
        def monitor_at(self, x, y):
            raise RuntimeError("no monitor")

    with pytest.raises(ScreenCaptureError) as err:
        capture_screen_context_at_point(Broken([]), 0, 0)
    assert "划词所在屏幕" in str(err.value)


def test_timeout_degrades_to_typed_error():
    def slow_capture():
        time.sleep(0.5)
        return []

    with pytest.raises(ScreenCaptureError) as err:
        capture_with_timeout(slow_capture, timeout_s=0.05)
    assert "截屏超过" in str(err.value)


def test_timeout_passes_through_fast_results():
    screens = [CapturedScreen("image/jpeg", "aGk=")]
    assert capture_with_timeout(lambda: screens, timeout_s=1.0) == screens


def test_timeout_returns_promptly_despite_hung_capture():
    # The timeout must bound the CALLER: a hung OS grab cannot hold the
    # assistant flow past timeout_s (executor shutdown must not join it).
    hung = time.time()

    def hung_capture():
        time.sleep(1.0)
        return []

    t0 = time.time()
    with pytest.raises(ScreenCaptureError):
        capture_with_timeout(hung_capture, timeout_s=0.05)
    assert time.time() - t0 < 0.5, "caller blocked on the hung capture thread"
