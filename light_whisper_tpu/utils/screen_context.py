"""Portable screen-context pipeline (capture → downscale → JPEG → budget).

The engine-relevant core of the reference's screen-capture service
(``src-tauri/src/services/screen_capture_service.rs``): everything after the
raw OS grab — aspect-preserving downscale to a max edge, JPEG encoding at a
fixed quality, base64 packaging, and the context byte budget — is portable
and lives here over an injectable monitor grabber. Only the OS capture call
(xcap / DXGI) stays with the shell.

Reference semantics preserved:

- defaults: max edge 1600 px, JPEG quality 80, 64 MiB total base64 budget
  (``screen_capture_service.rs:15-24``);
- images larger than the max edge are resized to FIT the (max_edge,
  max_edge) box, preserving aspect ratio, with a triangle/bilinear filter
  (``:99-103``);
- budget contract (``:111-121``): if the FIRST image alone exceeds the
  budget that is an error (the caller gets no silently empty context for a
  single-monitor machine); any LATER image that would overflow simply stops
  the loop — earlier screens are kept;
- monitors with no usable friendly name fall back to ``显示器 N``
  (``:89-93``);
- the async wrapper bounds the whole grab at 15 s and converts a timeout
  into a typed message instead of hanging the assistant flow (``:26-42``).

The output items feed :mod:`light_whisper_tpu.llm.assistant` /
:mod:`light_whisper_tpu.llm.polish` as ``(mime_type, data_base64)`` image
tuples.
"""
from __future__ import annotations

import base64
import concurrent.futures
import dataclasses
import io
from dataclasses import dataclass
from typing import Callable, List, Optional, Protocol, Sequence, Tuple

import numpy as np

__all__ = [
    "CapturedScreen",
    "ScreenCaptureOptions",
    "Monitor",
    "MonitorGrabber",
    "ScreenCaptureError",
    "encode_screen",
    "capture_monitors",
    "capture_full_screen_context",
    "capture_screen_context_at_point",
    "capture_with_timeout",
    "SCREEN_CAPTURE_TIMEOUT_S",
]

SCREEN_CAPTURE_TIMEOUT_S = 15.0


class ScreenCaptureError(RuntimeError):
    """Raised when a capture fails or the first screen busts the budget."""


@dataclass(frozen=True)
class CapturedScreen:
    """One encoded screen (``screen_capture_service.rs:1-5``)."""

    mime_type: str
    data_base64: str

    def as_image_tuple(self) -> Tuple[str, str]:
        """The ``(mime, base64)`` shape the LLM layers consume."""
        return self.mime_type, self.data_base64


@dataclass(frozen=True)
class ScreenCaptureOptions:
    """Pipeline knobs with the reference defaults (``:15-24``)."""

    max_edge: int = 1600
    jpeg_quality: int = 80
    max_images: Optional[int] = None  # None = all monitors
    max_total_base64_bytes: int = 64 * 1024 * 1024


class Monitor(Protocol):
    """One OS monitor: a name and a pixel grab."""

    def friendly_name(self) -> Optional[str]: ...

    def capture_image(self) -> np.ndarray:
        """HxWx3 or HxWx4 uint8 pixels; may raise."""


class MonitorGrabber(Protocol):
    """OS-side monitor enumeration (xcap analogue)."""

    def monitors(self) -> Sequence[Monitor]: ...

    def monitor_at(self, x: int, y: int) -> Monitor:
        """Monitor containing the point; may raise."""


def _fit_box(width: int, height: int, max_edge: int) -> Tuple[int, int]:
    """Aspect-preserving fit into (max_edge, max_edge), image.rs `resize` rules."""
    scale = min(max_edge / width, max_edge / height)
    return max(1, round(width * scale)), max(1, round(height * scale))


def encode_screen(
    pixels: np.ndarray,
    options: ScreenCaptureOptions = ScreenCaptureOptions(),
) -> CapturedScreen:
    """Downscale + JPEG-encode + base64 one captured frame (``:98-110``)."""
    from PIL import Image

    arr = np.asarray(pixels)
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] not in (3, 4):
        raise ScreenCaptureError(
            f"截图像素格式不支持: dtype={arr.dtype}, shape={arr.shape}"
        )
    image = Image.fromarray(arr[:, :, :3], mode="RGB")
    if max(image.width, image.height) > options.max_edge:
        image = image.resize(
            _fit_box(image.width, image.height, options.max_edge),
            Image.Resampling.BILINEAR,
        )
    buf = io.BytesIO()
    image.save(buf, format="JPEG", quality=options.jpeg_quality)
    return CapturedScreen(
        mime_type="image/jpeg",
        data_base64=base64.b64encode(buf.getvalue()).decode("ascii"),
    )


def _monitor_name(monitor: Monitor, index: int) -> str:
    try:
        name = monitor.friendly_name()
    except Exception:  # noqa: BLE001 — backend-defined
        name = None
    if name and name.strip():
        return name
    return f"显示器 {index + 1}"


def capture_monitors(
    monitors: Sequence[Monitor],
    options: ScreenCaptureOptions = ScreenCaptureOptions(),
) -> List[CapturedScreen]:
    """Run the full pipeline over ``monitors`` with the budget contract.

    Mirrors ``capture_monitors_with_options`` (``:71-130``): a failed grab is
    an error naming the monitor; the FIRST screen exceeding the budget is an
    error, later overflows stop the loop and keep what fits.
    """
    limit = len(monitors) if options.max_images is None else options.max_images
    captured: List[CapturedScreen] = []
    total_base64 = 0
    for index, monitor in enumerate(list(monitors)[:limit]):
        name = _monitor_name(monitor, index)
        try:
            pixels = monitor.capture_image()
        except Exception as exc:  # noqa: BLE001
            raise ScreenCaptureError(f"截取{name}失败: {exc}") from exc
        screen = encode_screen(pixels, options)
        size = len(screen.data_base64)
        if not captured and size > options.max_total_base64_bytes:
            raise ScreenCaptureError(
                f"{name}截图超过上下文预算："
                f"{size} > {options.max_total_base64_bytes} bytes"
            )
        if total_base64 + size > options.max_total_base64_bytes:
            break
        total_base64 += size
        captured.append(screen)
    return captured


def capture_full_screen_context(
    grabber: MonitorGrabber,
    options: ScreenCaptureOptions = ScreenCaptureOptions(),
) -> List[CapturedScreen]:
    """All monitors through the pipeline (``:45-47,63-68``)."""
    try:
        monitors = grabber.monitors()
    except Exception as exc:  # noqa: BLE001
        raise ScreenCaptureError(f"读取屏幕列表失败: {exc}") from exc
    return capture_monitors(monitors, options)


def capture_screen_context_at_point(
    grabber: MonitorGrabber,
    x: int,
    y: int,
    options: ScreenCaptureOptions = ScreenCaptureOptions(),
) -> List[CapturedScreen]:
    """Only the monitor under the point, capped at one image (``:50-60``)."""
    try:
        monitor = grabber.monitor_at(x, y)
    except Exception as exc:  # noqa: BLE001
        raise ScreenCaptureError(f"读取划词所在屏幕失败: {exc}") from exc
    return capture_monitors([monitor], dataclasses.replace(options, max_images=1))


def capture_with_timeout(
    capture: Callable[[], List[CapturedScreen]],
    timeout_s: float = SCREEN_CAPTURE_TIMEOUT_S,
) -> List[CapturedScreen]:
    """Bound a blocking capture like the async offload does (``:28-42``).

    A timeout degrades to a typed error (the assistant flow catches it and
    proceeds without screen context) instead of wedging the caller. The
    executor is shut down WITHOUT waiting — a `with` block (or
    ``shutdown(wait=True)``) would join the hung capture thread and defeat
    the timeout entirely; the abandoned daemon-less worker exits when the
    stuck OS call eventually returns.
    """
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    future = pool.submit(capture)
    try:
        return future.result(timeout=timeout_s)
    except concurrent.futures.TimeoutError:
        raise ScreenCaptureError(
            f"截屏超过 {timeout_s:g} 秒，已跳过屏幕上下文"
        ) from None
    finally:
        pool.shutdown(wait=False)
