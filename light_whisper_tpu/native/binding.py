"""ctypes binding for the native host runtime, with numpy fallbacks.

The shared library builds on demand with the system toolchain (no pybind11 —
plain C ABI + ctypes) and is cached next to this module. Every entry point
has a pure-numpy fallback so the engine works on hosts without a compiler;
call sites stay oblivious via the module-level functions.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOG = logging.getLogger(__name__)
_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "lwt_native.cpp")
_LIB_PATH = os.path.join(_DIR, "liblwt_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def build_library(force: bool = False) -> Optional[str]:
    """Compile the shared library if needed; returns its path or None."""
    if not force and os.path.isfile(_LIB_PATH):
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
            return _LIB_PATH
    try:
        subprocess.run(
            # -O3 for the auto-vectorized FIR; no -march so the packaged .so
            # stays portable across install hosts (build_library also runs
            # on-demand at first import on hosts WITH a toolchain).
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH
    except (OSError, subprocess.SubprocessError) as exc:
        _LOG.warning("native build failed, using numpy fallbacks: %s", exc)
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    with _lock:
        if _lib is not None or _load_attempted:
            return _lib
        _load_attempted = True
        path = build_library()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as exc:
            _LOG.warning("failed to load %s: %s", path, exc)
            return None
        lib.lwt_resample_linear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.lwt_pcm16_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.lwt_smooth_probs.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.lwt_vad_segments.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.lwt_vad_segments.restype = ctypes.c_int64
        lib.lwt_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.lwt_levenshtein.restype = ctypes.c_int64
        lib.lwt_fir_rows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resample_linear(audio: np.ndarray, source_rate: int, target_rate: int = 16_000) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if lib is None:
        from light_whisper_tpu.audio.pcm import resample_linear as np_resample

        return np_resample(audio, source_rate, target_rate)
    if source_rate == target_rate:
        return audio
    n_out = int(round(len(audio) * target_rate / source_rate))
    out = np.empty(n_out, dtype=np.float32)
    lib.lwt_resample_linear(_fptr(audio), len(audio), _fptr(out), n_out)
    return out


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray:
    lib = _load()
    pcm = np.ascontiguousarray(pcm, dtype="<i2")
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(len(pcm), dtype=np.float32)
    lib.lwt_pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(pcm), _fptr(out)
    )
    return out


def vad_segments(
    probs: np.ndarray,
    audio_len_samples: int,
    threshold: float = 0.5,
    smooth_window: int = 5,
    min_speech_ms: int = 150,
    min_silence_ms: int = 300,
    pad_ms: int = 120,
) -> List[Tuple[int, int]]:
    lib = _load()
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    if lib is None:
        from light_whisper_tpu.models.vad.segmenter import SegmenterOptions, speech_segments

        opts = SegmenterOptions(threshold, smooth_window, min_speech_ms, min_silence_ms, pad_ms)
        return [(s["start"], s["end"]) for s in speech_segments(probs, audio_len_samples, opts)]
    max_segments = max(1, len(probs) // 2 + 1)
    pairs = np.empty(2 * max_segments, dtype=np.int64)
    count = lib.lwt_vad_segments(
        _fptr(probs), len(probs), audio_len_samples,
        threshold, smooth_window, min_speech_ms, min_silence_ms, pad_ms,
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), max_segments,
    )
    return [(int(pairs[2 * i]), int(pairs[2 * i + 1])) for i in range(count)]


def fir_rows(span: np.ndarray, filt: np.ndarray, n: int) -> np.ndarray:
    """Depthwise FIR: out[t] = Σ_j span[t+j] · filt[j] for t in [0, n).

    span: [n + taps - 1, C] float32 (contiguous); filt: [taps, C] float32.
    The streaming DFSMN's per-tick memory-block hot path
    (``models/vad/streaming.py:_conv_rows``)."""
    lib = _load()
    taps, C = filt.shape
    if lib is None:
        out = span[:n] * filt[0]
        for j in range(1, taps):
            out += span[j : j + n] * filt[j]
        return out
    span = np.ascontiguousarray(span, dtype=np.float32)
    filt = np.ascontiguousarray(filt, dtype=np.float32)
    out = np.empty((n, C), dtype=np.float32)
    lib.lwt_fir_rows(_fptr(span), n, taps, C, _fptr(filt), _fptr(out))
    return out


def levenshtein(left: str, right: str) -> int:
    lib = _load()
    if lib is None:
        from light_whisper_tpu.text.hotwords import _levenshtein_py

        return _levenshtein_py(left, right)
    lb = left.encode("utf-8")
    rb = right.encode("utf-8")
    return int(
        lib.lwt_levenshtein(
            ctypes.cast(ctypes.c_char_p(lb), ctypes.POINTER(ctypes.c_uint8)), len(lb),
            ctypes.cast(ctypes.c_char_p(rb), ctypes.POINTER(ctypes.c_uint8)), len(rb),
        )
    )
