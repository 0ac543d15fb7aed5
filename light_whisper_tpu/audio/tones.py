"""UI feedback tones: generated start/stop/assistant chimes.

Port of the reference's tone synthesizer (``utils/sound.rs``): frequency
sweeps (±50%) under a half-sine envelope at 22.05 kHz, encoded as 16-bit PCM
WAV. The reference plays them via ``PlaySoundW``; playback stays a host
concern — this module produces identical WAV bytes for any shell to play.

Tone inventory (frequency, duration, direction — ``sound.rs:77-112``):
start 880 Hz/100 ms ascending, stop 660 Hz/100 ms descending, assistant
start 1174 Hz double-tone (80 ms + 30 ms gap) ascending, assistant stop
932 Hz double-tone descending.
"""

from __future__ import annotations

import functools

import numpy as np

from light_whisper_tpu.audio.pcm import encode_wav_mono_s16

SAMPLE_RATE = 22_050
AMPLITUDE = 0.25
SWEEP_RANGE = 0.5


def generate_tone(base_freq: float, duration_ms: int, ascending: bool) -> bytes:
    n = int(SAMPLE_RATE * duration_ms / 1000)
    i = np.arange(n)
    t = i / SAMPLE_RATE
    progress = i / n
    if ascending:
        freq = base_freq * (1.0 + progress * SWEEP_RANGE)
    else:
        freq = base_freq * (1.0 + SWEEP_RANGE - progress * SWEEP_RANGE)
    envelope = np.sin(progress * np.pi)
    samples = (envelope * AMPLITUDE * np.sin(2.0 * np.pi * freq * t)).astype(np.float32)
    return encode_wav_mono_s16(samples, SAMPLE_RATE)


def generate_double_tone(base_freq: float, tone_ms: int, gap_ms: int, ascending: bool) -> bytes:
    tone_n = int(SAMPLE_RATE * tone_ms / 1000)
    gap_n = int(SAMPLE_RATE * gap_ms / 1000)
    total = tone_n * 2 + gap_n

    i = np.arange(total)
    t = i / SAMPLE_RATE
    in_first = i < tone_n
    in_second = i >= tone_n + gap_n
    progress = np.where(
        in_first,
        i / tone_n,
        np.where(in_second, (i - tone_n - gap_n) / tone_n, 0.0),
    )
    if ascending:
        freq = base_freq * (1.0 + progress * SWEEP_RANGE)
    else:
        freq = base_freq * (1.0 + SWEEP_RANGE - progress * SWEEP_RANGE)
    envelope = np.sin(progress * np.pi)
    samples = (
        (in_first | in_second) * envelope * AMPLITUDE * np.sin(2.0 * np.pi * freq * t)
    ).astype(np.float32)
    return encode_wav_mono_s16(samples, SAMPLE_RATE)


@functools.lru_cache(maxsize=None)
def start_tone() -> bytes:
    return generate_tone(880.0, 100, ascending=True)


@functools.lru_cache(maxsize=None)
def stop_tone() -> bytes:
    return generate_tone(660.0, 100, ascending=False)


@functools.lru_cache(maxsize=None)
def assistant_start_tone() -> bytes:
    return generate_double_tone(1174.0, 80, 30, ascending=True)


@functools.lru_cache(maxsize=None)
def assistant_stop_tone() -> bytes:
    return generate_double_tone(932.0, 80, 30, ascending=False)
