"""Whisper-style 128-bin log-mel spectrogram for the Qwen3-ASR audio encoder.

The reference's C++ runtime computes these features internally before the AuT
encoder (transcribe.cpp consumes raw float32 audio at
``qwen3_asr_server.py:318-321``). Semantics follow the Whisper feature
extractor the Qwen audio tower was trained with: hann(400) periodic window,
hop 160, centered STFT with reflect padding, power spectrum, slaney-scale /
slaney-normalized 128-mel filterbank, ``log10`` with 1e-10 floor, per-clip
dynamic-range clamp to ``max - 8`` and affine ``(x + 4) / 4``.

The STFT + mel projection runs as one jitted XLA program; the clip-level max
reduction fuses in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP = 160
N_MELS = 128
FMIN = 0.0
FMAX = 8000.0


def _hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    with np.errstate(divide="ignore"):
        mels = np.where(
            log_region,
            min_log_mel + np.log(np.maximum(freq, 1e-12) / min_log_hertz) / logstep,
            mels,
        )
    return mels


def _mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    return np.where(log_region, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)


@functools.lru_cache(maxsize=None)
def whisper_mel_matrix() -> np.ndarray:
    """[N_FFT//2+1, N_MELS] slaney filterbank matching ``librosa.filters.mel``
    / ``transformers.audio_utils.mel_filter_bank`` with ``norm='slaney'``."""
    fft_freqs = np.linspace(0, SAMPLE_RATE / 2, N_FFT // 2 + 1)
    mel_pts = np.linspace(
        _hertz_to_mel_slaney(FMIN), _hertz_to_mel_slaney(FMAX), N_MELS + 2
    )
    hz_pts = _mel_to_hertz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # [bins, mels+2]
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : N_MELS + 2] - hz_pts[:N_MELS])
    weights *= enorm[None, :]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def hann_window() -> np.ndarray:
    # periodic hann: np.hanning(N_FFT + 1)[:-1]
    n = np.arange(N_FFT, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / N_FFT)).astype(np.float32)


def num_mel_frames(num_samples: int) -> int:
    """Frames produced for a waveform (centered STFT, last frame dropped)."""
    return num_samples // HOP


def _log_mel_with_max(waveform: jax.Array, frames: int):
    """Traceable core: (normalized log-mel [frames, 128], clip max scalar).

    The clip max (``jnp.max(log_spec)``) is *clip-global* state: the dynamic
    clamp floor ``max - 8`` moves when louder audio arrives later, changing
    every previously computed frame. Streaming callers that cache work keyed
    on earlier frames must invalidate when this value grows
    (``serving/incremental.py``). Zero-padded tail frames sit at
    ``log10(1e-10) = -10`` and never raise the max, so the value is
    pad-bucket-invariant.
    """
    if waveform.dtype == jnp.int16:
        # int16 wire transport: PCM ships at half the bytes of f32 through
        # the host->device path (measured 36 -> 6 ms for a 12 s window via
        # the relay) and converts on device. Exact for s16-sourced audio —
        # the engine's wire protocol is pcm_s16le, so serving inputs
        # round-trip bit-identically.
        waveform = waveform.astype(jnp.float32) * (1.0 / 32768.0)
    pad = N_FFT // 2
    x = jnp.pad(waveform.astype(jnp.float32), (pad, pad), mode="reflect")

    idx = jnp.arange(frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    framed = x[idx] * jnp.asarray(hann_window())

    spec = jnp.fft.rfft(framed, n=N_FFT, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))  # [T, 201]

    mel = power @ jnp.asarray(whisper_mel_matrix())  # [T, 128]
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    clip_max = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, clip_max - 8.0)
    return (log_spec + 4.0) / 4.0, clip_max


@functools.partial(jax.jit, static_argnames=("frames",))
def _log_mel_impl(waveform: jax.Array, frames: int) -> jax.Array:
    return _log_mel_with_max(waveform, frames)[0]


def log_mel(waveform) -> jax.Array:
    """[frames, 128] whisper-normalized log-mel of 16 kHz float32 audio.

    Matches ``WhisperFeatureExtractor._np_extract_fbank_features`` (which
    computes ``1 + len//hop`` centered frames then drops the final one).
    """
    waveform = jnp.asarray(waveform)
    frames = num_mel_frames(int(waveform.shape[-1]))
    if frames == 0:
        return jnp.zeros((0, N_MELS), dtype=jnp.float32)
    return _log_mel_impl(waveform, frames)
