"""Kaldi-compatible 80-dim log-mel fbank, fused into one jitted XLA pipeline.

The reference computes VAD features on CPU with kaldi-native-fbank
(``firered_vad.py:65-74``): 16 kHz, 25 ms frames / 10 ms shift, 80 mel bins,
dither 0, snip_edges. All remaining knobs are kaldi defaults: DC-offset
removal, pre-emphasis 0.97, povey window, 512-point FFT, power spectrum,
mel range 20 Hz → Nyquist, natural log with float-epsilon floor.

Here the whole framing→window→FFT→mel→log chain is one XLA program: the
framing gather and the [frames, 257] × [257, 80] mel projection map onto the
TPU's MXU/VPU, and the log fuses into the same kernel. Host code only pads the
waveform to a shape bucket.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
FRAME_LENGTH = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
PADDED_WINDOW = 512  # next power of two (kaldi round_to_power_of_two)
NUM_BINS = 80
PREEMPH = 0.97
LOW_FREQ = 20.0
# kaldi: high_freq 0 → Nyquist
HIGH_FREQ = SAMPLE_RATE / 2.0
LOG_FLOOR = float(np.finfo(np.float32).eps)


def num_frames(num_samples: int) -> int:
    """snip_edges frame count: frames fully inside the signal."""
    if num_samples < FRAME_LENGTH:
        return 0
    return 1 + (num_samples - FRAME_LENGTH) // FRAME_SHIFT


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


@functools.lru_cache(maxsize=None)
def kaldi_mel_matrix() -> np.ndarray:
    """[PADDED_WINDOW//2 + 1, NUM_BINS] triangular filters, kaldi semantics.

    Kaldi places ``num_bins + 2`` equally spaced points in mel space between
    ``low_freq`` and ``high_freq`` and evaluates the triangles at each FFT bin
    center (bin width = samp_freq / padded_window). The Nyquist bin carries no
    filter weight, matching kaldi's exclusive upper bound.
    """
    num_fft_bins = PADDED_WINDOW // 2
    mel_low = _mel_scale(LOW_FREQ)
    mel_high = _mel_scale(HIGH_FREQ)
    mel_delta = (mel_high - mel_low) / (NUM_BINS + 1)

    fft_bin_width = SAMPLE_RATE / PADDED_WINDOW
    bin_mels = _mel_scale(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))

    weights = np.zeros((num_fft_bins + 1, NUM_BINS), dtype=np.float64)
    for b in range(NUM_BINS):
        left = mel_low + b * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        weights[:num_fft_bins, b] = np.clip(np.minimum(up, down), 0.0, None)
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def povey_window() -> np.ndarray:
    n = np.arange(FRAME_LENGTH, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / (FRAME_LENGTH - 1))
    return np.power(hann, 0.85).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("frames",))
def _fbank_impl(waveform: jax.Array, frames: int) -> jax.Array:
    idx = jnp.arange(frames)[:, None] * FRAME_SHIFT + jnp.arange(FRAME_LENGTH)[None, :]
    x = waveform[idx].astype(jnp.float32)  # [T, 400]

    # kaldi ExtractWindow order: dc offset → pre-emphasis → window.
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=-1)
    x = x - PREEMPH * prev

    x = x * jnp.asarray(povey_window())
    x = jnp.pad(x, ((0, 0), (0, PADDED_WINDOW - FRAME_LENGTH)))

    spec = jnp.fft.rfft(x, n=PADDED_WINDOW, axis=-1)
    power = jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))  # [T, 257]

    mel = power @ jnp.asarray(kaldi_mel_matrix())  # [T, 80]
    return jnp.log(jnp.maximum(mel, LOG_FLOOR))


def fbank(waveform) -> jax.Array:
    """Compute [frames, 80] log-mel fbank of a 16 kHz waveform.

    The waveform is expected in int16 scale (±32768), matching how the
    reference feeds kaldi-native-fbank (``firered_vad.py:88-92``).
    """
    waveform = jnp.asarray(waveform)
    frames = num_frames(int(waveform.shape[-1]))
    if frames == 0:
        return jnp.zeros((0, NUM_BINS), dtype=jnp.float32)
    return _fbank_impl(waveform, frames)


def fbank_reference_np(waveform: np.ndarray) -> np.ndarray:
    """Plain-numpy mirror of :func:`fbank` used as a test oracle."""
    waveform = np.asarray(waveform, dtype=np.float64)
    frames = num_frames(len(waveform))
    out = np.zeros((frames, NUM_BINS), dtype=np.float32)
    window = povey_window().astype(np.float64)
    mel_mat = kaldi_mel_matrix().astype(np.float64)
    for t in range(frames):
        x = waveform[t * FRAME_SHIFT : t * FRAME_SHIFT + FRAME_LENGTH].copy()
        x -= x.mean()
        x[1:] -= PREEMPH * x[:-1]
        x[0] -= PREEMPH * x[0]
        x *= window
        spec = np.fft.rfft(x, n=PADDED_WINDOW)
        power = spec.real**2 + spec.imag**2
        out[t] = np.log(np.maximum(power @ mel_mat, LOG_FLOOR))
    return out
