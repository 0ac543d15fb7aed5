"""FireRedVAD runtime: the drop-in VAD used by the ASR engine.

Equivalent surface to the reference's ``FireRedVad`` class
(``firered_vad.py:38-119``): ``probabilities`` / ``warmup`` /
``speech_timestamps`` on 16 kHz float32 PCM — but the fbank + CMVN + DFSMN
chain runs as one jitted XLA program per shape bucket instead of
kaldi-native-fbank + onnxruntime on CPU threads.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.audio import fbank as kfb
from light_whisper_tpu.formats import gguf
from light_whisper_tpu.models.vad import dfsmn
from light_whisper_tpu.models.vad.segmenter import SegmenterOptions, speech_segments

SAMPLE_RATE = 16_000
BUNDLED_WEIGHTS = os.path.join(os.path.dirname(__file__), "fireredvad.gguf")

# Waveform shape buckets: fine 0.5 s steps through the streaming window sizes,
# then doubling for long-form audio. Each bucket compiles once per process.
_FINE_STEP = SAMPLE_RATE // 2
_FINE_MAX = 16 * SAMPLE_RATE


def bucket_samples(n: int) -> int:
    if n <= _FINE_MAX:
        return max(_FINE_STEP, (n + _FINE_STEP - 1) // _FINE_STEP * _FINE_STEP)
    b = _FINE_MAX
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, static_argnames=("frames",))
def _vad_probs_padded(params, cmvn_mean, cmvn_inv_std, waveform, valid_frames, frames: int):
    pcm = jnp.clip(waveform * 32768.0, -32768.0, 32767.0)
    feat = kfb._fbank_impl(pcm, frames)
    feat = (feat - cmvn_mean) * cmvn_inv_std
    return dfsmn.dfsmn_probs(params, feat, valid_frames)


class FireRedVadTPU:
    """Run FireRedVAD on the accelerator with exact reference semantics."""

    def __init__(
        self,
        weights_path: Optional[str] = None,
        options: Optional[SegmenterOptions] = None,
    ):
        self.options = options or SegmenterOptions()
        path = weights_path or BUNDLED_WEIGHTS
        if not os.path.isfile(path):
            raise FileNotFoundError(f"FireRedVAD weights not found: {path}")
        f = gguf.read_gguf(path)
        arch = f.metadata.get("general.architecture")
        if arch != "fireredvad-dfsmn":
            raise ValueError(f"{path}: unexpected architecture {arch!r}")
        flat: Dict[str, np.ndarray] = {
            name: t.array() for name, t in f.tensors.items() if not name.startswith("cmvn.")
        }
        self._params = dfsmn.prepare_device_params(flat)
        self._cmvn_mean = jnp.asarray(f.tensors["cmvn.mean"].array())
        self._cmvn_inv_std = jnp.asarray(f.tensors["cmvn.inv_std"].array())
        f.close()

    # ------------------------------------------------------------------

    def probabilities(self, audio: np.ndarray) -> np.ndarray:
        samples = np.asarray(audio, dtype=np.float32).reshape(-1)
        true_frames = kfb.num_frames(len(samples))
        if true_frames == 0:
            return np.empty(0, dtype=np.float32)
        bucket = bucket_samples(len(samples))
        padded = np.zeros(bucket, dtype=np.float32)
        padded[: len(samples)] = samples
        frames = kfb.num_frames(bucket)
        probs = _vad_probs_padded(
            self._params,
            self._cmvn_mean,
            self._cmvn_inv_std,
            jnp.asarray(padded),
            jnp.int32(true_frames),
            frames,
        )
        return np.asarray(probs[:true_frames])

    def warmup(self) -> None:
        self.probabilities(np.zeros(SAMPLE_RATE, dtype=np.float32))

    def speech_timestamps(self, audio: np.ndarray) -> List[Dict[str, int]]:
        samples = np.asarray(audio, dtype=np.float32).reshape(-1)
        probs = self.probabilities(samples)
        try:  # native hysteresis segmenter (same semantics, C++)
            from light_whisper_tpu.native import binding

            if binding.available():
                o = self.options
                pairs = binding.vad_segments(
                    probs,
                    len(samples),
                    threshold=o.threshold,
                    smooth_window=o.smooth_window_frames,
                    min_speech_ms=o.min_speech_duration_ms,
                    min_silence_ms=o.min_silence_duration_ms,
                    pad_ms=o.speech_pad_ms,
                )
                return [{"start": s, "end": e} for s, e in pairs]
        except Exception:
            pass
        return speech_segments(probs, len(samples), self.options)
