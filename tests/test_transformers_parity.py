"""Fidelity pins against the authoritative HF implementation.

The real ``handy-computer/Qwen3-ASR-*-gguf`` artifacts cannot be downloaded
in this environment, so transcript-level bit-match evidence is blocked — but
the *shape contracts* the GGUF runtime inherits from the Qwen3-Omni family
are checkable against ``transformers`` (the reference model's authoritative
processor, DEVNOTES):

- audio-token accounting: our ``conv_output_length`` / chunk math must equal
  ``_get_feat_extract_output_lengths`` from
  ``transformers.models.qwen3_omni_moe.processing_qwen3_omni_moe`` for every
  frame count (that function decides how many ``<|audio|>`` placeholder
  tokens the prompt carries — one off and every logit after the audio span
  shifts);
- mel frontend: our fused log-mel must match ``WhisperFeatureExtractor``
  (the processor's declared ``feature_extractor_class``) numerically.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


def test_audio_token_count_matches_qwen3_omni_processor():
    from transformers.models.qwen3_omni_moe.processing_qwen3_omni_moe import (
        _get_feat_extract_output_lengths,
    )

    from light_whisper_tpu.models.qwen3_asr.config import conv_output_length

    chunk = 100  # mel frames per encoder chunk (qwen3 audio tower)
    tokens_per_chunk = conv_output_length(chunk)
    assert tokens_per_chunk == 13  # the (input_lengths // 100) * 13 term

    for frames in list(range(1, 415)) + [999, 1000, 1198, 1200, 4800, 12000]:
        full, tail = divmod(frames, chunk)
        ours = full * tokens_per_chunk + (conv_output_length(tail) if tail else 0)
        theirs = int(_get_feat_extract_output_lengths(np.asarray(frames)))
        assert ours == theirs, (frames, ours, theirs)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    from light_whisper_tpu.audio import mel as wmel

    sr = 16_000
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(sr * 3) * 0.1).astype(np.float32)

    fe = WhisperFeatureExtractor(
        feature_size=wmel.N_MELS,
        sampling_rate=sr,
        hop_length=wmel.HOP,
        n_fft=wmel.N_FFT,
        chunk_length=len(audio) // sr,  # no padding beyond the clip
    )
    want = fe(
        audio,
        sampling_rate=sr,
        padding="do_not_pad",
        return_tensors="np",
    )["input_features"][0].T  # [frames, mels]

    ours = np.asarray(wmel.log_mel(audio), dtype=np.float32)

    # HF drops the final frame (`stft[..., :-1]`); compare the overlap.
    n = min(len(want), len(ours))
    assert n >= wmel.num_mel_frames(len(audio)) - 1
    np.testing.assert_allclose(ours[:n], want[:n], rtol=2e-4, atol=2e-4)
