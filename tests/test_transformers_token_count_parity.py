"""Audio-token-count parity against transformers' Qwen3-Omni processor.

The number of ``<|audio_placeholder|>`` slots spliced into the prompt is a
hard fidelity contract: one token too few/many shifts every suffix position
and desynchronizes the KV cache against the reference runtime
(``qwen3_asr_server.py:318-321`` feeds transcribe.cpp, which derives the
same count from the conv tower). The authoritative formula is
``processing_qwen3_omni_moe._get_feat_extract_output_lengths``:

    leave = T % 100
    feat = (leave - 1) // 2 + 1
    out  = ((feat - 1) // 2 + 1 - 1) // 2 + 1 + (T // 100) * 13

i.e. 13 tokens per full 100-frame chunk plus three ceil-halvings of the
remainder — which must equal this repo's
``full_chunks * tokens_per_chunk + conv_output_length(tail)`` splice math
(``model.Qwen3ASRModel._audio_tokens_for``) for every frame count.
"""

import sys

import pytest

sys.path.insert(0, "tests")

pytest.importorskip("transformers")

from light_whisper_tpu.models.qwen3_asr.config import conv_output_length


def _hf_output_lengths(T: int) -> int:
    from transformers.models.qwen3_omni_moe.processing_qwen3_omni_moe import (
        _get_feat_extract_output_lengths,
    )

    return int(_get_feat_extract_output_lengths(T))


def _ours(T: int, chunk: int = 100) -> int:
    full, tail = divmod(T, chunk)
    return full * conv_output_length(chunk) + (conv_output_length(tail) if tail else 0)


def test_token_count_matches_hf_for_every_frame_count():
    # 1..6000 mel frames ≈ up to a minute of audio, covering every remainder
    # class and the exact-chunk-multiple edge (tail == 0 contributes nothing).
    for T in range(1, 6001):
        assert _ours(T) == _hf_output_lengths(T), f"frame count {T}"


def test_chunk_yields_13_tokens():
    # The 100-frame chunk → 13 tokens constant both sides hard-code.
    assert conv_output_length(100) == 13
    assert _hf_output_lengths(100) == 13


def test_model_audio_tokens_for_uses_the_same_math():
    """Pin the model method itself (mel-frame derivation + splice count)."""
    from light_whisper_tpu.audio import mel as wmel
    from helpers.tiny_model import tiny_config

    cfg = tiny_config()
    chunk = cfg.audio.chunk_frames

    class _Probe:
        config = cfg
        _audio_tokens_for = __import__(
            "light_whisper_tpu.models.qwen3_asr.model", fromlist=["Qwen3ASRModel"]
        ).Qwen3ASRModel._audio_tokens_for

    probe = _Probe()
    for n_samples in (3200, 8000, 16000, 16160, 12345, 160000):
        frames = wmel.num_mel_frames(n_samples)
        full, tail = divmod(frames, chunk)
        expect = full * cfg.audio.tokens_per_chunk + (
            conv_output_length(tail) if tail else 0
        )
        assert probe._audio_tokens_for(n_samples) == expect
        if chunk == 100:
            assert expect == _hf_output_lengths(frames)
