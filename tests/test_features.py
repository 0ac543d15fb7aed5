"""Feature frontend goldens.

- whisper mel is checked against the installed ``transformers``
  WhisperFeatureExtractor (the extractor family the Qwen audio tower uses).
- kaldi fbank is checked against an independent numpy oracle and pins the
  reference's published frame count (98 frames for 1 s — ``test_firered_vad.py:58``).
"""

import numpy as np
import pytest

from light_whisper_tpu.audio import fbank as kfb
from light_whisper_tpu.audio import mel as wmel


def test_fbank_frame_counts():
    assert kfb.num_frames(16000) == 98
    assert kfb.num_frames(400) == 1
    assert kfb.num_frames(399) == 0
    assert kfb.num_frames(560) == 2


def test_fbank_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(4000) * 8192).astype(np.float32)
    got = np.asarray(kfb.fbank(wav))
    want = kfb.fbank_reference_np(wav)
    assert got.shape == want.shape == (kfb.num_frames(4000), 80)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fbank_silence_hits_log_floor():
    out = np.asarray(kfb.fbank(np.zeros(16000, dtype=np.float32)))
    assert out.shape == (98, 80)
    np.testing.assert_allclose(out, np.log(np.finfo(np.float32).eps), rtol=1e-6)


def test_fbank_mel_matrix_properties():
    m = kfb.kaldi_mel_matrix()
    assert m.shape == (257, 80)
    assert m[256].max() == 0.0  # nyquist bin excluded (kaldi semantics)
    assert m.min() >= 0.0
    # every interior filter has support
    assert (m.sum(axis=0) > 0).all()


def test_whisper_mel_matches_transformers():
    transformers = pytest.importorskip("transformers")
    fe = transformers.WhisperFeatureExtractor(feature_size=128, dither=0.0)
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    want = fe(
        [wav], sampling_rate=16000, padding=False, return_tensors="np"
    )["input_features"][0].T  # transformers returns [mels, frames]
    got = np.asarray(wmel.log_mel(wav))
    assert got.shape == want.shape == (100, 128)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_whisper_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    want = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=128,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    np.testing.assert_allclose(wmel.whisper_mel_matrix(), want, rtol=1e-6, atol=1e-8)


def test_whisper_mel_empty():
    assert np.asarray(wmel.log_mel(np.zeros(0, dtype=np.float32))).shape == (0, 128)
