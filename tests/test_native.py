"""Native C++ host runtime vs the Python reference implementations."""

import numpy as np
import pytest

from light_whisper_tpu.native import binding


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not binding.available():
        pytest.skip("native toolchain unavailable")


def test_resample_matches_numpy_reference():
    from light_whisper_tpu.audio.pcm import resample_linear as np_resample

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(48000).astype(np.float32)
    got = binding.resample_linear(audio, 48000)
    want = np_resample(audio, 48000)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resample_identity_and_edge_cases():
    audio = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    np.testing.assert_array_equal(binding.resample_linear(audio, 16000), audio)
    assert binding.resample_linear(np.empty(0, np.float32), 48000).size == 0


def test_pcm16_conversion():
    pcm = np.array([0, 16384, -32768, 32767], dtype="<i2")
    got = binding.pcm16_to_f32(pcm)
    np.testing.assert_allclose(got, [0.0, 0.5, -1.0, 32767 / 32768.0], atol=1e-7)


def test_vad_segments_match_python_segmenter():
    from light_whisper_tpu.models.vad.segmenter import speech_segments

    rng = np.random.default_rng(1)
    for trial in range(20):
        probs = rng.random(rng.integers(5, 400)).astype(np.float32)
        audio_len = len(probs) * 160 + int(rng.integers(0, 160))
        want = [(s["start"], s["end"]) for s in speech_segments(probs, audio_len)]
        got = binding.vad_segments(probs, audio_len)
        assert got == want, f"trial {trial}"


def test_vad_segments_structured_cases():
    probs = np.zeros(300, dtype=np.float32)
    probs[20:60] = 1.0
    probs[120:160] = 1.0
    got = binding.vad_segments(probs, 300 * 160, smooth_window=1, pad_ms=0)
    assert got == [(20 * 160, 60 * 160), (120 * 160, 160 * 160)]


def test_levenshtein_native():
    assert binding.levenshtein("kitten", "sitting") == 3
    assert binding.levenshtein("", "") == 0
    assert binding.levenshtein("abc", "") == 3


def test_fir_rows_native_matches_fallback():
    """lwt_fir_rows (the streaming VAD's per-tick hot path) must equal the
    numpy shifted-FMA fallback bit-for-bit-ish on random activations."""
    import numpy as np

    from light_whisper_tpu.native import binding

    rng = np.random.default_rng(11)
    taps, C, n = 40, 128, 173
    span = rng.standard_normal((n + taps - 1, C)).astype(np.float32)
    filt = rng.standard_normal((taps, C)).astype(np.float32)

    out = span[:n] * filt[0]
    for j in range(1, taps):
        out += span[j : j + n] * filt[j]

    got = binding.fir_rows(span, filt, n)
    assert got.shape == (n, C)
    np.testing.assert_allclose(got, out, rtol=1e-5, atol=1e-5)

    # degenerate row counts must not crash or mis-shape
    assert binding.fir_rows(span[: taps - 1 + 0 + 39], filt, 0).shape == (0, C)
