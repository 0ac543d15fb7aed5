"""Streaming DFSMN cascade: exactness vs the monolithic pass.

The cascade (``models/vad/streaming.py``) caches per-stage activations and
recomputes only appended frames plus each stage's lookahead-provisional rows.
Every returned vector must equal ``dfsmn_probs`` over the same buffer up to
float reassociation — the property the interim serving path
(``VadPrefixSession``) relies on. Reference behavior being replaced: the
stateless full ONNX pass per tick (``firered_vad.py:76-111``).
"""

import numpy as np
import pytest

from light_whisper_tpu.audio import fbank as kfb
from light_whisper_tpu.models.vad.api import FireRedVadTPU
from light_whisper_tpu.models.vad.streaming import StreamingDfsmn, StreamingVad, fbank_np


@pytest.fixture(scope="module")
def vad():
    return FireRedVadTPU()


@pytest.fixture(scope="module")
def stream_parts(vad):
    return vad._params_np, vad._cmvn_mean_np, vad._cmvn_inv_std_np


def _monolithic(vad, samples):
    """Stateless oracle through the jitted path (cascade disabled)."""
    import jax.numpy as jnp

    from light_whisper_tpu.models.vad import dfsmn
    from light_whisper_tpu.models.vad.api import _vad_probs_padded, bucket_samples

    true_frames = kfb.num_frames(len(samples))
    bucket = bucket_samples(len(samples))
    padded = np.zeros(bucket, dtype=np.float32)
    padded[: len(samples)] = samples
    probs = _vad_probs_padded(
        vad._params,
        vad._cmvn_mean,
        vad._cmvn_inv_std,
        jnp.asarray(padded),
        jnp.int32(true_frames),
        kfb.num_frames(bucket),
    )
    return np.asarray(probs[:true_frames])


def test_fbank_np_matches_jitted():
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000) * 3000).astype(np.float32)
    got = fbank_np(pcm)
    want = np.asarray(kfb.fbank(pcm))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_streaming_equals_monolithic_at_every_tick(vad, stream_parts):
    rng = np.random.default_rng(3)
    sr = 16000
    audio = (rng.standard_normal(sr * 6) * 0.2).astype(np.float32)
    audio *= 0.3 + 0.7 * np.abs(np.sin(np.arange(len(audio)) / sr * 3.0))

    sv = StreamingVad(*stream_parts)
    # deliberately unaligned growth steps (not multiples of the frame shift)
    ends = [7000, 16000, 23500, 40000, 41000, 96000]
    for end in ends:
        got = sv.extend(audio[:end])
        want = _monolithic(vad, audio[:end])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_streaming_zero_and_tiny_buffers(stream_parts):
    sv = StreamingVad(*stream_parts)
    assert sv.extend(np.zeros(10, np.float32)).shape == (0,)
    # under one frame: still no frames
    assert sv.extend(np.zeros(399, np.float32)).shape == (0,)
    # first complete frame appears
    probs = sv.extend(np.zeros(400, np.float32))
    assert probs.shape == (1,)


def test_streaming_same_length_resend(vad, stream_parts):
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(24000) * 0.3).astype(np.float32)
    sv = StreamingVad(*stream_parts)
    first = sv.extend(audio)
    again = sv.extend(audio)  # d == 0
    np.testing.assert_array_equal(first, again)


def test_streaming_rejects_shrunk_buffer(stream_parts):
    sv = StreamingVad(*stream_parts)
    sv.extend(np.zeros(16000, np.float32))
    with pytest.raises(ValueError):
        sv.extend(np.zeros(8000, np.float32))
    sv.reset()
    assert sv.extend(np.zeros(8000, np.float32)).shape[0] == kfb.num_frames(8000)


def test_streaming_dfsmn_frame_level_growth(vad, stream_parts):
    """Feed the raw DFSMN one frame at a time — the hardest provisional-row
    schedule — and compare the final vector to the monolithic pass."""
    params, mean, inv_std = stream_parts
    rng = np.random.default_rng(5)
    samples = (rng.standard_normal(12800) * 0.25).astype(np.float32)
    pcm = np.clip(samples * 32768.0, -32768.0, 32767.0)
    feat = (fbank_np(pcm) - mean) * inv_std

    net = StreamingDfsmn(params)
    out = None
    for t in range(feat.shape[0]):
        out = net.update(feat[t : t + 1])
    want = _monolithic(vad, samples)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_prefix_session_uses_cascade_and_matches(vad):
    from light_whisper_tpu.models.vad.api import VadPrefixSession

    sess = VadPrefixSession(vad)
    assert sess._stream is not None  # CPU test env → cascade active
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(48000) * 0.3).astype(np.float32)
    for end in (16000, 32000, 48000):
        got = sess.probabilities(audio[:end])
        want = _monolithic(vad, audio[:end])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert sess.reused_ticks == 2


def test_compaction_matches_longform_batched(vad, stream_parts):
    """Cache compaction (flat memory for long audio) must not change the
    probabilities: chunk-fed cascade with aggressive compaction equals the
    batched long-form pass."""
    rng = np.random.default_rng(9)
    sr = 16_000
    audio = (rng.standard_normal(40 * sr) * 0.1).astype(np.float32)

    sv = StreamingVad(*stream_parts)
    sv._net._compact_at = 1200
    sv._net._keep = 512
    probs = None
    for end in range(5 * sr, len(audio) + 5 * sr, 5 * sr):
        probs = sv.extend(audio[: min(end, len(audio))])
    assert sv._net._off > 0  # compaction actually ran

    want = vad._probabilities_longform(audio, kfb.num_frames(len(audio)))
    np.testing.assert_allclose(probs[: len(want)], want, rtol=1e-4, atol=1e-5)


def test_host_longform_routes_through_cascade(vad):
    """On a host-CPU backend the probabilities() long-form path rides the
    numpy cascade (flat memory, ~2.5× the jitted host path)."""
    from light_whisper_tpu.models.vad.api import _prefer_host_numpy

    assert _prefer_host_numpy(vad._device)  # CPU test env
    rng = np.random.default_rng(10)
    audio = (rng.standard_normal(35 * 16_000) * 0.1).astype(np.float32)
    got = vad.probabilities(audio)
    want = vad._probabilities_longform(audio, kfb.num_frames(len(audio)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
