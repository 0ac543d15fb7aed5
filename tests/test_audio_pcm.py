"""Audio ingestion parity tests (decode, WAV, resample)."""

import base64
import io

import numpy as np
import pytest

from light_whisper_tpu.audio.pcm import (
    decode_inline_audio,
    encode_wav_mono_s16,
    read_audio_file_mono_f32,
    resample_linear,
    wav_duration_seconds,
)


def test_pcm_s16le_decode_scaling_and_duration():
    samples = np.array([0, 16384, -32768, 32767], dtype="<i2")
    b64 = base64.b64encode(samples.tobytes()).decode()
    audio, duration = decode_inline_audio(b64, "pcm_s16le", 16000)
    np.testing.assert_allclose(
        audio, [0.0, 0.5, -1.0, 32767 / 32768.0], rtol=0, atol=1e-7
    )
    assert duration == pytest.approx(4 / 16000)


def test_pcm_decode_rejects_odd_bytes_and_bad_rate():
    b64 = base64.b64encode(b"\x01\x02\x03").decode()
    with pytest.raises(ValueError):
        decode_inline_audio(b64, "pcm_s16le", 16000)
    even = base64.b64encode(b"\x01\x02").decode()
    with pytest.raises(ValueError):
        decode_inline_audio(even, "pcm_s16le", 0)
    with pytest.raises(ValueError):
        decode_inline_audio("", "pcm_s16le", 16000)
    with pytest.raises(ValueError):
        decode_inline_audio("!!!not-base64!!!", "pcm_s16le", 16000)


def test_wav_inline_decode_reports_header_duration():
    wav_bytes = encode_wav_mono_s16(np.zeros(8000, dtype=np.float32), 16000)
    b64 = base64.b64encode(wav_bytes).decode()
    buf, duration = decode_inline_audio(b64, "wav", None)
    assert isinstance(buf, io.BytesIO)
    assert duration == pytest.approx(0.5)


def test_unknown_format_rejected():
    b64 = base64.b64encode(b"\x00\x00").decode()
    with pytest.raises(ValueError):
        decode_inline_audio(b64, "mp3", 16000)


def test_resample_identity_at_16k():
    audio = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    out = resample_linear(audio, 16000)
    np.testing.assert_array_equal(out, audio)


def test_resample_matches_reference_interp_semantics():
    # Reference: np.interp over linspace(0, len-1, round(len*16000/src)).
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(480).astype(np.float32)
    out = resample_linear(audio, 48000)
    expected = np.interp(
        np.linspace(0, 479, 160), np.arange(480, dtype=np.float64), audio
    ).astype(np.float32)
    np.testing.assert_array_equal(out, expected)
    assert out.dtype == np.float32


def test_resample_empty_input():
    assert resample_linear(np.empty(0, dtype=np.float32), 48000).size == 0


def test_wav_roundtrip_file(tmp_path):
    audio = (np.sin(np.linspace(0, 20, 1600)) * 0.5).astype(np.float32)
    path = tmp_path / "t.wav"
    path.write_bytes(encode_wav_mono_s16(audio, 16000))
    loaded, rate = read_audio_file_mono_f32(str(path))
    assert rate == 16000
    np.testing.assert_allclose(loaded, audio, atol=1 / 32768.0)
    assert wav_duration_seconds(str(path)) == pytest.approx(0.1)


def test_wav_float32_and_stereo(tmp_path):
    import struct

    audio = np.stack(
        [np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1
    ).astype("<f4")
    payload = audio.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 2, 16000, 16000 * 8, 8, 32)
    riff = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    path = tmp_path / "f32stereo.wav"
    path.write_bytes(riff)
    loaded, rate = read_audio_file_mono_f32(str(path))
    assert rate == 16000
    np.testing.assert_allclose(loaded, audio.mean(axis=1), atol=1e-6)


# -- streaming resampler (phase continuity across capture deltas) ------------

def _oneshot_grid(audio: np.ndarray, sr: int, tr: int) -> np.ndarray:
    """The fixed-ratio grid the streaming resampler commits to: k * sr/tr."""
    step = sr / tr
    n_out = int(np.floor((len(audio) - 1) / step)) + 1
    pos = np.arange(n_out, dtype=np.float64) * step
    return np.interp(pos, np.arange(len(audio), dtype=np.float64), audio).astype(
        np.float32
    )


def test_streaming_resampler_chunking_invariant():
    from light_whisper_tpu.audio.pcm import StreamingResampler

    rng = np.random.default_rng(7)
    audio = rng.standard_normal(48_000 * 2).astype(np.float32)
    want = _oneshot_grid(audio, 48_000, 16_000)

    for seed in range(3):
        r = StreamingResampler(48_000, 16_000)
        cuts = np.sort(
            np.random.default_rng(seed).choice(len(audio) - 2, size=9, replace=False) + 1
        )
        chunks = np.split(audio, cuts)
        got = np.concatenate([r.push(c) for c in chunks])
        # identical grid regardless of chunking — not just close, equal
        np.testing.assert_array_equal(got, want)


def test_streaming_resampler_identity_at_target_rate():
    from light_whisper_tpu.audio.pcm import StreamingResampler

    r = StreamingResampler(16_000, 16_000)
    audio = np.arange(100, dtype=np.float32)
    np.testing.assert_array_equal(r.push(audio), audio)


def test_streaming_resampler_no_boundary_double_sampling():
    from light_whisper_tpu.audio.pcm import StreamingResampler

    # A ramp resampled 48k->16k must stay a uniform ramp (step 3.0) across
    # chunk seams; per-chunk grid restarts would inject near-duplicate
    # samples at each boundary.
    audio = np.arange(48_000, dtype=np.float32)
    r = StreamingResampler(48_000, 16_000)
    out = np.concatenate([r.push(c) for c in np.split(audio, [5000, 12345, 30001])])
    steps = np.diff(out.astype(np.float64))
    assert np.allclose(steps, 3.0, atol=1e-3), (steps.min(), steps.max())


def test_streaming_resampler_empty_and_tiny_pushes():
    from light_whisper_tpu.audio.pcm import StreamingResampler

    r = StreamingResampler(48_000, 16_000)
    assert r.push(np.empty(0, dtype=np.float32)).size == 0
    out = [r.push(np.array([v], dtype=np.float32)) for v in np.arange(12.0)]
    got = np.concatenate(out)
    want = _oneshot_grid(np.arange(12, dtype=np.float32), 48_000, 16_000)
    np.testing.assert_array_equal(got, want)
