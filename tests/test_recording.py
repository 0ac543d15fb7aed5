"""Capture ring / downmix / waveform bars / level monitor / recording
lifecycle (portable cores of capture.rs, monitor.rs, audio.rs — see module
docstrings for the behavior cites)."""

import threading
import time
from types import SimpleNamespace

import numpy as np
import pytest

from light_whisper_tpu.audio.capture import (
    CaptureRing,
    ScriptedSource,
    WaveformEmitter,
    mix_to_mono,
    start_capture,
    waveform_bars,
)
from light_whisper_tpu.audio.monitor import LevelMonitor, mono_peak
from light_whisper_tpu.runtime.recording import (
    RecordingController,
    RecordingResult,
)
from light_whisper_tpu.runtime.recording_state import RecordingPhase

SR = 16_000


# -- downmix ------------------------------------------------------------


def test_mix_to_mono_i16_passthrough():
    x = np.array([1, -2, 3], dtype=np.int16)
    assert np.array_equal(mix_to_mono(x), x)


def test_mix_to_mono_f32_scales_and_clips():
    x = np.array([0.5, -1.5, 1.0], dtype=np.float32)
    out = mix_to_mono(x)
    assert out.dtype == np.int16
    assert out[0] == round(0.5 * 32767)
    assert out[1] == -32767  # clipped to -1 then scaled
    assert out[2] == 32767


def test_mix_to_mono_u16_offset_binary():
    x = np.array([32768, 0, 65535], dtype=np.uint16)
    out = mix_to_mono(x)
    assert out[0] == 0 and out[1] == -32768 and out[2] == 32767


def test_mix_to_mono_interleaved_stereo_averages():
    # L=1000, R=3000 → 2000
    x = np.array([1000, 3000, -1000, -3000], dtype=np.int16)
    out = mix_to_mono(x, channels=2)
    assert np.array_equal(out, np.array([2000, -2000], dtype=np.int16))


def test_mix_to_mono_2d_frames():
    x = np.array([[1000, 3000], [-1000, -3000]], dtype=np.int16)
    assert np.array_equal(mix_to_mono(x), np.array([2000, -2000], dtype=np.int16))


def test_mix_to_mono_rejects_unknown_dtype():
    with pytest.raises(TypeError):
        mix_to_mono(np.zeros(4, dtype=np.int32))


# -- ring ----------------------------------------------------------------


def test_capture_ring_appends_and_snapshots():
    ring = CaptureRing(SR)
    ring.append(np.array([1, 2], dtype=np.int16))
    ring.append(np.array([3], dtype=np.int16))
    assert len(ring) == 3
    assert np.array_equal(ring.snapshot(), np.array([1, 2, 3], dtype=np.int16))
    assert np.array_equal(ring.delta_since(2), np.array([3], dtype=np.int16))


def test_capture_ring_hard_cap_drops_excess():
    # capture.rs:18 — MAX_RECORD_SAMPLES stops growth, never fails
    ring = CaptureRing(sample_rate=2)  # cap = 30*60*2 = 3600 samples
    taken = ring.append(np.zeros(3000, dtype=np.int16))
    assert taken == 3000
    taken = ring.append(np.ones(1000, dtype=np.int16))
    assert taken == 600
    assert len(ring) == 3600
    assert ring.append(np.ones(10, dtype=np.int16)) == 0
    assert len(ring) == 3600


def test_scripted_source_feeds_ring_through_downmix():
    blocks = [np.full(100, 0.5, dtype=np.float32), np.full(60, -0.25, dtype=np.float32)]
    ring = CaptureRing(SR)
    src = ScriptedSource(blocks, sample_rate=SR)
    handle = start_capture(src, ring)
    deadline = time.time() + 5
    while not src.drained() and time.time() < deadline:
        time.sleep(0.01)
    handle.stop()
    snap = ring.snapshot()
    assert len(snap) == 160
    assert snap[0] == round(0.5 * 32767)
    assert snap[-1] == round(-0.25 * 32767)


# -- waveform bars --------------------------------------------------------


def test_waveform_bars_shape_and_silence():
    assert waveform_bars(np.zeros(0, dtype=np.int16)) == [0.0] * 9
    bars = waveform_bars(np.zeros(900, dtype=np.int16))
    assert bars == [0.0] * 9


def test_waveform_bars_rms_per_slice():
    # first half full-scale, second half silent → first bars ≈1, last ≈0
    x = np.zeros(9000, dtype=np.int16)
    x[:4500] = 32767
    bars = waveform_bars(x)
    assert len(bars) == 9
    assert bars[0] > 0.99 and bars[-1] == 0.0


def test_waveform_emitter_emits_periodically():
    ring = CaptureRing(SR)
    ring.append((np.ones(SR) * 16384).astype(np.int16))
    got = []
    emitter = WaveformEmitter(ring, got.append, interval_ms=20)
    emitter.start()
    time.sleep(0.15)
    emitter.stop()
    assert len(got) >= 2
    assert all(len(bars) == 9 for bars in got)
    assert got[-1][-1] == pytest.approx(0.5, abs=0.01)


# -- level monitor ---------------------------------------------------------


def test_mono_peak():
    assert mono_peak(np.array([100, -30000], dtype=np.int16)) == pytest.approx(
        30000 / 32768
    )
    assert mono_peak(np.zeros(0, dtype=np.int16)) == 0.0


def test_level_monitor_emits_meter_values():
    # one loud block then silence: the first emit should catch the peak
    blocks = [np.full(800, 0.8, dtype=np.float32)] + [
        np.zeros(800, dtype=np.float32)
    ] * 3
    src = ScriptedSource(blocks, sample_rate=SR, realtime=True)
    got = []
    mon = LevelMonitor(src, got.append, interval_ms=30)
    mon.start()
    time.sleep(0.3)
    mon.stop()
    assert got, "no meter emissions"
    assert max(got) == pytest.approx(800, abs=5)  # 0.8 → ~800 of 1000
    assert got[-1] == 0  # silence at the end


# -- recording controller ---------------------------------------------------


class FakeTranscriber:
    """Deterministic stand-in: text encodes the audio length it saw."""

    def __init__(self):
        self.calls = []

    def transcribe(self, audio):
        audio = np.asarray(audio)
        self.calls.append(len(audio))
        return SimpleNamespace(text=f"len={len(audio)}", language="zh")


def _float_blocks(seconds, block_s=0.25):
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(int(seconds * SR)) * 0.1).astype(np.float32)
    n = int(block_s * SR)
    return [audio[i : i + n] for i in range(0, len(audio), n)]


def test_recording_end_to_end_interim_reuse():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    interims = []
    src = ScriptedSource(_float_blocks(2.0), sample_rate=SR)
    sid = ctl.start_recording(
        src, on_interim=interims.append, interval_scale=0.05
    )
    assert ctl.state.snapshot().phase == RecordingPhase.RECORDING
    deadline = time.time() + 10
    while (not interims or not src.drained()) and time.time() < deadline:
        time.sleep(0.02)
    # let one more tick cover the tail so finalize can reuse it
    time.sleep(0.1)
    result = ctl.stop_recording()
    assert isinstance(result, RecordingResult) and result.session_id == sid
    assert not result.too_short
    assert result.duration_seconds == pytest.approx(2.0, abs=0.01)
    assert result.interim_ticks >= 1 and interims
    # 2 s fits the 12 s window and the tail gap is 0 → interim-cache reuse
    assert result.from_interim_cache
    assert result.text == interims[-1].text
    # success clears the snapshot (shell returns to idle)
    assert ctl.state.snapshot() is None


def test_recording_too_short_outcome():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    src = ScriptedSource([np.zeros(int(0.3 * SR), dtype=np.float32)], sample_rate=SR)
    ctl.start_recording(src, interval_scale=10.0)  # no interim ticks
    deadline = time.time() + 5
    while not src.drained() and time.time() < deadline:
        time.sleep(0.01)
    result = ctl.stop_recording()
    assert result.too_short and result.text == ""
    snap = ctl.state.snapshot()
    assert snap.phase == RecordingPhase.OUTCOME
    assert snap.outcome.value == "too_short"
    assert not t.calls  # the engine never ran


def test_recording_finalize_without_interim_runs_full_asr():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    src = ScriptedSource(_float_blocks(1.0), sample_rate=SR)
    ctl.start_recording(src, interval_scale=50.0)  # interim never fires
    deadline = time.time() + 5
    while not src.drained() and time.time() < deadline:
        time.sleep(0.01)
    result = ctl.stop_recording()
    assert not result.from_interim_cache
    assert result.text == f"len={SR}"
    assert t.calls == [SR]


def test_recording_resamples_foreign_rate_sources():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    # 48 kHz source: 1.0 s of audio → 16 k samples after resample
    blocks = [np.zeros(48_000, dtype=np.float32)]
    blocks[0][: 24_000] = 0.4
    src = ScriptedSource(blocks, sample_rate=48_000)
    ctl.start_recording(src, sample_rate=48_000, interval_scale=50.0)
    deadline = time.time() + 5
    while not src.drained() and time.time() < deadline:
        time.sleep(0.01)
    result = ctl.stop_recording()
    assert result.duration_seconds == pytest.approx(1.0, abs=0.01)
    assert t.calls and t.calls[0] == pytest.approx(SR, abs=2)


def test_recording_cancel_discards_without_asr():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    src = ScriptedSource(_float_blocks(1.0), sample_rate=SR)
    sid = ctl.start_recording(src, interval_scale=50.0)
    ctl.cancel_recording()
    assert not t.calls
    assert ctl.state.snapshot() is None or ctl.state.snapshot().session_id != sid
    # controller is reusable after cancel
    src2 = ScriptedSource(_float_blocks(1.0), sample_rate=SR)
    ctl.start_recording(src2, interval_scale=50.0)
    deadline = time.time() + 5
    while not src2.drained() and time.time() < deadline:
        time.sleep(0.01)
    assert not ctl.stop_recording().too_short


def test_second_start_rejected_while_active():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    src = ScriptedSource(_float_blocks(1.0), sample_rate=SR)
    ctl.start_recording(src, interval_scale=50.0)
    with pytest.raises(RuntimeError, match="already active"):
        ctl.start_recording(ScriptedSource([], sample_rate=SR))
    ctl.cancel_recording()


def test_recording_waveform_bars_emitted():
    t = FakeTranscriber()
    ctl = RecordingController(t)
    bars = []
    blocks = [np.full(int(0.2 * SR), 0.5, dtype=np.float32) for _ in range(5)]
    src = ScriptedSource(blocks, sample_rate=SR, realtime=True)
    ctl.start_recording(src, on_waveform=bars.append, interval_scale=50.0)
    time.sleep(0.3)
    ctl.stop_recording()
    assert bars and all(len(b) == 9 for b in bars)
    assert max(max(b) for b in bars) > 0.4


def test_capture_ring_delta_and_tail_cross_chunk_boundaries():
    ring = CaptureRing(SR)
    ring.append(np.arange(0, 5, dtype=np.int16))
    ring.append(np.arange(5, 9, dtype=np.int16))
    ring.append(np.arange(9, 12, dtype=np.int16))
    assert np.array_equal(ring.delta_since(0), np.arange(12, dtype=np.int16))
    assert np.array_equal(ring.delta_since(3), np.arange(3, 12, dtype=np.int16))
    assert np.array_equal(ring.delta_since(5), np.arange(5, 12, dtype=np.int16))
    assert np.array_equal(ring.delta_since(11), np.array([11], dtype=np.int16))
    assert len(ring.delta_since(12)) == 0
    assert np.array_equal(ring.tail(4), np.arange(8, 12, dtype=np.int16))
    assert np.array_equal(ring.tail(100), np.arange(12, dtype=np.int16))
    assert len(ring.tail(0)) == 0
    # returned arrays are copies: mutating them must not corrupt the ring
    d = ring.delta_since(9)
    d[:] = 0
    assert np.array_equal(ring.delta_since(9), np.arange(9, 12, dtype=np.int16))


def test_capture_ring_owns_appended_data():
    # Device backends reuse their callback buffer between blocks; the ring
    # must copy on append or history silently mutates.
    ring = CaptureRing(SR)
    buf = np.arange(10, dtype=np.int16)
    ring.append(buf)
    buf[:] = -1  # backend reuses the buffer for the next block
    assert ring.snapshot().tolist() == list(range(10))


def test_interim_tick_errors_do_not_kill_the_loop():
    class FlakyTranscriber:
        def __init__(self):
            self.calls = 0

        def transcribe(self, audio):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("engine restarting")
            from types import SimpleNamespace
            return SimpleNamespace(text=f"n={len(audio)}", language="zh")

    ctl = RecordingController(FlakyTranscriber())
    blocks = [np.full(SR // 10, 0.1, dtype=np.float32)] * 10  # 1 s total
    src = ScriptedSource(blocks, sample_rate=SR)
    interims = []
    ctl.start_recording(src, on_interim=interims.append, interval_scale=2.0)
    deadline = time.time() + 10
    while time.time() < deadline:
        active = ctl._active
        if active is not None and active.tick_errors >= 1 and active.ticks >= 1:
            break
        time.sleep(0.02)
    result = ctl.stop_recording()
    # the first tick raised, later ticks kept flowing, finalize succeeded
    assert result.text.startswith("n=")
    assert not result.too_short


def test_capture_ring_tail_fuzz_matches_snapshot_slices():
    rng = np.random.default_rng(11)
    ring = CaptureRing(SR)
    for _ in range(37):  # many small ragged chunks
        ring.append(rng.integers(-100, 100, size=int(rng.integers(1, 50)), dtype=np.int16))
    snap = ring.snapshot()
    for offset in [0, 1, 7, 100, len(snap) - 1, len(snap), len(snap) + 5]:
        np.testing.assert_array_equal(ring.delta_since(offset), snap[offset:])
    for n in [0, 1, 13, 200, len(snap), len(snap) + 9]:
        np.testing.assert_array_equal(ring.tail(n), snap[len(snap) - min(n, len(snap)):])
