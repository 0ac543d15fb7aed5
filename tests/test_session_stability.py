"""Session KV-reuse must survive VAD trim jitter on growing interim windows.

Round-1 review weak spot: the server trims outer silence *before* the
session's byte-prefix check, so a leading trim that wobbles by one VAD hop
between interim ticks silently degraded every tick to a full prefill. The
trim pinning in ``runtime/qwen3_server.py:_stabilize_trim`` fixes that;
these tests pin the hit rate on a realistic growing-window sequence with
jittering VAD boundaries, and that the pinned path stays greedy-exact.
"""

import base64
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.runtime.qwen3_server import (
    TRIM_PIN_TOLERANCE_SAMPLES,
    Qwen3EngineServer,
)
from light_whisper_tpu.serving.session_pool import DEFAULT_STREAM

SR = 16000


def default_bridge(server):
    """The default-stream KV session (requests that never name a stream)."""
    pool = server._session_pool
    assert pool is not None and pool is not False
    return pool.bridge_for(None)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path_factory.mktemp("model") / "tiny.gguf")
    write_tiny_model(path, quantize=False)
    return Qwen3ASRModel(path, max_new_tokens=8)


class JitterVad:
    """Reports one speech segment whose boundaries wobble per call."""

    def __init__(self, true_start, start_jitter, end_jitter):
        self.true_start = true_start
        self.start_jitter = list(start_jitter)
        self.end_jitter = list(end_jitter)
        self.calls = 0

    def speech_timestamps(self, audio):
        i = self.calls
        self.calls += 1
        start = self.true_start + self.start_jitter[i % len(self.start_jitter)]
        end = len(audio) - abs(self.end_jitter[i % len(self.end_jitter)])
        return [{"start": start, "end": end}]

    def warmup(self):
        pass


def pcm_b64(audio):
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2")
    return base64.b64encode(pcm.tobytes()).decode()


def quantized(audio):
    """The float32 audio the server actually sees after the int16 wire trip."""
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2")
    return (pcm.astype(np.float32) / 32768.0).astype(np.float32)


def make_server(model, vad):
    return Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda path: model,
        vad_factory=lambda: vad,
        model_path="/fake/model.gguf",
    )


def test_session_hit_rate_survives_vad_jitter(model):
    """Growing windows + per-tick VAD wobble → every extend tick still hits."""
    rng = np.random.default_rng(7)
    lead_silence = 1600
    speech = (rng.standard_normal(SR * 9) * 0.3).astype(np.float32)
    full = np.concatenate([np.zeros(lead_silence, np.float32), speech])

    jitter = JitterVad(
        true_start=lead_silence,
        start_jitter=[0, 160, -160, 320, -320, 480],  # VAD hop wobble
        end_jitter=[0, 80, 160, 40, 120, 200],
    )
    server = make_server(model, jitter)
    assert server.initialize()["success"]

    ticks = [3, 4, 5, 6, 7, 9]
    texts = []
    for seconds in ticks:
        window = full[: lead_silence + seconds * SR]
        resp = server.transcribe(
            audio_base64=pcm_b64(window), audio_format="pcm_s16le", sample_rate=SR
        )
        assert resp["success"], resp
        texts.append(resp["raw_text"])

    session = default_bridge(server)
    assert session is not None
    hits, resets = session.session_hits, session.session_resets
    # First tick is necessarily a reset; every later tick must hit despite
    # the jittering trim (the documented floor for this synthetic corpus).
    assert resets == 1 and hits == len(ticks) - 1

    stats = server.performance_stats()
    assert stats["session_hits"] == hits
    assert stats["session_resets"] == resets
    assert stats["session_hit_rate"] == pytest.approx(hits / (hits + resets), abs=1e-4)

    # Greedy-exact: the pinned-trim result equals a stateless transcribe of
    # the same pinned window (quantized: what the server saw on the wire).
    _raw, start, end = server._prev_trims[DEFAULT_STREAM]
    want = model.transcribe(np.ascontiguousarray(quantized(full)[start:end]))
    assert texts[-1] == want.text.strip()


def test_jitter_beyond_tolerance_retrims_fresh(model):
    """A trim start that genuinely moved (> tolerance) must NOT be pinned."""
    lead = SR  # 1 s of real leading silence
    rng = np.random.default_rng(8)
    speech = (rng.standard_normal(SR * 5) * 0.3).astype(np.float32)
    full = np.concatenate([np.zeros(lead, np.float32), speech])

    big_move = TRIM_PIN_TOLERANCE_SAMPLES + 160
    jitter = JitterVad(true_start=lead, start_jitter=[0, big_move], end_jitter=[0])
    server = make_server(model, jitter)
    assert server.initialize()["success"]

    for seconds in (3, 5):
        resp = server.transcribe(
            audio_base64=pcm_b64(full[: lead + seconds * SR]),
            audio_format="pcm_s16le",
            sample_rate=SR,
        )
        assert resp["success"]

    _raw, start, _end = server._prev_trims[DEFAULT_STREAM]
    assert start == lead + big_move  # second tick's own trim, not the pinned one
    assert default_bridge(server).session_resets == 2


def test_two_interleaved_streams_each_keep_kv_reuse(model):
    """Two dictation streams interleaving growing windows must EACH stay on
    their own KV-reuse fast path (per-stream ``SessionPool``): with a shared
    single session every tick byte-differs from the *other* stream's previous
    audio and resets it — the regression this pool exists to prevent. Floor:
    each stream's hit rate matches the single-stream floor (first tick is the
    only reset)."""
    vad = JitterVad(true_start=0, start_jitter=[0], end_jitter=[0])
    server = make_server(model, vad)
    assert server.initialize()["success"]

    rng = np.random.default_rng(11)
    full_a = (rng.standard_normal(SR * 7) * 0.3).astype(np.float32)
    full_b = (rng.standard_normal(SR * 7) * 0.3).astype(np.float32)

    ticks = [3, 4, 5, 6, 7]
    last = {}
    for seconds in ticks:
        for name, full in (("alice", full_a), ("bob", full_b)):
            resp = server.transcribe(
                audio_base64=pcm_b64(full[: seconds * SR]),
                audio_format="pcm_s16le",
                sample_rate=SR,
                options={"stream": name},
            )
            assert resp["success"], resp
            last[name] = resp["raw_text"]

    stats = server.performance_stats()
    per_stream = stats["session_streams"]
    assert set(per_stream) >= {"alice", "bob"}
    for name in ("alice", "bob"):
        s = per_stream[name]
        # Single-stream floor: one reset (the first tick), every later tick hits.
        assert s["resets"] == 1 and s["hits"] == len(ticks) - 1, per_stream

    # Greedy-exact per stream: each final interim equals a stateless decode.
    for name, full in (("alice", full_a), ("bob", full_b)):
        want = model.transcribe(np.ascontiguousarray(quantized(full)))
        assert last[name] == want.text.strip()


def test_session_pool_evicts_lru_and_stays_correct(model, monkeypatch):
    """With the pool capped at 1, alternating streams force an eviction per
    tick — results must stay identical to stateless decodes (the
    ``SessionBridge`` reset contract) and evictions must be counted."""
    monkeypatch.setenv("LWT_MAX_SESSIONS", "1")
    vad = JitterVad(true_start=0, start_jitter=[0], end_jitter=[0])
    server = make_server(model, vad)
    assert server.initialize()["success"]

    rng = np.random.default_rng(12)
    full = (rng.standard_normal(SR * 4) * 0.3).astype(np.float32)

    for seconds in (3, 4):
        for name in ("alice", "bob"):
            resp = server.transcribe(
                audio_base64=pcm_b64(full[: seconds * SR]),
                audio_format="pcm_s16le",
                sample_rate=SR,
                options={"stream": name},
            )
            assert resp["success"], resp

    stats = server.performance_stats()
    assert stats["session_evictions"] >= 2
    # Counters are lifetime totals: evicted bridges' hits/resets fold into
    # the pool's retired tally, so totals stay monotonic and account for
    # every transcribe even under churn.
    assert stats["session_hits"] + stats["session_resets"] == 4
    want = model.transcribe(np.ascontiguousarray(quantized(full)))
    assert resp["raw_text"] == want.text.strip()


def test_non_extending_audio_resets_pin_state(model):
    jitter = JitterVad(true_start=0, start_jitter=[0], end_jitter=[0])
    server = make_server(model, jitter)
    assert server.initialize()["success"]

    rng = np.random.default_rng(9)
    a = (rng.standard_normal(SR * 3) * 0.3).astype(np.float32)
    b = (rng.standard_normal(SR * 3) * 0.3).astype(np.float32)  # unrelated clip
    for clip in (a, b):
        resp = server.transcribe(
            audio_base64=pcm_b64(clip), audio_format="pcm_s16le", sample_rate=SR
        )
        assert resp["success"]
    assert default_bridge(server).session_resets == 2
    assert default_bridge(server).session_hits == 0


def test_checkout_pins_bridge_against_concurrent_eviction(model):
    """A bridge checked out for transcription must not be LRU-evicted
    (reset frees donated KV buffers a concurrent decode still uses)."""
    from light_whisper_tpu.serving.session_pool import SessionPool

    pool = SessionPool(model, limit=1)
    with pool.checkout(["busy"]) as (busy,):
        # another thread's fresh stream triggers eviction pressure
        other = pool.bridge_for("fresh")
        assert other is not busy
        # the pinned bridge survived (pool transiently exceeds the limit)
        assert pool.bridge_for("busy") is busy
    # after release, pressure evicts normally again
    pool.bridge_for("third")
    assert len(pool) <= 2  # fresh/busy/third minus at least one eviction
    assert pool.evictions >= 1


def test_thirty_minute_request_bounds_host_retention(model, monkeypatch):
    """VERDICT r3 #8: retention is bounded by BYTES, not entry count.

    A 30-min finalize request must not park its raw audio anywhere for the
    process lifetime: the session bridge skips parking audio over
    ``LWT_SESSION_PARK_MAX_BYTES``, the trim pin drops requests over its
    30 s sample cap, and ``stats`` exposes the retained bytes so residency
    is observable over the wire."""
    from light_whisper_tpu.serving.session_bridge import SessionBridge

    bridge = SessionBridge(model)
    thirty_min = np.zeros(30 * 60 * SR, dtype=np.int16)  # 57.6 MB wire dtype

    # Park decision only — a real 30-min decode is a multi-minute CPU run.
    monkeypatch.setattr(
        bridge._inc, "transcribe_window", lambda audio, window_start_sample: object()
    )
    bridge.transcribe_extending(thirty_min)
    assert bridge.retained_bytes == 0  # over the cap: not parked

    short = np.zeros(3 * SR, dtype=np.int16)
    bridge.transcribe_extending(short)
    assert bridge.retained_bytes == short.nbytes  # normal ticks still park

    # Trim pinning: a 30-min raw request never enters the pin dict; the pin
    # dict itself evicts oldest-first down to the byte budget.
    vad = JitterVad(true_start=0, start_jitter=[0], end_jitter=[0])
    server = make_server(model, vad)
    assert server.initialize()["success"]
    long_raw = np.zeros(30 * 60 * SR, dtype=np.float32)
    server._stabilize_trim(long_raw, 0, len(long_raw), "finalize")
    stats = server.performance_stats()
    assert stats["trim_pin_retained_bytes"] == 0

    # Byte-budget eviction across streams: shrink the budget to 2 pins'
    # worth and insert 4 — only the newest ≤2 survive.
    pin = np.zeros(5 * SR, dtype=np.float32)  # 320 KB each
    monkeypatch.setenv("LWT_TRIM_PIN_MAX_BYTES", str(2 * pin.nbytes))
    for name in ("a", "b", "c", "d"):
        server._stabilize_trim(pin, 0, len(pin), name)
    stats = server.performance_stats()
    assert 0 < stats["trim_pin_retained_bytes"] <= 2 * pin.nbytes
    assert set(server._prev_trims) == {"c", "d"}

    # A single pin larger than the whole budget is itself dropped.
    monkeypatch.setenv("LWT_TRIM_PIN_MAX_BYTES", str(pin.nbytes // 2))
    server._stabilize_trim(pin, 0, len(pin), "huge")
    assert "huge" not in server._prev_trims


def test_stats_expose_retained_audio_bytes(model):
    """The stats action reports every host retention surface."""
    vad = JitterVad(true_start=0, start_jitter=[0], end_jitter=[0])
    server = make_server(model, vad)
    assert server.initialize()["success"]
    audio = (np.random.default_rng(3).standard_normal(SR * 3) * 0.3).astype(np.float32)
    resp = server.transcribe(
        audio_base64=pcm_b64(audio), audio_format="pcm_s16le", sample_rate=SR
    )
    assert resp["success"]
    stats = server.performance_stats()
    for key in (
        "trim_pin_retained_bytes",
        "vad_session_retained_bytes",
        "session_parked_audio_bytes",
    ):
        assert key in stats and stats[key] >= 0
    # something was actually parked by the tick above
    assert stats["trim_pin_retained_bytes"] > 0
    assert stats["session_parked_audio_bytes"] > 0
