"""Wire-level multi-stream serving tests.

The reference client correlates responses strictly by ``request_id``
(``funasr_service.rs:1394-1440``), so the engine may answer out of order.
These tests pin the TPU-native upgrades built on that freedom:

- ``status``/``stats`` answer while a transcribe is still in flight,
- two transcribe commands in flight together coalesce into ONE
  ``transcribe_batch`` device dispatch, each response carrying its own
  ``request_id``,
- commands without a ``request_id`` (legacy ordered correlation) drain
  pipelined work first, preserving serial semantics byte-for-byte.
"""

import base64
import json
import os
import threading
import time
import types

import numpy as np

from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
from light_whisper_tpu.runtime.server import EngineServer


class BatchRecordingModel:
    def __init__(self):
        self.solo_calls = 0
        self.batch_sizes = []

    def transcribe(self, audio):
        self.solo_calls += 1
        return types.SimpleNamespace(text="solo", language="zh", tokens=[])

    def transcribe_batch(self, clips):
        self.batch_sizes.append(len(clips))
        return [
            types.SimpleNamespace(text=f"batched-{i}", language="zh", tokens=[])
            for i in range(len(clips))
        ]

    def warmup(self):
        pass


class FakeVad:
    def __init__(self, segments):
        self.segments = segments

    def speech_timestamps(self, audio):
        return self.segments

    def warmup(self):
        pass


def pcm_b64(seconds=1.0):
    samples = np.zeros(int(16000 * seconds), dtype="<i2")
    return base64.b64encode(samples.tobytes()).decode()


def transcribe_cmd(request_id):
    return json.dumps(
        {
            "action": "transcribe",
            "request_id": request_id,
            "audio_base64": pcm_b64(),
            "audio_format": "pcm_s16le",
            "sample_rate": 16000,
        }
    )


class Conversation:
    """Full-duplex client over OS pipes around a threaded EngineServer."""

    def __init__(self, engine):
        c2s_r, c2s_w = os.pipe()
        s2c_r, s2c_w = os.pipe()
        self._to_server = os.fdopen(c2s_w, "w")
        self._from_server = os.fdopen(s2c_r, "r")
        self.server = EngineServer(
            engine.hooks(),
            stdin=os.fdopen(c2s_r, "r"),
            stdout=os.fdopen(s2c_w, "w"),
        )
        self.thread = threading.Thread(target=self.server.run, daemon=True)
        self.thread.start()

    def send(self, line):
        self._to_server.write(line + "\n")
        self._to_server.flush()

    def recv(self):
        return json.loads(self._from_server.readline())

    def close(self):
        self.send(json.dumps({"action": "exit", "request_id": 10_000}))
        while True:
            if self.recv().get("request_id") == 10_000:
                break
        self.thread.join(timeout=5)
        assert not self.thread.is_alive()


def make_engine(model=None):
    model = model or BatchRecordingModel()
    engine = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda path: model,
        vad_factory=lambda: FakeVad([{"start": 0, "end": 16000}]),
        model_path="/fake/model.gguf",
    )
    return engine, model


def _block_scheduler(engine):
    """Occupy the device scheduler so queued jobs pile up deterministically."""
    scheduler = engine._decode_scheduler()
    running = threading.Event()
    release = threading.Event()

    def blocker():
        running.set()
        assert release.wait(10)

    scheduler.submit("blocker", blocker, supersede=False)
    assert running.wait(10)
    return scheduler, release


def _wait_for_queue(scheduler, n, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        with scheduler._lock:
            if len(scheduler._queue) >= n:
                return
        time.sleep(0.005)
    raise AssertionError(f"scheduler queue never reached {n} jobs")


def test_interleaved_transcribes_coalesce_into_one_batch():
    engine, model = make_engine()
    assert engine.initialize()["success"]
    scheduler, release = _block_scheduler(engine)

    conv = Conversation(engine)
    assert conv.recv()["success"]  # init line
    conv.send(transcribe_cmd(1))
    conv.send(transcribe_cmd(2))
    _wait_for_queue(scheduler, 2)
    release.set()

    responses = {r["request_id"]: r for r in (conv.recv(), conv.recv())}
    assert set(responses) == {1, 2}
    assert sorted(r["text"] for r in responses.values()) == ["batched-0", "batched-1"]
    assert model.batch_sizes == [2]  # ONE device dispatch for both requests
    assert model.solo_calls == 0

    stats = engine.performance_stats()
    assert stats["batch_dispatches"] == 1
    assert stats["batched_requests"] == 2
    conv.close()


def test_status_answers_while_transcribe_in_flight():
    engine, _model = make_engine()
    assert engine.initialize()["success"]
    _scheduler, release = _block_scheduler(engine)

    conv = Conversation(engine)
    assert conv.recv()["success"]
    conv.send(transcribe_cmd(5))
    conv.send(json.dumps({"action": "status", "request_id": 6}))
    first = conv.recv()  # must be status: transcribe is blocked on device
    assert first["request_id"] == 6 and first["success"]
    release.set()
    second = conv.recv()
    assert second["request_id"] == 5 and second["success"]
    conv.close()


def test_legacy_command_without_request_id_drains_first():
    engine, _model = make_engine()
    assert engine.initialize()["success"]
    _scheduler, release = _block_scheduler(engine)

    conv = Conversation(engine)
    assert conv.recv()["success"]
    conv.send(transcribe_cmd(7))
    conv.send(json.dumps({"action": "status"}))  # legacy: ordered correlation
    # The legacy status may not be answered until the transcribe completes.
    threading.Timer(0.2, release.set).start()
    first = conv.recv()
    assert first["request_id"] == 7  # transcribe flushed first
    second = conv.recv()
    assert "request_id" not in second and second["success"]
    conv.close()


def test_solo_transcribe_keeps_session_fast_path():
    engine, model = make_engine()
    assert engine.initialize()["success"]

    conv = Conversation(engine)
    assert conv.recv()["success"]
    conv.send(transcribe_cmd(1))
    assert conv.recv()["text"] == "solo"
    assert model.solo_calls == 1 and model.batch_sizes == []
    conv.close()


def test_concurrent_storm_keeps_correlation_exact():
    """Race-detection stress: many writers hammer the wire with mixed
    transcribes, status probes, garbage lines and blank lines at once; every
    well-formed command must get exactly one response with its request_id
    and the dispatch loop must stay alive throughout (the invariant the
    reference enforces by holding the process mutex across I/O,
    funasr_service.rs:1353-1388 — here concurrency is allowed and
    correlation carries the weight)."""
    engine, model = make_engine()
    convo = Conversation(engine)
    try:
        n_writers, per_writer = 4, 12
        write_lock = threading.Lock()  # line-atomicity, as stdin gives the server

        def writer(base):
            for i in range(per_writer):
                rid = base + i
                with write_lock:
                    if i % 4 == 3:
                        convo.send("}{ total garbage")
                        convo.send("")
                    if i % 2 == 0:
                        convo.send(transcribe_cmd(rid))
                    else:
                        convo.send(json.dumps({"action": "status", "request_id": rid}))

        threads = [
            threading.Thread(target=writer, args=(1000 * (w + 1),))
            for w in range(n_writers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        expected = {
            1000 * (w + 1) + i for w in range(n_writers) for i in range(per_writer)
        }
        seen = {}
        garbage_errors = 0
        while set(expected) - set(seen):
            response = convo.recv()
            rid = response.get("request_id")
            if rid is None:
                garbage_errors += 1  # typed error for the garbage lines
                continue
            assert rid in expected, f"unknown request_id {rid}"
            assert rid not in seen, f"duplicate response for {rid}"
            seen[rid] = response
        # every transcribe answered as a transcribe, every status as a status
        for rid, response in seen.items():
            if rid % 2 == 0:
                assert "text" in response or response.get("success") is not None
            else:
                assert response.get("engine") or "model_loaded" in response or response.get("success") is not None
        assert garbage_errors >= n_writers  # the garbage never killed the loop
    finally:
        convo.close()


class FullSpanVad:
    """VAD double whose trim tracks the audio length, so a grown interim
    window still byte-extends the previous request after trimming."""

    def speech_timestamps(self, audio):
        return [{"start": 0, "end": len(audio)}]

    def warmup(self):
        pass


def test_coalesced_interim_ticks_batch_with_kv_sessions(tmp_path):
    """Two dictation streams' interim ticks queued together must run as ONE
    batched device tick that keeps BOTH KV sessions (batched_tick_dispatches),
    not the stateless batched transcribe. Reference scenario generalized:
    interim.rs drives one session; here N streams tick concurrently."""
    from helpers.tiny_model import write_tiny_model
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=True)
    model = Qwen3ASRModel(path, max_new_tokens=6)
    engine = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda _p: model,
        vad_factory=lambda: FullSpanVad(),
        model_path=path,
    )
    assert engine.initialize()["success"]

    rng = np.random.default_rng(3)
    sr = 16000

    def cmd(rid, stream, seconds):
        audio = (rng_streams[stream][: int(seconds * sr)] * 32767).astype("<i2")
        return json.dumps(
            {
                "action": "transcribe",
                "request_id": rid,
                "audio_base64": base64.b64encode(audio.tobytes()).decode(),
                "audio_format": "pcm_s16le",
                "sample_rate": sr,
                "options": {"stream": stream},
            }
        )

    rng_streams = {
        "a": (rng.standard_normal(2 * sr) * 0.2).clip(-1, 1).astype(np.float32),
        "b": (rng.standard_normal(2 * sr) * 0.2).clip(-1, 1).astype(np.float32),
    }

    conv = Conversation(engine)
    assert conv.recv()["success"]
    # establish both sessions sequentially (fresh ticks prime the KV prefix)
    conv.send(cmd(1, "a", 1.0))
    assert conv.recv()["success"]
    conv.send(cmd(2, "b", 1.0))
    assert conv.recv()["success"]

    # grown ticks queued together → one batched KV-keeping dispatch
    scheduler, release = _block_scheduler(engine)
    conv.send(cmd(3, "a", 1.5))
    conv.send(cmd(4, "b", 1.5))
    _wait_for_queue(scheduler, 2)
    release.set()
    responses = {r["request_id"]: r for r in (conv.recv(), conv.recv())}
    assert set(responses) == {3, 4}
    assert all(r["success"] for r in responses.values())

    stats = engine.performance_stats()
    assert stats["batched_tick_dispatches"] == 1, stats
    assert stats["session_hits"] >= 2, stats
    conv.close()


def test_mixed_fresh_and_extending_coalesce_keeps_sessions(tmp_path):
    """A batch mixing one extending tick and one brand-new stream must keep
    the extending stream's KV session (previously mixed batches fell back to
    the stateless path and silently reset it)."""
    from helpers.tiny_model import write_tiny_model
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=True)
    model = Qwen3ASRModel(path, max_new_tokens=6)
    engine = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda _p: model,
        vad_factory=lambda: FullSpanVad(),
        model_path=path,
    )
    assert engine.initialize()["success"]

    rng = np.random.default_rng(9)
    sr = 16000
    streams = {
        "a": (rng.standard_normal(2 * sr) * 0.2).clip(-1, 1).astype(np.float32),
        "b": (rng.standard_normal(2 * sr) * 0.2).clip(-1, 1).astype(np.float32),
    }

    def cmd(rid, stream, seconds):
        audio = (streams[stream][: int(seconds * sr)] * 32767).astype("<i2")
        return json.dumps(
            {
                "action": "transcribe",
                "request_id": rid,
                "audio_base64": base64.b64encode(audio.tobytes()).decode(),
                "audio_format": "pcm_s16le",
                "sample_rate": sr,
                "options": {"stream": stream},
            }
        )

    conv = Conversation(engine)
    assert conv.recv()["success"]
    conv.send(cmd(1, "a", 1.0))  # establish stream a
    assert conv.recv()["success"]

    scheduler, release = _block_scheduler(engine)
    conv.send(cmd(2, "a", 1.5))  # extends a
    conv.send(cmd(3, "b", 1.0))  # fresh b
    _wait_for_queue(scheduler, 2)
    release.set()
    responses = {r["request_id"]: r for r in (conv.recv(), conv.recv())}
    assert set(responses) == {2, 3} and all(
        r["success"] for r in responses.values()
    )

    stats = engine.performance_stats()
    assert stats["batched_tick_dispatches"] == 1, stats
    assert stats["session_hits"] >= 1, stats  # stream a kept its session

    # stream a's transcript matches a pure per-stream run of the same audio
    ref = Qwen3ASRModel(path, max_new_tokens=6)
    from light_whisper_tpu.serving.session_bridge import SessionBridge

    bridge = SessionBridge(ref)
    bridge.transcribe_extending(streams["a"][: sr])
    want = bridge.transcribe_extending(streams["a"][: int(1.5 * sr)])
    assert responses[2]["raw_text"] == want.text or responses[2]["text"] == want.text
    conv.close()
