"""Concurrent-dictation soak: the full engine under interleaved live load.

Three dictation streams grow concurrently through a REAL tiny model behind
the wire dispatch loop — threads racing into the scheduler, per-stream KV
sessions, the streaming VAD cascade, batched interim ticks when ticks
coalesce, hot words, and the device audio buffers all engaged at once.
Verifies the race-defensive design end to end (SURVEY §5): every response
correlates to its request, per-stream transcripts equal a clean sequential
replay of the same windows, and the server's counters stay coherent.
Reference invariant being generalized: the shell serializes everything
behind a process mutex (``funasr_service.rs:1353-1388``); here concurrency
is allowed and correlation + session isolation carry the weight.
"""

import base64
import json
import os
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer
from light_whisper_tpu.runtime.server import EngineServer

SR = 16_000


class FullSpanVad:
    def speech_timestamps(self, audio):
        return [{"start": 0, "end": len(audio)}]

    def warmup(self):
        pass


def _pcm_b64(x):
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    return base64.b64encode(pcm.tobytes()).decode()


def test_concurrent_dictations_soak(tmp_path):
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

    c2s_r, c2s_w = os.pipe()
    s2c_r, s2c_w = os.pipe()
    to_server = os.fdopen(c2s_w, "w")
    from_server = os.fdopen(s2c_r, "r")
    server = EngineServer(
        engine.hooks(), stdin=os.fdopen(c2s_r, "r"), stdout=os.fdopen(s2c_w, "w")
    )
    threading.Thread(target=server.run, daemon=True).start()
    assert json.loads(from_server.readline())["success"]  # init line

    n_streams, n_ticks = 3, 4
    rng = np.random.default_rng(0)
    streams = {
        f"s{k}": (rng.standard_normal(3 * SR) * 0.2).clip(-1, 1).astype(np.float32)
        for k in range(n_streams)
    }
    # tick schedule per stream: growing windows in 0.5 s steps from 1.5 s
    windows = {
        name: [audio[: int((1.5 + 0.5 * t) * SR)] for t in range(n_ticks)]
        for name, audio in streams.items()
    }

    write_lock = threading.Lock()
    responses = {}
    resp_lock = threading.Lock()

    def reader():
        for _ in range(n_streams * n_ticks):
            r = json.loads(from_server.readline())
            with resp_lock:
                responses[r["request_id"]] = r

    reader_thread = threading.Thread(target=reader)
    reader_thread.start()

    barrier = threading.Barrier(n_streams)

    def dictate(name, base_rid):
        barrier.wait()  # all streams start ticking together
        for t in range(n_ticks):
            cmd = json.dumps(
                {
                    "action": "transcribe",
                    "request_id": base_rid + t,
                    "audio_base64": _pcm_b64(windows[name][t]),
                    "audio_format": "pcm_s16le",
                    "sample_rate": SR,
                    "hot_words": ["SoakWordX"],
                    "options": {"stream": name},
                }
            )
            with write_lock:
                to_server.write(cmd + "\n")
                to_server.flush()

    threads = [
        threading.Thread(target=dictate, args=(name, 100 * (k + 1)))
        for k, name in enumerate(streams)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    reader_thread.join(timeout=300)
    assert not reader_thread.is_alive()

    # every request answered exactly once, successfully
    expected = {100 * (k + 1) + t for k in range(n_streams) for t in range(n_ticks)}
    assert set(responses) == expected
    assert all(r["success"] for r in responses.values()), {
        rid: r for rid, r in responses.items() if not r["success"]
    }

    # per-stream transcripts equal a clean sequential replay: same-stream
    # wire ordering is preserved, so the final tick must match a session
    # that saw the same growing windows alone
    from light_whisper_tpu.serving.session_bridge import SessionBridge

    for k, name in enumerate(streams):
        ref = SessionBridge(model)
        for t in range(n_ticks):
            want = ref.transcribe_extending(windows[name][t])
        final = responses[100 * (k + 1) + n_ticks - 1]
        assert final["raw_text"] == want.text, name

    stats = engine.performance_stats()
    assert stats["transcription_count"] == n_streams * n_ticks
    assert stats["session_hits"] + stats["session_resets"] >= n_streams * n_ticks
    assert stats["batched_tick_degrades"] == 0, stats

    to_server.write(json.dumps({"action": "exit", "request_id": 9999}) + "\n")
    to_server.flush()
