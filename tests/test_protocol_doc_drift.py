"""docs/PROTOCOL.md ↔ implementation drift guard.

The round-2 advisor caught a documented stats field the server never
emitted (`batches_coalesced`, since fixed). This pins the contract both
ways for the stats action: every field the doc's stats example documents
must appear in a real ``performance_stats()`` payload, and every top-level
field the server emits must be documented — so neither side can drift
silently again. A REAL tiny model is used (not a fake) so the conditional
sections the doc describes — per-stream KV sessions, the device
scheduler — actually come into existence.
"""

import base64
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer

DOC = os.path.join(os.path.dirname(__file__), os.pardir, "docs", "PROTOCOL.md")


def _documented_stats_keys():
    text = open(DOC, encoding="utf-8").read()
    section = text.split("### stats", 1)[1].split("###", 1)[0]
    block = section.split("```json", 1)[1].split("```", 1)[0]
    # keys of the "stats" object: everything quoted and followed by a colon,
    # excluding the envelope and nested-object internals we don't pin flat
    keys = set(re.findall(r'"([a-zA-Z_0-9]+)":', block))
    keys -= {"success", "request_id", "stats"}
    # nested objects documented with their own internals
    nested_internals = {
        "asr", "vad", "punc",  # models_loaded
        "hits", "resets",  # session_streams entries
        "count", "p50_ms", "p95_ms", "batches", "batched_jobs",  # scheduler
        # init_phases entries (tags are dynamic: loader attribution +
        # whichever warmup phases ran)
        "model_load_s", "model_load_parse_s", "model_load_host_prep_s",
        "model_load_device_upload_s", "vad_warmup_s", "model_warmup_s",
        "ladder_sync_s", "warmup_total_s",
    }
    return keys - nested_internals


class FullSpanVad:
    def speech_timestamps(self, audio):
        return [{"start": 0, "end": len(audio)}]

    def warmup(self):
        pass


def _pcm_b64(x):
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    return base64.b64encode(pcm.tobytes()).decode()


def test_documented_stats_fields_all_emitted_and_vice_versa(tmp_path):
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=True)
    model = Qwen3ASRModel(path, max_new_tokens=4)
    engine = Qwen3EngineServer(
        engine="qwen3-asr-0.6b",
        model_factory=lambda _p: model,
        vad_factory=lambda: FullSpanVad(),
        model_path=path,
    )
    assert engine.initialize()["success"]

    # one base window + one extension on the same stream: creates the KV
    # session pool (hit + reset counters), the scheduler, and VAD stats —
    # every conditional section the doc's stats example describes
    rng = np.random.default_rng(0)
    base = (rng.standard_normal(16_000).astype(np.float32) * 0.05)
    grown = np.concatenate([base, base[:8_000]])
    for window in (base, grown):
        result = engine.transcribe(
            audio_base64=_pcm_b64(window),
            audio_format="pcm_s16le",
            sample_rate=16_000,
            options={"stream": "docdrift"},
        )
        assert result["success"], result

    stats = engine.performance_stats()
    assert json.dumps(stats)  # the wire requires JSON-serializable stats

    documented = _documented_stats_keys()
    emitted = set(stats.keys())

    missing_from_server = documented - emitted
    assert not missing_from_server, (
        f"PROTOCOL.md documents stats fields the server never emitted: "
        f"{sorted(missing_from_server)}"
    )

    undocumented = emitted - documented
    assert not undocumented, (
        f"server emits undocumented stats fields (document them in "
        f"docs/PROTOCOL.md ### stats): {sorted(undocumented)}"
    )
