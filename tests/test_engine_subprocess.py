"""Full-stack integration: real engine subprocess over the real protocol.

Spawns ``light_whisper_tpu.runtime.engine_cli serve`` as a child process
(CPU JAX, tiny GGUF via ``LIGHT_WHISPER_MODEL_PATH``) and drives it with
``EngineClient`` — covering process spawn, init line, request correlation,
inline-PCM transcription and graceful shutdown, end to end.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.runtime.client import EngineClient


@pytest.mark.slow
def test_engine_subprocess_end_to_end(tmp_path):
    model_path = str(tmp_path / "tiny.gguf")
    write_tiny_model(model_path, quantize=False)

    env_patch = {
        "LIGHT_WHISPER_MODEL_PATH": model_path,
        "JAX_PLATFORMS": "cpu",
        "LIGHT_WHISPER_FORCE_CPU": "1",
    }
    old = {k: os.environ.get(k) for k in env_patch}
    os.environ.update(env_patch)
    try:
        client = EngineClient.spawn(
            engine="qwen3-asr-0.6b", data_dir=str(tmp_path / "data")
        )
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

    try:
        assert client.init_result["success"], client.init_result
        assert client.init_result["model_loaded"]

        status = client.status()
        assert status["initialized"] and status["models"]["asr"]

        rng = np.random.default_rng(0)
        samples = (rng.standard_normal(16000) * 3000).astype("<i2")
        result = client.transcribe_pcm16(samples, 16000)
        assert result["success"], result
        assert result["input_mode"] == "memory"
        assert "inference_ms" in result or result["text"] == ""

        stats = client.stats()
        assert stats["success"] and stats["stats"]["initialized"]
    finally:
        client.shutdown()
