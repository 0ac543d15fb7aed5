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


@pytest.mark.slow
def test_dictate_subcommand_end_to_end(tmp_path):
    """``engine_cli dictate`` replays a WAV through the recording stack:
    JSON interim/final events on stdout, exit 0."""
    import json
    import subprocess

    from light_whisper_tpu.audio.pcm import encode_wav_mono_s16
    from light_whisper_tpu.eval.speechlike import speechlike

    model_path = str(tmp_path / "tiny.gguf")
    write_tiny_model(model_path, quantize=True)
    wav_path = str(tmp_path / "say.wav")
    with open(wav_path, "wb") as f:
        f.write(encode_wav_mono_s16(speechlike(1.5, seed=13), 16_000))

    env = dict(
        os.environ,
        LIGHT_WHISPER_MODEL_PATH=model_path,
        LIGHT_WHISPER_FORCE_CPU="1",
        LIGHT_WHISPER_DATA_DIR=str(tmp_path / "data"),
    )
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "light_whisper_tpu.runtime.engine_cli",
            "dictate",
            "--wav",
            wav_path,
            "--no-realtime",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    events = [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]
    finals = [e for e in events if e["event"] == "final"]
    assert len(finals) == 1
    final = finals[0]
    assert not final["too_short"]
    assert final["duration_seconds"] == pytest.approx(1.5, abs=0.01)
    assert final["text"]
