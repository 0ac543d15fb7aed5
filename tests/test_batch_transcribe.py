"""Batched multi-stream transcription vs per-stream decoding."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import write_tiny_model

from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model") / "tiny.gguf")
    write_tiny_model(path, quantize=False)
    return Qwen3ASRModel(path, max_new_tokens=10)


def test_batch_matches_sequential_same_bucket(model):
    rng = np.random.default_rng(0)
    audios = [
        (rng.standard_normal(8000) * 0.3).astype(np.float32) for _ in range(3)
    ]
    sequential = [model.transcribe(a) for a in audios]
    batched = model.transcribe_batch(audios)
    assert [r.tokens for r in batched] == [r.tokens for r in sequential]
    assert [r.text for r in batched] == [r.text for r in sequential]


def test_batch_mixed_lengths_smoke(model):
    rng = np.random.default_rng(1)
    audios = [
        (rng.standard_normal(8000) * 0.3).astype(np.float32),
        (rng.standard_normal(17000) * 0.3).astype(np.float32),
    ]
    results = model.transcribe_batch(audios)
    assert len(results) == 2
    for r in results:
        assert isinstance(r.text, str)
        assert all(t >= 0 for t in r.tokens)


def test_batch_chunked_matches_sequential(model, monkeypatch):
    """More rows than LWT_MAX_DECODE_BATCH: the chunk loop (with a padded
    tail chunk) must still reproduce per-stream output exactly."""
    monkeypatch.setenv("LWT_MAX_DECODE_BATCH", "3")
    rng = np.random.default_rng(7)
    audios = [
        (rng.standard_normal(8000) * 0.3).astype(np.float32) for _ in range(7)
    ]
    sequential = [model.transcribe(a) for a in audios]
    batched = model.transcribe_batch(audios)
    assert [r.tokens for r in batched] == [r.tokens for r in sequential]


def test_batch_size_buckets_to_pow2(model, monkeypatch):
    """3 concurrent streams must run as a padded batch of 4: every distinct
    batch size is a fresh XLA program (minutes through a remote-compile
    relay), so B buckets to powers of two like every other shape axis."""
    import light_whisper_tpu.models.qwen3_asr.model as mmod

    seen = []
    real = mmod._prefill_batch

    def recording(cfg, params, embeds, caches, last_indices):
        seen.append(int(embeds.shape[0]))
        return real(cfg, params, embeds, caches, last_indices)

    monkeypatch.setattr(mmod, "_prefill_batch", recording)
    rng = np.random.default_rng(4)
    audios = [
        (rng.standard_normal(8000) * 0.3).astype(np.float32) for _ in range(3)
    ]
    sequential = [model.transcribe(a) for a in audios]
    batched = model.transcribe_batch(audios)
    assert seen == [4]  # 3 rows padded into the B=4 bucket, one dispatch
    assert [r.tokens for r in batched] == [r.tokens for r in sequential]


def test_batch_singleton_and_empty(model):
    assert model.transcribe_batch([]) == []
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    single = model.transcribe_batch([audio])
    assert single[0].tokens == model.transcribe(audio).tokens


def test_multistream_concurrent_matches_sequential(model):
    """Concurrent requests coalesce into one batch and match per-stream output."""
    import threading
    import time

    from light_whisper_tpu.serving.multistream import MultiStreamTranscriber
    from light_whisper_tpu.serving.scheduler import EngineScheduler

    rng = np.random.default_rng(7)
    audios = [
        (rng.standard_normal(8000) * 0.3).astype(np.float32) for _ in range(3)
    ]
    sequential = [model.transcribe(a) for a in audios]

    scheduler = EngineScheduler()
    ms = MultiStreamTranscriber(model, scheduler=scheduler)
    try:
        # Hold the worker so all three requests are queued together.
        gate = threading.Event()
        started = threading.Event()
        scheduler.submit("hold", lambda: (started.set(), gate.wait(5)))
        started.wait(5)

        results = [None] * 3
        batch_calls = []
        orig = ms._run_batch

        def counting(payloads):
            batch_calls.append(len(payloads))
            return orig(payloads)

        ms._run_batch = counting

        def call(i):
            results[i] = ms.transcribe(f"stream{i}", audios[i], timeout=120)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        time.sleep(0.3)  # let all three enqueue behind the gate
        gate.set()
        for t in threads:
            t.join(timeout=120)

        assert batch_calls == [3]
        assert [r.tokens for r in results] == [r.tokens for r in sequential]
    finally:
        scheduler.shutdown()


def test_precise_mode_batch_matches_sequential(tmp_path):
    """precise=True (f32 fidelity mode) must hold through transcribe_batch:
    the batched prompt embeds were silently built in bf16, diverging from
    the per-stream path long-form routes around."""
    import jax.numpy as jnp

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=False)
    m = Qwen3ASRModel(path, max_new_tokens=8, precise=True)
    assert m.config.decoder.dtype == jnp.float32
    rng = np.random.default_rng(3)
    audios = [
        (rng.standard_normal(16000) * 0.1).astype(np.float32) for _ in range(2)
    ]
    solo = [m.transcribe(a) for a in audios]
    batch = m.transcribe_batch(audios)
    for s, b in zip(solo, batch):
        assert s.tokens == b.tokens


def test_batch_rejects_context_overflow(tmp_path):
    """The batched path gets _cache_for's clean overflow error instead of
    silently decoding past trained RoPE positions."""
    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=False)
    m = Qwen3ASRModel(path, max_new_tokens=8)
    ctx = m.config.decoder.context_length
    # enough audio tokens to overflow the tiny context
    seconds = (ctx * 4 * 160) / 16000  # ~4 mel frames per token heuristic
    audio = np.zeros(int(seconds * 16000) + 16000, dtype=np.float32)
    try:
        m.transcribe_batch([audio])
    except ValueError as exc:
        assert "exceeds context" in str(exc)
    else:
        # tiny config's context fit this audio — assert the guard directly
        with pytest.raises(ValueError, match="exceeds context"):
            m._cache_for(ctx + 1)
