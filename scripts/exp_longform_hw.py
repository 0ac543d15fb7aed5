#!/usr/bin/env python3
"""Capstone hardware run: long-form transcription on the flagship model.

Drives a 75 s utterance through the REAL serving entry
(``Qwen3EngineServer.transcribe`` → long-form windowed batching →
``transcribe_batch`` → merged text) on the actual TPU with flagship-shaped
random Q8 weights — the one serving route bench.py and the TPU test runs
don't cover end-to-end on hardware at model scale. Reports the windows
planned, wall time, RTF, and the per-request stats the wire would carry.
"""

import base64
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as graft  # noqa: E402
from light_whisper_tpu.runtime.qwen3_server import Qwen3EngineServer  # noqa: E402

SECONDS = float(os.environ.get("LONGFORM_SECONDS", "75"))
SR = 16_000


class FullSpanVad:
    def speech_timestamps(self, audio):
        return [{"start": 0, "end": len(audio)}]

    def warmup(self):
        pass


def log(msg):
    print(f"[longform {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _bench_model(size):
    """Flagship-shaped Qwen3ASRModel over random Q8 weights (bench.py's
    construction: compute-equivalent, no artifact needed)."""
    import jax.numpy as jnp

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    cfg = graft._flagship_config(size)
    encoder_params, decoder_params = graft._random_params(cfg, quantize_decoder=True)
    model = Qwen3ASRModel.__new__(Qwen3ASRModel)
    model.config = cfg
    model.encoder_params = encoder_params
    model.decoder_params = decoder_params
    model.max_new_tokens = 48
    model.cache_dtype = jnp.bfloat16
    model.mesh = None
    model._cache_sharding = None
    model.prefix_ids = list(range(2, 10))
    model.suffix_ids = [3, 4, 5]
    model._caches = {}

    class _NoEosTokenizer:
        tokens = []

        def decode(self, ids, skip_special=True):
            return "a dictated long form sentence segment"

    model.tokenizer = _NoEosTokenizer()
    return model


def main():
    size = os.environ.get("BENCH_MODEL", "1.7b")
    t0 = time.perf_counter()
    model = _bench_model(size)
    log(f"model ready in {time.perf_counter() - t0:.1f}s ({size})")

    engine = Qwen3EngineServer(
        engine=f"qwen3-asr-{size}",
        model_factory=lambda _p: model,
        vad_factory=lambda: FullSpanVad(),
        model_path="/bench/synthetic.gguf",
    )
    init = engine.initialize()
    assert init["success"], init
    log("engine initialized (warmup done)")

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(1 << 16).astype(np.float32) * 0.05
    n = int(SECONDS * SR)
    audio = np.tile(audio, -(-n // audio.size))[:n]
    pcm = np.clip(audio * 32767, -32768, 32767).astype("<i2")
    b64 = base64.b64encode(pcm.tobytes()).decode()

    for mode, options in (("regular", {}), ("long-form", {"long_form": True})):
        for trial in range(3):
            t0 = time.perf_counter()
            result = engine.transcribe(
                audio_base64=b64,
                audio_format="pcm_s16le",
                sample_rate=SR,
                options=dict(options),
            )
            wall = time.perf_counter() - t0
            assert result["success"], result
            log(
                f"{mode} trial {trial}: {wall:.2f}s for {SECONDS:.0f}s audio → RTF "
                f"{wall / SECONDS:.4f} ({SECONDS / wall:.1f}x realtime); "
                f"windows={result.get('vad_segments')}, "
                f"long_form={result.get('long_form')}, "
                f"inference_ms={result.get('inference_ms')}"
            )
    stats = engine.performance_stats()
    log(
        f"stats: batch_dispatches={stats.get('batch_dispatches')}, "
        f"batched_requests={stats.get('batched_requests')}"
    )

    # ---- phase attribution (replicates transcribe_batch's body) ----------
    import jax
    import jax.numpy as jnp

    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.models.qwen3_asr.model import (
        PROMPT_BUCKET,
        _build_prompt_embeds,
        _decode_greedy_batch,
        _prefill_batch,
        _round_up,
        as_device_audio,
        bucket_audio_samples,
    )
    from light_whisper_tpu.serving.longform import plan_windows

    m = model
    segments = [{"start": 0, "end": len(audio)}]
    windows = plan_windows(segments, len(audio), 28.0)
    clips = [as_device_audio(audio[s:e]) for s, e in windows]
    log(f"windows: {[(round(s / SR, 1), round(e / SR, 1)) for s, e in windows]}")
    bucket = max(bucket_audio_samples(len(a)) for a in clips)

    t0 = time.perf_counter()
    embeds_list, n_audio_list = [], []
    for clip in clips:
        padded = np.zeros(bucket, dtype=clip.dtype)
        padded[: len(clip)] = clip
        e, _ = m._encode_padded(padded, true_samples=len(clip))
        jax.block_until_ready(e)
        embeds_list.append(e)
        n_audio_list.append(m._audio_tokens_for(len(clip)))
    log(f"encode {len(clips)} windows: {time.perf_counter() - t0:.2f}s")

    prompt_lens = [len(m.prefix_ids) + n + len(m.suffix_ids) for n in n_audio_list]
    bucket_len = _round_up(max(prompt_lens), PROMPT_BUCKET)
    ids_padded = np.full((len(clips), bucket_len), m.config.pad_token_id, np.int32)
    for row, n_audio in enumerate(n_audio_list):
        ids = m.prefix_ids + [m.config.audio_token_id] * n_audio + m.suffix_ids
        ids_padded[row, : len(ids)] = ids
    needed = bucket_len + m.max_new_tokens
    capacity = 1024
    while capacity < needed:
        capacity *= 2
    pad_to = 4
    padded_rows = list(range(len(clips))) + [0] * (pad_to - len(clips))

    t0 = time.perf_counter()
    embeds = jnp.stack(
        [
            _build_prompt_embeds(
                m.decoder_params, jnp.asarray(ids_padded[r]), embeds_list[r],
                jnp.int32(n_audio_list[r]), len(m.prefix_ids), m.config.decoder.dtype,
            )
            for r in padded_rows
        ]
    )
    jax.block_until_ready(embeds)
    log(f"prompt embeds: {time.perf_counter() - t0:.2f}s (shape {embeds.shape}, capacity {capacity})")

    t0 = time.perf_counter()
    caches = jax.vmap(lambda _: dec.init_cache(m.config.decoder, capacity, m.cache_dtype))(
        jnp.arange(pad_to)
    )
    jax.block_until_ready(caches.k)
    log(f"cache init: {time.perf_counter() - t0:.2f}s")

    lens = [prompt_lens[r] for r in padded_rows]
    t0 = time.perf_counter()
    firsts, caches = _prefill_batch(
        m.config.decoder, m.decoder_params, embeds, caches,
        jnp.asarray([l - 1 for l in lens], dtype=jnp.int32),
    )
    jax.block_until_ready(firsts)
    log(f"prefill batch (vmapped, B={pad_to}, T={embeds.shape[1]}): {time.perf_counter() - t0:.2f}s")

    caches = caches._replace(pos=jnp.asarray(lens, dtype=jnp.int32))
    t0 = time.perf_counter()
    tokens, _caches = _decode_greedy_batch(
        m.config.decoder, m.decoder_params, firsts, caches, m.config.eos_token_id,
        m.max_new_tokens,
    )
    jax.block_until_ready(tokens)
    log(f"decode batch ({m.max_new_tokens} steps, B={pad_to}, C={capacity}): {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
