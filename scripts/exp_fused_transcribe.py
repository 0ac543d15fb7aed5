#!/usr/bin/env python3
"""A/B: two-dispatch transcribe (prefill program + decode program) vs ONE
fused program (mel → encoder → splice → prefill → greedy while_loop).

Motivation: the headline utterance path pays host↔device round trips per
dispatch. JAX async dispatch *may* pipeline the two executes through the
relay, or the relay may serialize them (one blocking RPC each) — DEVNOTES
round-3 measured the predecode dispatch at RTT+transfer+8 ms and decode at
RTT+170 ms as separate blocking calls, but never measured the chained pair
against a single program. This answers whether a fused `_transcribe_fused`
saves a relay RTT (~29 ms of a ~229 ms utterance) or nothing.

Methodology: same shapes as bench.py's headline (12 s bucket, 40-token
budget, DECODE_TOKENS-less EOS so the loop runs its full budget), fresh
donated cache per run, median of 5 walls after 2 warmups per arm.
"""

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

import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as graft  # noqa: E402
from light_whisper_tpu.audio import mel as wmel  # noqa: E402
from light_whisper_tpu.models.qwen3_asr import decoder as dec  # noqa: E402
from light_whisper_tpu.models.qwen3_asr.config import conv_output_length  # noqa: E402
from light_whisper_tpu.models.qwen3_asr.model import (  # noqa: E402
    PROMPT_BUCKET,
    _encode_and_prefill,
    _round_up,
    as_device_audio,
    bucket_audio_samples,
)

AUDIO_SECONDS = 12.0
DECODE_TOKENS = 40


def log(msg):
    print(f"[fusedx {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    model_size = os.environ.get("BENCH_MODEL", "1.7b")
    cfg = graft._flagship_config(model_size)
    t0 = time.perf_counter()
    encoder_params, decoder_params = graft._random_params(cfg, quantize_decoder=True)
    log(f"params ready in {time.perf_counter() - t0:.1f}s ({model_size})")

    sample_rate = 16_000
    n_samples = int(AUDIO_SECONDS * sample_rate)
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(1 << 16).astype(np.float32) * 0.05
    audio = np.tile(audio, -(-n_samples // audio.size))[:n_samples]
    audio = (
        np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
    ).astype(np.float32) / 32768.0

    prefix_len = 8
    prefix_ids = list(range(2, 2 + prefix_len))
    suffix_ids = [3, 4, 5]

    device_audio = as_device_audio(audio)
    bucket = bucket_audio_samples(len(device_audio))
    padded = np.zeros(bucket, dtype=device_audio.dtype)
    padded[: len(device_audio)] = device_audio

    chunk = cfg.audio.chunk_frames
    mel_frames = wmel.num_mel_frames(bucket)
    true_frames = wmel.num_mel_frames(len(audio))
    num_chunks = max(1, (mel_frames + chunk - 1) // chunk)
    full, tail = divmod(true_frames, chunk)
    n_audio = full * cfg.audio.tokens_per_chunk + (conv_output_length(tail) if tail else 0)

    ids = prefix_ids + [cfg.audio_token_id] * n_audio + suffix_ids
    true_len = len(ids)
    bucket_len = _round_up(true_len, PROMPT_BUCKET)
    ids_padded = np.full(bucket_len, 0, dtype=np.int32)
    ids_padded[:true_len] = ids

    capacity = 1024
    while capacity < bucket_len + DECODE_TOKENS:
        capacity *= 2

    import functools

    @functools.partial(
        jax.jit,
        static_argnames=("num_chunks", "mel_frames", "prefix_len", "max_new"),
        donate_argnames=("cache",),
    )
    def transcribe_fused(
        enc_p, dec_p, waveform, n_audio, ids, last_index, cache,
        eos, num_chunks, mel_frames, prefix_len, max_new,
    ):
        first, cache, clip_max = _encode_and_prefill(
            cfg, enc_p, dec_p, waveform, n_audio, ids, last_index, cache,
            num_chunks, mel_frames, prefix_len,
        )
        cache = cache._replace(pos=(last_index + 1).astype(jnp.int32))
        tokens, count, _cache = dec.decode_greedy(
            cfg.decoder, dec_p, first, cache, eos, max_new
        )
        return tokens, count, clip_max

    def run_two_dispatch():
        cache = dec.init_cache(cfg.decoder, capacity)
        first, cache, _clip = _encode_and_prefill(
            cfg, encoder_params, decoder_params,
            jnp.asarray(padded), jnp.int32(n_audio), jnp.asarray(ids_padded),
            jnp.int32(true_len - 1), cache, num_chunks, mel_frames, prefix_len,
        )
        cache = cache._replace(pos=jnp.int32(true_len))
        tokens, count, _cache = dec.decode_greedy(
            cfg.decoder, decoder_params, first, cache, -2, DECODE_TOKENS
        )
        return np.asarray(tokens), int(jax.device_get(count))

    def run_fused():
        cache = dec.init_cache(cfg.decoder, capacity)
        tokens, count, _clip = transcribe_fused(
            encoder_params, decoder_params,
            jnp.asarray(padded), jnp.int32(n_audio), jnp.asarray(ids_padded),
            jnp.int32(true_len - 1), cache,
            jnp.int32(-2), num_chunks, mel_frames, prefix_len, DECODE_TOKENS,
        )
        return np.asarray(tokens), int(jax.device_get(count))

    results = {}
    for name, fn in (("two-dispatch", run_two_dispatch), ("fused", run_fused)):
        for i in range(2):
            t0 = time.perf_counter()
            tokens, count = fn()
            log(f"{name} warmup {i}: {time.perf_counter() - t0:.1f}s (count={count})")
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            tokens, count = fn()
            walls.append((time.perf_counter() - t0) * 1000)
        walls.sort()
        results[name] = (walls, tokens, count)
        log(f"{name}: median {walls[2]:.1f} ms, walls {[round(w, 1) for w in walls]}")

    ta, ca = results["two-dispatch"][1], results["two-dispatch"][2]
    tb, cb = results["fused"][1], results["fused"][2]
    same = ca == cb and bool(np.array_equal(ta[:ca], tb[:cb]))
    log(f"token parity: {'IDENTICAL' if same else 'DIFFERS (near-tie ULP flips are expected on random weights)'}")
    d = results["two-dispatch"][0][2] - results["fused"][0][2]
    log(f"fused saves {d:.1f} ms median")


if __name__ == "__main__":
    main()
