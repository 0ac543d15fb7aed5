#!/usr/bin/env python3
"""Where does the non-decode part of RTF go? (v5e via relay)

Breaks the 12 s-utterance transcribe wall time into attributable terms,
using the in-dispatch-iteration + RTT-subtraction methodology (DEVNOTES
round-3: single-op dispatches through the relay measure the round trip,
not the op):

  - relay RTT (trivial program round trip)
  - host->device transfer: 12 s audio as f32 vs int16
  - mel frontend device time (in-dispatch x16)
  - encoder device time (in-dispatch x16)
  - full _encode_and_prefill dispatch wall (one dispatch, minus RTT)
  - decode loop wall for 40 tokens (the known ~4.3 ms/step x 40)

Run on the TPU: python scripts/exp_profile_rtf.py  (BENCH_MODEL=1.7b default)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import __graft_entry__ as graft
    from light_whisper_tpu.audio import mel as wmel
    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.models.qwen3_asr.config import conv_output_length
    from light_whisper_tpu.models.qwen3_asr.model import (
        PROMPT_BUCKET,
        _encode_and_prefill,
        _round_up,
        bucket_audio_samples,
    )

    model_size = os.environ.get("BENCH_MODEL", "1.7b")
    cfg = graft._flagship_config(model_size)
    encoder_params, decoder_params = graft._random_params(cfg, quantize_decoder=True)
    print(f"[profile] params ready ({model_size})", flush=True)

    sr = 16_000
    n_samples = 12 * sr
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(1 << 16).astype(np.float32) * 0.05)
    audio = np.tile(audio, -(-n_samples // audio.size))[:n_samples]

    # ---- RTT ----------------------------------------------------------
    trivial = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    jax.device_get(trivial(z))
    rtts = []
    for _ in range(15):
        t0 = time.perf_counter()
        jax.device_get(trivial(z))
        rtts.append((time.perf_counter() - t0) * 1000)
    rtts.sort()
    rtt = rtts[len(rtts) // 2]
    print(f"[profile] relay rtt p50: {rtt:.2f} ms", flush=True)

    # ---- transfer cost ------------------------------------------------
    consume = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def xfer_ms(arr, label):
        jax.device_get(consume(jnp.asarray(arr)))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(consume(jnp.asarray(arr)))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1000 - rtt
        print(f"[profile] transfer+consume {label}: {ms:.2f} ms (above rtt)", flush=True)
        return ms

    xfer_ms(audio, "12s f32 (768 KB)")
    pcm16 = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
    xfer_ms(pcm16, "12s int16 (384 KB)")
    xfer_ms(audio[: sr // 2], "0.5s f32 (32 KB)")

    # ---- mel device time ----------------------------------------------
    bucket = bucket_audio_samples(n_samples)
    padded = np.zeros(bucket, dtype=np.float32)
    padded[:n_samples] = audio
    mel_frames = wmel.num_mel_frames(bucket)
    wave_dev = jax.device_put(jnp.asarray(padded))

    from light_whisper_tpu.audio.mel import _log_mel_with_max

    def iterate(fn, x, params=None, iters=16):
        # params passed as a jit ARG: a closure-captured device array becomes
        # a baked-in constant, and the 1.7B encoder as literal bytes blows the
        # relay's request-size limit (HTTP 413).
        @jax.jit
        def run(x, params):
            def body(i, carry):
                out = fn(x + (carry * 1e-9).astype(x.dtype), params)
                return jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        jax.device_get(run(x, params))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(run(x, params))
            best = min(best, time.perf_counter() - t0)
        return max(0.0, (best * 1000 - rtt) / iters)

    mel_ms = iterate(lambda w, _p: _log_mel_with_max(w, mel_frames)[0], wave_dev)
    print(f"[profile] mel device: {mel_ms:.2f} ms", flush=True)

    # ---- encoder device time -------------------------------------------
    from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks

    chunk = cfg.audio.chunk_frames
    num_chunks = max(1, (mel_frames + chunk - 1) // chunk)
    true_frames = wmel.num_mel_frames(n_samples)
    full, tail = divmod(true_frames, chunk)
    n_audio = full * cfg.audio.tokens_per_chunk + (conv_output_length(tail) if tail else 0)
    mel_dev = jax.device_put(
        jnp.zeros((num_chunks * chunk, cfg.audio.num_mel_bins), jnp.float32)
    )
    enc_ms = iterate(
        lambda m, p: encode_chunks(cfg.audio, p, m, jnp.int32(n_audio), num_chunks),
        mel_dev,
        params=encoder_params,
        iters=8,
    )
    print(f"[profile] encoder device: {enc_ms:.2f} ms", flush=True)

    # conv-only split
    from light_whisper_tpu.models.qwen3_asr.encoder import _conv2d

    x0 = jnp.zeros((num_chunks, 1, chunk, cfg.audio.num_mel_bins), jnp.float32)

    def convs(x, p):
        import jax.nn as jnn

        x = jnn.gelu(_conv2d(x, p["conv1"]["w"], p["conv1"]["b"]), approximate=False)
        x = jnn.gelu(_conv2d(x, p["conv2"]["w"], p["conv2"]["b"]), approximate=False)
        x = jnn.gelu(_conv2d(x, p["conv3"]["w"], p["conv3"]["b"]), approximate=False)
        return x

    conv_ms = iterate(convs, x0, params=encoder_params, iters=8)
    print(f"[profile] encoder convs (f32) device: {conv_ms:.2f} ms", flush=True)

    # ---- full pre-decode dispatch wall ---------------------------------
    prefix_len = 8
    prefix_ids = list(range(2, 2 + prefix_len))
    suffix_ids = [3, 4, 5]
    ids = prefix_ids + [cfg.audio_token_id] * n_audio + suffix_ids
    true_len = len(ids)
    bucket_len = _round_up(true_len, PROMPT_BUCKET)
    ids_padded = np.full(bucket_len, 0, dtype=np.int32)
    ids_padded[:true_len] = ids

    def predecode():
        cache = dec.init_cache(cfg.decoder, 1024)
        first, cache, _clip = _encode_and_prefill(
            cfg,
            encoder_params,
            decoder_params,
            jnp.asarray(padded),
            jnp.int32(n_audio),
            jnp.asarray(ids_padded),
            jnp.int32(true_len - 1),
            cache,
            num_chunks,
            mel_frames,
            prefix_len,
        )
        return first, cache

    t0 = time.perf_counter()
    first, cache = predecode()
    jax.device_get(first)
    print(f"[profile] predecode first call (compile?): {time.perf_counter() - t0:.1f}s", flush=True)
    pre_ms = []
    for _ in range(5):
        t0 = time.perf_counter()
        first, cache = predecode()
        jax.device_get(first)
        pre_ms.append((time.perf_counter() - t0) * 1000)
    pre_ms.sort()
    print(
        f"[profile] predecode dispatch wall p50: {pre_ms[len(pre_ms)//2]:.1f} ms "
        f"(min {pre_ms[0]:.1f}; includes transfer + rtt)",
        flush=True,
    )

    # ---- decode wall ---------------------------------------------------
    cache = cache._replace(pos=jnp.int32(true_len))
    t0 = time.perf_counter()
    tokens, count, _c = dec.decode_greedy(cfg.decoder, decoder_params, first, cache, -2, 40)
    n = int(jax.device_get(count))
    first_decode = (time.perf_counter() - t0) * 1000
    dec_ms = []
    for _ in range(3):
        c2 = dec.init_cache(cfg.decoder, 1024)._replace(pos=jnp.int32(true_len))
        t0 = time.perf_counter()
        _t, cnt, _c = dec.decode_greedy(cfg.decoder, decoder_params, jnp.int32(7), c2, -2, 40)
        jax.device_get(cnt)
        dec_ms.append((time.perf_counter() - t0) * 1000)
    dec_ms.sort()
    print(
        f"[profile] decode 40 tokens wall p50: {dec_ms[len(dec_ms)//2]:.1f} ms "
        f"(first {first_decode:.1f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
