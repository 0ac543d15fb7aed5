#!/usr/bin/env python3
"""Hardware check for the row-batched decode (``forward_decode_batch``).

Two questions, answered on the real chip at flagship 1.7B shapes:

1. **Does the batched program compile through the relay?** It should be
   cheap: the stacked kernels at T=B=8 hit the exact Mosaic payloads the
   T=1 decode already pads to (block_t=8), so only the XLA glue is new.
2. **Does batching amortize the weight read?** Decode is weight-DMA bound
   (~3.2 ms/step floor); if the row-batched step stays near the
   single-stream cost, aggregate tokens/s multiplies by ~B.

Also asserts greedy-token parity: B identical streams must emit the same
tokens as one single-stream decode of the same prompt.

Run on the TPU: ``python scripts/exp_batched_decode.py [B ...]``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[batched {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import __graft_entry__ as graft
    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.models.qwen3_asr.model import _decode_greedy_batch

    sizes = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    model_size = os.environ.get("BENCH_MODEL", "1.7b")
    cfg = graft._flagship_config(model_size)
    t0 = time.perf_counter()
    _enc, decoder_params = graft._random_params(cfg, quantize_decoder=True)
    log(f"params ready in {time.perf_counter() - t0:.1f}s ({model_size})")
    log(f"device: {jax.devices()[0]}")

    steps = 64
    capacity = 1024
    pos0 = 160

    # --- single-stream reference cost ---------------------------------
    def single_run():
        cache = dec.init_cache(cfg.decoder, capacity)._replace(pos=jnp.int32(pos0))
        tokens, count, _c = dec.decode_greedy(
            cfg.decoder, decoder_params, jnp.int32(7), cache, -2, steps
        )
        return tokens, count

    t0 = time.perf_counter()
    tokens1, count1 = single_run()
    jax.device_get(count1)
    log(f"single-stream compile+run: {time.perf_counter() - t0:.1f}s")
    single_ms = []
    for _ in range(3):
        t0 = time.perf_counter()
        tokens1, count1 = single_run()
        n = int(jax.device_get(count1))
        single_ms.append((time.perf_counter() - t0) / max(n, 1) * 1000)
    single_ms.sort()
    ref_tokens = np.asarray(jax.device_get(tokens1))
    log(f"single-stream: {[round(v, 2) for v in single_ms]} ms/step")

    for B in sizes:
        def batched_run():
            caches = jax.vmap(lambda _: dec.init_cache(cfg.decoder, capacity))(
                jnp.arange(B)
            )
            caches = caches._replace(pos=jnp.full((B,), pos0, jnp.int32))
            firsts = jnp.full((B,), 7, jnp.int32)
            tokens, _c = _decode_greedy_batch(
                cfg.decoder, decoder_params, firsts, caches, -2, steps
            )
            return tokens

        t0 = time.perf_counter()
        tokens = jax.device_get(batched_run())
        log(f"B={B} compile+run: {time.perf_counter() - t0:.1f}s")

        # Parity: every identical stream must match the single-stream tokens
        # (same prompt position, same first token, same weights).
        n = int(jax.device_get(count1))
        got = np.asarray(tokens)
        for b in range(B):
            row = got[b][got[b] >= 0][:n]
            if not np.array_equal(row, ref_tokens[:n]):
                log(f"  PARITY MISMATCH stream {b}: {row[:8]} vs {ref_tokens[:8]}")
                break
        else:
            log(f"  parity OK: all {B} streams match single-stream tokens")

        ms = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(batched_run())
            ms.append((time.perf_counter() - t0) / steps * 1000)
        ms.sort()
        step_ms = ms[len(ms) // 2]
        attn_mode = (
            "kernel" if os.environ.get("LWT_BATCHED_ATTN", "1") not in ("", "0")
            else "xla"
        )
        log(
            f"B={B} [{attn_mode} attention]: {[round(v, 2) for v in ms]} ms/step → "
            f"{B / (step_ms / 1000):.0f} aggregate tok/s "
            f"(efficiency {single_ms[len(single_ms)//2] * B / step_ms:.1f}x of {B}x ideal)"
        )


if __name__ == "__main__":
    main()
