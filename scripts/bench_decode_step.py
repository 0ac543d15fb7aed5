#!/usr/bin/env python3
"""Microbench: per-step decode cost breakdown for the 1.7B config.

Variants isolate where the per-step milliseconds go:
  full      — decode_greedy as shipped (the bench.py hot loop)
  matmuls   — scan over layers doing ONLY the 4 q8 matmuls (no attn/norm/rope)
  nologits  — full layer stack, no vocab projection
  unrollN   — full step with lax.scan(unroll=N) over layers

Usage: python scripts/bench_decode_step.py [steps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import __graft_entry__ as graft
    from light_whisper_tpu.models.qwen3_asr import decoder as dec

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = graft._flagship_config(os.environ.get("BENCH_MODEL", "1.7b"))
    _, params = graft._random_params(cfg, quantize_decoder=True)
    d = cfg.decoder
    capacity = 1024

    def timeit(name, fn, iters=5):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn()
            jax.device_get(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1000
        print(f"{name:>12}: {ms:7.3f} ms/step  ({best:.3f}s / {steps} steps)", flush=True)
        return ms

    # --- full decode_greedy ------------------------------------------------
    def full():
        # decode_greedy donates the cache: rebuild it per call.
        cache = dec.init_cache(d, capacity)._replace(pos=jnp.int32(160))
        tokens, count, _cache = dec.decode_greedy(
            d, params, jnp.int32(7), cache, -2, steps
        )
        return count

    timeit("full", full)

    cache0 = dec.init_cache(d, capacity)._replace(pos=jnp.int32(160))

    # --- full minus logits -------------------------------------------------
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def nologits(params, cache, n):
        def step(carry, _):
            x, cache = carry
            hidden, cache = dec.forward(d, params, x, cache)
            cache = cache._replace(pos=cache.pos - 1)  # stay in place
            return (hidden, cache), None

        x0 = jnp.zeros((1, d.embedding_length), jnp.bfloat16)
        (x, cache), _ = jax.lax.scan(step, (x0, cache), None, length=n)
        return x

    timeit("nologits", lambda: nologits(params, cache0, steps))

    # --- matmul chain only -------------------------------------------------
    from light_whisper_tpu.ops.linear import apply_linear

    @functools.partial(jax.jit, static_argnames=("n",))
    def matmuls(params, n):
        qdim = d.head_count * d.key_length

        def layer_body(x, layer):
            qkv = apply_linear(layer["qkv"], x)
            x = apply_linear(layer["o"], qkv[:, :qdim].astype(jnp.bfloat16)) \
                .astype(jnp.bfloat16)
            gu = apply_linear(layer["gateup"], x)
            g, u = jnp.split(gu, 2, axis=-1)
            x = apply_linear(layer["down"], (g * u).astype(jnp.bfloat16)) \
                .astype(jnp.bfloat16)
            return x, None

        def step(x, _):
            x, _ = jax.lax.scan(layer_body, x, params["layers"])
            return x, None

        x0 = jnp.zeros((1, d.embedding_length), jnp.bfloat16)
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    timeit("matmuls", lambda: matmuls(params, steps))

    # --- matmuls with T=8 (pad the token dim: same weight traffic) ---------
    @functools.partial(jax.jit, static_argnames=("n",))
    def matmuls8(params, n):
        qdim = d.head_count * d.key_length

        def layer_body(x, layer):
            qkv = apply_linear(layer["qkv"], x)
            x = apply_linear(layer["o"], qkv[:, :qdim].astype(jnp.bfloat16)) \
                .astype(jnp.bfloat16)
            gu = apply_linear(layer["gateup"], x)
            g, u = jnp.split(gu, 2, axis=-1)
            x = apply_linear(layer["down"], (g * u).astype(jnp.bfloat16)) \
                .astype(jnp.bfloat16)
            return x, None

        def step(x, _):
            x, _ = jax.lax.scan(layer_body, x, params["layers"])
            return x, None

        x0 = jnp.zeros((8, d.embedding_length), jnp.bfloat16)
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    timeit("matmuls T=8", lambda: matmuls8(params, steps))

    # --- matmuls, UNROLLED over per-layer separate buffers -----------------
    # Hypothesis: scan-over-stacked-weights makes XLA copy each layer's
    # sliced weights before the pallas custom call (~53 MB/layer/step).
    layer_list = [
        jax.tree.map(lambda leaf: leaf[i], params["layers"])
        for i in range(d.block_count)
    ]
    layer_list = jax.device_put(layer_list)

    @functools.partial(jax.jit, static_argnames=("n",))
    def matmuls_unrolled(layers, n):
        qdim = d.head_count * d.key_length

        def step(x, _):
            for layer in layers:
                qkv = apply_linear(layer["qkv"], x)
                x = apply_linear(layer["o"], qkv[:, :qdim].astype(jnp.bfloat16)) \
                    .astype(jnp.bfloat16)
                gu = apply_linear(layer["gateup"], x)
                g, u = jnp.split(gu, 2, axis=-1)
                x = apply_linear(layer["down"], (g * u).astype(jnp.bfloat16)) \
                    .astype(jnp.bfloat16)
            return x, None

        x0 = jnp.zeros((1, d.embedding_length), jnp.bfloat16)
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    timeit("unrolled", lambda: matmuls_unrolled(layer_list, steps))

    # --- matmuls via layer-indexed stacked kernel in a scan ----------------
    from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas_stacked

    stacked = {
        name: {
            "q": params["layers"][name]["q"],
            "s_t": params["layers"][name]["s"].astype(jnp.bfloat16).transpose(0, 2, 1),
        }
        for name in ("qkv", "o", "gateup", "down")
    }
    stacked = jax.device_put(stacked)

    @functools.partial(jax.jit, static_argnames=("n",))
    def matmuls_stacked(stacked, n):
        qdim = d.head_count * d.key_length

        def layer_body(x, idx):
            qkv = q8_matmul_pallas_stacked(
                x, stacked["qkv"]["q"], stacked["qkv"]["s_t"], idx
            )
            x = q8_matmul_pallas_stacked(
                qkv[:, :qdim].astype(jnp.bfloat16),
                stacked["o"]["q"], stacked["o"]["s_t"], idx,
            ).astype(jnp.bfloat16)
            gu = q8_matmul_pallas_stacked(
                x, stacked["gateup"]["q"], stacked["gateup"]["s_t"], idx
            )
            g, u = jnp.split(gu, 2, axis=-1)
            x = q8_matmul_pallas_stacked(
                (g * u).astype(jnp.bfloat16),
                stacked["down"]["q"], stacked["down"]["s_t"], idx,
            ).astype(jnp.bfloat16)
            return x, None

        def step(x, _):
            x, _ = jax.lax.scan(layer_body, x, jnp.arange(d.block_count))
            return x, None

        x0 = jnp.zeros((1, d.embedding_length), jnp.bfloat16)
        x, _ = jax.lax.scan(step, x0, None, length=n)
        return x

    timeit("stacked", lambda: matmuls_stacked(stacked, steps))

    # The k-permuted layout ("kperm") chain A/Bs that used to live here were
    # RETIRED with the layout itself (round 5): the decisive measurements —
    # "stacked kperm" 4.235 vs 4.19 ms/step, "kperm nox" 3.290 vs 3.374 —
    # are recorded in docs/SERVING.md; the probe survives self-contained in
    # scripts/exp_q8_kperm_probe.py (--bench reruns the alternating chain).

    # --- stacked with bk=1024/2048 (fewer reduction steps, bigger DMAs) ----
    from light_whisper_tpu.ops import q8_matmul as q8mod

    for bk in (1024, 2048):
        @functools.partial(jax.jit, static_argnames=("n",))
        def matmuls_stacked_bk(stacked, n, _bk=bk):
            qdim = d.head_count * d.key_length

            def mm(x, p, idx):
                T2 = x.shape[0]
                return q8mod._q8_matmul_stacked_2d(
                    x, p["q"], p["s_t"], idx, 8, 2048 if p["q"].shape[1] % 2048 == 0 else p["q"].shape[1], _bk
                )

            def layer_body(x, idx):
                qkv = mm(x, stacked["qkv"], idx)
                x = mm(qkv[:, :qdim].astype(jnp.bfloat16), stacked["o"], idx).astype(jnp.bfloat16)
                gu = mm(x, stacked["gateup"], idx)
                g, u = jnp.split(gu, 2, axis=-1)
                x = mm((g * u).astype(jnp.bfloat16), stacked["down"], idx).astype(jnp.bfloat16)
                return x, None

            def step(x, _):
                x, _ = jax.lax.scan(layer_body, x, jnp.arange(d.block_count))
                return x, None

            x0 = jnp.zeros((8, d.embedding_length), jnp.bfloat16)
            x, _ = jax.lax.scan(step, x0, None, length=n)
            return x

        try:
            timeit(f"stacked bk{bk}", lambda f=matmuls_stacked_bk: f(stacked, steps))
        except Exception as exc:
            print(f"stacked bk{bk}: FAILED {type(exc).__name__}: {str(exc)[:200]}")

    # weights bandwidth floor
    bytes_per_step = 0
    for leaf in jax.tree.leaves(params["layers"]):
        bytes_per_step += leaf.size * leaf.dtype.itemsize
    emb = params["embed"]
    logit_bytes = sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(emb))
    print(f"layer weights/step: {bytes_per_step/1e6:.0f} MB, logits head: {logit_bytes/1e6:.0f} MB")
    print(f"floor @580GB/s: {bytes_per_step/580e9*1000:.2f} ms (+logits {logit_bytes/580e9*1000:.2f} ms)")


if __name__ == "__main__":
    main()
