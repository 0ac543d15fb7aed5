#!/usr/bin/env python3
"""A/B: production decode_greedy (scanned stacked weights) vs a python-loop
decode over SEPARATE per-layer weight buffers.

bench_decode_step.py measured the bare matmul chain 0.17 ms/step faster on
per-layer buffers (3.19 vs 3.36 at 1.7B) — no scan carry threading, no
layer-gather feeding the kernels. This measures whether that survives in the
FULL decode step (attention + norms + logits + while_loop), which is what
could actually ship. Cost if landed: the per-layer buffers are materialized
slices — 2× decoder weights in HBM.

The layer body is a copy of decoder._layer_forward_stacked with the weight
index split from the cache index: weights come from [1, O, K] per-layer
stacks (index 0), the KV cache stays whole and uses the real (constant)
layer index.
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

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as graft  # noqa: E402
from light_whisper_tpu.models.qwen3_asr import decoder as dec  # noqa: E402
from light_whisper_tpu.ops.q8_matmul import (  # noqa: E402
    q8_matmul_pallas_stacked,
    q8_matmul_pallas_stacked_fused,
)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def log(msg):
    print(f"[unrolled {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    cfg = graft._flagship_config(os.environ.get("BENCH_MODEL", "1.7b"))
    d = cfg.decoder
    t0 = time.perf_counter()
    _, params = graft._random_params(cfg, quantize_decoder=True)
    log(f"params ready in {time.perf_counter() - t0:.1f}s")
    capacity = 1024

    # ---- baseline: production decode_greedy --------------------------------
    def full_baseline():
        cache = dec.init_cache(d, capacity)._replace(pos=jnp.int32(160))
        tokens, count, _cache = dec.decode_greedy(
            d, params, jnp.int32(7), cache, -2, STEPS
        )
        return tokens, count

    # ---- per-layer weight buffers ------------------------------------------
    layers = params["layers"]
    proj_names = [n for n in ("qkv", "o", "gateup", "down") if n in layers]
    per_layer = []
    for i in range(d.block_count):
        entry = {
            name: {
                "q": layers[name]["q"][i : i + 1],
                "s_t": layers[name]["s_t"][i : i + 1],
            }
            for name in proj_names
        }
        entry["small"] = {
            k: v[i]
            for k, v in layers.items()
            if k not in ("qkv", "o", "gateup", "down")
        }
        per_layer.append(entry)
    per_layer = jax.device_put(per_layer)  # materialize the copies
    log(f"per-layer buffers materialized ({d.block_count} layers)")

    groups = d.head_count // d.head_count_kv

    def layer_fwd(weights, small, layer_idx, x, k_all, v_all, pos, cos, sin):
        T = x.shape[0]
        hd = d.key_length
        n_kv = d.head_count_kv
        cap = k_all.shape[2]
        zero = jnp.int32(0)

        def proj_norm(name, h, norm_w):
            p = weights[name]
            return q8_matmul_pallas_stacked_fused(
                h, p["q"], p["s_t"], zero, norm_w=norm_w, eps=d.rms_epsilon
            )

        def proj_residual(name, h, residual):
            p = weights[name]
            return q8_matmul_pallas_stacked_fused(
                h, p["q"], p["s_t"], zero, residual=residual
            ).astype(residual.dtype)

        q, k, v = dec._split_qkv(d, proj_norm("qkv", x, small["attn_norm"]), T)
        q = dec.rms_norm(q, small["q_norm"], d.rms_epsilon)
        k = dec.rms_norm(k, small["k_norm"], d.rms_epsilon)
        q = dec.apply_rope(q, cos, sin)
        k = dec.apply_rope(k, cos, sin)

        k_all = jax.lax.dynamic_update_slice(
            k_all, k.transpose(1, 0, 2).astype(k_all.dtype)[None], (layer_idx, 0, pos, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.transpose(1, 0, 2).astype(v_all.dtype)[None], (layer_idx, 0, pos, 0)
        )

        q_positions = pos + jnp.arange(T)
        if d.dtype == jnp.bfloat16 and dec._use_attention_kernel(
            T, d.head_count, hd, cap, n_kv
        ):
            from light_whisper_tpu.ops.decode_attention import (
                decode_attention_pallas_stacked,
            )

            attn = decode_attention_pallas_stacked(
                q, k_all, v_all, q_positions, jnp.int32(layer_idx)
            ).astype(q.dtype)
        else:
            k_layer = jax.lax.dynamic_index_in_dim(k_all, layer_idx, keepdims=False)
            v_layer = jax.lax.dynamic_index_in_dim(v_all, layer_idx, keepdims=False)
            attn = dec._attention(q, k_layer, v_layer, q_positions, groups, d.dtype)

        x = proj_residual("o", attn.reshape(T, -1), x)
        gateup = proj_norm("gateup", x, small["ffn_norm"])
        gate, up = jnp.split(gateup, 2, axis=-1)
        x = proj_residual("down", (jax.nn.silu(gate) * up).astype(x.dtype), x)
        return x, k_all, v_all

    def forward_unrolled(params, embeds, cache):
        T = embeds.shape[0]
        positions = cache.pos + jnp.arange(T)
        cos, sin = dec.rope_tables(positions, d.key_length, d.rope_freq_base)
        x, k_all, v_all = embeds, cache.k, cache.v
        for i in range(d.block_count):
            x, k_all, v_all = layer_fwd(
                per_layer[i], per_layer[i]["small"], i, x, k_all, v_all,
                cache.pos, cos, sin,
            )
        x = dec.rms_norm(x, params["final_norm"], d.rms_epsilon)
        return x, dec.KVCache(k=k_all, v=v_all, pos=cache.pos + T)

    @functools.partial(jax.jit, static_argnames=("max_new",), donate_argnames=("cache",))
    def decode_greedy_unrolled(params, first_token, cache, eos, max_new):
        def cond(state):
            _tokens, count, _token, _cache, done = state
            return jnp.logical_and(jnp.logical_not(done), count < max_new)

        def step(state):
            tokens, count, token, cache, _done = state
            tokens = tokens.at[count].set(token)
            embeds = dec.embed_tokens(params, token[None])
            hidden, cache = forward_unrolled(params, embeds, cache)
            logits = dec.logits_for(d, params, hidden[-1:])
            next_token = jnp.argmax(logits[-1]).astype(jnp.int32)
            return tokens, count + 1, next_token, cache, next_token == eos

        tokens0 = jnp.zeros(max_new, dtype=jnp.int32)
        init = (
            tokens0, jnp.int32(0), first_token.astype(jnp.int32), cache,
            first_token.astype(jnp.int32) == eos,
        )
        tokens, count, _t, cache, _done = jax.lax.while_loop(cond, step, init)
        return tokens, count

    def full_unrolled():
        cache = dec.init_cache(d, capacity)._replace(pos=jnp.int32(160))
        return decode_greedy_unrolled(params, jnp.int32(7), cache, jnp.int32(-2), STEPS)

    results = {}
    for name, fn in (("baseline", full_baseline), ("unrolled-weights", full_unrolled)):
        t0 = time.perf_counter()
        tokens, count = fn()
        tok_np = np.asarray(tokens)
        log(f"{name} compile+warm: {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            tokens, count = fn()
            jax.device_get(count)
            best = min(best, time.perf_counter() - t0)
        results[name] = (best / STEPS * 1000, tok_np)
        log(f"{name}: {best / STEPS * 1000:.3f} ms/step ({best:.3f}s / {STEPS})")

    a, b = results["baseline"], results["unrolled-weights"]
    log(f"delta: {a[0] - b[0]:+.3f} ms/step (positive = unrolled wins)")
    log(
        "token parity: "
        + ("IDENTICAL" if np.array_equal(a[1], b[1]) else "DIFFERS (ULP near-ties expected on random weights)")
    )


if __name__ == "__main__":
    main()
