#!/usr/bin/env python3
"""Relay compile-ceiling experiment: land the fused stacked Q8 kernels.

Round-2 DEVNOTES: the production 1.7B decode program compiles in ~5 min,
but swapping in the norm-prologue/residual-epilogue fused kernels at all
four projection sites crossed the relay's ~30-40 min per-request compile
wall. The axon plugin compiles LAZILY (``.lower().compile()`` returns
instantly; the remote Mosaic/XLA compile happens at first execution), so
every probe here executes once and times the first call.

Weights are ``jnp.zeros`` created ON DEVICE — no relay data transfer; only
compile time + one tiny execution is measured.

  e1 — each fused payload standalone at 1.7B shapes, inside a lax.scan.
  e2 — the full fused decode_greedy program (1.7B, capacity 1024, one
       step), then a variant program (different max_new_tokens) to detect
       server-side payload caching across compile requests.

Run on the axon TPU: `python scripts/exp_fused_compile.py [e1|e2|all]`.
"""

import os
import sys
import time

os.environ["LWT_FUSED_DECODE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas_stacked_fused

L, D, F = 28, 2048, 6144
SITES = {
    "qkv": (4096, D, "norm"),
    "o": (D, 2048, "res"),
    "gateup": (2 * F, D, "norm"),
    "down": (D, F, "res"),
}


def log(msg):
    print(f"[exp {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def e1():
    for name, (O, K, mode) in SITES.items():
        q = jnp.zeros((L, O, K), jnp.int8)
        s_t = jnp.zeros((L, K // 32, O), jnp.bfloat16)
        norm = jnp.ones((K,), jnp.float32)
        res = jnp.zeros((1, O), jnp.float32)

        @jax.jit
        def f(x, q, s_t, aux):
            def step(c, i):
                if mode == "norm":
                    y = q8_matmul_pallas_stacked_fused(c, q, s_t, i, norm_w=aux)
                else:
                    y = q8_matmul_pallas_stacked_fused(c, q, s_t, i, residual=aux)
                return c, y[:, :1]
            _, ys = jax.lax.scan(step, x, jnp.arange(4))
            return ys

        x = jnp.zeros((1, K), jnp.bfloat16)
        aux = norm if mode == "norm" else res
        t0 = time.time()
        jax.device_get(f(x, q, s_t, aux))
        t1 = time.time()
        jax.device_get(f(x, q, s_t, aux))
        log(
            f"E1 {name} ({mode}, O={O}, K={K}): first {t1 - t0:.1f}s, "
            f"steady {time.time() - t1:.3f}s"
        )


def _run_decode(max_new):
    import __graft_entry__ as graft
    from light_whisper_tpu.models.qwen3_asr import decoder as dec

    cfg = graft._flagship_config("1.7b")
    d = cfg.decoder
    qdim = d.head_count * d.key_length
    kvdim = d.head_count_kv * d.key_length

    def q8z(out_f, in_f):
        return {
            "q": jnp.zeros((d.block_count, out_f, in_f), jnp.int8),
            "s": jnp.zeros((d.block_count, out_f, in_f // 32), jnp.bfloat16),
            "s_t": jnp.zeros((d.block_count, in_f // 32, out_f), jnp.bfloat16),
        }

    vocab_padded = -(-d.vocab_size // 1024) * 1024
    params = {
        "embed": {
            "q": jnp.zeros((vocab_padded, d.embedding_length), jnp.int8),
            "s": jnp.zeros((vocab_padded, d.embedding_length // 32), jnp.bfloat16),
        },
        "layers": {
            "attn_norm": jnp.ones((d.block_count, d.embedding_length), jnp.float32),
            "qkv": q8z(qdim + 2 * kvdim, d.embedding_length),
            "o": q8z(d.embedding_length, qdim),
            "q_norm": jnp.ones((d.block_count, d.key_length), jnp.float32),
            "k_norm": jnp.ones((d.block_count, d.key_length), jnp.float32),
            "ffn_norm": jnp.ones((d.block_count, d.embedding_length), jnp.float32),
            "gateup": q8z(2 * d.feed_forward_length, d.embedding_length),
            "down": q8z(d.embedding_length, d.feed_forward_length),
        },
        "final_norm": jnp.ones((d.embedding_length,), jnp.float32),
    }

    def fresh_cache():
        return dec.init_cache(d, 1024)._replace(pos=jnp.int32(160))

    t0 = time.time()
    tokens, count, _ = dec.decode_greedy(
        d, params, jnp.int32(7), fresh_cache(), -2, max_new
    )
    n = int(jax.device_get(count))
    t1 = time.time()
    tokens, count, _ = dec.decode_greedy(
        d, params, jnp.int32(7), fresh_cache(), -2, max_new
    )
    n = int(jax.device_get(count))
    t2 = time.time()
    log(
        f"E2 fused decode_greedy max_new={max_new}: first {t1 - t0:.1f}s, "
        f"steady {(t2 - t1) / max(n, 1) * 1000:.2f} ms/step over {n} steps"
    )


def e2():
    _run_decode(64)
    _run_decode(40)


def e3():
    """Seed the fused-FFN megakernel payload, then the full decode program
    with LWT_FUSED_FFN=1 (norm→gate/up→silu·mul→down→residual in ONE
    launch: 2 fewer kernel entries per layer step than e2's folded
    projections)."""
    os.environ["LWT_FUSED_FFN"] = "1"
    from light_whisper_tpu.ops.fused_ffn import fused_ffn_step

    D, F = 2048, 6144
    gateup_q = jnp.zeros((L, 2 * F, D), jnp.int8)
    gateup_st = jnp.zeros((L, D // 32, 2 * F), jnp.bfloat16)
    down_q = jnp.zeros((L, D, F), jnp.int8)
    down_st = jnp.zeros((L, F // 32, D), jnp.bfloat16)
    norm = jnp.ones((D,), jnp.float32)

    @jax.jit
    def f(x):
        def step(c, i):
            y = fused_ffn_step(c, norm, gateup_q, gateup_st, down_q, down_st, i)
            return c, y[:, :1]

        _, ys = jax.lax.scan(step, x, jnp.arange(4))
        return ys

    x = jnp.zeros((1, D), jnp.bfloat16)
    t0 = time.time()
    jax.device_get(f(x))
    t1 = time.time()
    jax.device_get(f(x))
    log(f"E3 ffn payload seed: first {t1 - t0:.1f}s, steady {time.time() - t1:.3f}s")
    _run_decode(64)
    _run_decode(40)


def e4():
    """Seed + time the flash-prefill attention payload at the long-form
    bench shape (T=512 queries vs a 32k cache, GQA 16/8, hd 128)."""
    from light_whisper_tpu.ops.flash_prefill import flash_prefill_attention

    T, H, Hkv, hd, C = 512, 16, 8, 128, 32768
    q = jnp.zeros((T, H, hd), jnp.bfloat16)
    k = jnp.zeros((Hkv, C, hd), jnp.bfloat16)
    v = jnp.zeros((Hkv, C, hd), jnp.bfloat16)
    qpos = jnp.arange(C - T, C, dtype=jnp.int32)

    # Fetch a SCALAR reduction: device_get of the full [512,16,128] output
    # costs ~100 ms of relay transfer alone and swamps the kernel time.
    f = jax.jit(lambda q, k, v, p: jnp.sum(flash_prefill_attention(q, k, v, p)))
    t0 = time.time()
    jax.device_get(f(q, k, v, qpos))
    t1 = time.time()
    best = float("inf")
    for _ in range(5):
        ts = time.time()
        jax.device_get(f(q, k, v, qpos))
        best = min(best, time.time() - ts)
    log(f"E4 flash prefill 32k: first {t1 - t0:.1f}s, steady {best * 1000:.2f} ms (scalar fetch)")

    from light_whisper_tpu.models.qwen3_asr.decoder import _attention_chunked

    g = jax.jit(lambda q, k, v, p: jnp.sum(_attention_chunked(q, k, v, p, H // Hkv, jnp.bfloat16)))
    jax.device_get(g(q, k, v, qpos))
    best = float("inf")
    for _ in range(5):
        ts = time.time()
        jax.device_get(g(q, k, v, qpos))
        best = min(best, time.time() - ts)
    log(f"E4 chunked XLA 32k (same process): steady {best * 1000:.2f} ms (scalar fetch)")


def e5():
    """True device-side per-layer prefill attention time: iterate the op
    N times inside ONE dispatch (single-op dispatches measure only the
    relay RTT, ~34 ms — e4's scalar-fetch numbers bottomed out there)."""
    from light_whisper_tpu.models.qwen3_asr.decoder import _attention_chunked
    from light_whisper_tpu.ops.flash_prefill import flash_prefill_attention

    T, H, Hkv, hd, C = 512, 16, 8, 128, 32768
    N = 16
    q = jnp.ones((T, H, hd), jnp.bfloat16) * 0.01
    k = jnp.ones((Hkv, C, hd), jnp.bfloat16) * 0.01
    v = jnp.ones((Hkv, C, hd), jnp.bfloat16) * 0.01
    qpos = jnp.arange(C - T, C, dtype=jnp.int32)

    def iterate(attn_fn):
        @jax.jit
        def run(q, k, v, p):
            def body(i, carry):
                # carry feeds q so iterations can't be CSE'd away
                out = attn_fn(q + carry * 1e-9, k, v, p)
                return jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        return run

    for name, fn in (
        ("flash", lambda q, k, v, p: flash_prefill_attention(q, k, v, p)),
        ("chunked", lambda q, k, v, p: _attention_chunked(q, k, v, p, H // Hkv, jnp.bfloat16)),
    ):
        run = iterate(fn)
        t0 = time.time()
        jax.device_get(run(q, k, v, qpos))
        t1 = time.time()
        best = float("inf")
        for _ in range(3):
            ts = time.time()
            jax.device_get(run(q, k, v, qpos))
            best = min(best, time.time() - ts)
        per_layer = (best * 1000 - 34.0) / N  # subtract one RTT
        log(
            f"E5 {name} x{N} in-dispatch: first {t1 - t0:.1f}s, "
            f"wall {best * 1000:.1f} ms -> ~{per_layer:.2f} ms/layer"
        )


def e6():
    """Contiguous-bk tiling (LWT_BK2048): seed every payload the 1.7B decode
    program needs at the new (bo=1024, bk=2048) tiling — the four fused
    projection sites plus the unstacked logits kernel — then compile + time
    the full decode program. Run the baseline e2 in a SEPARATE process (env
    is read at trace time) and compare ms/step."""
    os.environ["LWT_BK2048"] = "1"
    e1()  # four fused projection payloads at the gated tiling
    from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas

    V, D2 = 152576, 2048  # 1.7B tied-embed logits shape (vocab padded to 1024)
    qv = jnp.zeros((V, D2), jnp.int8)
    sv = jnp.zeros((V, D2 // 32), jnp.bfloat16)

    @jax.jit
    def flogit(x, qv, sv):
        return q8_matmul_pallas(x, qv, sv)[:, :8]

    x = jnp.zeros((1, D2), jnp.bfloat16)
    t0 = time.time()
    jax.device_get(flogit(x, qv, sv))
    log(f"E6 logits payload seed: first {time.time() - t0:.1f}s")
    _run_decode(64)
    _run_decode(40)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log(f"devices: {jax.devices()}")
    if which in ("all", "e1"):
        e1()
    if which in ("all", "e2"):
        e2()
    if which == "e3":
        e3()
    if which == "e4":
        e4()
    if which == "e5":
        e5()
    if which == "e6":
        e6()
    log("done")
