#!/usr/bin/env python3
"""w8a8 viability experiment (VERDICT r2 #5): int8×int8 MXU decode matmul.

llama.cpp's ``vec_dot_q8_0_q8_0`` quantizes activations to per-32-block int8
and contracts int8×int8 → int32, scaling per block. On the TPU the question
is whether that beats the shipped dequant-in-VMEM kernel
(``ops/q8_matmul``), which casts the int8 weight block to bf16 (VPU) and
runs ONE bf16 MXU contraction.

Hypothesis going in: decode is weight-DMA bound (~3.2 ms/step floor at
1.7B), the dequant VPU work overlaps the next block's DMA, so w8a8 moves
nothing — but the block-batched int8 formulation ALSO forces k=32 batched
contractions (MXU depth 128 → 4× underutilized) and an extra [nb, T, O]
int32 scratch. This measures both at 1.7B decode shapes so the call is
data, not vibes.

Variants (XLA-level; a Pallas port only makes sense if (b) wins here):
  a. bf16 dequant matmul — jnp mirror of the shipped kernel's math
  b. w8a8 block-batched — int8×int8 dot_general (batch = 32-blocks),
     per-block scale einsum in f32

Run on the TPU: ``python scripts/exp_w8a8.py``.
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

B = 32  # Q8_0 block


def log(msg):
    print(f"[w8a8 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def quantize_activations(x):
    """Per-32-block symmetric absmax int8 (llama.cpp quantize_row_q8_0)."""
    T, K = x.shape
    xb = x.reshape(T, K // B, B).astype(jnp.float32)
    scale = jnp.max(jnp.abs(xb), axis=-1, keepdims=True) / 127.0
    safe = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(xb / safe), -127, 127).astype(jnp.int8)
    return q.reshape(T, K), scale[..., 0].astype(jnp.float32)  # [T,K] int8, [T,K/B]


@jax.jit
def dequant_matmul(x, wq, ws):
    """(a) shipped math: dequantize weights to bf16, one MXU contraction."""
    w = wq.astype(jnp.bfloat16) * jnp.repeat(ws.astype(jnp.bfloat16), B, axis=1)
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def w8a8_matmul(x, wq, ws):
    """(b) int8×int8 per-block batched contraction + f32 scale combine."""
    T, K = x.shape
    O = wq.shape[0]
    xq, xs = quantize_activations(x)
    xb = xq.reshape(T, K // B, B).transpose(1, 0, 2)  # [nb, T, B]
    wb = wq.reshape(O, K // B, B).transpose(1, 0, 2)  # [nb, O, B]
    p = jax.lax.dot_general(
        xb, wb,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [nb, T, O] int32
    return jnp.einsum(
        "btn,tb,bn->tn".replace("n", "o"),
        p.astype(jnp.float32),
        xs,
        ws.astype(jnp.float32).T,
    )


def measure_rtt():
    """Median round-trip of a trivial dispatch through the relay."""
    one = jnp.float32(1.0)
    f = jax.jit(lambda v: v + 1.0)
    jax.device_get(f(one))
    samples = []
    for _ in range(9):
        t0 = time.perf_counter()
        jax.device_get(f(one))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2] * 1000


def bench(fn, x, wq, ws, rtt_ms, iters=256):
    """Iterate the op in ONE dispatch: single-op dispatches through the
    relay measure only the ~34 ms RTT, not sub-ms kernel time."""

    @jax.jit
    def run(x, wq, ws):
        def body(i, carry):
            out = fn(x + (carry * 1e-9).astype(x.dtype), wq, ws)
            return jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jax.device_get(run(x, wq, ws))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(run(x, wq, ws))
        best = min(best, time.perf_counter() - t0)
    return max(0.001, best * 1000 - rtt_ms) / iters


def main():
    log(f"devices: {jax.devices()}")
    rtt_ms = measure_rtt()
    log(f"relay rtt p50: {rtt_ms:.2f} ms (subtracted from in-dispatch timings)")
    rng = np.random.default_rng(0)
    # 1.7B decode shapes: the four projections
    shapes = {
        "qkv": (4096, 2048),
        "o": (2048, 2048),
        "gateup": (12288, 2048),
        "down": (2048, 6144),
    }
    T = 8  # decode row tile
    for name, (O, K) in shapes.items():
        x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, size=(O, K)).astype(np.int8))
        ws = jnp.asarray((rng.standard_normal((O, K // B)) * 0.01).astype(np.float32)).astype(jnp.bfloat16)

        a = bench(dequant_matmul, x, wq, ws, rtt_ms)
        b = bench(w8a8_matmul, x, wq, ws, rtt_ms)

        ya = np.asarray(dequant_matmul(x, wq, ws))
        yb = np.asarray(w8a8_matmul(x, wq, ws))
        denom = np.maximum(np.abs(ya), np.abs(ya).mean())
        rel = np.abs(ya - yb) / denom
        # Caveat on (a): XLA hoists the loop-invariant dequant out of the
        # timing loop, so (a) here reads 2x the real shipped-kernel bytes
        # (bf16 w instead of int8+VMEM dequant). If (b) loses even to this
        # handicapped (a), the w8a8 path is dead.
        log(
            f"{name} (O={O}, K={K}): dequant(hoisted) {a:.4f} ms, "
            f"w8a8 {b:.4f} ms ({a / b:.2f}x), max rel diff {rel.max():.4f}"
        )


if __name__ == "__main__":
    main()
