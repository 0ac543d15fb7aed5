"""Qwen3 decoder in JAX: GQA + per-head q/k RMSNorm + NeoX RoPE + SwiGLU.

Replaces the LM half of transcribe.cpp's GGUF runtime
(``qwen3_asr_server.py:317-321`` — persistent KV session, greedy decode).
TPU-first choices:

- layer parameters are stacked on a leading axis and the layer loop is a
  ``lax.scan`` (one compiled layer body, not ``block_count`` inlined copies);
- the KV cache is a preallocated static-shape buffer updated with
  ``dynamic_update_slice``; attention masks positions ≥ ``pos`` instead of
  reshaping (no dynamic shapes under jit);
- greedy decoding runs entirely on device in one ``lax.while_loop`` — one
  dispatch per utterance, not per token;
- matmuls run in bf16 with f32 accumulation; Q8_0 weights stay int8 in HBM
  (see ``ops.linear``).

RoPE uses the HF half-split ("rotate_half") layout. GGUF artifacts produced
by this package's export tool store q/k projections in that layout; artifacts
converted from llama.cpp ordering need the loader's permutation adapter.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from light_whisper_tpu.models.qwen3_asr.config import DecoderConfig
from light_whisper_tpu.ops.linear import apply_linear

NEG_INF = -1e30


class KVCache(NamedTuple):
    """Static-shape per-layer key/value buffers plus the write position.

    Layout is head-major (``[L, Hkv, C, hd]``) so the decode-attention
    kernel can stream each head's keys/values contiguously without a
    per-step transpose of the whole cache."""

    k: jax.Array  # [L, Hkv, C, hd]
    v: jax.Array  # [L, Hkv, C, hd]
    pos: jax.Array  # int32 scalar: number of valid positions


def init_cache(cfg: DecoderConfig, capacity: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.block_count, cfg.head_count_kv, capacity, cfg.key_length)
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        pos=jnp.int32(0),
    )


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale * weight.astype(jnp.float32)).astype(x.dtype)


def rope_tables(positions: jax.Array, head_dim: int, base: float) -> Tuple[jax.Array, jax.Array]:
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, hd/2]
    cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)
    sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)
    return cos, sin


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [T, H, hd]; cos/sin: [T, hd] (float32 math, HF rotate_half)."""
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    out = xf * cos[:, None, :] + rotated * sin[:, None, :]
    return out.astype(x.dtype)


_PROJ_NAMES = ("qkv", "o", "gateup", "down")


def prepare_stacked_scales(params: Dict) -> Dict:
    """Attach pre-transposed scales (``s_t``) to stacked Q8 projections.

    The layer-indexed Pallas kernel wants scales as ``[L, in/32, out]`` so
    their lane dim is the 128-aligned out-features axis. Transposing once at
    load time keeps the transpose out of the decode ``while_loop`` (XLA's
    loop-invariant motion is not guaranteed for materializing ops). Dense
    and kernel-incompatible projections pass through untouched.
    """
    layers = params.get("layers")
    if not isinstance(layers, dict):
        return params
    new_layers = dict(layers)
    for name in _PROJ_NAMES:
        p = layers.get(name)
        if not isinstance(p, dict) or "q" not in p or "s_t" in p:
            continue
        _, out_f, in_f = p["q"].shape
        if out_f < 256 or out_f % 128 != 0 or in_f % 512 != 0:
            continue
        new_layers[name] = dict(
            p, s_t=jnp.asarray(p["s"]).astype(jnp.bfloat16).transpose(0, 2, 1)
        )
    return dict(params, layers=new_layers)


def _use_fused_stacked() -> bool:
    """Fold rms-norm prologues / residual epilogues into the stacked Q8
    kernels (``q8_matmul_pallas_stacked_fused``). Same single-contraction
    kernel shape the remote compiler accepts under a scan; the folds remove
    the XLA glue ops between the four projection launches of every layer
    step. Rounding is bit-identical to the unfused path (the residual add
    happens at the same bf16 precision the unfused epilogue used).

    Default ON: proven under the relay compile ceiling in round 3 by
    seeding each fused payload standalone first (``scripts/
    exp_fused_compile.py`` e1), after which the full 1.7B decode program
    compiles in ~4.6 min and steps at 4.93 ms (was 6.02 unfused).
    ``LWT_FUSED_DECODE=0`` restores the unfused kernels. Applied only at
    decode-shaped T (see call site) so prefill keeps its existing proven
    payloads."""
    import os

    return os.environ.get("LWT_FUSED_DECODE", "1") not in ("", "0")


def _use_fused_ffn() -> bool:
    """Route the decode FFN half through the single-launch megakernel
    (``ops/fused_ffn.fused_ffn_step``). Off by default: the 3-contraction
    body needs its Mosaic payload seeded standalone before the full decode
    program fits under the relay's compile wall (``LWT_FUSED_FFN=1`` after
    running ``scripts/exp_fused_compile.py``)."""
    import os

    return os.environ.get("LWT_FUSED_FFN", "0") not in ("", "0")


def _use_stacked_kernel(layers: Dict) -> bool:
    """All four projections carry prepared stacked-kernel scales on TPU."""
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    return isinstance(layers, dict) and all(
        isinstance(layers.get(name), dict) and "s_t" in layers[name]
        for name in _PROJ_NAMES
    )


def _use_attention_kernel(T: int, n_heads: int, hd: int, capacity: int, n_kv: int) -> bool:
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    from light_whisper_tpu.ops.decode_attention import usable

    return usable(T, n_heads, hd, capacity, n_kv)


def _use_batched_attention_kernel(
    B: int, n_heads: int, hd: int, capacity: int, n_kv: int
) -> bool:
    """Route the batched decode step's attention through the per-(stream,
    head) Pallas kernel (``decode_attention_pallas_batched``), which reads
    each stream's cache slice at a scalar-prefetched layer offset.

    Off by default: measured perf-NEUTRAL vs the XLA batched einsum at 1.7B
    B=8 (8.64 vs 8.63 ms/step — XLA fuses the per-layer cache slice into
    the contraction, so there was no materialization to save), and the XLA
    path costs zero extra Mosaic payloads under the relay compile ceiling.
    Same call as the fused-FFN megakernel (DEVNOTES). ``LWT_BATCHED_ATTN=1``
    enables it (payload compiles in ~14 s warm, token-parity verified on
    hardware)."""
    import os

    if os.environ.get("LWT_BATCHED_ATTN", "0") in ("", "0"):
        return False
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    from light_whisper_tpu.ops.decode_attention import usable_batched

    return usable_batched(B, n_heads, hd, capacity, n_kv)


# Above this capacity, prefill attention switches to the chunked
# online-softmax formulation: the one-shot einsum materializes
# [Hkv, G, T, C] f32 logits (≈1 GB at T=512, C=32k), which turns long-form
# prefill HBM-bound on scratch traffic rather than on the KV cache itself.
_CHUNKED_PREFILL_MIN_CAPACITY = 8192
_PREFILL_KEY_CHUNK = 1024


def _use_flash_prefill(T: int, hd: int, capacity: int) -> bool:
    """Single-launch Pallas online-softmax prefill (``ops/flash_prefill``).

    Opt-in (``LWT_FLASH_PREFILL=1``): the 2-contraction body inside the
    layer scan needs its Mosaic payload seeded standalone first
    (``scripts/exp_fused_compile.py e4``) to fit the remote compiler's
    per-request wall."""
    import os

    if os.environ.get("LWT_FLASH_PREFILL", "0") in ("", "0"):
        return False
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    from light_whisper_tpu.ops.flash_prefill import usable

    return usable(T, hd, capacity)


def _attention_chunked(
    q: jax.Array,  # [T, Hq, hd]
    k_cache: jax.Array,  # [Hkv, C, hd]
    v_cache: jax.Array,
    q_positions: jax.Array,  # [T]
    head_groups: int,
    dtype,
) -> jax.Array:
    """Flash-style causal attention: scan key chunks with a running
    (max, denominator, accumulator) triple. Peak memory is O(T·chunk)
    instead of O(T·C); every cache byte is still read exactly once.
    Reference motivation: transcribe.cpp's 32k-ctx sessions
    (``qwen3_asr_server.py:114-133``) on long-form audio.
    """
    n_kv, capacity, hd = k_cache.shape
    T, n_heads, _ = q.shape
    scale = hd ** -0.5
    chunk = _PREFILL_KEY_CHUNK
    n_chunks = capacity // chunk

    qg = (
        q.reshape(T, n_kv, head_groups, hd).transpose(1, 2, 0, 3).astype(dtype)
    )  # [Hkv, G, T, hd]

    def body(carry, chunk_idx):
        m, l, acc = carry
        base = chunk_idx * chunk
        k_chunk = jax.lax.dynamic_slice(
            k_cache, (0, base, 0), (n_kv, chunk, hd)
        ).astype(dtype)
        v_chunk = jax.lax.dynamic_slice(
            v_cache, (0, base, 0), (n_kv, chunk, hd)
        ).astype(dtype)
        logits = jnp.einsum(
            "kgtd,kcd->kgtc", qg, k_chunk, preferred_element_type=jnp.float32
        ) * scale  # [Hkv, G, T, chunk]
        mask = (base + jnp.arange(chunk))[None, :] <= q_positions[:, None]
        logits = jnp.where(mask[None, None, :, :], logits, NEG_INF)

        m_new = jnp.maximum(m, logits.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "kgtc,kcd->kgtd", p.astype(dtype), v_chunk,
            preferred_element_type=jnp.float32,
        )
        return (m_new, l, acc), None

    init = (
        jnp.full((n_kv, head_groups, T, 1), NEG_INF, jnp.float32),
        jnp.zeros((n_kv, head_groups, T, 1), jnp.float32),
        jnp.zeros((n_kv, head_groups, T, hd), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    # Every query attends to at least its own position, so l ≥ exp(0) > 0.
    out = acc / l
    return out.transpose(2, 0, 1, 3).reshape(T, n_heads, hd).astype(q.dtype)


def _attention(
    q: jax.Array,  # [T, Hq, hd]
    k_cache: jax.Array,  # [Hkv, C, hd]
    v_cache: jax.Array,  # [Hkv, C, hd]
    q_positions: jax.Array,  # [T] absolute positions of the queries
    head_groups: int,
    dtype=jnp.bfloat16,  # matmul operand dtype (f32 in precise mode)
) -> jax.Array:
    """Causal attention of new queries against the full (masked) cache."""
    n_kv, capacity, hd = k_cache.shape
    T, n_heads, _ = q.shape
    scale = hd ** -0.5

    if dtype == jnp.bfloat16 and _use_attention_kernel(T, n_heads, hd, capacity, n_kv):
        from light_whisper_tpu.ops.decode_attention import decode_attention_pallas

        return decode_attention_pallas(q, k_cache, v_cache, q_positions).astype(q.dtype)

    if (
        T > 1
        and capacity >= _CHUNKED_PREFILL_MIN_CAPACITY
        and capacity % _PREFILL_KEY_CHUNK == 0
    ):
        if dtype == jnp.bfloat16 and _use_flash_prefill(T, hd, capacity):
            from light_whisper_tpu.ops.flash_prefill import flash_prefill_attention

            return flash_prefill_attention(q, k_cache, v_cache, q_positions)
        return _attention_chunked(q, k_cache, v_cache, q_positions, head_groups, dtype)

    # Grouped-query attention without materializing repeated K/V: the cache
    # (the dominant HBM traffic during decode) is read once per step.
    # Head-major ordering keeps both contractions canonical batched matmuls
    # (batch = kv head), which every backend's dot path supports.
    qg = (
        q.reshape(T, n_kv, head_groups, hd).transpose(1, 2, 0, 3)
    )  # [Hkv, G, T, hd]
    logits = jnp.einsum(
        "kgtd,kcd->kgtc", qg.astype(dtype), k_cache.astype(dtype),
        preferred_element_type=jnp.float32,
    ) * scale  # [Hkv, G, T, C]

    key_pos = jnp.arange(capacity)
    mask = key_pos[None, :] <= q_positions[:, None]  # [T, C] causal + validity
    logits = jnp.where(mask[None, None, :, :], logits, NEG_INF)

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "kgtc,kcd->kgtd", weights.astype(dtype), v_cache.astype(dtype),
        preferred_element_type=jnp.float32,
    )  # [Hkv, G, T, hd]
    return out.transpose(2, 0, 1, 3).reshape(T, n_heads, hd).astype(q.dtype)


def _split_qkv(cfg: DecoderConfig, qkv: jax.Array, T: int):
    """Split a fused [T, (Hq+2·Hkv)·hd] projection into q/k/v head tensors.

    q/k/v are stored fused (one kernel launch instead of three — launch
    count dominates decode steps with 28 scanned layers)."""
    hd = cfg.key_length
    qdim = cfg.head_count * hd
    kvdim = cfg.head_count_kv * hd
    q = qkv[:, :qdim].reshape(T, cfg.head_count, hd)
    k = qkv[:, qdim : qdim + kvdim].reshape(T, cfg.head_count_kv, hd)
    v = qkv[:, qdim + kvdim :].reshape(T, cfg.head_count_kv, hd)
    return q, k, v


def _layer_forward(
    cfg: DecoderConfig,
    layer: Dict[str, jax.Array],
    x: jax.Array,  # [T, D]
    k_cache: jax.Array,  # [C, Hkv, hd]
    v_cache: jax.Array,
    pos: jax.Array,  # int32: cache fill level == absolute position of x[0]
    cos: jax.Array,
    sin: jax.Array,
    proj=None,  # (name, h) → h @ W_name.T; defaults to this layer's params
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    T = x.shape[0]
    hd = cfg.key_length
    groups = cfg.head_count // cfg.head_count_kv
    if proj is None:
        proj = lambda name, h: apply_linear(layer[name], h)

    h = rms_norm(x, layer["attn_norm"], cfg.rms_epsilon)
    q, k, v = _split_qkv(cfg, proj("qkv", h), T)

    q = rms_norm(q, layer["q_norm"], cfg.rms_epsilon)
    k = rms_norm(k, layer["k_norm"], cfg.rms_epsilon)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # cache is head-major: write the (small) new K/V transposed to [Hkv, T, hd]
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k.transpose(1, 0, 2).astype(k_cache.dtype), (0, pos, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v.transpose(1, 0, 2).astype(v_cache.dtype), (0, pos, 0)
    )

    q_positions = pos + jnp.arange(T)
    attn = _attention(q, k_cache, v_cache, q_positions, groups, cfg.dtype)
    x = x + proj("o", attn.reshape(T, -1)).astype(x.dtype)

    h = rms_norm(x, layer["ffn_norm"], cfg.rms_epsilon)
    gateup = proj("gateup", h)
    gate, up = jnp.split(gateup, 2, axis=-1)
    x = x + proj("down", (jax.nn.silu(gate) * up).astype(x.dtype)).astype(x.dtype)
    return x, k_cache, v_cache


def _layer_forward_stacked(
    cfg: DecoderConfig,
    layers: Dict,  # full stacked params (closure constants for the kernels)
    layer_small: Dict,  # this layer's norm weights (scanned slices, tiny)
    idx: jax.Array,  # int32 layer index
    x: jax.Array,  # [T, D]
    k_all: jax.Array,  # [L, Hkv, C, hd] — whole cache, updated in place
    v_all: jax.Array,
    pos: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One layer through the layer-indexed kernels; cache stays whole."""
    from light_whisper_tpu.ops.q8_matmul import (
        q8_matmul_pallas_stacked,
        q8_matmul_pallas_stacked_fused,
    )

    T = x.shape[0]
    hd = cfg.key_length
    groups = cfg.head_count // cfg.head_count_kv
    n_kv = cfg.head_count_kv
    capacity = k_all.shape[2]
    # Fused folds only at decode-shaped T: that's where per-step glue
    # dominates; prefill (T ≥ 64) is compute-bound and keeps the unfused
    # payloads the relay has already compiled.
    fused = T <= 8 and _use_fused_stacked()

    def proj(name, h):
        p = layers[name]
        return q8_matmul_pallas_stacked(h, p["q"], p["s_t"], idx)

    def proj_norm(name, h, norm_w):
        """rms-norm prologue folded into the projection kernel."""
        if not fused:
            return proj(name, rms_norm(h, norm_w, cfg.rms_epsilon))
        p = layers[name]
        return q8_matmul_pallas_stacked_fused(
            h, p["q"], p["s_t"], idx, norm_w=norm_w, eps=cfg.rms_epsilon
        )

    def proj_residual(name, h, residual):
        """residual-add epilogue folded into the projection kernel."""
        if not fused:
            return residual + proj(name, h).astype(residual.dtype)
        p = layers[name]
        return q8_matmul_pallas_stacked_fused(
            h, p["q"], p["s_t"], idx, residual=residual
        ).astype(residual.dtype)

    q, k, v = _split_qkv(
        cfg, proj_norm("qkv", x, layer_small["attn_norm"]), T
    )
    q = rms_norm(q, layer_small["q_norm"], cfg.rms_epsilon)
    k = rms_norm(k, layer_small["k_norm"], cfg.rms_epsilon)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    k_all = jax.lax.dynamic_update_slice(
        k_all, k.transpose(1, 0, 2).astype(k_all.dtype)[None], (idx, 0, pos, 0)
    )
    v_all = jax.lax.dynamic_update_slice(
        v_all, v.transpose(1, 0, 2).astype(v_all.dtype)[None], (idx, 0, pos, 0)
    )

    q_positions = pos + jnp.arange(T)
    if cfg.dtype == jnp.bfloat16 and _use_attention_kernel(
        T, cfg.head_count, hd, capacity, n_kv
    ):
        from light_whisper_tpu.ops.decode_attention import (
            decode_attention_pallas_stacked,
        )

        attn = decode_attention_pallas_stacked(
            q, k_all, v_all, q_positions, idx
        ).astype(q.dtype)
    else:
        k_layer = jax.lax.dynamic_slice(
            k_all, (idx, 0, 0, 0), (1, n_kv, capacity, hd)
        )[0]
        v_layer = jax.lax.dynamic_slice(
            v_all, (idx, 0, 0, 0), (1, n_kv, capacity, hd)
        )[0]
        attn = _attention(q, k_layer, v_layer, q_positions, groups, cfg.dtype)

    x = proj_residual("o", attn.reshape(T, -1), x)
    if fused and _use_fused_ffn() and "q" in layers["gateup"]:
        # Whole FFN half (norm → gate/up → silu·mul → down → residual) in
        # ONE launch: 2 fewer kernel entries + no [T, F] round trip per
        # layer step. The 3-contraction body only compiles under the relay
        # ceiling once its Mosaic payload has been seeded standalone
        # (scripts/exp_fused_compile.py) — hence the separate gate.
        from light_whisper_tpu.ops.fused_ffn import fused_ffn_step

        gu, dn = layers["gateup"], layers["down"]
        x = fused_ffn_step(
            x,
            layer_small["ffn_norm"],
            gu["q"],
            gu["s_t"],
            dn["q"],
            dn["s_t"],
            idx,
            eps=cfg.rms_epsilon,
        ).astype(x.dtype)
    else:
        gateup = proj_norm("gateup", x, layer_small["ffn_norm"])
        gate, up = jnp.split(gateup, 2, axis=-1)
        x = proj_residual("down", (jax.nn.silu(gate) * up).astype(x.dtype), x)
    return x, k_all, v_all


def forward(
    cfg: DecoderConfig,
    params: Dict,
    embeds: jax.Array,  # [T, D] input embeddings (token + spliced audio)
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Run all layers over T new positions; returns hidden states + cache."""
    T = embeds.shape[0]
    positions = cache.pos + jnp.arange(T)
    cos, sin = rope_tables(positions, cfg.key_length, cfg.rope_freq_base)
    layers = params["layers"]

    if _use_stacked_kernel(layers):
        # Layer-indexed path: the scan carries only the hidden state and the
        # WHOLE cache; the big Q8 stacks and the KV cache stay in place in
        # HBM and the kernels DMA the current layer's blocks directly at a
        # scalar-prefetched offset. Slicing stacked weights/cache in the
        # scan makes XLA materialize per-layer copies (~50 MB weights +
        # ~8 MB cache per layer per step) — measured 7.5 → 5.0 ms/step on
        # the 1.7B decode when removed (scripts/bench_decode_step.py).
        small = {
            name: value for name, value in layers.items() if name not in _PROJ_NAMES
        }

        def body(carry, layer_inputs):
            x, k_all, v_all = carry
            idx, layer_small = layer_inputs
            x, k_all, v_all = _layer_forward_stacked(
                cfg, layers, layer_small, idx, x, k_all, v_all, cache.pos, cos, sin
            )
            return (x, k_all, v_all), None

        # Measured dead end (bench_decode_step.py, 1.7B, 256-step walls):
        # scan(unroll=block_count) REGRESSES 4.34 → 5.13 ms/step — with
        # constant layer indices XLA folds the stacked-buffer gathers into
        # static slices feeding the kernels, re-materializing exactly the
        # per-layer weight copies this scan design exists to avoid. (The
        # matmul chain over SEPARATE pre-materialized per-layer buffers
        # does run 0.17 ms/step faster than this scan — 3.19 vs 3.36 —
        # but capturing it means duplicating the decoder weights in HBM or
        # dropping the stacked layout; deferred, see ROADMAP.)
        (x, new_k, new_v), _ = jax.lax.scan(
            body,
            (embeds, cache.k, cache.v),
            (jnp.arange(cfg.block_count), small),
        )
    else:

        def body(carry, layer_inputs):
            x = carry
            layer, k_cache, v_cache = layer_inputs
            x, k_cache, v_cache = _layer_forward(
                cfg, layer, x, k_cache, v_cache, cache.pos, cos, sin
            )
            return x, (k_cache, v_cache)

        x, (new_k, new_v) = jax.lax.scan(
            body, embeds, (layers, cache.k, cache.v)
        )
    x = rms_norm(x, params["final_norm"], cfg.rms_epsilon)
    return x, KVCache(k=new_k, v=new_v, pos=cache.pos + T)


def make_train_layer(cfg: DecoderConfig, T: int):
    """Scanned layer body for the cache-free causal forward.

    Returns ``layer_fn(x, layer) -> (x, None)`` over a [T, D] sequence —
    shared by :func:`forward_train` and the pipeline-parallel stages
    (``parallel/pipeline.py``), so both paths run identical layer math.
    """
    positions = jnp.arange(T)
    cos, sin = rope_tables(positions, cfg.key_length, cfg.rope_freq_base)
    hd = cfg.key_length
    groups = cfg.head_count // cfg.head_count_kv
    causal = positions[None, :] <= positions[:, None]  # [T, T]

    def layer_fn(x, layer):
        h = rms_norm(x, layer["attn_norm"], cfg.rms_epsilon)
        q, k, v = _split_qkv(cfg, apply_linear(layer["qkv"], h), T)
        q = rms_norm(q, layer["q_norm"], cfg.rms_epsilon)
        k = rms_norm(k, layer["k_norm"], cfg.rms_epsilon)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        qg = q.reshape(T, cfg.head_count_kv, groups, hd)
        logits = jnp.einsum(
            "qkgd,ckd->kgqc", qg.astype(cfg.dtype), k.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        ) * (hd ** -0.5)
        logits = jnp.where(causal[None, None], logits, NEG_INF)
        weights = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum(
            "kgqc,ckd->qkgd", weights.astype(cfg.dtype), v.astype(cfg.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(T, cfg.head_count, hd).astype(x.dtype)
        x = x + apply_linear(layer["o"], attn.reshape(T, -1)).astype(x.dtype)
        h = rms_norm(x, layer["ffn_norm"], cfg.rms_epsilon)
        gateup = apply_linear(layer["gateup"], h)
        gate, up = jnp.split(gateup, 2, axis=-1)
        x = x + apply_linear(layer["down"], (jax.nn.silu(gate) * up).astype(x.dtype)).astype(x.dtype)
        return x, None

    return layer_fn


def forward_train(cfg: DecoderConfig, params: Dict, embeds: jax.Array) -> jax.Array:
    """Cache-free causal forward over a full sequence (training / scoring).

    embeds: [T, D] → hidden states [T, D]. Differentiable; uses the same
    layer math as :func:`forward` but dense causal attention instead of a
    cache, which is the natural formulation for fine-tuning.
    """
    layer_fn = make_train_layer(cfg, embeds.shape[0])
    x, _ = jax.lax.scan(layer_fn, embeds, params["layers"])
    return rms_norm(x, params["final_norm"], cfg.rms_epsilon)


def logits_for(cfg: DecoderConfig, params: Dict, hidden: jax.Array) -> jax.Array:
    head = params.get("lm_head")
    if head is not None:
        logits = apply_linear(head, hidden)
    else:
        embed = params["embed"]
        if "q" in embed:
            # Tied Q8_0 embedding doubles as the output head ([V, D] = [out, in]).
            logits = apply_linear(embed, hidden)
        else:
            logits = jax.lax.dot_general(
                hidden.astype(cfg.dtype),
                embed["w"].astype(cfg.dtype),  # [V, D]
                dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if logits.shape[-1] > cfg.vocab_size:
        # The embedding rows are padded to a kernel-friendly tile multiple;
        # padded slots must never win the argmax.
        slot = jnp.arange(logits.shape[-1])
        logits = jnp.where(slot >= cfg.vocab_size, NEG_INF, logits)
    return logits


def embed_tokens(params: Dict, ids: jax.Array) -> jax.Array:
    embed = params["embed"]
    if "q" in embed:
        from light_whisper_tpu.formats.gguf import Q8_0_BLOCK

        rows_q = embed["q"][ids].astype(jnp.bfloat16)  # [T, D]
        rows_s = jnp.repeat(embed["s"][ids].astype(jnp.bfloat16), Q8_0_BLOCK, axis=-1)
        return rows_q * rows_s
    return embed["w"][ids]


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill(
    cfg: DecoderConfig,
    params: Dict,
    embeds: jax.Array,
    cache: KVCache,
) -> Tuple[jax.Array, KVCache]:
    """Process the prompt; returns logits of the final position + cache."""
    hidden, cache = forward(cfg, params, embeds, cache)
    return logits_for(cfg, params, hidden[-1:]), cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens"), donate_argnames=("cache",)
)
def decode_greedy(
    cfg: DecoderConfig,
    params: Dict,
    first_token: jax.Array,  # int32 scalar: argmax after prefill
    cache: KVCache,
    eos_token_id: int,
    max_new_tokens: int,
    budget: Optional[jax.Array] = None,  # dynamic cap ≤ max_new_tokens
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """On-device greedy loop. Returns (tokens [max_new], count, cache).

    ``tokens[:count]`` are the generated ids excluding EOS. One jit dispatch
    decodes the whole utterance (reference: the C++ session loops in native
    code for the same reason). ``budget`` lets speculative callers shrink
    the step count without a recompile (array sizes stay ``max_new_tokens``).
    """
    limit = jnp.int32(max_new_tokens) if budget is None else jnp.minimum(
        jnp.int32(max_new_tokens), budget.astype(jnp.int32)
    )

    def cond(state):
        _tokens, count, token, _cache, done = state
        return jnp.logical_and(jnp.logical_not(done), count < limit)

    def step(state):
        tokens, count, token, cache, _done = state
        tokens = tokens.at[count].set(token)
        embeds = embed_tokens(params, token[None])
        hidden, cache = forward(cfg, params, embeds, cache)
        logits = logits_for(cfg, params, hidden[-1:])
        next_token = jnp.argmax(logits[-1]).astype(jnp.int32)
        done = next_token == eos_token_id
        return tokens, count + 1, next_token, cache, done

    tokens0 = jnp.zeros(max_new_tokens, dtype=jnp.int32)
    init = (
        tokens0,
        jnp.int32(0),
        first_token.astype(jnp.int32),
        cache,
        first_token.astype(jnp.int32) == eos_token_id,
    )
    tokens, count, _token, cache, _done = jax.lax.while_loop(cond, step, init)
    return tokens, count, cache


# ---------------------------------------------------------------------------
# Batched decode: B independent streams, weights read once per step
# ---------------------------------------------------------------------------


def _attention_decode_batch(
    q: jax.Array,  # [B, H, hd] — one query per stream
    k_layer: jax.Array,  # [B, Hkv, C, hd] — per-stream cache, this layer
    v_layer: jax.Array,
    pos: jax.Array,  # [B] — per-stream fill level (== query position)
    head_groups: int,
    dtype,
) -> jax.Array:
    """Per-stream decode attention: row ``b`` attends to its own cache,
    masked to positions ≤ ``pos[b]`` (its just-written slot included)."""
    B, n_heads, hd = q.shape
    n_kv, capacity = k_layer.shape[1], k_layer.shape[2]
    scale = hd ** -0.5
    qg = q.reshape(B, n_kv, head_groups, hd)
    logits = jnp.einsum(
        "bkgd,bkcd->bkgc", qg.astype(dtype), k_layer.astype(dtype),
        preferred_element_type=jnp.float32,
    ) * scale  # [B, Hkv, G, C]
    mask = jnp.arange(capacity)[None, :] <= pos[:, None]  # [B, C]
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bkgc,bkcd->bkgd", weights.astype(dtype), v_layer.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, n_heads * hd).astype(q.dtype)


def _layer_forward_batch(
    cfg: DecoderConfig,
    layers: Dict,
    idx: jax.Array,  # int32 layer index
    x: jax.Array,  # [B, D] — one new token per stream
    k_all: jax.Array,  # [B, L, Hkv, C, hd]
    v_all: jax.Array,
    pos: jax.Array,  # [B]
    cos: jax.Array,  # [B, hd] per-stream rope tables
    sin: jax.Array,
    use_stacked: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One layer over B single-token streams.

    Projections treat the stream dimension as matmul ROWS — the stacked Q8
    kernels see ``T = B``, so each layer's weight blocks cross HBM once for
    the whole batch; only the cache write and attention are per-stream."""
    B = x.shape[0]
    groups = cfg.head_count // cfg.head_count_kv

    if use_stacked:
        from light_whisper_tpu.ops.q8_matmul import (
            q8_matmul_pallas_stacked,
            q8_matmul_pallas_stacked_fused,
        )

        fused = B <= 8 and _use_fused_stacked()

        def proj(name, h):
            p = layers[name]
            return q8_matmul_pallas_stacked(h, p["q"], p["s_t"], idx)

        def proj_norm(name, h, norm_w):
            if not fused:
                return proj(name, rms_norm(h, norm_w, cfg.rms_epsilon))
            p = layers[name]
            return q8_matmul_pallas_stacked_fused(
                h, p["q"], p["s_t"], idx, norm_w=norm_w, eps=cfg.rms_epsilon
            )

        def proj_residual(name, h, residual):
            if not fused:
                return residual + proj(name, h).astype(residual.dtype)
            p = layers[name]
            return q8_matmul_pallas_stacked_fused(
                h, p["q"], p["s_t"], idx, residual=residual
            ).astype(residual.dtype)

    else:

        def layer_param(name):
            return jax.tree.map(lambda a: a[idx], layers[name])

        def proj(name, h):
            return apply_linear(layer_param(name), h)

        def proj_norm(name, h, norm_w):
            return proj(name, rms_norm(h, norm_w, cfg.rms_epsilon))

        def proj_residual(name, h, residual):
            return residual + proj(name, h).astype(residual.dtype)

    q, k, v = _split_qkv(cfg, proj_norm("qkv", x, layers["attn_norm"][idx]), B)
    q = rms_norm(q, layers["q_norm"][idx], cfg.rms_epsilon)
    k = rms_norm(k, layers["k_norm"][idx], cfg.rms_epsilon)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    def write(cache_b, new_b, p):
        # cache_b: [L, Hkv, C, hd]; new_b: [Hkv, hd] — one new position.
        return jax.lax.dynamic_update_slice(
            cache_b, new_b[None, :, None, :].astype(cache_b.dtype), (idx, 0, p, 0)
        )

    k_all = jax.vmap(write)(k_all, k, pos)
    v_all = jax.vmap(write)(v_all, v, pos)

    if cfg.dtype == jnp.bfloat16 and _use_batched_attention_kernel(
        B, cfg.head_count, cfg.key_length, k_all.shape[3], cfg.head_count_kv
    ):
        from light_whisper_tpu.ops.decode_attention import (
            decode_attention_pallas_batched,
        )

        attn = (
            decode_attention_pallas_batched(q, k_all, v_all, pos, idx)
            .astype(q.dtype)
            .reshape(B, -1)
        )
    else:
        k_layer = jax.lax.dynamic_slice_in_dim(k_all, idx, 1, axis=1)[:, 0]
        v_layer = jax.lax.dynamic_slice_in_dim(v_all, idx, 1, axis=1)[:, 0]
        attn = _attention_decode_batch(q, k_layer, v_layer, pos, groups, cfg.dtype)

    x = proj_residual("o", attn, x)
    gateup = proj_norm("gateup", x, layers["ffn_norm"][idx])
    gate, up = jnp.split(gateup, 2, axis=-1)
    x = proj_residual("down", (jax.nn.silu(gate) * up).astype(x.dtype), x)
    return x, k_all, v_all


def _layer_forward_batch_seq(
    cfg: DecoderConfig,
    layers: Dict,
    idx: jax.Array,  # int32 layer index
    x: jax.Array,  # [B, T, D] — T new positions per stream
    k_all: jax.Array,  # [B, L, Hkv, C, hd]
    v_all: jax.Array,
    pos: jax.Array,  # [B] per-stream fill level
    cos: jax.Array,  # [B, T, hd]
    sin: jax.Array,
    use_stacked: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One layer over B streams × T new positions each.

    The projection rows are the flattened [B·T, D] — the stacked Q8 kernels
    read each layer's weights once for the whole batch; RoPE, cache writes
    and attention are per-stream (no weights there, so a plain ``vmap``)."""
    B, T, D = x.shape
    hd = cfg.key_length
    groups = cfg.head_count // cfg.head_count_kv
    n_kv = cfg.head_count_kv
    capacity = k_all.shape[3]

    if use_stacked:
        from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas_stacked

        def proj(name, h):  # h: [B, T, Din] → [B, T, out]
            p = layers[name]
            out = q8_matmul_pallas_stacked(
                h.reshape(B * T, h.shape[-1]), p["q"], p["s_t"], idx
            )
            return out.reshape(B, T, -1)

    else:

        def proj(name, h):
            p = jax.tree.map(lambda a: a[idx], layers[name])
            return apply_linear(p, h.reshape(B * T, h.shape[-1])).reshape(B, T, -1)

    h = rms_norm(x, layers["attn_norm"][idx], cfg.rms_epsilon)
    qkv = proj("qkv", h)
    qdim = cfg.head_count * hd
    kvdim = n_kv * hd
    q = qkv[..., :qdim].reshape(B, T, cfg.head_count, hd)
    k = qkv[..., qdim : qdim + kvdim].reshape(B, T, n_kv, hd)
    v = qkv[..., qdim + kvdim :].reshape(B, T, n_kv, hd)

    q = rms_norm(q, layers["q_norm"][idx], cfg.rms_epsilon)
    k = rms_norm(k, layers["k_norm"][idx], cfg.rms_epsilon)
    q = jax.vmap(apply_rope)(q, cos, sin)
    k = jax.vmap(apply_rope)(k, cos, sin)

    def write(cache_b, new_b, p):
        # cache_b: [L, Hkv, C, hd]; new_b: [T, Hkv, hd]
        return jax.lax.dynamic_update_slice(
            cache_b,
            new_b.transpose(1, 0, 2).astype(cache_b.dtype)[None],
            (idx, 0, p, 0),
        )

    k_all = jax.vmap(write)(k_all, k, pos)
    v_all = jax.vmap(write)(v_all, v, pos)

    def attend(q_b, k_all_b, v_all_b, pos_b):
        k_layer = jax.lax.dynamic_slice(
            k_all_b, (idx, 0, 0, 0), (1, n_kv, capacity, hd)
        )[0]
        v_layer = jax.lax.dynamic_slice(
            v_all_b, (idx, 0, 0, 0), (1, n_kv, capacity, hd)
        )[0]
        return _attention(
            q_b, k_layer, v_layer, pos_b + jnp.arange(T), groups, cfg.dtype
        )

    attn = jax.vmap(attend)(q, k_all, v_all, pos)  # [B, T, H, hd]

    x = x + proj("o", attn.reshape(B, T, -1)).astype(x.dtype)
    h = rms_norm(x, layers["ffn_norm"][idx], cfg.rms_epsilon)
    gateup = proj("gateup", h)
    gate, up = jnp.split(gateup, 2, axis=-1)
    x = x + proj("down", (jax.nn.silu(gate) * up).astype(x.dtype)).astype(x.dtype)
    return x, k_all, v_all


def forward_prefill_batch(
    cfg: DecoderConfig,
    params: Dict,
    embeds: jax.Array,  # [B, T, D] — T new embeddings per stream
    cache: KVCache,  # batched: k/v [B, L, Hkv, C, hd], pos [B]
) -> Tuple[jax.Array, KVCache]:
    """Prefill T new positions for each of B independent streams.

    The multi-token generalization of :func:`forward_decode_batch`: stream
    rows flatten onto the matmul row axis (one weight-stack read per layer
    for the whole batch); attention/cache stay per-stream. Serves the
    batched interim tick (``serving/incremental_batch.py``) — the
    TPU-native generalization of the reference's one-session-per-process
    interim loop (``interim.rs:21-196``)."""
    B, T, _ = embeds.shape
    cos, sin = jax.vmap(
        lambda p: rope_tables(p + jnp.arange(T), cfg.key_length, cfg.rope_freq_base)
    )(cache.pos)
    layers = params["layers"]
    use_stacked = _use_stacked_kernel(layers)

    def body(carry, idx):
        h, k_all, v_all = carry
        h, k_all, v_all = _layer_forward_batch_seq(
            cfg, layers, idx, h, k_all, v_all, cache.pos, cos, sin, use_stacked
        )
        return (h, k_all, v_all), None

    (h, new_k, new_v), _ = jax.lax.scan(
        body, (embeds, cache.k, cache.v), jnp.arange(cfg.block_count)
    )
    h = rms_norm(h, params["final_norm"], cfg.rms_epsilon)
    return h, KVCache(k=new_k, v=new_v, pos=cache.pos + T)


def forward_decode_batch(
    cfg: DecoderConfig,
    params: Dict,
    x: jax.Array,  # [B, D] — one new embedding per stream
    cache: KVCache,  # batched: k/v [B, L, Hkv, C, hd], pos [B]
) -> Tuple[jax.Array, KVCache]:
    """One decode step for B independent streams (one token each).

    ``cache`` uses the layout a vmapped :func:`init_cache` produces. Unlike
    ``vmap(forward)`` — whose Pallas batching rule prepends a batch GRID
    dimension, re-reading every layer's weight stack once PER STREAM — the
    stream dimension here rides the matmul row axis, so the Q8 weight stack
    crosses HBM once per step regardless of B. Decode is weight-DMA bound
    (~3.2 ms floor at 1.7B; see ROADMAP), so this is the difference between
    batching that multiplies aggregate tokens/s and batching that doesn't.
    Reference: one C++ GGUF session per process serves one stream
    (``qwen3_asr_server.py:114-133``); batched serving is the TPU-native
    generalization the multi-stream scheduler coalesces into.
    """
    cos, sin = rope_tables(cache.pos, cfg.key_length, cfg.rope_freq_base)
    layers = params["layers"]
    use_stacked = _use_stacked_kernel(layers)

    def body(carry, idx):
        h, k_all, v_all = carry
        h, k_all, v_all = _layer_forward_batch(
            cfg, layers, idx, h, k_all, v_all, cache.pos, cos, sin, use_stacked
        )
        return (h, k_all, v_all), None

    (h, new_k, new_v), _ = jax.lax.scan(
        body, (x, cache.k, cache.v), jnp.arange(cfg.block_count)
    )
    h = rms_norm(h, params["final_norm"], cfg.rms_epsilon)
    return h, KVCache(k=new_k, v=new_v, pos=cache.pos + 1)
