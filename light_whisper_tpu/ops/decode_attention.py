"""Pallas TPU kernel: grouped-query decode attention over the KV cache.

One launch per layer computes mask → QK^T → softmax → ·V for a handful of
query positions against the full cache bucket. During greedy decoding the
XLA expression of the same math is ~6-8 separate kernels per scanned layer;
at 28 layers the launch overhead alone costs milliseconds per token, which
is why this exists (decode is otherwise HBM-bound, see DEVNOTES).

Grid: one program per KV head; each program streams its [C, hd] K/V slices
into VMEM and serves all of the head's query groups at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, pos_ref, o_ref):
    # q: [1, G*T, hd] — this kv-head's query groups; k/v: [1, C, hd];
    # pos: [G*T, 1] absolute query positions (causal+validity bound).
    q = q_ref[0]  # [GT, hd]
    k = k_ref[0]  # [C, hd]
    v = v_ref[0]
    hd = q.shape[-1]

    logits = jax.lax.dot_general(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (hd ** -0.5)  # [GT, C]

    key_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(key_pos <= pos_ref[...], logits, NEG_INF)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    weights = jnp.exp(logits)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        weights.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(
    q: jax.Array,  # [T, Hq, hd]
    k_cache: jax.Array,  # [Hkv, C, hd] (head-major)
    v_cache: jax.Array,  # [Hkv, C, hd]
    q_positions: jax.Array,  # [T] int32
    interpret: bool = False,
) -> jax.Array:
    T, n_heads, hd = q.shape
    n_kv, C, _ = k_cache.shape
    groups = n_heads // n_kv

    # [T, Hkv, G, hd] → [Hkv, G*T, hd]: all of one kv-head's queries together.
    q_heads = q.reshape(T, n_kv, groups, hd).transpose(1, 2, 0, 3).reshape(n_kv, groups * T, hd)
    k_heads = k_cache  # already head-major [Hkv, C, hd]
    v_heads = v_cache
    pos = jnp.tile(q_positions.astype(jnp.int32), groups)[:, None]  # [G*T, 1]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_kv, groups * T, hd), jnp.float32),
        grid=(n_kv,),
        in_specs=[
            pl.BlockSpec((1, groups * T, hd), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, hd), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, hd), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups * T, 1), lambda h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, groups * T, hd), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q_heads, k_heads, v_heads, pos)

    # [Hkv, G*T, hd] → [T, Hq, hd]
    return (
        out.reshape(n_kv, groups, T, hd).transpose(2, 0, 1, 3).reshape(T, n_heads, hd)
    )


def _kernel_stacked(idx_ref, q_ref, k_ref, v_ref, pos_ref, o_ref):
    """Same math as :func:`_kernel`; the cache refs carry a unit layer dim
    selected by the scalar-prefetched layer index in the block specs."""
    _kernel(q_ref, k_ref[0], v_ref[0], pos_ref, o_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas_stacked(
    q: jax.Array,  # [T, Hq, hd]
    k_cache: jax.Array,  # [L, Hkv, C, hd] — the WHOLE stacked cache
    v_cache: jax.Array,  # [L, Hkv, C, hd]
    q_positions: jax.Array,  # [T] int32
    layer: jax.Array,  # int32 scalar
    interpret: bool = False,
) -> jax.Array:
    """Layer-indexed decode attention over the full stacked KV cache.

    Companion of ``q8_matmul_pallas_stacked``: inside the decoder's layer
    scan, slicing ``cache[k][layer]`` for a custom call would materialize
    a per-layer copy and the scan's stacked outputs another; reading the
    stacked buffer at a scalar-prefetched layer offset keeps cache traffic
    at exactly one read of the bucket per layer.
    """
    T, n_heads, hd = q.shape
    L, n_kv, C, _ = k_cache.shape
    groups = n_heads // n_kv

    q_heads = (
        q.reshape(T, n_kv, groups, hd).transpose(1, 2, 0, 3).reshape(n_kv, groups * T, hd)
    )
    pos = jnp.tile(q_positions.astype(jnp.int32), groups)[:, None]
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))

    out = pl.pallas_call(
        _kernel_stacked,
        out_shape=jax.ShapeDtypeStruct((n_kv, groups * T, hd), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_kv,),
            in_specs=[
                pl.BlockSpec(
                    (1, groups * T, hd), lambda h, idx: (h, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, C, hd), lambda h, idx: (idx[0], h, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, C, hd), lambda h, idx: (idx[0], h, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (groups * T, 1), lambda h, idx: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, groups * T, hd), lambda h, idx: (h, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(idx, q_heads, k_cache, v_cache, pos)

    return (
        out.reshape(n_kv, groups, T, hd).transpose(2, 0, 1, 3).reshape(T, n_heads, hd)
    )


def usable(T: int, n_heads: int, hd: int, capacity: int, n_kv: int) -> bool:
    """Shape gate: small query counts, lane-aligned dims, VMEM-sized cache."""
    groups_t = (n_heads // max(1, n_kv)) * T
    per_head_bytes = 2 * capacity * hd * 2  # K+V bf16
    return (
        hd % 128 == 0
        and capacity % 128 == 0
        and groups_t >= 8
        and T <= 64
        and per_head_bytes <= 8 * 1024 * 1024
    )


# ---------------------------------------------------------------------------
# Batched decode attention: one program per (stream, kv-head) pair
# ---------------------------------------------------------------------------

_ROW_PAD = 8  # Mosaic sublane tile: pad the per-program query rows to 8


def _kernel_batched(idx_ref, pos_ref, q_ref, k_ref, v_ref, o_ref, *, n_kv: int):
    """Same math as :func:`_kernel` with a per-program position bound.

    The grid walks (stream × kv-head) pairs; each program's K/V block is
    its stream's cache slice at the scalar-prefetched layer offset, so the
    batched step never materializes a per-layer cache copy (the
    ``dynamic_slice`` the XLA path pays per layer per step). ``pos`` rides
    scalar prefetch (SMEM) — one int per stream."""
    del idx_ref  # consumed by the block index maps
    q = q_ref[0]  # [ROW_PAD, hd] — G real rows + padding
    k = k_ref[0, 0, 0]  # [C, hd]
    v = v_ref[0, 0, 0]
    hd = q.shape[-1]

    logits = jax.lax.dot_general(
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (hd ** -0.5)  # [ROW_PAD, C]

    key_pos = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(key_pos <= pos_ref[pl.program_id(0) // n_kv], logits, NEG_INF)

    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    weights = jnp.exp(logits)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)

    o_ref[0] = jax.lax.dot_general(
        weights.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas_batched(
    q: jax.Array,  # [B, Hq, hd] — one query position per stream
    k_cache: jax.Array,  # [B, L, Hkv, C, hd] — per-stream stacked caches
    v_cache: jax.Array,
    pos: jax.Array,  # [B] int32 — per-stream fill level (== query position)
    layer: jax.Array,  # int32 scalar
    interpret: bool = False,
) -> jax.Array:
    """Row-batched decode attention over per-stream caches, layer-indexed.

    Companion of :func:`decoder.forward_decode_batch`: the XLA fallback
    slices ``cache[:, layer]`` inside the layer scan, which materializes a
    [B, Hkv, C, hd] copy per layer per step (~2× the necessary cache
    traffic at decode shapes). Here each grid program DMAs exactly its
    (stream, kv-head) slice of the stacked buffer at a scalar-prefetched
    offset — every cache byte crosses HBM once. Query rows pad from G to
    a sublane tile of 8 (the padded rows' outputs are discarded).
    """
    B, n_heads, hd = q.shape
    _B, L, n_kv, C, _ = k_cache.shape
    groups = n_heads // n_kv

    # [B, Hkv, G, hd] → rows padded to the sublane tile → [B·Hkv, 8, hd]
    q_heads = q.reshape(B, n_kv, groups, hd)
    q_heads = jnp.pad(q_heads, ((0, 0), (0, 0), (0, _ROW_PAD - groups), (0, 0)))
    q_heads = q_heads.reshape(B * n_kv, _ROW_PAD, hd)
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(_kernel_batched, n_kv=n_kv),
        out_shape=jax.ShapeDtypeStruct((B * n_kv, _ROW_PAD, hd), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # (layer idx, per-stream positions)
            grid=(B * n_kv,),
            in_specs=[
                pl.BlockSpec(
                    (1, _ROW_PAD, hd),
                    lambda h, idx, pos: (h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 1, C, hd),
                    lambda h, idx, pos: (h // n_kv, idx[0], h % n_kv, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, 1, C, hd),
                    lambda h, idx, pos: (h // n_kv, idx[0], h % n_kv, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _ROW_PAD, hd), lambda h, idx, pos: (h, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(idx, pos.astype(jnp.int32), q_heads, k_cache, v_cache)

    # [B·Hkv, 8, hd] → drop row padding → [B, Hq, hd]
    out = out.reshape(B, n_kv, _ROW_PAD, hd)[:, :, :groups]
    return out.reshape(B, n_heads, hd)


def usable_batched(B: int, n_heads: int, hd: int, capacity: int, n_kv: int) -> bool:
    """Shape gate for the batched kernel (one (stream, head) per program)."""
    per_head_bytes = 2 * capacity * hd * 2  # K+V bf16
    return (
        hd % 128 == 0
        and capacity % 128 == 0
        and n_heads % max(1, n_kv) == 0
        and (n_heads // max(1, n_kv)) <= _ROW_PAD
        and per_head_bytes <= 8 * 1024 * 1024
    )
