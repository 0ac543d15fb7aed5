"""Pallas TPU kernel: online-softmax (flash) prefill attention vs a KV cache.

Long-form prefill attends T new queries against a 32k-capacity cache
(``qwen3_asr_server.py:29``: the reference's n_ctx). The XLA chunked
formulation (``decoder._attention_chunked``) already avoids the ~1 GB
[Hkv, G, T, C] logits tensor, but still runs as a lax.scan of einsum +
softmax-algebra fusions — ~86 ms/layer at T=512, C=32k on v5e. This kernel
is the same mathematics as ONE launch per layer: grid (kv-head, q-row tile,
key chunk), a running (max, denom, accumulator) triple in VMEM scratch, and
both contractions on the MXU with the key chunk streamed HBM→VMEM exactly
once.

GQA layout: q rows are flattened (group, time) per kv head — [Hkv, G·T, hd]
— so the kernel is plain MHA over ``rows`` with a per-row absolute position
for the causal mask (positions repeat per group).

Compile economics (DEVNOTES round-2/3): a 2-full-contraction body inside the
decoder's layer scan only fits under the remote compiler's per-request wall
after its Mosaic payload has been seeded standalone — run
``scripts/exp_fused_compile.py e4`` once per shape family; the payload then
serves from the compile cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANE = 128  # TPU lane width: scratch vectors keep a full lane dim


def _kernel(
    q_ref,  # [1, bt, hd]
    k_ref,  # [1, bc, hd]
    v_ref,  # [1, bc, hd]
    qpos_ref,  # [1, bt] int32 — absolute position per q row (-1 = padding)
    o_ref,  # [1, bt, hd] f32
    m_ref,  # scratch [bt, LANE] f32
    l_ref,  # scratch [bt, LANE] f32
    acc_ref,  # scratch [bt, hd] f32
    *,
    scale: float,
    block_c: int,
):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0],
        k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bt, bc]

    kv_pos = pl.program_id(2) * block_c + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1
    )
    allowed = kv_pos <= qpos_ref[0][:, None]
    s = jnp.where(allowed, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    # Mask explicitly instead of relying on exp underflow: in a fully
    # masked row m_new stays NEG_INF, so exp(s - m_new) would be 1 per
    # entry and l would reach `capacity` — the flush guard's l == 0
    # invariant for padding rows (qpos = -1) holds only with this where.
    p = jnp.where(allowed, jnp.exp(s - m_new), 0.0)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype),
        v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        l = l_ref[:, :1]
        # fully masked rows (padding, qpos = -1) have l == 0
        o_ref[0] = jnp.where(l > 0, acc_ref[...] / l, 0.0)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_c", "interpret")
)
def _flash_rows(
    q_rows: jax.Array,  # [Hkv, R, hd] bf16 (R = G·T, padded)
    k_cache: jax.Array,  # [Hkv, C, hd]
    v_cache: jax.Array,
    qpos_rows: jax.Array,  # [1, R] int32, -1 on padding rows
    block_rows: int,
    block_c: int,
    interpret: bool = False,
) -> jax.Array:
    n_kv, R, hd = q_rows.shape
    capacity = k_cache.shape[1]
    grid = (n_kv, R // block_rows, capacity // block_c)
    kernel = functools.partial(
        _kernel, scale=hd ** -0.5, block_c=block_c
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_kv, R, hd), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_rows, hd), lambda h, t, c: (h, t, 0)),
                pl.BlockSpec((1, block_c, hd), lambda h, t, c: (h, c, 0)),
                pl.BlockSpec((1, block_c, hd), lambda h, t, c: (h, c, 0)),
                pl.BlockSpec((1, block_rows), lambda h, t, c: (0, t)),
            ],
            out_specs=pl.BlockSpec((1, block_rows, hd), lambda h, t, c: (h, t, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_rows, _LANE), jnp.float32),
                pltpu.VMEM((block_rows, _LANE), jnp.float32),
                pltpu.VMEM((block_rows, hd), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_kv * R * capacity * hd,
            bytes_accessed=2 * n_kv * capacity * hd * 2 + n_kv * R * hd * 6,
            transcendentals=n_kv * R * capacity,
        ),
        interpret=interpret,
    )(q_rows, k_cache, v_cache, qpos_rows)


def usable(T: int, hd: int, capacity: int, block_c: int = 512) -> bool:
    return T > 1 and hd % _LANE == 0 and capacity % block_c == 0


def flash_prefill_attention(
    q: jax.Array,  # [T, Hq, hd]
    k_cache: jax.Array,  # [Hkv, C, hd] bf16
    v_cache: jax.Array,
    q_positions: jax.Array,  # [T] int32 absolute positions
    interpret: bool = False,
) -> jax.Array:
    """Causal flash attention of new queries against the full cache.

    Returns [T, Hq, hd] in the query dtype — drop-in for
    ``decoder._attention_chunked``.
    """
    T, n_heads, hd = q.shape
    n_kv, capacity, _ = k_cache.shape
    groups = n_heads // n_kv

    rows = groups * T
    if rows >= 512 and rows % 512 == 0:
        block_rows, pad = 512, 0
    elif rows >= 256 and rows % 256 == 0:
        block_rows, pad = 256, 0
    else:  # small/ragged prompts: one row tile, padded to sublane multiple
        pad = -rows % 8
        block_rows = rows + pad
    q_rows = (
        q.reshape(T, n_kv, groups, hd).transpose(1, 2, 0, 3).reshape(n_kv, rows, hd)
    ).astype(jnp.bfloat16)
    qpos_rows = jnp.tile(q_positions.astype(jnp.int32), (groups,))
    if pad:
        q_rows = jnp.pad(q_rows, ((0, 0), (0, pad), (0, 0)))
        qpos_rows = jnp.pad(qpos_rows, (0, pad), constant_values=-1)

    out = _flash_rows(
        q_rows,
        k_cache.astype(jnp.bfloat16),
        v_cache.astype(jnp.bfloat16),
        qpos_rows[None, :],
        block_rows,
        512,
        interpret,
    )
    out = out[:, :rows].reshape(n_kv, groups, T, hd).transpose(2, 0, 1, 3)
    return out.reshape(T, n_heads, hd).astype(q.dtype)
