"""Pallas TPU kernel: fused decode FFN step over stacked Q8 weights.

One launch computes ``y = x + W_down(silu(W_gate·h) * W_up·h)`` with
``h = rms_norm(x, w_norm)``, reading the layer's gate/up/down weights from
the full stacked ``[L, ...]`` buffers at a scalar-prefetched layer index.

Why: during greedy decode the XLA expression of the FFN half of a layer is
two q8-matmul launches plus 3-4 fusion kernels (norm, split, silu·mul,
residual). At 28 scanned layers the launch overhead alone is ~0.4 ms per
token (DEVNOTES; scripts/bench_decode_step.py). Here the whole chain is one
kernel: the grid walks ffn-column tiles, each program dequantizes its
gate/up/down tiles in VMEM, and the down-projection contribution is
accumulated across programs into the output (TPU grids execute sequentially
per core, so cross-program accumulation into ``o_ref`` is well-defined).

The rms-norm is recomputed per program from the (tiny) ``x`` block instead
of being passed in — 2048 f32 squares per program is noise next to the MXU
work, and it keeps the op single-launch.

Numerics match the unfused path: norm/scale math in f32, weights dequantized
to bf16 exactly as ``ops.q8_matmul``, contractions accumulate in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_whisper_tpu.formats.gguf import Q8_0_BLOCK


def _dequant(q, s_t, expand):
    """int8 block [O, K] + transposed scales [K/32, O] → bf16 [O, K]."""
    s_full = jax.lax.dot_general(
        s_t.T,
        expand,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    return q.astype(jnp.bfloat16) * s_full


def _kernel(
    idx_ref,
    x_ref,  # [T, D]
    norm_ref,  # [1, D] f32
    gate_q_ref,  # [1, bf, D] int8 (gate rows of the gateup stack)
    up_q_ref,  # [1, bf, D] int8
    gate_st_ref,  # [1, D // 32, bf] bf16
    up_st_ref,  # [1, D // 32, bf]
    down_q_ref,  # [1, D, bf] int8
    down_st_ref,  # [1, bf // 32, D] bf16
    expand_d_ref,  # [D // 32, D] 0/1 expansion
    expand_f_ref,  # [bf // 32, bf]
    o_ref,  # [T, D] f32 — accumulated across programs
    *,
    eps: float,
):
    j = pl.program_id(0)

    x = x_ref[...].astype(jnp.float32)  # [T, D]
    scale = jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    h = (x * scale * norm_ref[...]).astype(jnp.bfloat16)  # [T, D]

    w_gate = _dequant(gate_q_ref[0], gate_st_ref[0], expand_d_ref[...])  # [bf, D]
    w_up = _dequant(up_q_ref[0], up_st_ref[0], expand_d_ref[...])

    gate = jax.lax.dot_general(
        h, w_gate, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, bf]
    up = jax.lax.dot_general(
        h, w_up, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    inner = (gate * jax.lax.logistic(gate) * up).astype(jnp.bfloat16)  # silu(g)*u

    w_down = _dequant(down_q_ref[0], down_st_ref[0], expand_f_ref[...])  # [D, bf]
    partial = jax.lax.dot_general(
        inner, w_down, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, D]

    @pl.when(j == 0)
    def _first():
        o_ref[...] = x + partial

    @pl.when(j != 0)
    def _rest():
        o_ref[...] += partial


@functools.partial(jax.jit, static_argnames=("block_f", "eps", "interpret"))
def fused_ffn_step(
    x: jax.Array,  # [T, D] bf16 (or f32)
    norm_w: jax.Array,  # [D] f32 rms weight
    gateup_q: jax.Array,  # [L, 2F, D] int8
    gateup_s_t: jax.Array,  # [L, D // 32, 2F] bf16
    down_q: jax.Array,  # [L, D, F] int8
    down_s_t: jax.Array,  # [L, F // 32, D] bf16
    layer: jax.Array,  # int32 scalar
    block_f: int = 512,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """One fused FFN decode step; returns ``x + down(silu(gate)*up)`` in f32."""
    T, D = x.shape
    L, two_f, _ = gateup_q.shape
    F = two_f // 2
    assert F % block_f == 0 and D % Q8_0_BLOCK == 0
    f_tiles = F // block_f

    expand_d = jnp.repeat(jnp.eye(D // Q8_0_BLOCK, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1)
    expand_f = jnp.repeat(
        jnp.eye(block_f // Q8_0_BLOCK, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1
    )
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f_tiles,),
            in_specs=[
                pl.BlockSpec((T, D), lambda j, idx: (0, 0)),
                pl.BlockSpec((1, D), lambda j, idx: (0, 0)),
                # gate rows live at [0, F); up rows at [F, 2F) of the stack
                pl.BlockSpec((1, block_f, D), lambda j, idx: (idx[0], j, 0)),
                pl.BlockSpec(
                    (1, block_f, D),
                    lambda j, idx, _ft=f_tiles: (idx[0], _ft + j, 0),
                ),
                pl.BlockSpec((1, D // Q8_0_BLOCK, block_f), lambda j, idx: (idx[0], 0, j)),
                pl.BlockSpec(
                    (1, D // Q8_0_BLOCK, block_f),
                    lambda j, idx, _ft=f_tiles: (idx[0], 0, _ft + j),
                ),
                pl.BlockSpec((1, D, block_f), lambda j, idx: (idx[0], 0, j)),
                pl.BlockSpec((1, block_f // Q8_0_BLOCK, D), lambda j, idx: (idx[0], j, 0)),
                pl.BlockSpec((D // Q8_0_BLOCK, D), lambda j, idx: (0, 0)),
                pl.BlockSpec((block_f // Q8_0_BLOCK, block_f), lambda j, idx: (0, 0)),
            ],
            out_specs=pl.BlockSpec((T, D), lambda j, idx: (0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * 3 * F,
            bytes_accessed=3 * D * F + 3 * D * F // Q8_0_BLOCK * 2 + T * D * 6,
            transcendentals=T * F,
        ),
        interpret=interpret,
    )(
        idx,
        x.astype(jnp.bfloat16),
        norm_w.astype(jnp.float32)[None, :],
        gateup_q,
        gateup_q,
        gateup_s_t,
        gateup_s_t,
        down_q,
        down_s_t,
        expand_d,
        expand_f,
    )
    return out


# ---------------------------------------------------------------------------
# half-fused variant: gate/up matmuls + silu·mul in one launch
#
# The full 3-contraction kernel above exceeds the remote compiler's ceiling
# when embedded in a scan (DEVNOTES round-2); this 2-contraction version
# keeps the down projection on the stacked q8 kernel and still removes the
# split + silu + mul glue and one launch per layer.
# ---------------------------------------------------------------------------


def _kernel_gateup(
    idx_ref,
    h_ref,  # [T, D] bf16 — already normalized
    gate_q_ref,  # [1, bf, D] int8
    up_q_ref,  # [1, bf, D] int8
    gate_st_ref,  # [1, D // 32, bf]
    up_st_ref,  # [1, D // 32, bf]
    expand_d_ref,  # [D // 32, D]
    o_ref,  # [T, F] bf16 — silu(gate)*up tile per program
):
    h = h_ref[...]
    w_gate = _dequant(gate_q_ref[0], gate_st_ref[0], expand_d_ref[...])
    w_up = _dequant(up_q_ref[0], up_st_ref[0], expand_d_ref[...])
    gate = jax.lax.dot_general(
        h, w_gate, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    up = jax.lax.dot_general(
        h, w_up, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (gate * jax.lax.logistic(gate) * up).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_gateup_silu(
    h: jax.Array,  # [T, D] bf16 (normalized input)
    gateup_q: jax.Array,  # [L, 2F, D] int8
    gateup_s_t: jax.Array,  # [L, D // 32, 2F] bf16
    layer: jax.Array,
    block_f: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """``silu(gate(h)) * up(h)`` in one layer-indexed launch → [T, F] bf16."""
    T, D = h.shape
    L, two_f, _ = gateup_q.shape
    F = two_f // 2
    while block_f > 128 and F % block_f != 0:
        block_f //= 2
    f_tiles = F // block_f
    expand_d = jnp.repeat(jnp.eye(D // Q8_0_BLOCK, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1)
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))

    return pl.pallas_call(
        _kernel_gateup,
        out_shape=jax.ShapeDtypeStruct((T, F), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(f_tiles,),
            in_specs=[
                pl.BlockSpec((T, D), lambda j, idx: (0, 0)),
                pl.BlockSpec((1, block_f, D), lambda j, idx: (idx[0], j, 0)),
                pl.BlockSpec(
                    (1, block_f, D),
                    lambda j, idx, _ft=f_tiles: (idx[0], _ft + j, 0),
                ),
                pl.BlockSpec((1, D // Q8_0_BLOCK, block_f), lambda j, idx: (idx[0], 0, j)),
                pl.BlockSpec(
                    (1, D // Q8_0_BLOCK, block_f),
                    lambda j, idx, _ft=f_tiles: (idx[0], 0, _ft + j),
                ),
                pl.BlockSpec((D // Q8_0_BLOCK, D), lambda j, idx: (0, 0)),
            ],
            out_specs=pl.BlockSpec((T, block_f), lambda j, idx: (0, j)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * D * 2 * F,
            bytes_accessed=2 * D * F + 2 * D * F // Q8_0_BLOCK * 2 + T * (D + F) * 2,
            transcendentals=T * F,
        ),
        interpret=interpret,
    )(idx, h.astype(jnp.bfloat16), gateup_q, gateup_q, gateup_s_t, gateup_s_t, expand_d)
