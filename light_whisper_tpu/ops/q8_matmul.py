"""Pallas TPU kernel: fused Q8_0 dequant + matmul.

``y[T, out] = x[T, in] @ dequant(q[out, in], s[out, in/32]).T``

This is the engine's hottest op: every decoder/encoder projection multiplies
activations against Q8_0 weights. Decode steps are HBM-bandwidth-bound, so
the win over a dequantize-then-matmul graph is that the weights cross
HBM→VMEM as int8 (half the bytes of bf16); the dequant (cast + per-block
scale) happens in VMEM right before the MXU contraction.

Grid: (T tiles, out tiles, in tiles) with a VMEM f32 accumulator over the
reduction dimension (same schedule as the reference tiled-matmul kernel in
``jax.experimental.pallas.ops.tpu.matmul``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from light_whisper_tpu.formats.gguf import Q8_0_BLOCK


def _kernel(x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]  # [bo, bk] int8
    # Scales arrive transposed as [bk // 32, bo] so their lane dimension is
    # the 128-aligned out-features axis (a [bo, bk/32] block would put a
    # 16-wide tile in the lane dim, which the TPU layout rejects). They are
    # bf16 (converted at load: Mosaic has no f16 support at all).
    s = st_ref[...].T  # [bo, bk // 32]
    # Lane-dim block expansion (s[o, k // 32] for every k) is not a legal
    # Mosaic reshape; express it as a matmul with a constant 0/1 expansion
    # matrix instead — ~bk/32× fewer FLOPs than the main contraction.
    s_full = jax.lax.dot_general(
        s,
        expand_ref[...],  # [bk // 32, bk]
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [bo, bk]
    w = q.astype(jnp.bfloat16) * s_full

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick(n: int, preferred: int) -> int:
    while preferred > 128 and n % preferred != 0:
        preferred //= 2
    return preferred if n % preferred == 0 else n


# RETIRED: the k-permuted weight layout ("kperm") that replaced the expand
# matmul with a free ``pltpu.repeat`` measured a full-program WASH (isolated
# kernels hit the DMA floor, but the decode chain sustains ~470-480 GB/s
# across the alternating weight streams regardless of kernel internals —
# 3.290 vs 3.374 ms/step even with zero activation permutes). It was removed
# from the shipped kernels in round 5; the probe and its exactness selftest
# live self-contained in ``scripts/exp_q8_kperm_probe.py``, the measurement
# record in docs/SERVING.md ("Retired: the k-permuted Q8 layout").


def _contig_bk_mode() -> str:
    import os

    v = os.environ.get("LWT_BK2048", "").strip().lower()
    if v in ("1", "true", "on"):
        return "all"  # contig for every divisible shape (the e6 experiment)
    if v in ("0", "false", "off"):
        return "off"
    return "auto"  # measured per-shape policy (default)


def _tile_policy(out_features: int, in_features: int) -> tuple:
    """(block_o, block_k) for the dequant-matmul grid.

    Base tiling is (2048, 512): bk=512 gives the transposed-scales block
    exactly the 16-sublane minimum tile, and bo=2048 amortizes grid
    overhead. bk=2048 ("contig") instead reads each q-block row as one
    contiguous 2 KB HBM burst rather than four 512 B bursts at stride K —
    but VMEM caps bo at 1024 there (bo=2048/bk=2048 exceeds the 16 MB
    scoped-vmem limit), so it is not uniformly better. Per-site hardware
    A/B at 1.7B decode shapes (scripts/exp_q8_block_sweep.py --ab, 512
    in-dispatch iterations, v5e via relay, 2026-08-18):

      gateup [12288x2048]: 555 → 567 GB/s   (contig wins)
      logits [152576x2048]: 449 → 530 GB/s  (contig wins, ~0.11 ms/step)
      down   [2048x6144]:  718 → 601 GB/s   (contig REGRESSES)
      qkv/o  (≤8.4 MB/call): unresolvable through relay RTT jitter

    Differential-slope re-measurement (--diff: per-call time from the slope
    between two in-dispatch trip counts, relay RTT cancels exactly;
    2026-08-18, absolute GB/s lower that session — compare within-session
    deltas only):

      qkv  [4096x2048]:  421 default → 396 contig  (default wins)
      o    [2048x2048]:  343 default → 319 contig  (default wins)
      down [2048x6144]:  448 default → 426 contig  (default wins)
      gateup:            463 default → 483 contig  (contig wins)
      logits:            443 default → 514 contig  (contig wins)

    i.e. the shape-targeted auto policy below is confirmed at every site.

    0.6B decode shapes (D=1024; same --diff methodology, same session),
    default (bo, 512) vs bk=1024 contiguous 1 KB bursts:

      qkv    [4096x1024]:  350 → 314 GB/s  (default wins)
      o      [1024x2048]:  248 → 403 GB/s  (bk=1024 WINS, 9.0 → 5.5 us)
      down   [1024x3072]:  310 → 378 GB/s  (bk=1024 wins, 10.8 → 8.8 us)
      gateup [6144x1024]:  464 → 343 GB/s  (default wins)
      logits [152576x1024]: 466 → 502 GB/s (bk=1024 wins)

    …but the per-call wins DO NOT TRANSFER to the real decode chain: a
    policy switching o/down/logits to bk=1024 measured the matmul chain at
    1.355 vs 1.310 ms/step and the full decode at 2.052 vs 2.040 (base) —
    flat-to-worse (bench_decode_step.py, 256-step walls, same session).
    Isolated back-to-back calls on one weight buffer reward the longer
    burst; interleaved with the other projections' streams it buys nothing.
    The 0.6B therefore KEEPS the base tiling everywhere. Methodology rule:
    a --diff per-site win is a candidate, not a decision — only a
    full-program A/B lands a policy change (the 1.7B contig rule above
    passed exactly that gate: 4.50 → 4.38 ms/step).

    Full-program confirmation: 256-step decode_greedy 4.47-4.52 (base) vs
    4.36-4.43 ms/step (all-contig). Default policy is therefore
    shape-targeted: contig only for in==2048 with out≥8192 (gateup +
    tied-embed logits at 1.7B; 0.6B's D=1024 shapes keep the base tiling).
    ``LWT_BK2048=1`` forces contig for every divisible shape, ``=0``
    disables it. Changing bk regroups the f32 accumulation order — inside
    the serving exactness doctrine (docs/SERVING.md), but a different XLA
    program.
    """
    mode = _contig_bk_mode()
    contig = (
        mode == "all"
        and in_features % 2048 == 0
        and out_features % 512 == 0
    ) or (
        mode == "auto" and in_features == 2048 and out_features >= 8192
    )
    if contig:
        return _pick(out_features, 1024), 2048
    return _pick(out_features, 2048), 512


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_o", "block_k", "interpret")
)
def _q8_matmul_2d(
    x: jax.Array,  # [T, in] bf16
    q: jax.Array,  # [out, in] int8
    s: jax.Array,  # [out, in // 32] f16
    block_t: int,
    block_o: int,
    block_k: int,
    interpret: bool = False,
) -> jax.Array:
    T = x.shape[0]
    out_features, in_features = q.shape
    s_t = s.astype(jnp.bfloat16).T  # [in // 32, out] — lane dim = aligned axis
    nb = block_k // Q8_0_BLOCK

    grid = (T // block_t, out_features // block_o, in_features // block_k)
    in_specs = [
        pl.BlockSpec((block_t, block_k), lambda t, o, k: (t, k)),
        pl.BlockSpec((block_o, block_k), lambda t, o, k: (o, k)),
        pl.BlockSpec((block_k // Q8_0_BLOCK, block_o), lambda t, o, k: (k, o)),
        pl.BlockSpec((nb, block_k), lambda t, o, k: (0, 0)),
    ]
    operands = [
        x.astype(jnp.bfloat16),
        q,
        s_t,
        jnp.repeat(jnp.eye(nb, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1),
    ]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((T, out_features), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_t, block_o), lambda t, o, k: (t, o)),
            scratch_shapes=[pltpu.VMEM((block_t, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * out_features * in_features,
            bytes_accessed=T * in_features * 2
            + out_features * in_features
            + out_features * in_features // Q8_0_BLOCK * 2
            + T * out_features * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _kernel_stacked(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    """Same contraction as :func:`_kernel`, reading layer ``idx_ref[0]`` of
    stacked weights. Block index maps do the layer selection; the body only
    squeezes the unit layer dim."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [bo, bk] int8
    s = st_ref[0].T  # [bo, bk // 32]
    s_full = jax.lax.dot_general(
        s,
        expand_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    w = q.astype(jnp.bfloat16) * s_full

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_o", "block_k", "interpret")
)
def _q8_matmul_stacked_2d(
    x: jax.Array,  # [T, in] bf16
    q: jax.Array,  # [L, out, in] int8 — ALL layers, resident in HBM
    s_t: jax.Array,  # [L, in // 32, out] bf16 (pre-transposed at load)
    layer: jax.Array,  # int32 scalar: which layer to multiply against
    block_t: int,
    block_o: int,
    block_k: int,
    interpret: bool = False,
) -> jax.Array:
    """Layer-indexed Q8 matmul over stacked weights.

    Why this exists: the decoder's layer loop is a ``lax.scan`` over weights
    stacked on a leading axis. Slicing a layer out of that stack and handing
    it to a pallas custom call makes XLA materialize the slice — a ~50 MB
    copy per layer per decode step that alone costs more than the whole
    matmul at HBM speed. Passing the full stack plus a scalar-prefetched
    layer index lets the kernel DMA blocks straight from the stacked buffer
    (index maps pick the layer), so the scan touches each byte of weights
    exactly once.
    """
    T = x.shape[0]
    _, out_features, in_features = q.shape
    nb = block_k // Q8_0_BLOCK
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))

    grid = (T // block_t, out_features // block_o, in_features // block_k)
    in_specs = [
        # index_map args: grid indices first, then the scalar ref.
        pl.BlockSpec((block_t, block_k), lambda t, o, k, idx: (t, k)),
        pl.BlockSpec((1, block_o, block_k), lambda t, o, k, idx: (idx[0], o, k)),
        pl.BlockSpec(
            (1, block_k // Q8_0_BLOCK, block_o),
            lambda t, o, k, idx: (idx[0], k, o),
        ),
    ]
    operands = [idx, x.astype(jnp.bfloat16), q, s_t]
    in_specs.append(pl.BlockSpec((nb, block_k), lambda t, o, k, idx: (0, 0)))
    operands.append(
        jnp.repeat(jnp.eye(nb, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1)
    )
    return pl.pallas_call(
        _kernel_stacked,
        out_shape=jax.ShapeDtypeStruct((T, out_features), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_t, block_o), lambda t, o, k, idx: (t, o)),
            scratch_shapes=[pltpu.VMEM((block_t, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * out_features * in_features,
            bytes_accessed=T * in_features * 2
            + out_features * in_features
            + out_features * in_features // Q8_0_BLOCK * 2
            + T * out_features * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _kernel_stacked_fused(
    idx_ref, x_ref, scale_ref, norm_ref, res_ref, q_ref, st_ref, expand_ref,
    o_ref, acc_ref, *, with_norm: bool, with_residual: bool,
):
    """Stacked Q8 matmul with elementwise prologue/epilogue folded in.

    Same single-main-contraction shape as :func:`_kernel_stacked` (the only
    kernel shape the remote compiler accepts under a scan — DEVNOTES
    round-2 differential), plus optional folds:

    - prologue: ``x * scale * norm_w`` — the rms-norm multiply, with the
      (tiny) rsqrt-of-mean-square reduction precomputed outside;
    - epilogue: ``+ residual`` at flush.
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if with_norm:
        x = (
            x.astype(jnp.float32) * scale_ref[...] * norm_ref[...]
        ).astype(jnp.bfloat16)
    q = q_ref[0]
    s = st_ref[0].T
    s_full = jax.lax.dot_general(
        s,
        expand_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    w = q.astype(jnp.bfloat16) * s_full

    acc_ref[...] += jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        acc = acc_ref[...]
        if with_residual:
            # Match the unfused epilogue's rounding exactly: the unfused path
            # computes ``residual_bf16 + matmul_f32.astype(bf16)`` in bf16,
            # so round the accumulator to bf16 BEFORE the add. This keeps the
            # fused decode bit-identical to the unfused decode.
            acc = (
                res_ref[...].astype(jnp.bfloat16) + acc.astype(jnp.bfloat16)
            ).astype(jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block_t", "block_o", "block_k", "with_norm", "with_residual",
        "interpret",
    ),
)
def _q8_matmul_stacked_fused_2d(
    x: jax.Array,  # [T, in]
    scale: jax.Array,  # [T, 1] f32 — rsqrt(mean(x²)+eps), ones when unused
    norm_w: jax.Array,  # [1, in] f32, ones when unused
    residual: jax.Array,  # [T, out] f32, zeros when unused
    q: jax.Array,  # [L, out, in] int8
    s_t: jax.Array,  # [L, in // 32, out] bf16
    layer: jax.Array,
    block_t: int,
    block_o: int,
    block_k: int,
    with_norm: bool,
    with_residual: bool,
    interpret: bool = False,
) -> jax.Array:
    T = x.shape[0]
    _, out_features, in_features = q.shape
    nb = block_k // Q8_0_BLOCK
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))

    grid = (T // block_t, out_features // block_o, in_features // block_k)
    in_specs = [
        pl.BlockSpec((block_t, block_k), lambda t, o, k, idx: (t, k)),
        pl.BlockSpec((block_t, 1), lambda t, o, k, idx: (t, 0)),
        pl.BlockSpec((1, block_k), lambda t, o, k, idx: (0, k)),
        pl.BlockSpec((block_t, block_o), lambda t, o, k, idx: (t, o)),
        pl.BlockSpec((1, block_o, block_k), lambda t, o, k, idx: (idx[0], o, k)),
        pl.BlockSpec(
            (1, block_k // Q8_0_BLOCK, block_o),
            lambda t, o, k, idx: (idx[0], k, o),
        ),
    ]
    operands = [
        idx, x.astype(jnp.bfloat16), scale, norm_w, residual, q, s_t,
    ]
    kernel = functools.partial(
        _kernel_stacked_fused,
        with_norm=with_norm, with_residual=with_residual,
    )
    in_specs.append(pl.BlockSpec((nb, block_k), lambda t, o, k, idx: (0, 0)))
    operands.append(
        jnp.repeat(jnp.eye(nb, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, out_features), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_t, block_o), lambda t, o, k, idx: (t, o)),
            scratch_shapes=[pltpu.VMEM((block_t, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


def q8_matmul_pallas_stacked_fused(
    x: jax.Array,  # [T, in] — UNNORMALIZED when norm_w given
    q: jax.Array,
    s_t: jax.Array,
    layer: jax.Array,
    norm_w=None,  # [in] rms weight → fold rms-norm into the kernel
    eps: float = 1e-6,
    residual=None,  # [T, out] → fold the residual add into the flush
    interpret: bool = False,
) -> jax.Array:
    """Stacked Q8 matmul with folded rms-norm prologue / residual epilogue.

    The rsqrt-of-mean-square scale is computed outside (a [T,1] reduction —
    one tiny fused op); the expensive part of rms-norm (the [T,in]
    elementwise multiply and its materialization) happens inside the kernel
    on the already-loaded x block.
    """
    T, in_features = x.shape
    out_features = q.shape[1]
    block_t = 8 if T <= 8 else _pick(T, 256)
    pad_t = -T % max(block_t, 8)
    if pad_t or T < 8:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad_t), (0, 0)))
        block_t = _pick(x.shape[0], max(block_t, 8))
    Tp = x.shape[0]
    block_o, block_k = _tile_policy(out_features, in_features)

    with_norm = norm_w is not None
    if with_norm:
        xf = x.astype(jnp.float32)
        scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        norm2d = norm_w.astype(jnp.float32)[None, :]
    else:
        scale = jnp.ones((Tp, 1), jnp.float32)
        norm2d = jnp.ones((1, in_features), jnp.float32)
    with_residual = residual is not None
    res = (
        residual.astype(jnp.float32)
        if with_residual
        else jnp.zeros((Tp, out_features), jnp.float32)
    )

    y = _q8_matmul_stacked_fused_2d(
        x, scale, norm2d, res, q, s_t, layer,
        block_t, block_o, block_k, with_norm, with_residual, interpret,
    )
    return y[:T]


def q8_matmul_pallas_stacked(
    x: jax.Array,
    q: jax.Array,  # [L, out, in] int8
    s_t: jax.Array,  # [L, in // 32, out] bf16
    layer: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch wrapper for the stacked kernel (same tiling policy as 2D)."""
    lead_shape = x.shape[:-1]
    in_features = x.shape[-1]
    out_features = q.shape[1]
    x2 = x.reshape(-1, in_features)
    T = x2.shape[0]

    block_t = 8 if T <= 8 else _pick(T, 256)
    if T % block_t != 0 or T < 8:
        pad_t = -T % max(block_t, 8)
        x2 = jnp.pad(x2, ((0, pad_t), (0, 0)))
        T = x2.shape[0]
        block_t = _pick(T, max(block_t, 8))
    block_o, block_k = _tile_policy(out_features, in_features)

    y = _q8_matmul_stacked_2d(
        x2, q, s_t, layer, block_t, block_o, block_k, interpret
    )
    return y[: _prod(lead_shape)].reshape(*lead_shape, out_features)


def q8_matmul_pallas(
    x: jax.Array,
    q: jax.Array,
    s: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch wrapper: flattens batch dims, picks tile sizes, pads T.

    Falls back assumptions: ``out % 128 == 0`` and ``in % 128 == 0`` (the
    caller — ``ops.linear`` — routes other shapes to the XLA path).
    """
    lead_shape = x.shape[:-1]
    in_features = x.shape[-1]
    out_features = q.shape[0]
    x2 = x.reshape(-1, in_features)
    T = x2.shape[0]

    block_t = 8 if T <= 8 else _pick(T, 256)
    if T % block_t != 0 or T < 8:
        pad_t = -T % max(block_t, 8)
        x2 = jnp.pad(x2, ((0, pad_t), (0, 0)))
        T = x2.shape[0]
        block_t = _pick(T, max(block_t, 8))
    # Measured on v5e at decode shapes: larger out-tiles amortize grid
    # overhead (bo=2048 → ~580 GB/s vs ~530 at bo=512); ops.linear only
    # routes shapes with in % 512 == 0 here.
    block_o, block_k = _tile_policy(out_features, in_features)

    y = _q8_matmul_2d(x2, q, s, block_t, block_o, block_k, interpret)
    return y[: _prod(lead_shape)].reshape(*lead_shape, out_features)


def _prod(shape) -> int:
    n = 1
    for s in shape:
        n *= int(s)
    return n
