#!/usr/bin/env python3
"""RETIRED k-permuted Q8 layout ("kperm") — probe-only, kept reproducible.

History (round 4, v5e via relay, 2026-08-19; full record in DEVNOTES.md and
docs/SERVING.md "Retired: the k-permuted Q8 layout"):

The shipped Q8 kernels' (``ops/q8_matmul.py``) measured over-the-DMA-floor
term is the *expand matmul* that builds per-k scales (gateup contig
bo=1024/bk=2048: full kernel 55.3-60.6 us/call vs 40.0 us DMA-touch).
``pltpu.repeat`` has tiled semantics — ``s_full[o, j] = s[o, j % nb]`` —
which is wrong for the natural layout but EXACT if, inside every bk block,
weight column ``a*nb + b`` holds original column ``b*32 + a`` (a
``(nb, 32) → (32, nb)`` transpose of the k-axis). With weights permuted at
load and activations permuted per call, the isolated gateup kernel hit the
DMA floor (40.4 us/call). But:

- full-program A/B: decode 4.235 vs 4.19 ms/step — a WASH (the ~113
  per-step activation transposes eat the per-kernel win);
- the resident-permuted-activation cost model (``--nox`` below: permuted
  kernels with NO activation transposes — wrong math, true cost) measured
  3.290 vs 3.374 ms/step, 2.5%: the chain sustains ~470-480 GB/s across the
  alternating weight streams regardless of kernel internals.

Decode ships at the sustained-HBM wall for Q8 bytes; kperm was therefore
REMOVED from the shipped kernels (round 5, VERDICT r4 #10 — zero residue,
like the reference's retired engines, ``retired_whisper_contract.rs:16-40``)
and lives only here, self-contained, so the negative result stays
reproducible.

Usage:
    python scripts/exp_q8_kperm_probe.py --selftest     # exactness (CPU ok)
    python scripts/exp_q8_kperm_probe.py --bench        # per-kernel + chain
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from light_whisper_tpu.formats.gguf import Q8_0_BLOCK  # noqa: E402
from light_whisper_tpu.ops.q8_matmul import _pick, _tile_policy  # noqa: E402


def kperm_block(out_features: int, in_features: int) -> int:
    """The k-permute granularity for a weight shape (= the policy block_k)."""
    return _tile_policy(out_features, in_features)[1]


def permute_kaxis(a: jax.Array, block_k: int) -> jax.Array:
    """Permute the last axis: within each ``block_k`` block, position
    a*nb + b  ←  old position b*32 + a (nb = block_k/32)."""
    nb = block_k // Q8_0_BLOCK
    *lead, n = a.shape
    k_blocks = n // block_k
    return (
        a.reshape(*lead, k_blocks, nb, Q8_0_BLOCK)
        .swapaxes(-1, -2)
        .reshape(*lead, n)
    )


def unpermute_kaxis(a: jax.Array, block_k: int) -> jax.Array:
    """Inverse of :func:`permute_kaxis` (same transform with axes swapped)."""
    nb = block_k // Q8_0_BLOCK
    *lead, n = a.shape
    k_blocks = n // block_k
    return (
        a.reshape(*lead, k_blocks, Q8_0_BLOCK, nb)
        .swapaxes(-1, -2)
        .reshape(*lead, n)
    )


def expand_scales_perm(s: jax.Array, block_k: int) -> jax.Array:
    """Per-k scale vector matching the permuted layout, via XLA ops:
    within each block, position j carries scale s[..., j % nb]."""
    nb = block_k // Q8_0_BLOCK
    *lead, n_scales = s.shape
    k_blocks = n_scales // nb
    s3 = s.reshape(*lead, k_blocks, 1, nb)
    s3 = jnp.broadcast_to(s3, (*lead, k_blocks, Q8_0_BLOCK, nb))
    return s3.reshape(*lead, k_blocks * block_k)


def _kernel_perm(x_ref, q_ref, st_ref, o_ref, acc_ref):
    """Q8 dequant-matmul over the k-permuted layout: the scale expansion is
    a free ``pltpu.repeat`` (exact under the permutation, see module doc)."""

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = st_ref[...].T  # [bo, bk // 32]
    s_full = pltpu.repeat(s, Q8_0_BLOCK, 1)  # [bo, bk] = s[o, j % nb]
    w = q_ref[...].astype(jnp.bfloat16) * s_full
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_stacked_perm(idx_ref, x_ref, q_ref, st_ref, o_ref, acc_ref):
    """Layer-indexed variant of :func:`_kernel_perm` over stacked weights."""

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    s = st_ref[0].T
    s_full = pltpu.repeat(s, Q8_0_BLOCK, 1)
    w = q_ref[0].astype(jnp.bfloat16) * s_full
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
def _q8_matmul_perm_2d(x, qp, s, block_t, block_o, block_k, interpret=False):
    T = x.shape[0]
    out_features, in_features = qp.shape
    s_t = s.astype(jnp.bfloat16).T
    grid = (T // block_t, out_features // block_o, in_features // block_k)
    return pl.pallas_call(
        _kernel_perm,
        out_shape=jax.ShapeDtypeStruct((T, out_features), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_t, block_k), lambda t, o, k: (t, k)),
                pl.BlockSpec((block_o, block_k), lambda t, o, k: (o, k)),
                pl.BlockSpec((block_k // Q8_0_BLOCK, block_o), lambda t, o, k: (k, o)),
            ],
            out_specs=pl.BlockSpec((block_t, block_o), lambda t, o, k: (t, o)),
            scratch_shapes=[pltpu.VMEM((block_t, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qp, s_t)


@functools.partial(
    jax.jit, static_argnames=("block_t", "block_o", "block_k", "interpret")
)
def _q8_matmul_stacked_perm_2d(
    x, qp, s_t, layer, block_t, block_o, block_k, interpret=False
):
    T = x.shape[0]
    _, out_features, in_features = qp.shape
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))
    grid = (T // block_t, out_features // block_o, in_features // block_k)
    return pl.pallas_call(
        _kernel_stacked_perm,
        out_shape=jax.ShapeDtypeStruct((T, out_features), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_t, block_k), lambda t, o, k, idx: (t, k)),
                pl.BlockSpec(
                    (1, block_o, block_k), lambda t, o, k, idx: (idx[0], o, k)
                ),
                pl.BlockSpec(
                    (1, block_k // Q8_0_BLOCK, block_o),
                    lambda t, o, k, idx: (idx[0], k, o),
                ),
            ],
            out_specs=pl.BlockSpec((block_t, block_o), lambda t, o, k, idx: (t, o)),
            scratch_shapes=[pltpu.VMEM((block_t, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(idx, x.astype(jnp.bfloat16), qp, s_t)


def _perm_blocks(out_features: int, block_k: int):
    # bo=1024 at bk=2048 fits the scoped-vmem limit (the policy pairing).
    return _pick(out_features, 1024 if block_k >= 2048 else 2048), block_k


def q8_matmul_perm(x, qp, s, interpret=False):
    """Dispatch wrapper: permutes activations to match qp's layout."""
    out_features, in_features = qp.shape
    T = x.shape[0]
    block_t = 8 if T <= 8 else _pick(T, 256)
    pad_t = -T % max(block_t, 8)
    if pad_t or T < 8:
        x = jnp.pad(x, ((0, pad_t), (0, 0)))
        block_t = _pick(x.shape[0], max(block_t, 8))
    block_k = kperm_block(out_features, in_features)
    block_o, block_k = _perm_blocks(out_features, block_k)
    xp = permute_kaxis(x.astype(jnp.bfloat16), block_k)
    return _q8_matmul_perm_2d(xp, qp, s, block_t, block_o, block_k, interpret)[:T]


def _selftest() -> None:
    rng = np.random.default_rng(0)
    out_f, in_f = 512, 1024
    q = rng.integers(-127, 127, size=(out_f, in_f), dtype=np.int8)
    s = (rng.random((out_f, in_f // 32), dtype=np.float32) * 0.01 + 0.001).astype(
        np.float32
    )
    x = rng.standard_normal((16, in_f)).astype(np.float32)
    bk = kperm_block(out_f, in_f)

    # permute/unpermute are inverse bijections
    a = rng.standard_normal((3, in_f)).astype(np.float32)
    p = np.asarray(permute_kaxis(jnp.asarray(a), bk))
    assert sorted(p[0].tolist()) == sorted(a[0].tolist())
    np.testing.assert_array_equal(np.asarray(unpermute_kaxis(jnp.asarray(p), bk)), a)

    # permuted dequant == natural dequant after unpermute
    qp = permute_kaxis(jnp.asarray(q), bk)
    deq_perm = qp.astype(jnp.float32) * expand_scales_perm(
        jnp.asarray(s).astype(jnp.float32), bk
    )
    deq_nat = jnp.asarray(q).astype(jnp.float32) * jnp.repeat(
        jnp.asarray(s), Q8_0_BLOCK, axis=-1
    )
    np.testing.assert_array_equal(
        np.asarray(unpermute_kaxis(deq_perm, bk)), np.asarray(deq_nat)
    )

    # perm kernel (interpret mode) vs natural XLA matmul
    from light_whisper_tpu.ops.linear import q8_matmul_xla

    want = np.asarray(q8_matmul_xla(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)))
    got = np.asarray(
        q8_matmul_perm(
            jnp.asarray(x), qp, jnp.asarray(s).astype(jnp.bfloat16), interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    print("selftest OK: permutation bijective, dequant exact, kernel matches")


def _bench() -> None:
    """Per-kernel + alternating-chain A/B on the current device."""
    rng = np.random.default_rng(0)
    out_f, in_f = 12288, 2048  # gateup at 1.7B — the round-4 probe shape
    L = 4
    q = rng.integers(-127, 127, size=(L, out_f, in_f), dtype=np.int8)
    s = (rng.random((L, out_f, in_f // 32), dtype=np.float32) * 0.01).astype(
        np.float32
    )
    bk = kperm_block(out_f, in_f)
    qp = jax.device_put(permute_kaxis(jnp.asarray(q), bk))
    s_t = jax.device_put(jnp.asarray(s).astype(jnp.bfloat16).transpose(0, 2, 1))
    qd = jax.device_put(jnp.asarray(q))
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((8, in_f)).astype(np.float32)).astype(
            jnp.bfloat16
        )
    )
    bo, _ = _perm_blocks(out_f, bk)

    from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas_stacked

    @functools.partial(jax.jit, static_argnames=("n", "mode"))
    def chain(x, n, mode):
        def body(x, idx):
            if mode == "perm_nox":  # permuted kernel, NO activation permutes
                y = _q8_matmul_stacked_perm_2d(x, qp, s_t, idx, 8, bo, bk)
            elif mode == "perm":
                xp = permute_kaxis(x, bk)
                y = _q8_matmul_stacked_perm_2d(xp, qp, s_t, idx, 8, bo, bk)
            else:
                y = q8_matmul_pallas_stacked(x, qd, s_t, idx)
            return y[:, : x.shape[-1]].astype(jnp.bfloat16), None

        def step(x, _):
            return jax.lax.scan(body, x, jnp.arange(L))[0], None

        return jax.lax.scan(step, x, None, length=n)[0]

    for mode in ("natural", "perm", "perm_nox"):
        jax.block_until_ready(chain(x, 64, mode))  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(x, 64, mode))
            best = min(best, time.perf_counter() - t0)
        per_call = best / (64 * L) * 1e6
        print(f"{mode:8s}: {per_call:8.1f} us/call (64x{L} alternating chain)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--selftest", action="store_true")
    parser.add_argument("--bench", action="store_true")
    args = parser.parse_args()
    if args.selftest or not args.bench:
        _selftest()
    if args.bench:
        _bench()
