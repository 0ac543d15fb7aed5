"""k-permuted Q8 weight layout (ops/q8_matmul.py "kperm").

The layout turns the kernels' per-block scale expansion (the measured
38%-over-DMA-floor term of the decode step: gateup 55.3 → 40.4 us/call on
v5e, scripts/exp_q8_compute_bound.py) into a ``pltpu.repeat``. These tests
pin the semantics the speedup rests on:

- the permutation is a per-bk-block (nb, 32) → (32, nb) transpose of the
  k-axis, self-inverse via :func:`unpermute_kaxis`;
- permuted-layout matmuls equal the natural-layout matmuls up to f32
  accumulation reordering (bounded against an f64 oracle, not just against
  each other);
- the fused (norm/residual) kernels stay bit-identical to their unfused
  counterparts under the permuted layout — the serving exactness doctrine
  (docs/SERVING.md) must survive the layout change;
- ``prepare_stacked_scales`` re-stores projections under ``qp`` only when
  the flag is on, and dispatch re-derives the same granularity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_whisper_tpu.formats.gguf import Q8_0_BLOCK
from light_whisper_tpu.ops.linear import q8_matmul_xla, q8_matmul_xla_perm
from light_whisper_tpu.ops.q8_matmul import (
    expand_scales_perm,
    kperm_block,
    permute_kaxis,
    q8_matmul_pallas,
    q8_matmul_pallas_stacked,
    q8_matmul_pallas_stacked_fused,
    unpermute_kaxis,
)


def _mk(out_f=512, in_f=1024, T=8, L=2, seed=3):
    rng = np.random.default_rng(seed)
    q = rng.integers(-127, 127, size=(L, out_f, in_f), dtype=np.int8)
    s = (rng.standard_normal((L, out_f, in_f // Q8_0_BLOCK)) * 0.01).astype(
        np.float32
    )
    x = rng.standard_normal((T, in_f)).astype(np.float32)
    return q, s, x


def test_permute_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 2048)).astype(np.float32)
    for bk in (512, 1024, 2048):
        p = np.asarray(permute_kaxis(jnp.asarray(a), bk))
        assert not np.array_equal(p, a)
        back = np.asarray(unpermute_kaxis(jnp.asarray(p), bk))
        np.testing.assert_array_equal(back, a)


def test_permute_is_per_block_transpose():
    # Position a*nb + b inside each block must hold old position b*32 + a.
    bk = 512
    nb = bk // Q8_0_BLOCK
    n = 1024
    a = np.arange(n, dtype=np.float32)[None]
    p = np.asarray(permute_kaxis(jnp.asarray(a), bk))[0]
    for blk in range(n // bk):
        for j in (0, 1, nb, nb + 1, bk - 1):
            a_, b_ = divmod(j, nb)
            assert p[blk * bk + j] == blk * bk + b_ * Q8_0_BLOCK + a_


def test_expand_scales_perm_matches_natural_mapping():
    # dequant over the permuted layout, un-permuted back, must equal the
    # natural dequant exactly (elementwise ops only — bitwise).
    q, s, _ = _mk()
    bk = 512
    qp = permute_kaxis(jnp.asarray(q[0]), bk)
    deq_perm = qp.astype(jnp.float32) * expand_scales_perm(
        jnp.asarray(s[0]), bk
    )
    deq_nat = jnp.asarray(q[0]).astype(jnp.float32) * jnp.repeat(
        jnp.asarray(s[0]), Q8_0_BLOCK, axis=-1
    )
    np.testing.assert_array_equal(
        np.asarray(unpermute_kaxis(deq_perm, bk)), np.asarray(deq_nat)
    )


def _f64_oracle(q, s, x):
    w = q.astype(np.float64) * np.repeat(
        np.asarray(jnp.asarray(s).astype(jnp.bfloat16).astype(jnp.float32)),
        Q8_0_BLOCK,
        axis=-1,
    )
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    return xb.astype(np.float64) @ w.T


def _close_to_oracle(y, y64):
    scale = np.maximum(np.abs(y64).max(), 1e-6)
    return float(np.max(np.abs(y - y64)) / scale)


def test_xla_perm_matches_oracle():
    q, s, x = _mk()
    bk = kperm_block(q.shape[1], q.shape[2])
    y64 = _f64_oracle(q[0], s[0], x)
    y_nat = np.asarray(q8_matmul_xla(jnp.asarray(x), jnp.asarray(q[0]), jnp.asarray(s[0])))
    qp = permute_kaxis(jnp.asarray(q[0]), bk)
    y_perm = np.asarray(
        q8_matmul_xla_perm(jnp.asarray(x), qp, jnp.asarray(s[0]), bk)
    )
    # Both paths are the same math; each must sit in the same error band
    # against the f64 oracle (reordering-only difference).
    assert _close_to_oracle(y_perm, y64) < 2 * _close_to_oracle(y_nat, y64) + 1e-6


def test_pallas_perm_interpret_matches_oracle():
    q, s, x = _mk()
    bk = kperm_block(q.shape[1], q.shape[2])
    y64 = _f64_oracle(q[0], s[0], x)
    y_nat = np.asarray(
        q8_matmul_pallas(jnp.asarray(x), jnp.asarray(q[0]), jnp.asarray(s[0]), interpret=True)
    )
    qp = permute_kaxis(jnp.asarray(q[0]), bk)
    y_perm = np.asarray(
        q8_matmul_pallas(jnp.asarray(x), qp, jnp.asarray(s[0]), interpret=True, kperm=bk)
    )
    assert _close_to_oracle(y_perm, y64) < 2 * _close_to_oracle(y_nat, y64) + 1e-6


def test_stacked_perm_interpret_matches_natural():
    q, s, x = _mk()
    L, out_f, in_f = q.shape
    bk = kperm_block(out_f, in_f)
    s_t = jnp.asarray(s).astype(jnp.bfloat16).transpose(0, 2, 1)
    qp = permute_kaxis(jnp.asarray(q), bk)
    for layer in (0, 1):
        y_nat = np.asarray(
            q8_matmul_pallas_stacked(
                jnp.asarray(x), jnp.asarray(q), s_t, jnp.int32(layer), interpret=True
            )
        )
        y_perm = np.asarray(
            q8_matmul_pallas_stacked(
                jnp.asarray(x), qp, s_t, jnp.int32(layer), interpret=True, kperm=bk
            )
        )
        y64 = _f64_oracle(q[layer], np.asarray(s_t[layer].T.astype(jnp.float32)), x)
        assert _close_to_oracle(y_perm, y64) < 2 * _close_to_oracle(y_nat, y64) + 1e-6


def test_fused_bitwise_matches_unfused_under_kperm():
    """The doctrine invariant: folding norm/residual into the kernel must not
    change a single bit vs the unfused sequence — including under kperm."""
    from light_whisper_tpu.models.qwen3_asr.decoder import rms_norm

    q, s, x = _mk(out_f=1024, in_f=1024, T=8)
    L, out_f, in_f = q.shape
    bk = kperm_block(out_f, in_f)
    s_t = jnp.asarray(s).astype(jnp.bfloat16).transpose(0, 2, 1)
    qp = permute_kaxis(jnp.asarray(q), bk)
    norm_w = jnp.asarray(
        np.random.default_rng(5).standard_normal(in_f).astype(np.float32)
    )
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    layer = jnp.int32(1)

    normed = rms_norm(xb, norm_w, 1e-6)
    y_unfused = q8_matmul_pallas_stacked(
        normed, qp, s_t, layer, interpret=True, kperm=bk
    )
    y_fused = q8_matmul_pallas_stacked_fused(
        xb, qp, s_t, layer, norm_w=norm_w, eps=1e-6, interpret=True, kperm=bk
    )
    np.testing.assert_array_equal(np.asarray(y_fused), np.asarray(y_unfused))

    residual = jnp.asarray(
        np.random.default_rng(6).standard_normal((8, out_f)).astype(np.float32)
    ).astype(jnp.bfloat16)
    y_unfused_res = residual + q8_matmul_pallas_stacked(
        xb, qp, s_t, layer, interpret=True, kperm=bk
    ).astype(residual.dtype)
    y_fused_res = q8_matmul_pallas_stacked_fused(
        xb, qp, s_t, layer, residual=residual, interpret=True, kperm=bk
    ).astype(residual.dtype)
    np.testing.assert_array_equal(
        np.asarray(y_fused_res), np.asarray(y_unfused_res)
    )


def test_prepare_stacked_scales_kperm_flag(monkeypatch):
    from light_whisper_tpu.models.qwen3_asr import decoder as dec

    q, s, _ = _mk(out_f=512, in_f=1024)
    params = {"layers": {"qkv": {"q": jnp.asarray(q), "s": jnp.asarray(s)}}}

    monkeypatch.setenv("LWT_Q8_KPERM", "0")
    off = dec.prepare_stacked_scales(params)
    assert "q" in off["layers"]["qkv"] and "qp" not in off["layers"]["qkv"]
    assert "s_t" in off["layers"]["qkv"]

    monkeypatch.setenv("LWT_Q8_KPERM", "1")
    on = dec.prepare_stacked_scales(params)
    p = on["layers"]["qkv"]
    assert "qp" in p and "q" not in p
    bk = kperm_block(512, 1024)
    np.testing.assert_array_equal(
        np.asarray(unpermute_kaxis(p["qp"], bk)), q
    )
    # dispatch helper re-derives the same granularity
    qa, kp = dec._q_kperm(p)
    assert kp == bk and qa is p["qp"]


def test_apply_linear_routes_qp():
    from light_whisper_tpu.ops.linear import apply_linear

    q, s, x = _mk()
    bk = kperm_block(q.shape[1], q.shape[2])
    p_nat = {"q": jnp.asarray(q[0]), "s": jnp.asarray(s[0])}
    p_perm = {"qp": permute_kaxis(jnp.asarray(q[0]), bk), "s": jnp.asarray(s[0])}
    y_nat = np.asarray(apply_linear(p_nat, jnp.asarray(x)))
    y_perm = np.asarray(apply_linear(p_perm, jnp.asarray(x)))
    y64 = _f64_oracle(q[0], s[0], x)
    assert _close_to_oracle(y_perm, y64) < 2 * _close_to_oracle(y_nat, y64) + 1e-6
