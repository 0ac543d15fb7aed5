"""Flash-prefill kernel correctness (interpret mode) vs the XLA paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_whisper_tpu.models.qwen3_asr.decoder import (
    _attention,
    _attention_chunked,
)
from light_whisper_tpu.ops.flash_prefill import flash_prefill_attention, usable


def _setup(T, n_heads, n_kv, hd, capacity, pos_base, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((T, n_heads, hd)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(
        (rng.standard_normal((n_kv, capacity, hd)) * 0.2).astype(np.float32)
    ).astype(jnp.bfloat16)
    v = jnp.asarray(
        (rng.standard_normal((n_kv, capacity, hd)) * 0.2).astype(np.float32)
    ).astype(jnp.bfloat16)
    q_pos = jnp.arange(pos_base, pos_base + T, dtype=jnp.int32)
    return q, k, v, q_pos


@pytest.mark.parametrize(
    "T,n_heads,n_kv,capacity,pos_base",
    [
        (128, 16, 8, 1024, 896),  # mid-prompt prefill
        (64, 4, 2, 512, 100),  # queries in the middle of the cache
        (8, 4, 2, 512, 0),  # ragged tiny prompt (single padded row tile)
        (96, 6, 2, 512, 200),  # G=3, ragged rows (288)
    ],
)
def test_matches_dense_attention(T, n_heads, n_kv, capacity, pos_base):
    hd = 128
    assert usable(T, hd, capacity)
    q, k, v, q_pos = _setup(T, n_heads, n_kv, hd, capacity, pos_base)
    groups = n_heads // n_kv

    want = _attention(q, k, v, q_pos, groups, jnp.bfloat16)
    got = flash_prefill_attention(q, k, v, q_pos, interpret=True)
    np.testing.assert_allclose(
        np.asarray(want, np.float32),
        np.asarray(got, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_matches_chunked_at_longform_shape():
    """Same math as the XLA online-softmax path at a (scaled-down) long-form
    shape: 512 queries at the end of an 8k cache."""
    T, n_heads, n_kv, hd, capacity = 512, 16, 8, 128, 8192
    q, k, v, q_pos = _setup(T, n_heads, n_kv, hd, capacity, capacity - T, seed=1)
    groups = n_heads // n_kv

    want = _attention_chunked(q, k, v, q_pos, groups, jnp.bfloat16)
    got = flash_prefill_attention(q, k, v, q_pos, interpret=True)
    np.testing.assert_allclose(
        np.asarray(want, np.float32),
        np.asarray(got, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_padding_rows_are_exact_zero_and_sliced():
    """Ragged G·T (not a tile multiple) must not contaminate real rows."""
    T, n_heads, n_kv, hd, capacity = 12, 4, 2, 128, 512
    q, k, v, q_pos = _setup(T, n_heads, n_kv, hd, capacity, 40, seed=2)
    got = flash_prefill_attention(q, k, v, q_pos, interpret=True)
    assert got.shape == (T, n_heads, hd)
    assert np.isfinite(np.asarray(got, np.float32)).all()

    # Pin the kernel's documented invariant directly: fully masked rows
    # (qpos = -1) leave l == 0 and flush to EXACT zero — not mean-of-V
    # (the failure mode when exp(s - m) is left unmasked and m stays
    # NEG_INF). A future caller using in-band masked rows instead of
    # sliced padding relies on this.
    from light_whisper_tpu.ops.flash_prefill import _flash_rows

    groups = n_heads // n_kv
    rows = groups * T  # 24: ragged → one padded row tile of 32
    pad = -rows % 8
    q_rows = (
        q.reshape(T, n_kv, groups, hd).transpose(1, 2, 0, 3).reshape(n_kv, rows, hd)
    ).astype(jnp.bfloat16)
    q_rows = jnp.pad(q_rows, ((0, 0), (0, pad), (0, 0)))
    qpos_rows = jnp.pad(
        jnp.tile(q_pos.astype(jnp.int32), (groups,)), (0, pad), constant_values=-1
    )
    out = _flash_rows(
        q_rows,
        k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        qpos_rows[None, :],
        rows + pad,
        512,
        True,
    )
    padding = np.asarray(out[:, rows:], np.float32)
    np.testing.assert_array_equal(padding, np.zeros_like(padding))
