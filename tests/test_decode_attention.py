"""Pallas decode-attention kernel vs the einsum path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_whisper_tpu.ops.decode_attention import decode_attention_pallas, usable


def _einsum_reference(q, k_cache, v_cache, q_positions):
    n_kv, C, hd = k_cache.shape
    T, H, _ = q.shape
    groups = H // n_kv
    qg = np.asarray(q, np.float32).reshape(T, n_kv, groups, hd)
    logits = np.einsum("tkgd,kcd->kgtc", qg, np.asarray(k_cache, np.float32)) / np.sqrt(hd)
    mask = np.arange(C)[None, :] <= np.asarray(q_positions)[:, None]
    logits = np.where(mask[None, None], logits, -1e30)
    logits -= logits.max(-1, keepdims=True)
    w = np.exp(logits); w /= w.sum(-1, keepdims=True)
    out = np.einsum("kgtc,kcd->tkgd", w, np.asarray(v_cache, np.float32))
    return out.reshape(T, H, hd)


@pytest.mark.parametrize("T,H,n_kv,C", [(8, 16, 8, 256), (8, 4, 2, 128), (16, 8, 4, 512)])
def test_kernel_matches_einsum(T, H, n_kv, C):
    hd = 128
    rng = np.random.default_rng(0)
    q = rng.standard_normal((T, H, hd)).astype(np.float32)
    k = rng.standard_normal((n_kv, C, hd)).astype(np.float32) * 0.3
    v = rng.standard_normal((n_kv, C, hd)).astype(np.float32)
    pos = np.arange(40, 40 + T, dtype=np.int32)

    got = np.asarray(
        decode_attention_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos), interpret=True)
    )
    want = _einsum_reference(q, k, v, pos)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_masking_respects_positions():
    """Keys beyond a query's position must not influence its output."""
    hd, n_kv, C, T, H = 128, 2, 128, 8, 4
    rng = np.random.default_rng(1)
    q = rng.standard_normal((T, H, hd)).astype(np.float32)
    k = rng.standard_normal((n_kv, C, hd)).astype(np.float32) * 0.3
    v = rng.standard_normal((n_kv, C, hd)).astype(np.float32)
    pos = np.full(T, 10, dtype=np.int32)

    out1 = np.asarray(decode_attention_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos), interpret=True))
    k2, v2 = k.copy(), v.copy()
    k2[:, 11:] = 99.0  # garbage beyond the mask
    v2[:, 11:] = -99.0
    out2 = np.asarray(decode_attention_pallas(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(pos), interpret=True))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_usable_gate():
    assert usable(T=8, n_heads=16, hd=128, capacity=1024, n_kv=8)
    assert not usable(T=8, n_heads=16, hd=96, capacity=1024, n_kv=8)  # hd not 128-aligned
    assert not usable(T=128, n_heads=16, hd=128, capacity=1024, n_kv=8)  # prefill-sized
    assert not usable(T=8, n_heads=16, hd=128, capacity=32768, n_kv=8)  # cache too big for VMEM
