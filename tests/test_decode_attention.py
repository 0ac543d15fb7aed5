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


# -- chunked (online-softmax) prefill attention ------------------------------


def test_chunked_prefill_matches_dense():
    import numpy as np

    from light_whisper_tpu.models.qwen3_asr.decoder import (
        _attention_chunked,
        NEG_INF,
    )

    rng = np.random.default_rng(5)
    n_kv, groups, hd = 2, 2, 128
    T, C = 16, 8192
    n_heads = n_kv * groups
    q = jnp.asarray(rng.standard_normal((T, n_heads, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n_kv, C, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((n_kv, C, hd)).astype(np.float32) * 0.3)
    q_pos = jnp.arange(100, 100 + T)

    got = np.asarray(
        _attention_chunked(q, k, v, q_pos, groups, jnp.float32), np.float64
    )

    # dense reference
    qg = np.asarray(q, np.float64).reshape(T, n_kv, groups, hd).transpose(1, 2, 0, 3)
    logits = np.einsum("kgtd,kcd->kgtc", qg, np.asarray(k, np.float64)) * hd ** -0.5
    mask = np.arange(C)[None, :] <= np.asarray(q_pos)[:, None]
    logits = np.where(mask[None, None], logits, NEG_INF)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = (
        np.einsum("kgtc,kcd->kgtd", w, np.asarray(v, np.float64))
        .transpose(2, 0, 1, 3)
        .reshape(T, n_heads, hd)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_prefill_routes_to_chunked_at_large_capacity():
    import numpy as np

    from light_whisper_tpu.models.qwen3_asr import decoder as dec

    rng = np.random.default_rng(6)
    n_kv, groups, hd = 2, 2, 128
    T, C = 8, 8192
    q = jnp.asarray(rng.standard_normal((T, n_kv * groups, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n_kv, C, hd)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal((n_kv, C, hd)).astype(np.float32) * 0.3)
    q_pos = jnp.arange(40, 40 + T)
    # on CPU the kernel gate is off; large capacity + T>1 must take the
    # chunked path and still agree with the dense fallback
    got = np.asarray(dec._attention(q, k, v, q_pos, groups, jnp.float32))
    small_C = 1024
    got_dense_small = np.asarray(
        dec._attention(q, k[:, :small_C], v[:, :small_C], q_pos, groups, jnp.float32)
    )
    # keys beyond q_pos are masked in both, so truncating the cache at 1024
    # (> max q_pos) must not change the result
    np.testing.assert_allclose(got, got_dense_small, rtol=1e-4, atol=1e-4)


def test_stacked_attention_kernel_selects_layer():
    import numpy as np

    from light_whisper_tpu.ops.decode_attention import (
        decode_attention_pallas,
        decode_attention_pallas_stacked,
    )

    rng = np.random.default_rng(9)
    L, n_kv, groups, hd, C, T = 3, 2, 4, 128, 256, 2
    n_heads = n_kv * groups
    q = jnp.asarray(rng.standard_normal((T, n_heads, hd)).astype(np.float32))
    k_all = jnp.asarray(rng.standard_normal((L, n_kv, C, hd)).astype(np.float32) * 0.2)
    v_all = jnp.asarray(rng.standard_normal((L, n_kv, C, hd)).astype(np.float32) * 0.2)
    q_pos = jnp.asarray([100, 101], jnp.int32)
    for layer in range(L):
        got = np.asarray(
            decode_attention_pallas_stacked(
                q, k_all, v_all, q_pos, jnp.int32(layer), interpret=True
            )
        )
        want = np.asarray(
            decode_attention_pallas(q, k_all[layer], v_all[layer], q_pos, interpret=True)
        )
        np.testing.assert_array_equal(got, want)


def test_batched_kernel_matches_xla_batched_path():
    """decode_attention_pallas_batched (interpret) vs the decoder's XLA
    batched-einsum attention over per-stream caches at mixed positions."""
    import jax

    from light_whisper_tpu.models.qwen3_asr.decoder import _attention_decode_batch
    from light_whisper_tpu.ops.decode_attention import (
        decode_attention_pallas_batched,
        usable_batched,
    )

    B, H, n_kv, C, hd, L = 4, 16, 8, 256, 128, 3
    assert usable_batched(B, H, hd, C, n_kv)
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    k_all = (rng.standard_normal((B, L, n_kv, C, hd)) * 0.3).astype(np.float32)
    v_all = rng.standard_normal((B, L, n_kv, C, hd)).astype(np.float32)
    pos = np.asarray([7, 100, 255, 0], dtype=np.int32)

    for layer in range(L):
        got = np.asarray(
            decode_attention_pallas_batched(
                jnp.asarray(q),
                jnp.asarray(k_all),
                jnp.asarray(v_all),
                jnp.asarray(pos),
                jnp.int32(layer),
                interpret=True,
            )
        ).reshape(B, H * hd)
        want = np.asarray(
            _attention_decode_batch(
                jnp.asarray(q),
                jnp.asarray(k_all[:, layer]),
                jnp.asarray(v_all[:, layer]),
                jnp.asarray(pos),
                H // n_kv,
                jnp.float32,
            )
        )
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_batched_kernel_row_padding_isolated():
    """The padded query rows (G→8) must not leak into real outputs: perturb
    nothing, change one stream's pos, only that stream's rows move."""
    from light_whisper_tpu.ops.decode_attention import decode_attention_pallas_batched

    B, H, n_kv, C, hd, L = 2, 4, 2, 128, 128, 1
    rng = np.random.default_rng(9)
    q = rng.standard_normal((B, H, hd)).astype(np.float32)
    k_all = (rng.standard_normal((B, L, n_kv, C, hd)) * 0.3).astype(np.float32)
    v_all = rng.standard_normal((B, L, n_kv, C, hd)).astype(np.float32)

    a = np.asarray(decode_attention_pallas_batched(
        jnp.asarray(q), jnp.asarray(k_all), jnp.asarray(v_all),
        jnp.asarray([50, 60], np.int32), jnp.int32(0), interpret=True,
    ))
    b = np.asarray(decode_attention_pallas_batched(
        jnp.asarray(q), jnp.asarray(k_all), jnp.asarray(v_all),
        jnp.asarray([50, 10], np.int32), jnp.int32(0), interpret=True,
    ))
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[1], b[1])
