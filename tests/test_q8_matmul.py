"""Q8_0 Pallas matmul kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from light_whisper_tpu.formats.gguf import quantize_q8_0
from light_whisper_tpu.ops.linear import q8_matmul_xla
from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas


def _case(T, out_f, in_f, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((out_f, in_f)).astype(np.float32) / np.sqrt(in_f)
    q, s = quantize_q8_0(w)
    x = rng.standard_normal((T, in_f)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(q), jnp.asarray(s)


@pytest.mark.parametrize(
    "T,out_f,in_f",
    [
        (1, 256, 512),  # decode step
        (8, 512, 1024),
        (64, 256, 512),
        (200, 384, 512),  # T padded to a tile multiple
    ],
)
def test_kernel_matches_xla_path(T, out_f, in_f):
    x, q, s = _case(T, out_f, in_f)
    want = np.asarray(q8_matmul_xla(x, q, s))
    got = np.asarray(q8_matmul_pallas(x, q, s, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kernel_exact_on_integer_values():
    """With integer activations and power-of-two scales, both paths are exact."""
    rng = np.random.default_rng(1)
    q = rng.integers(-127, 127, size=(256, 512), dtype=np.int8)
    s = np.full((256, 512 // 32), 0.5, dtype=np.float16)
    x = rng.integers(-4, 4, size=(16, 512)).astype(np.float32)
    got = np.asarray(q8_matmul_pallas(jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), interpret=True))
    want = x @ (q.astype(np.float32) * 0.5).T
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_batched_leading_dims():
    x, q, s = _case(12, 256, 512, seed=2)
    x3 = x.reshape(3, 4, 512)
    got = np.asarray(q8_matmul_pallas(x3, q, s, interpret=True))
    want = np.asarray(q8_matmul_xla(x3, q, s))
    assert got.shape == (3, 4, 256)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


# -- layer-indexed stacked kernel (decode hot path) ---------------------------


def _stacked_case(L, T, out_f, in_f, seed=0):
    rng = np.random.default_rng(seed)
    qs, ss = [], []
    for i in range(L):
        w = (rng.standard_normal((out_f, in_f)) * 0.1).astype(np.float32)
        q, s = quantize_q8_0(w)
        qs.append(q)
        ss.append(s)
    x = jnp.asarray(rng.standard_normal((T, in_f)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    q = jnp.asarray(np.stack(qs))
    s = jnp.asarray(np.stack(ss))
    return x, q, s


def test_stacked_kernel_selects_each_layer():
    from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas_stacked

    x, q, s = _stacked_case(L=3, T=8, out_f=256, in_f=512)
    s_t = s.astype(jnp.bfloat16).transpose(0, 2, 1)
    for layer in range(3):
        got = np.asarray(
            q8_matmul_pallas_stacked(x, q, s_t, jnp.int32(layer), interpret=True)
        )
        want = np.asarray(q8_matmul_xla(x, q[layer], s[layer]))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_stacked_kernel_matches_per_layer_kernel_bitwise():
    """Same blocking/accumulation order → bit-identical to the 2D kernel."""
    from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas_stacked

    x, q, s = _stacked_case(L=2, T=8, out_f=384, in_f=1024, seed=3)
    s_t = s.astype(jnp.bfloat16).transpose(0, 2, 1)
    for layer in range(2):
        stacked = np.asarray(
            q8_matmul_pallas_stacked(x, q, s_t, jnp.int32(layer), interpret=True)
        )
        per_layer = np.asarray(q8_matmul_pallas(x, q[layer], s[layer], interpret=True))
        np.testing.assert_array_equal(stacked, per_layer)


def _tiny_stacked_setup():
    """Tiny 2-layer decoder config + stacked Q8 params + input embeds."""
    import jax

    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.models.qwen3_asr.config import DecoderConfig

    cfg = DecoderConfig(
        block_count=2,
        embedding_length=512,
        feed_forward_length=1024,
        head_count=4,
        head_count_kv=2,
        key_length=128,
        rms_epsilon=1e-6,
        rope_freq_base=1e6,
        vocab_size=128,
    )
    rng = np.random.default_rng(11)

    def q8lin(in_f, out_f):
        w = (rng.standard_normal((out_f, in_f)) * (1.0 / np.sqrt(in_f))).astype(
            np.float32
        )
        q, s = quantize_q8_0(w)
        return {"q": jnp.asarray(q), "s": jnp.asarray(s)}

    qdim = cfg.head_count * cfg.key_length
    kvdim = cfg.head_count_kv * cfg.key_length
    layers = []
    for _ in range(cfg.block_count):
        layers.append(
            {
                "attn_norm": jnp.ones(cfg.embedding_length),
                "qkv": q8lin(cfg.embedding_length, qdim + 2 * kvdim),
                "o": q8lin(qdim, cfg.embedding_length),
                "q_norm": jnp.ones(cfg.key_length),
                "k_norm": jnp.ones(cfg.key_length),
                "ffn_norm": jnp.ones(cfg.embedding_length),
                "gateup": q8lin(cfg.embedding_length, 2 * cfg.feed_forward_length),
                "down": q8lin(cfg.feed_forward_length, cfg.embedding_length),
            }
        )

    stacked_layers = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    params = {
        "embed": {"w": jnp.asarray(rng.standard_normal((cfg.vocab_size, cfg.embedding_length)).astype(np.float32) * 0.02)},
        "layers": stacked_layers,
        "final_norm": jnp.ones(cfg.embedding_length),
    }

    embeds = jnp.asarray(
        rng.standard_normal((4, cfg.embedding_length)).astype(np.float32)
    ).astype(jnp.bfloat16)

    prepared = dec.prepare_stacked_scales(params)
    assert "s_t" in prepared["layers"]["qkv"]
    return cfg, prepared, embeds, params


def test_decoder_stacked_path_matches_default(monkeypatch):
    """forward() through the layer-indexed path is greedy-equivalent to the
    per-layer path on identical Q8 params (kernel in interpret mode)."""
    import functools

    import light_whisper_tpu.ops.q8_matmul as q8mod
    from light_whisper_tpu.models.qwen3_asr import decoder as dec

    cfg, prepared, embeds, params = _tiny_stacked_setup()

    cache = dec.init_cache(cfg, 64)
    base_hidden, base_cache = dec.forward(cfg, params, embeds, cache)
    monkeypatch.setattr(dec, "_use_stacked_kernel", lambda layers: "s_t" in layers.get("qkv", {}))
    monkeypatch.setenv("LWT_FUSED_DECODE", "0")  # first compare the unfused path
    monkeypatch.setattr(
        q8mod,
        "q8_matmul_pallas_stacked",
        functools.partial(q8mod.q8_matmul_pallas_stacked, interpret=True),
    )
    cache2 = dec.init_cache(cfg, 64)
    st_hidden, st_cache = dec.forward(cfg, prepared, embeds, cache2)

    # Q8 weights are identical; the two paths share blocking, so hidden
    # states agree to bf16 round-off and the caches match closely.
    np.testing.assert_allclose(
        np.asarray(base_hidden, np.float32),
        np.asarray(st_hidden, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(base_cache.k, np.float32),
        np.asarray(st_cache.k, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )

    # Fused stacked path (norm prologue / residual epilogue folded into the
    # projection kernels): the folds reproduce the unfused rounding sequence
    # op-for-op — `test_fused_stacked_kernel_bit_matches_unfused` proves the
    # kernel calls bit-identical in isolation. Through a full jitted forward
    # the two paths are *different XLA programs*, so excess-precision /
    # fusion freedom moves bf16 roundings around; the forward-level contract
    # is the same bf16-ulp closeness the unfused-vs-default comparison uses.
    monkeypatch.setenv("LWT_FUSED_DECODE", "1")
    monkeypatch.setattr(
        q8mod,
        "q8_matmul_pallas_stacked_fused",
        functools.partial(q8mod.q8_matmul_pallas_stacked_fused, interpret=True),
    )
    cache3 = dec.init_cache(cfg, 64)
    fu_hidden, fu_cache = dec.forward(cfg, prepared, embeds, cache3)
    np.testing.assert_allclose(
        np.asarray(st_cache.k, np.float32),
        np.asarray(fu_cache.k, np.float32),
        rtol=1e-2,
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(st_cache.v, np.float32),
        np.asarray(fu_cache.v, np.float32),
        rtol=1e-2,
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(st_hidden, np.float32),
        np.asarray(fu_hidden, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_decoder_fused_ffn_path_matches(monkeypatch):
    """LWT_FUSED_FFN routes the FFN half through the single-launch
    megakernel; forward must agree with the fused-projection path to the
    same bf16-ulp contract (the megakernel adds the residual in f32 — one
    rounding instead of the unfused path's two)."""
    import functools

    import jax

    import light_whisper_tpu.ops.fused_ffn as ffnmod
    import light_whisper_tpu.ops.q8_matmul as q8mod
    from light_whisper_tpu.models.qwen3_asr import decoder as dec

    cfg, prepared, embeds, _params = _tiny_stacked_setup()
    monkeypatch.setattr(
        dec, "_use_stacked_kernel", lambda layers: "s_t" in layers.get("qkv", {})
    )
    monkeypatch.setenv("LWT_FUSED_DECODE", "1")
    monkeypatch.setattr(
        q8mod,
        "q8_matmul_pallas_stacked",
        functools.partial(q8mod.q8_matmul_pallas_stacked, interpret=True),
    )
    monkeypatch.setattr(
        q8mod,
        "q8_matmul_pallas_stacked_fused",
        functools.partial(q8mod.q8_matmul_pallas_stacked_fused, interpret=True),
    )

    cache1 = dec.init_cache(cfg, 64)
    base_hidden, base_cache = dec.forward(cfg, prepared, embeds, cache1)

    monkeypatch.setenv("LWT_FUSED_FFN", "1")
    monkeypatch.setattr(
        ffnmod, "fused_ffn_step", functools.partial(ffnmod.fused_ffn_step, interpret=True)
    )
    jax.clear_caches()  # the env gate is read at trace time
    cache2 = dec.init_cache(cfg, 64)
    ffn_hidden, ffn_cache = dec.forward(cfg, prepared, embeds, cache2)

    np.testing.assert_allclose(
        np.asarray(base_cache.k, np.float32),
        np.asarray(ffn_cache.k, np.float32),
        rtol=1e-2,
        atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(base_hidden, np.float32),
        np.asarray(ffn_hidden, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_fused_stacked_kernel_bit_matches_unfused():
    """The folded rms-norm prologue and residual epilogue reproduce the
    unfused op sequence EXACTLY (same rounding points): called eagerly on
    identical inputs, fused and unfused results are bit-equal."""
    import jax

    from light_whisper_tpu.formats.gguf import quantize_q8_0
    from light_whisper_tpu.models.qwen3_asr.decoder import rms_norm
    from light_whisper_tpu.ops.q8_matmul import (
        q8_matmul_pallas_stacked,
        q8_matmul_pallas_stacked_fused,
    )

    rng = np.random.default_rng(11)
    L, O, K = 2, 1024, 512
    w = (rng.standard_normal((L, O, K)) * (1.0 / np.sqrt(K))).astype(np.float32)
    qs = [quantize_q8_0(w[i]) for i in range(L)]
    q = jnp.stack([jnp.asarray(a) for a, _ in qs])
    s = jnp.stack([jnp.asarray(b) for _, b in qs])
    s_t = jnp.swapaxes(s.astype(jnp.bfloat16), 1, 2)

    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    norm = jnp.asarray(1.0 + rng.standard_normal(K).astype(np.float32) * 0.1)
    eps = 1e-6

    h = rms_norm(x, norm, eps)
    want = np.asarray(q8_matmul_pallas_stacked(h, q, s_t, jnp.int32(1), interpret=True))
    got = np.asarray(
        q8_matmul_pallas_stacked_fused(
            x, q, s_t, jnp.int32(1), norm_w=norm, eps=eps, interpret=True
        )
    )
    np.testing.assert_array_equal(want, got)

    res = jnp.asarray(rng.standard_normal((4, O)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    want = np.asarray(
        (
            res
            + q8_matmul_pallas_stacked(x, q, s_t, jnp.int32(0), interpret=True).astype(
                res.dtype
            )
        ).astype(jnp.float32)
    )
    got = np.asarray(
        q8_matmul_pallas_stacked_fused(x, q, s_t, jnp.int32(0), residual=res, interpret=True)
        .astype(res.dtype)
        .astype(jnp.float32)
    )
    np.testing.assert_array_equal(want, got)


def test_contig_bk_tiling_matches_default(monkeypatch):
    """LWT_BK2048 selects the contiguous-read tiling (bo≤1024, bk=2048) on
    divisible shapes and leaves others alone; kernel outputs match the
    default tiling (a different k-grouping of the f32 accumulator — equal
    up to reduction-order rounding, so allclose, not bitwise)."""
    from light_whisper_tpu.ops import q8_matmul as m

    # auto (default): contig only for the measured winners — in==2048 with
    # out >= 8192 (1.7B gateup + tied-embed logits)
    monkeypatch.delenv("LWT_BK2048", raising=False)
    assert m._tile_policy(12288, 2048) == (1024, 2048)  # gateup
    assert m._tile_policy(152576, 2048) == (1024, 2048)  # logits
    assert m._tile_policy(4096, 2048) == (2048, 512)  # qkv: default wins (--diff)
    assert m._tile_policy(2048, 6144) == (2048, 512)  # down: contig regresses
    # 0.6B (D=1024) keeps base tiling everywhere: per-call --diff wins for
    # o/down/logits at bk=1024 did NOT transfer to the chained decode step
    # (full-program A/B flat-to-worse — see the _tile_policy docstring).
    assert m._tile_policy(1024, 2048) == (1024, 512)  # o
    assert m._tile_policy(1024, 3072) == (1024, 512)  # down
    assert m._tile_policy(152576, 1024) == (1024, 512)  # logits
    assert m._tile_policy(4096, 1024) == (2048, 512)  # qkv
    assert m._tile_policy(6144, 1024) == (2048, 512)  # gateup
    # forced on: every divisible shape
    monkeypatch.setenv("LWT_BK2048", "1")
    assert m._tile_policy(12288, 2048) == (1024, 2048)
    assert m._tile_policy(512, 2048) == (512, 2048)
    assert m._tile_policy(2048, 6144) == (1024, 2048)
    assert m._tile_policy(12288, 1024) == (2048, 512)  # indivisible in-dim
    # forced off
    monkeypatch.setenv("LWT_BK2048", "0")
    assert m._tile_policy(12288, 2048) == (2048, 512)

    # Numeric check: contig vs base tiling on a small divisible shape
    # (forced-on picks contig for it; forced-off picks base).
    monkeypatch.setenv("LWT_BK2048", "1")
    rng = np.random.default_rng(17)
    L, O, K = 2, 512, 2048
    w = (rng.standard_normal((L, O, K)) * (1.0 / np.sqrt(K))).astype(np.float32)
    qs = [quantize_q8_0(w[i]) for i in range(L)]
    q = jnp.stack([jnp.asarray(a) for a, _ in qs])
    s = jnp.stack([jnp.asarray(b) for _, b in qs])
    s_t = jnp.swapaxes(s.astype(jnp.bfloat16), 1, 2)
    x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    norm = jnp.asarray(1.0 + rng.standard_normal(K).astype(np.float32) * 0.1)

    got = np.asarray(
        m.q8_matmul_pallas_stacked(x, q, s_t, jnp.int32(1), interpret=True)
    )
    got_fused = np.asarray(
        m.q8_matmul_pallas_stacked_fused(
            x, q, s_t, jnp.int32(1), norm_w=norm, interpret=True
        )
    )
    monkeypatch.setenv("LWT_BK2048", "0")
    want = np.asarray(
        m.q8_matmul_pallas_stacked(x, q, s_t, jnp.int32(1), interpret=True)
    )
    want_fused = np.asarray(
        m.q8_matmul_pallas_stacked_fused(
            x, q, s_t, jnp.int32(1), norm_w=norm, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_fused, want_fused, rtol=1e-5, atol=1e-5)


def test_fused_gateup_silu_matches_unfused():
    """Half-fused FFN kernel: silu(gate)·up in one layer-indexed launch."""
    import jax

    from light_whisper_tpu.ops.fused_ffn import fused_gateup_silu

    rng = np.random.default_rng(4)
    L, D, F, T = 2, 512, 1024, 8
    qs, ss = [], []
    for _ in range(L):
        w = (rng.standard_normal((2 * F, D)) * 0.05).astype(np.float32)
        q, s = quantize_q8_0(w)
        qs.append(q)
        ss.append(s)
    gq = jnp.asarray(np.stack(qs))
    gs = jnp.asarray(np.stack(ss))
    gs_t = gs.astype(jnp.bfloat16).transpose(0, 2, 1)
    h = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32)).astype(jnp.bfloat16)
    for layer in range(L):
        got = np.asarray(
            fused_gateup_silu(h, gq, gs_t, jnp.int32(layer), interpret=True),
            np.float32,
        )
        gu = q8_matmul_xla(h, gq[layer], gs[layer])
        g, u = jnp.split(gu, 2, -1)
        want = np.asarray((jax.nn.silu(g) * u).astype(jnp.bfloat16), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_ffn_step_matches_unfused():
    """Full fused FFN kernel (norm+gate/up+silu+down+residual, one launch)."""
    import jax

    from light_whisper_tpu.ops.fused_ffn import fused_ffn_step

    rng = np.random.default_rng(2)
    L, D, F, T = 2, 512, 1024, 8
    gq_l, gs_l, dq_l, ds_l = [], [], [], []
    for _ in range(L):
        wg = (rng.standard_normal((2 * F, D)) * 0.05).astype(np.float32)
        wd = (rng.standard_normal((D, F)) * 0.05).astype(np.float32)
        q1, s1 = quantize_q8_0(wg)
        q2, s2 = quantize_q8_0(wd)
        gq_l.append(q1), gs_l.append(s1), dq_l.append(q2), ds_l.append(s2)
    gq, gs = jnp.asarray(np.stack(gq_l)), jnp.asarray(np.stack(gs_l))
    dq, ds = jnp.asarray(np.stack(dq_l)), jnp.asarray(np.stack(ds_l))
    gs_t = gs.astype(jnp.bfloat16).transpose(0, 2, 1)
    ds_t = ds.astype(jnp.bfloat16).transpose(0, 2, 1)
    norm_w = jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1 + 1.0)
    x = jnp.asarray(rng.standard_normal((T, D)).astype(np.float32)).astype(jnp.bfloat16)

    for layer in range(L):
        got = np.asarray(
            fused_ffn_step(x, norm_w, gq, gs_t, dq, ds_t, jnp.int32(layer), interpret=True)
        )
        xf = x.astype(jnp.float32)
        scale = jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
        hh = (xf * scale * norm_w).astype(jnp.bfloat16)
        gu = q8_matmul_xla(hh, gq[layer], gs[layer])
        g, u = jnp.split(gu, 2, -1)
        inner = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
        want = np.asarray(xf + q8_matmul_xla(inner, dq[layer], ds[layer]))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_stacked_norm_prologue_and_residual_epilogue():
    """q8_matmul_pallas_stacked_fused folds rms-norm / residual correctly,
    and its bare mode is bit-identical to the unfused stacked kernel."""
    import jax
    import ml_dtypes

    from light_whisper_tpu.ops.q8_matmul import (
        q8_matmul_pallas_stacked,
        q8_matmul_pallas_stacked_fused,
    )

    rng = np.random.default_rng(7)
    L, O, K, T = 2, 256, 512, 8
    qs, ss = [], []
    for _ in range(L):
        w = (rng.standard_normal((O, K)) * 0.05).astype(np.float32)
        q, s = quantize_q8_0(w)
        qs.append(q)
        ss.append(s)
    q = jnp.asarray(np.stack(qs))
    s = jnp.asarray(np.stack(ss))
    s_t = s.astype(jnp.bfloat16).transpose(0, 2, 1)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32)).astype(jnp.bfloat16)
    norm_w = jnp.asarray(rng.standard_normal(K).astype(np.float32) * 0.1 + 1.0)
    res = jnp.asarray(rng.standard_normal((T, O)).astype(np.float32))

    for layer in range(L):
        got = np.asarray(
            q8_matmul_pallas_stacked_fused(
                x, q, s_t, jnp.int32(layer), norm_w=norm_w, residual=res,
                interpret=True,
            )
        )
        xf = np.asarray(x, np.float32)
        scale = 1.0 / np.sqrt((xf ** 2).mean(-1, keepdims=True) + 1e-6)
        h = (xf * scale * np.asarray(norm_w)).astype(ml_dtypes.bfloat16)
        want = np.asarray(q8_matmul_xla(jnp.asarray(h), q[layer], s[layer])) + np.asarray(res)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

        bare_fused = np.asarray(
            q8_matmul_pallas_stacked_fused(x, q, s_t, jnp.int32(layer), interpret=True)
        )
        bare = np.asarray(
            q8_matmul_pallas_stacked(x, q, s_t, jnp.int32(layer), interpret=True)
        )
        np.testing.assert_array_equal(bare_fused, bare)
