"""Row-batched decode (``forward_decode_batch``) vs per-stream forward.

The batched step treats the stream dimension as matmul rows so the Q8
weight stack is read once per step for the whole batch (see decoder
docstrings). These tests pin numerical parity with the single-stream
path — dense CPU, stacked-kernel interpret mode, and fused-kernel
interpret mode — over streams at *different* cache positions.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from light_whisper_tpu.formats.gguf import quantize_q8_0
from light_whisper_tpu.models.qwen3_asr import decoder as dec
from light_whisper_tpu.models.qwen3_asr.config import DecoderConfig


def _setup(seed: int = 11):
    """Tiny 2-layer decoder with kernel-compatible Q8 shapes."""
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
    rng = np.random.default_rng(seed)

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
    params = {
        "embed": {
            "w": jnp.asarray(
                rng.standard_normal((cfg.vocab_size, cfg.embedding_length)).astype(
                    np.float32
                )
                * 0.02
            )
        },
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones(cfg.embedding_length),
    }
    return cfg, params, rng


def _prefill_streams(cfg, params, rng, lengths, capacity):
    """Per-stream prefill at mixed lengths; returns per-stream caches + a
    fresh batched token embedding for the next step."""
    caches = []
    for length in lengths:
        prefix = jnp.asarray(
            rng.standard_normal((length, cfg.embedding_length)).astype(np.float32)
        ).astype(jnp.bfloat16)
        cache = dec.init_cache(cfg, capacity)
        _h, cache = dec.forward(cfg, params, prefix, cache)
        caches.append(cache)
    x = jnp.asarray(
        rng.standard_normal((len(lengths), cfg.embedding_length)).astype(np.float32)
    ).astype(jnp.bfloat16)
    return caches, x


def _stack_caches(caches):
    return dec.KVCache(
        k=jnp.stack([c.k for c in caches]),
        v=jnp.stack([c.v for c in caches]),
        pos=jnp.asarray([int(c.pos) for c in caches], dtype=jnp.int32),
    )


def test_forward_decode_batch_matches_per_stream():
    cfg, params, rng = _setup()
    lengths = [3, 7, 5, 1]
    caches, x = _prefill_streams(cfg, params, rng, lengths, capacity=32)

    batched = _stack_caches(caches)
    hidden_b, batched_out = dec.forward_decode_batch(cfg, params, x, batched)

    for b, cache in enumerate(caches):
        hidden_s, cache_s = dec.forward(cfg, params, x[b][None], cache)
        np.testing.assert_allclose(
            np.asarray(hidden_b[b], np.float32),
            np.asarray(hidden_s[0], np.float32),
            rtol=3e-2,
            atol=3e-2,
        )
        # The new K/V row landed at this stream's own position.
        np.testing.assert_allclose(
            np.asarray(batched_out.k[b], np.float32),
            np.asarray(cache_s.k, np.float32),
            rtol=3e-2,
            atol=3e-2,
        )
        assert int(batched_out.pos[b]) == lengths[b] + 1


def test_forward_decode_batch_stream_isolation():
    """Changing one stream's input must not perturb any other stream."""
    cfg, params, rng = _setup(seed=3)
    lengths = [4, 4, 4]
    caches, x = _prefill_streams(cfg, params, rng, lengths, capacity=32)
    batched = _stack_caches(caches)

    hidden_a, _ = dec.forward_decode_batch(cfg, params, x, batched)
    x2 = x.at[1].set(x[1] * -2.0 + 0.5)
    batched2 = _stack_caches(caches)
    hidden_c, _ = dec.forward_decode_batch(cfg, params, x2, batched2)

    np.testing.assert_array_equal(np.asarray(hidden_a[0]), np.asarray(hidden_c[0]))
    np.testing.assert_array_equal(np.asarray(hidden_a[2]), np.asarray(hidden_c[2]))
    assert not np.array_equal(np.asarray(hidden_a[1]), np.asarray(hidden_c[1]))


@pytest.mark.parametrize("fused", [False, True])
def test_forward_decode_batch_stacked_interpret(monkeypatch, fused):
    """Stacked-kernel batched path (interpret mode) matches the XLA batched
    path — with and without the norm/residual folds."""
    import light_whisper_tpu.ops.q8_matmul as q8mod

    cfg, params, rng = _setup(seed=7)
    lengths = [2, 6]
    caches, x = _prefill_streams(cfg, params, rng, lengths, capacity=32)
    batched = _stack_caches(caches)
    hidden_ref, out_ref = dec.forward_decode_batch(cfg, params, x, batched)

    prepared = dec.prepare_stacked_scales(params)
    assert "s_t" in prepared["layers"]["qkv"]
    monkeypatch.setattr(
        dec, "_use_stacked_kernel", lambda layers: "s_t" in layers.get("qkv", {})
    )
    monkeypatch.setenv("LWT_FUSED_DECODE", "1" if fused else "0")
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
    batched2 = _stack_caches(caches)
    hidden_st, out_st = dec.forward_decode_batch(cfg, params, x, batched2)

    np.testing.assert_allclose(
        np.asarray(hidden_ref, np.float32),
        np.asarray(hidden_st, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref.k, np.float32),
        np.asarray(out_st.k, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )
    np.testing.assert_array_equal(np.asarray(out_ref.pos), np.asarray(out_st.pos))


def test_forward_decode_batch_attention_kernel_interpret(monkeypatch):
    """forward_decode_batch with the batched attention kernel (interpret)
    matches the XLA batched attention path bit-for-bit at the layer level."""
    import light_whisper_tpu.ops.decode_attention as da
    from light_whisper_tpu.models.qwen3_asr import decoder as dmod

    cfg, params, rng = _setup(seed=13)
    lengths = [3, 9]
    caches, x = _prefill_streams(cfg, params, rng, lengths, capacity=128)
    batched = _stack_caches(caches)
    hidden_ref, out_ref = dec.forward_decode_batch(cfg, params, x, batched)

    monkeypatch.setattr(
        dmod, "_use_batched_attention_kernel", lambda *a: True
    )
    monkeypatch.setattr(
        da,
        "decode_attention_pallas_batched",
        functools.partial(da.decode_attention_pallas_batched, interpret=True),
    )
    batched2 = _stack_caches(caches)
    hidden_k, out_k = dec.forward_decode_batch(cfg, params, x, batched2)

    np.testing.assert_allclose(
        np.asarray(hidden_ref, np.float32),
        np.asarray(hidden_k, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref.k, np.float32),
        np.asarray(out_k.k, np.float32),
        rtol=3e-2,
        atol=3e-2,
    )


def test_decode_greedy_batch_staggered_eos(monkeypatch):
    """Streams hitting EOS at different steps: each stream's token list must
    cut at ITS EOS, later-finishing streams keep decoding, and a stream
    whose FIRST token is EOS contributes nothing. The forward is stubbed
    with a step-indexed emission schedule (random tiny models rarely emit
    EOS, so real decodes never exercise the done mask)."""
    from light_whisper_tpu.models.qwen3_asr import model as mmod

    cfg, params, rng = _setup(seed=17)
    eos = 99
    scripts = [
        [5, 6, eos],          # finishes at step 3
        [7, 8, 9, 10, eos],   # finishes at step 5
        [eos],                # first decoded token is EOS -> empty output
    ]
    max_steps = 8
    schedule = np.zeros((max_steps, len(scripts)), np.int32)
    for b, script in enumerate(scripts):
        for i in range(max_steps):
            schedule[i, b] = script[i] if i < len(script) else 0
    sched = jnp.asarray(schedule)
    pos0 = 4

    def fake_forward(cfg_, params_, x, cache):
        # thread the step index through the carried position
        step = cache.pos[0] - pos0
        h = jnp.full((x.shape[0], 1), step, jnp.int32)
        return h, cache._replace(pos=cache.pos + 1)

    def fake_logits(cfg_, params_, hidden):
        i = jnp.clip(hidden[0, 0], 0, max_steps - 1)
        return jax.nn.one_hot(sched[i], cfg.vocab_size, dtype=jnp.float32)

    monkeypatch.setattr(dec, "forward_decode_batch", fake_forward)
    monkeypatch.setattr(dec, "logits_for", fake_logits)
    decode_fn = mmod._decode_greedy_batch.__wrapped__  # skip the jit cache

    caches = dec.KVCache(
        k=jnp.zeros((3, cfg.block_count, cfg.head_count_kv, 16, cfg.key_length), jnp.bfloat16),
        v=jnp.zeros((3, cfg.block_count, cfg.head_count_kv, 16, cfg.key_length), jnp.bfloat16),
        pos=jnp.asarray([pos0, pos0, pos0], jnp.int32),
    )
    firsts = jnp.asarray([5, 7, eos], jnp.int32)
    tokens, _caches = decode_fn(cfg, params, firsts, caches, eos, max_steps)
    rows = [[int(t) for t in row if t >= 0] for row in np.asarray(tokens)]
    assert rows[0] == [5, 5, 6]       # first token echoed, then script; EOS excluded
    assert rows[1] == [7, 7, 8, 9, 10]
    assert rows[2] == []              # EOS-first stream stays silent
