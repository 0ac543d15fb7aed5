"""Mesh sharding, multi-chip train step, and checkpoint round trip.

Runs on the virtual 8-device CPU mesh from conftest.
"""

import sys

import jax
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

sys.path.insert(0, ".")

from light_whisper_tpu.parallel.mesh import make_mesh
from light_whisper_tpu.parallel.sharding import param_specs


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh2 = make_mesh(tp=8)
    assert mesh2.shape == {"dp": 1, "tp": 8}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_param_specs_megatron_split():
    import jax.numpy as jnp

    params = {
        "layers": {
            "q": {"w": jnp.zeros((2, 8, 16))},
            "o": {"w": jnp.zeros((2, 16, 8))},
            "gate": {"q": jnp.zeros((2, 32, 8), jnp.int8), "s": jnp.zeros((2, 32, 1))},
            "attn_norm": jnp.zeros((2, 8)),
        },
        "final_norm": jnp.zeros(8),
    }
    specs = param_specs(params)
    assert specs["layers"]["q"]["w"] == P(None, None, "tp")
    assert specs["layers"]["o"]["w"] == P(None, "tp", None)
    assert specs["layers"]["gate"]["q"] == P(None, "tp", None)
    assert specs["layers"]["gate"]["s"] == P(None, "tp", None)
    assert specs["layers"]["attn_norm"] == P()
    assert specs["final_norm"] == P()


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_virtual_mesh():
    """Driver conditions: a process whose backend initializes with one device
    must respawn itself onto a virtual n-device CPU mesh (MULTICHIP check).

    ``-S`` skips the sitecustomize so the outer process deterministically
    lands on a single CPU device; the respawned child goes through the real
    staged path (sitecustomize + jax.config override)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "_LWT_DRYRUN_STAGE")
    }
    env["JAX_PLATFORMS"] = "cpu"  # honored: -S skips the axon sitecustomize
    paths = [repo] + [p for p in sys.path if p.endswith("site-packages")]
    out = subprocess.run(
        [
            sys.executable,
            "-S",
            "-c",
            f"import sys; sys.path[:0] = {paths!r}; "
            "import __graft_entry__ as g; g.dryrun_multichip(4)",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout


def test_train_step_loss_decreases():
    """A few steps on one fixed batch must reduce the loss (end-to-end grad
    flow through encoder, splice, and decoder)."""
    import __graft_entry__ as graft
    from light_whisper_tpu.models.qwen3_asr.config import (
        AudioEncoderConfig,
        DecoderConfig,
        Qwen3ASRConfig,
    )
    from light_whisper_tpu.parallel.train import IGNORE_LABEL, init_state, make_train_step

    mesh = make_mesh(dp=2, tp=4)
    dec_cfg = DecoderConfig(
        vocab_size=256,
        embedding_length=64,
        block_count=2,
        feed_forward_length=128,
        head_count=8,
        head_count_kv=4,
        key_length=8,
        context_length=256,
    )
    enc_cfg = AudioEncoderConfig(
        num_mel_bins=128,
        d_model=64,
        block_count=1,
        head_count=8,
        feed_forward_length=128,
        downsample_hidden_size=16,
        output_dim=64,
        n_window=50,
        max_source_positions=32,
    )
    cfg = Qwen3ASRConfig(audio=enc_cfg, decoder=dec_cfg, audio_token_id=250)
    enc_p, dec_p = graft._random_params(cfg, seed=3)

    optimizer = optax.adam(3e-3)
    prefix = 2
    with mesh:
        state = init_state(mesh, enc_p, dec_p, optimizer)
        step, place = make_train_step(cfg, mesh, optimizer, prefix)

        rng = np.random.default_rng(0)
        B = 2
        n_audio = cfg.audio.tokens_per_chunk
        T = prefix + n_audio + 6
        mel = rng.standard_normal((B, cfg.audio.chunk_frames, 128)).astype(np.float32)
        ids = rng.integers(0, 200, size=(B, T)).astype(np.int32)
        labels = np.full((B, T), IGNORE_LABEL, np.int32)
        labels[:, -6:] = rng.integers(0, 200, size=(B, 6))
        batch = place(mel, ids, labels)

        losses = []
        for _ in range(5):
            state, loss = step(state, *batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path):
    from light_whisper_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
        tree_equal,
    )

    import jax.numpy as jnp

    state = {
        "params": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)},
        "step": jnp.int32(7),
    }
    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    restored = restore_train_state(path, jax.device_get(state))
    assert tree_equal(jax.device_get(state), restored)


def test_mesh_sharded_inference_matches_single_device(tmp_path):
    """Tiny model on a tp=2 mesh must produce the same transcript tokens."""
    sys.path.insert(0, "tests")
    from helpers.tiny_model import write_tiny_model

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=False)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(8000) * 0.3).astype(np.float32)

    plain = Qwen3ASRModel(path, max_new_tokens=8).transcribe(audio)

    mesh = make_mesh(dp=4, tp=2)  # tiny model has 2 kv heads
    sharded_model = Qwen3ASRModel(path, max_new_tokens=8, mesh=mesh)
    sharded = sharded_model.transcribe(audio)
    assert sharded.tokens == plain.tokens


def test_mesh_rejects_indivisible_tp(tmp_path):
    sys.path.insert(0, "tests")
    from helpers.tiny_model import write_tiny_model

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path / "tiny2.gguf")
    write_tiny_model(path, quantize=False)
    mesh = make_mesh(dp=1, tp=8)  # 8 does not divide 2 kv heads
    with pytest.raises(ValueError):
        Qwen3ASRModel(path, mesh=mesh)


def test_sequence_parallel_encoder_matches_single_device(tmp_path):
    """encode_chunks_sp over an 8-way sp mesh == unsharded encode_chunks."""
    import jax.numpy as jnp

    sys.path.insert(0, "tests")
    from helpers.tiny_model import write_tiny_model

    from light_whisper_tpu.models.qwen3_asr.loader import Qwen3ASRWeights
    from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks
    from light_whisper_tpu.parallel.encoder_sp import (
        encode_chunks_sp,
        make_sp_mesh,
        replicate_params,
    )

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=False)
    weights = Qwen3ASRWeights(path)
    acfg = weights.config.audio

    num_chunks = 8
    rng = np.random.default_rng(0)
    mel = rng.standard_normal(
        (num_chunks * acfg.chunk_frames, acfg.num_mel_bins)
    ).astype(np.float32)
    valid = num_chunks * acfg.tokens_per_chunk - 3

    want = np.asarray(
        encode_chunks(acfg, weights.encoder_params, jnp.asarray(mel), jnp.int32(valid), num_chunks)
    )

    mesh = make_sp_mesh()
    assert mesh.shape == {"sp": 8}
    params = replicate_params(weights.encoder_params, mesh)
    got_arr = encode_chunks_sp(acfg, params, mel, valid, num_chunks, mesh)
    got = np.asarray(got_arr)

    assert got.shape == want.shape
    np.testing.assert_allclose(
        got[:valid].astype(np.float32), want[:valid].astype(np.float32),
        rtol=2e-2, atol=2e-2,
    )

    with pytest.raises(ValueError):
        encode_chunks_sp(acfg, params, mel[: 7 * acfg.chunk_frames], valid, 7, mesh)


# ---------------------------------------------------------------------------
# pipeline parallelism (pp)
# ---------------------------------------------------------------------------


def _tiny_pp_setup(pp=4, M=5, T=12, seed=11):
    import jax.numpy as jnp
    import __graft_entry__ as graft
    from light_whisper_tpu.models.qwen3_asr.config import (
        AudioEncoderConfig,
        DecoderConfig,
        Qwen3ASRConfig,
    )
    from light_whisper_tpu.parallel.pipeline import (
        make_pp_mesh,
        place_decoder_params_pp,
    )

    dec_cfg = DecoderConfig(
        vocab_size=256,
        embedding_length=64,
        block_count=pp * 2,
        feed_forward_length=128,
        head_count=8,
        head_count_kv=4,
        key_length=8,
        context_length=256,
    )
    enc_cfg = AudioEncoderConfig(
        num_mel_bins=128,
        d_model=64,
        block_count=1,
        head_count=8,
        feed_forward_length=128,
        downsample_hidden_size=16,
        output_dim=64,
        n_window=50,
        max_source_positions=32,
    )
    cfg = Qwen3ASRConfig(audio=enc_cfg, decoder=dec_cfg, audio_token_id=250)
    _enc, params = graft._random_params(cfg, seed=seed)
    mesh = make_pp_mesh(pp, devices=jax.devices()[:pp])
    placed = place_decoder_params_pp(params, mesh)
    rng = np.random.default_rng(seed)
    embeds_mb = jnp.asarray(
        rng.standard_normal((M, T, dec_cfg.embedding_length)).astype(np.float32)
    )
    return dec_cfg, params, placed, mesh, embeds_mb


def test_pipeline_forward_matches_single_device():
    """forward_train_pp must reproduce forward_train on every microbatch —
    same scanned layer body, stage-split over pp with ppermute handoffs."""
    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.parallel.pipeline import forward_train_pp

    cfg, params, placed, mesh, embeds_mb = _tiny_pp_setup()
    got = np.asarray(forward_train_pp(cfg, placed, embeds_mb, mesh))
    for i in range(embeds_mb.shape[0]):
        want = np.asarray(dec.forward_train(cfg, params, embeds_mb[i]))
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-3)


def test_pipeline_fewer_microbatches_than_stages():
    """M < pp exercises the all-bubble regime (every tick but M of them is
    bubble work on some stage); outputs must still be exact."""
    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.parallel.pipeline import forward_train_pp

    cfg, params, placed, mesh, embeds_mb = _tiny_pp_setup(pp=4, M=2)
    got = np.asarray(forward_train_pp(cfg, placed, embeds_mb, mesh))
    for i in range(2):
        want = np.asarray(dec.forward_train(cfg, params, embeds_mb[i]))
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-3)


def test_pipeline_grads_match_single_device():
    """Autodiff through the pipeline schedule (reverse ppermute = backward
    pipeline) must produce the same layer gradients as the unpipelined
    loss on one device."""
    import jax.numpy as jnp
    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.parallel.pipeline import forward_train_pp
    from light_whisper_tpu.parallel.train import IGNORE_LABEL

    cfg, params, placed, mesh, embeds_mb = _tiny_pp_setup(M=3)
    rng = np.random.default_rng(12)
    labels = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=embeds_mb.shape[:2]).astype(np.int32)
    )

    def ce(logits, labels_i):
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(ll, labels_i[..., None], axis=-1)[..., 0]
        return -jnp.sum(picked)

    def loss_pp(p):
        hidden = forward_train_pp(cfg, p, embeds_mb, mesh)
        logits = jax.vmap(lambda h: dec.logits_for(cfg, p, h))(hidden)
        return ce(logits, labels) / labels.size

    def loss_ref(p):
        total = 0.0
        for i in range(embeds_mb.shape[0]):
            hidden = dec.forward_train(cfg, p, embeds_mb[i])
            total = total + ce(dec.logits_for(cfg, p, hidden), labels[i])
        return total / labels.size

    g_pp = jax.grad(loss_pp)(placed)
    g_ref = jax.grad(loss_ref)(params)
    flat_pp = jax.tree.leaves_with_path(g_pp)
    flat_ref = {jax.tree_util.keystr(k): v for k, v in jax.tree.leaves_with_path(g_ref)}
    checked = 0
    for key, leaf in flat_pp:
        ref = flat_ref[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=5e-3, atol=5e-3,
            err_msg=jax.tree_util.keystr(key),
        )
        checked += 1
    assert checked >= 10


def test_pipeline_train_step_loss_decreases():
    import jax.numpy as jnp
    import optax
    from light_whisper_tpu.parallel.pipeline import make_train_step_pp

    cfg, _params, placed, mesh, embeds_mb = _tiny_pp_setup(M=4)
    rng = np.random.default_rng(13)
    labels = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=embeds_mb.shape[:2]).astype(np.int32)
    )
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(placed)
    step = make_train_step_pp(cfg, mesh, optimizer)
    losses = []
    params = placed
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, embeds_mb, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_pipeline_rejects_indivisible_layers():
    from light_whisper_tpu.parallel.pipeline import forward_train_pp, make_pp_mesh

    cfg, params, placed, mesh, embeds_mb = _tiny_pp_setup(pp=4)
    mesh3 = make_pp_mesh(3, devices=jax.devices()[:3])
    with pytest.raises(ValueError):
        forward_train_pp(cfg, placed, embeds_mb, mesh3)


def test_pipeline_dp_composition_matches_single_device():
    """(dp, pp) mesh: each dp row pipelines its batch shard; outputs must
    equal the unpipelined forward for every (microbatch, example) pair, and
    layer grads must match the unpipelined loss (dp all-reduce via the
    shard_map transpose)."""
    import jax.numpy as jnp
    from light_whisper_tpu.models.qwen3_asr import decoder as dec
    from light_whisper_tpu.parallel.pipeline import (
        forward_train_pp,
        make_pp_mesh,
        place_decoder_params_pp,
    )

    cfg, params, _placed, _mesh, _ = _tiny_pp_setup(pp=4)
    mesh = make_pp_mesh(pp=4, dp=2)
    assert mesh.shape == {"dp": 2, "pp": 4}
    placed = place_decoder_params_pp(params, mesh)

    M, B, T = 3, 4, 10
    rng = np.random.default_rng(21)
    embeds_mb = jnp.asarray(
        rng.standard_normal((M, B, T, cfg.embedding_length)).astype(np.float32)
    )
    got = np.asarray(forward_train_pp(cfg, placed, embeds_mb, mesh))
    for m in range(M):
        for b in range(B):
            want = np.asarray(dec.forward_train(cfg, params, embeds_mb[m, b]))
            np.testing.assert_allclose(got[m, b], want, rtol=2e-3, atol=2e-3)

    labels = jnp.asarray(
        rng.integers(0, cfg.vocab_size, size=(M, B, T)).astype(np.int32)
    )

    def ce(logits, labels_i):
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(ll, labels_i[..., None], axis=-1)[..., 0]
        return -jnp.sum(picked)

    def loss_pp(p):
        hidden = forward_train_pp(cfg, p, embeds_mb, mesh)
        logits = jax.vmap(lambda h: dec.logits_for(cfg, p, h))(hidden)
        return ce(logits, labels) / labels.size

    def loss_ref(p):
        total = 0.0
        for m in range(M):
            for b in range(B):
                hidden = dec.forward_train(cfg, p, embeds_mb[m, b])
                total = total + ce(dec.logits_for(cfg, p, hidden), labels[m, b])
        return total / labels.size

    g_pp = jax.grad(loss_pp)(placed)
    g_ref = jax.grad(loss_ref)(params)
    ref_by_key = {
        jax.tree_util.keystr(k): v for k, v in jax.tree.leaves_with_path(g_ref)
    }
    for key, leaf in jax.tree.leaves_with_path(g_pp):
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(ref_by_key[jax.tree_util.keystr(key)]),
            rtol=5e-3,
            atol=5e-3,
            err_msg=jax.tree_util.keystr(key),
        )


def test_mesh_sharded_batched_decode_matches_single_device(tmp_path):
    """Multi-stream batched decode under a tp mesh: transcribe_batch on a
    tp=2-sharded model must match the single-device batch token-for-token
    (GSPMD propagates the Megatron shardings through forward_decode_batch's
    row-batched projections; the KV caches stay replicated)."""
    sys.path.insert(0, "tests")
    from helpers.tiny_model import write_tiny_model

    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = str(tmp_path / "tiny.gguf")
    write_tiny_model(path, quantize=False)

    rng = np.random.default_rng(1)
    audios = [
        (rng.standard_normal(8000 + 2000 * i) * 0.3).astype(np.float32)
        for i in range(3)
    ]

    plain = Qwen3ASRModel(path, max_new_tokens=8).transcribe_batch(audios)

    mesh = make_mesh(dp=4, tp=2)
    sharded = Qwen3ASRModel(path, max_new_tokens=8, mesh=mesh).transcribe_batch(audios)
    for p, s in zip(plain, sharded):
        assert p.tokens == s.tokens
