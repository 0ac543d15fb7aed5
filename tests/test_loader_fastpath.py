"""Direct-fill loader fast path: bit parity with the legacy split/concat/stack.

The fast path (``Qwen3ASRWeights._fill_stacked`` / ``_embedding_fast``)
deinterleaves every quantized tensor's mmap bytes straight into the final
layer-stacked / fused / vocab-padded destination arrays, skipping the
legacy path's three generations of temporary copies. These tests pin that
the resulting parameter trees are byte-identical to the legacy path for
Q8_0 and Q4_0 artifacts, with and without the llama RoPE row permutation,
and that dense (unquantized) artifacts still take the legacy path.
"""

import numpy as np
import pytest

from helpers.tiny_model import tiny_config, tiny_tensors, tiny_vocab
from light_whisper_tpu.formats import gguf
from light_whisper_tpu.models.qwen3_asr import loader as loader_mod
from light_whisper_tpu.models.qwen3_asr.export import write_model
from light_whisper_tpu.models.qwen3_asr.loader import Qwen3ASRWeights
from light_whisper_tpu.utils.numerics import NP_BF16, host_bf16


def _write(path, quantize=True, quant_type=gguf.GGML_Q8_0, extra_metadata=None):
    cfg = tiny_config()
    tokens, types = tiny_vocab()
    tokenizer_meta = {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.merges": [],
    }
    write_model(
        str(path),
        cfg,
        tiny_tensors(cfg, seed=3),
        tokenizer_meta,
        quantize=quantize,
        quant_type=quant_type,
        extra_metadata=extra_metadata,
    )
    return cfg


def _tree_equal(a, b, path=""):
    if isinstance(a, dict) or isinstance(b, dict):
        assert sorted(a) == sorted(b), f"{path}: keys {sorted(a)} != {sorted(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
        return
    an, bn = np.asarray(a), np.asarray(b)
    assert an.dtype == bn.dtype, f"{path}: dtype {an.dtype} != {bn.dtype}"
    assert an.shape == bn.shape, f"{path}: shape {an.shape} != {bn.shape}"
    assert np.array_equal(
        an.view(np.uint8) if an.dtype == NP_BF16 else an,
        bn.view(np.uint8) if bn.dtype == NP_BF16 else bn,
    ), f"{path}: values differ"


def _load_pair(path, monkeypatch):
    """(fast-path weights, forced-legacy weights) for one artifact."""
    fill_calls = []
    orig = Qwen3ASRWeights._fill_stacked

    def spy(self, *a, **kw):
        fill_calls.append(a[0])
        return orig(self, *a, **kw)

    monkeypatch.setattr(Qwen3ASRWeights, "_fill_stacked", spy)
    fast = Qwen3ASRWeights(str(path))
    monkeypatch.setattr(Qwen3ASRWeights, "_fill_stacked", orig)
    monkeypatch.setattr(Qwen3ASRWeights, "_all_quantized", lambda self, names: False)
    legacy = Qwen3ASRWeights(str(path))
    return fast, legacy, fill_calls


@pytest.mark.parametrize("quant_type", [gguf.GGML_Q8_0, gguf.GGML_Q4_0])
def test_split_into_matches_parts(tmp_path, quant_type):
    path = tmp_path / "m.gguf"
    _write(path, quant_type=quant_type)
    f = gguf.read_gguf(str(path))
    checked = 0
    for ten in f.tensors.values():
        if ten.ggml_type not in (gguf.GGML_Q8_0, gguf.GGML_Q4_0):
            continue
        q_ref, s_ref = ten.q8_0_parts()
        q_out = np.empty(ten.shape, np.int8)
        s_out = np.empty(s_ref.shape, NP_BF16)
        ten.q8_0_parts_into(q_out, s_out)
        assert np.array_equal(q_out, q_ref)
        assert np.array_equal(
            s_out.view(np.uint8), host_bf16(s_ref).view(np.uint8)
        )
        checked += 1
    f.close()
    assert checked > 0


def test_split_into_rejects_shape_mismatch(tmp_path):
    path = tmp_path / "m.gguf"
    _write(path)
    f = gguf.read_gguf(str(path))
    ten = next(
        t for t in f.tensors.values() if t.ggml_type == gguf.GGML_Q8_0
    )
    bad = np.empty((ten.shape[0] + 1, *ten.shape[1:]), np.int8)
    s = np.empty((ten.shape[0] + 1, ten.shape[-1] // 32), NP_BF16)
    with pytest.raises(ValueError, match="q_out shape"):
        ten.q8_0_parts_into(bad, s)
    # non-contiguous destination: reshape would copy and writes vanish
    wide = np.empty((ten.shape[0], ten.shape[1] * 2), np.int8)
    s_ok = np.empty((ten.shape[0], ten.shape[-1] // 32), NP_BF16)
    with pytest.raises(ValueError, match="contiguous"):
        ten.q8_0_parts_into(wide[:, :: 2], s_ok)
    f.close()


@pytest.mark.parametrize("quant_type", [gguf.GGML_Q8_0, gguf.GGML_Q4_0])
def test_fast_path_matches_legacy(tmp_path, monkeypatch, quant_type):
    path = tmp_path / "m.gguf"
    _write(path, quant_type=quant_type)
    fast, legacy, fill_calls = _load_pair(path, monkeypatch)
    assert fill_calls, "fast path did not engage on a fully quantized artifact"
    _tree_equal(fast.decoder_params, legacy.decoder_params, "decoder")
    _tree_equal(fast.encoder_params, legacy.encoder_params, "encoder")


def test_fast_path_matches_legacy_llama_rope(tmp_path, monkeypatch):
    path = tmp_path / "m.gguf"
    _write(path, extra_metadata={"qwen3asr.rope_permutation": "llama"})
    fast, legacy, fill_calls = _load_pair(path, monkeypatch)
    assert fill_calls
    _tree_equal(fast.decoder_params, legacy.decoder_params, "decoder")
    _tree_equal(fast.encoder_params, legacy.encoder_params, "encoder")


def test_dense_artifact_takes_legacy_path(tmp_path, monkeypatch):
    path = tmp_path / "dense.gguf"
    _write(path, quantize=False)
    calls = []
    orig = Qwen3ASRWeights._fill_stacked
    monkeypatch.setattr(
        Qwen3ASRWeights,
        "_fill_stacked",
        lambda self, *a, **kw: calls.append(a) or orig(self, *a, **kw),
    )
    w = Qwen3ASRWeights(str(path))
    assert not calls
    # dense tree shape sanity: qkv is a dense {"w"} dict, not {"q","s"}
    assert "w" in w.decoder_params["layers"]["qkv"]


def test_precise_mode_takes_legacy_path(tmp_path, monkeypatch):
    path = tmp_path / "m.gguf"
    _write(path)
    calls = []
    orig = Qwen3ASRWeights._fill_stacked
    monkeypatch.setattr(
        Qwen3ASRWeights,
        "_fill_stacked",
        lambda self, *a, **kw: calls.append(a) or orig(self, *a, **kw),
    )
    w = Qwen3ASRWeights(str(path), precise=True)
    assert not calls
    assert "w" in w.decoder_params["layers"]["qkv"]


@pytest.mark.parametrize("quant_type", [gguf.GGML_Q8_0, gguf.GGML_Q4_0])
def test_device_tree_shapes_match_real_load(tmp_path, quant_type):
    """The shape mirror must agree with the real load leaf-for-leaf —
    this is the drift guard that makes load-overlapped warmup safe (a
    wrong shape would compile a program the real dispatch never uses)."""
    import jax

    path = tmp_path / "m.gguf"
    _write(path, quant_type=quant_type)
    captured = {}
    w = Qwen3ASRWeights(
        str(path),
        on_parsed=lambda s: captured.update(shapes=s.device_tree_shapes()),
    )
    assert captured["shapes"] is not None
    enc_shapes, dec_shapes = captured["shapes"]
    for shapes, real, tag in (
        (enc_shapes, w.encoder_params, "encoder"),
        (dec_shapes, w.decoder_params, "decoder"),
    ):
        assert jax.tree.structure(shapes) == jax.tree.structure(real), tag
        for sd, arr in zip(jax.tree.leaves(shapes), jax.tree.leaves(real)):
            assert tuple(sd.shape) == tuple(arr.shape), tag
            assert np.dtype(sd.dtype) == np.dtype(arr.dtype), tag


def test_device_tree_shapes_none_for_dense(tmp_path):
    path = tmp_path / "dense.gguf"
    _write(path, quantize=False)
    captured = {}
    Qwen3ASRWeights(
        str(path),
        on_parsed=lambda s: captured.update(shapes=s.device_tree_shapes()),
    )
    assert captured["shapes"] is None


def test_broken_on_parsed_does_not_block_loading(tmp_path):
    path = tmp_path / "m.gguf"
    _write(path)

    def boom(_):
        raise RuntimeError("prewarm hook exploded")

    w = Qwen3ASRWeights(str(path), on_parsed=boom)
    assert "q" in w.decoder_params["layers"]["qkv"]


def test_load_overlap_warmup_matches_plain_model(tmp_path, monkeypatch):
    """A model built with the load-overlapped shadow warmup transcribes
    identically to one without it (the shadow only touches compile caches)."""
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = tmp_path / "m.gguf"
    _write(path)
    starts = []
    orig = Qwen3ASRModel._start_load_prewarm

    def spy(self, *a, **kw):
        starts.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(Qwen3ASRModel, "_start_load_prewarm", spy)
    monkeypatch.setenv("LWT_LOAD_OVERLAP_WARMUP", "1")
    overlapped = Qwen3ASRModel(str(path), max_new_tokens=8)
    assert starts, "overlap prewarm did not engage on a quantized artifact"
    overlapped._join_prewarm()

    monkeypatch.setenv("LWT_LOAD_OVERLAP_WARMUP", "0")
    plain = Qwen3ASRModel(str(path), max_new_tokens=8)
    assert plain._prewarm_thread is None

    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(16000) * 0.01 * 32768).astype(np.int16)
    assert overlapped.transcribe(audio).tokens == plain.transcribe(audio).tokens


def test_prewarm_joined_when_load_fails_after_parse(tmp_path, monkeypatch):
    """A load failure after the header parse must not orphan the shadow
    thread — jax teardown under a live dispatch aborts the process."""
    from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel

    path = tmp_path / "m.gguf"
    _write(path)
    threads = []
    orig = Qwen3ASRModel._start_load_prewarm

    def spy(self, *a, **kw):
        orig(self, *a, **kw)
        threads.append(self._prewarm_thread)

    monkeypatch.setattr(Qwen3ASRModel, "_start_load_prewarm", spy)

    def boom(self):
        raise RuntimeError("tensor data corrupt")

    monkeypatch.setattr(Qwen3ASRWeights, "_load_encoder", boom)
    with pytest.raises(RuntimeError, match="corrupt"):
        Qwen3ASRModel(str(path), max_new_tokens=4)
    assert threads and threads[0] is not None
    assert not threads[0].is_alive(), "shadow thread left running on failure"


def test_prewarm_skipped_when_device_memory_tight(monkeypatch):
    """The shadow doubles parameter residency; it must not spawn when the
    device can't hold both trees."""
    import jax

    from light_whisper_tpu.models.qwen3_asr import model as model_mod

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 1 << 20, "bytes_in_use": 0}

    monkeypatch.setattr(model_mod.jax, "devices", lambda: [FakeDev()])
    shapes = {"w": jax.ShapeDtypeStruct((1024, 1024), np.float32)}  # 4 MB
    t = model_mod.start_shadow_warmup(
        None,
        shapes,
        shapes,
        max_new_tokens=4,
        cache_dtype=np.float32,
        tokenizer=None,
        prefix_ids=[1],
        suffix_ids=[2],
    )
    assert t is None


def test_embedding_fast_pads_with_zeros(tmp_path, monkeypatch):
    path = tmp_path / "m.gguf"
    _write(path)
    fast = Qwen3ASRWeights(str(path))
    embed = fast.decoder_params["embed"]
    q = np.asarray(embed["q"])
    vocab = tiny_config().decoder.vocab_size
    assert q.shape[0] % loader_mod.VOCAB_PAD_MULTIPLE == 0
    assert not q[vocab:].any()
    s = np.asarray(embed["s"])
    assert not s[vocab:].view(np.uint8).any()
