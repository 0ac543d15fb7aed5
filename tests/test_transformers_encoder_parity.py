"""AuT encoder parity against transformers' Qwen3OmniMoeAudioEncoder.

Identical random weights loaded into BOTH the authoritative HF audio tower
(``modeling_qwen3_omni_moe.Qwen3OmniMoeAudioEncoder`` — the shape reference
this engine's encoder follows, DEVNOTES) and this repo's chunked encoder,
then audio embeddings compared on a NON-chunk-multiple frame count (tail
chunk + masked window groups exercised). External-fidelity evidence for the
conv downsampler, per-chunk sinusoid positions, block-diagonal windowed
attention, ln_post and the proj1/gelu/proj2 head — none of it against this
repo's own oracle.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from helpers.tiny_model import tiny_config, tiny_tensors, tiny_vocab, write_model

from light_whisper_tpu.models.qwen3_asr.encoder import encode
from light_whisper_tpu.models.qwen3_asr.loader import Qwen3ASRWeights


def _hf_encoder(cfg, tensors):
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoderConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeAudioEncoder,
    )

    a = cfg.audio
    hf_cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=a.num_mel_bins,
        encoder_layers=a.block_count,
        encoder_attention_heads=a.head_count,
        encoder_ffn_dim=a.feed_forward_length,
        d_model=a.d_model,
        n_window=a.n_window,
        output_dim=a.output_dim,
        n_window_infer=a.n_window_infer,
        downsample_hidden_size=a.downsample_hidden_size,
        max_source_positions=a.max_source_positions,
        conv_chunksize=500,
    )
    hf_cfg._attn_implementation = "eager"
    enc = Qwen3OmniMoeAudioEncoder(hf_cfg)

    mapping = {
        "conv2d1.weight": "aenc.conv1.weight",
        "conv2d1.bias": "aenc.conv1.bias",
        "conv2d2.weight": "aenc.conv2.weight",
        "conv2d2.bias": "aenc.conv2.bias",
        "conv2d3.weight": "aenc.conv3.weight",
        "conv2d3.bias": "aenc.conv3.bias",
        "conv_out.weight": "aenc.conv_out.weight",
        "ln_post.weight": "aenc.ln_post.weight",
        "ln_post.bias": "aenc.ln_post.bias",
        "proj1.weight": "aenc.proj1.weight",
        "proj1.bias": "aenc.proj1.bias",
        "proj2.weight": "aenc.proj2.weight",
        "proj2.bias": "aenc.proj2.bias",
    }
    for i in range(a.block_count):
        src = f"aenc.blk.{i}."
        dst = f"layers.{i}."
        for hf_name, ours in (
            ("self_attn.q_proj", "attn_q"),
            ("self_attn.k_proj", "attn_k"),
            ("self_attn.v_proj", "attn_v"),
            ("self_attn.out_proj", "attn_output"),
            ("fc1", "ffn_up"),
            ("fc2", "ffn_down"),
        ):
            mapping[dst + hf_name + ".weight"] = src + ours + ".weight"
            mapping[dst + hf_name + ".bias"] = src + ours + ".bias"
        mapping[dst + "self_attn_layer_norm.weight"] = src + "attn_norm.weight"
        mapping[dst + "self_attn_layer_norm.bias"] = src + "attn_norm.bias"
        mapping[dst + "final_layer_norm.weight"] = src + "ffn_norm.weight"
        mapping[dst + "final_layer_norm.bias"] = src + "ffn_norm.bias"

    state = dict(enc.state_dict())
    for hf_name, _param in enc.named_parameters():
        ours = mapping[hf_name]  # KeyError = our mapping is incomplete
        state[hf_name] = torch.tensor(tensors[ours], dtype=torch.float32)
    enc.load_state_dict(state)
    enc.eval()
    return enc


def test_audio_embeddings_match_transformers(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")

    cfg = tiny_config()
    tensors = tiny_tensors(cfg, seed=5)
    # perturb biases/norms away from the helper's zeros/ones so mistakes in
    # bias handling or norm placement cannot hide
    rng = np.random.default_rng(8)
    for name in list(tensors):
        if name.startswith("aenc.") and name.endswith(".bias"):
            tensors[name] = (
                tensors[name]
                + rng.standard_normal(tensors[name].shape).astype(np.float32) * 0.05
            )

    hf = _hf_encoder(cfg, tensors)

    # our side: the same weights through the real GGUF export/loader
    gguf_path = str(tmp_path / "tiny.gguf")
    tokens, types = tiny_vocab()
    write_model(
        gguf_path,
        cfg,
        tensors,
        {
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.token_type": types,
            "tokenizer.ggml.merges": [],
            "tokenizer.chat_template": "<|im_start|>user\n{audio}<|im_end|>\n<|im_start|>assistant\n",
        },
        quantize=False,
    )
    weights = Qwen3ASRWeights(gguf_path, precise=True)
    ours_params = weights.encoder_params
    acfg = weights.config.audio  # f32 compute (precise mode)

    frames = 230  # 2 full chunks + a 30-frame tail chunk
    mel = rng.standard_normal((frames, cfg.audio.num_mel_bins)).astype(np.float32)

    with torch.no_grad():
        theirs = (
            hf(
                torch.tensor(mel.T),  # HF takes [mels, frames]
                feature_lens=torch.tensor([frames], dtype=torch.long),
            ).last_hidden_state.numpy()
        )

    ours, valid = encode(acfg, ours_params, mel)
    ours = np.asarray(ours, dtype=np.float32)[:valid]

    assert theirs.shape == ours.shape, (theirs.shape, ours.shape)
    np.testing.assert_allclose(ours, theirs, rtol=3e-3, atol=3e-3)
