"""HF checkpoint → GGUF conversion round trip on a synthetic checkpoint."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from helpers.tiny_model import tiny_config, tiny_tensors

from light_whisper_tpu.models.qwen3_asr.convert_hf import convert
from light_whisper_tpu.models.qwen3_asr.loader import Qwen3ASRWeights


def _fake_hf_checkpoint(tmp_path, cfg, tensors):
    """Write our tiny tensors under HF names (inverse of map_tensors)."""
    from safetensors.numpy import save_file

    hf = {}
    hf["model.embed_tokens.weight"] = tensors["token_embd.weight"]
    hf["model.norm.weight"] = tensors["output_norm.weight"]
    for i in range(cfg.decoder.block_count):
        src = f"blk.{i}."
        dst = f"model.layers.{i}."
        hf[dst + "input_layernorm.weight"] = tensors[src + "attn_norm.weight"]
        hf[dst + "self_attn.q_proj.weight"] = tensors[src + "attn_q.weight"]
        hf[dst + "self_attn.k_proj.weight"] = tensors[src + "attn_k.weight"]
        hf[dst + "self_attn.v_proj.weight"] = tensors[src + "attn_v.weight"]
        hf[dst + "self_attn.o_proj.weight"] = tensors[src + "attn_output.weight"]
        hf[dst + "self_attn.q_norm.weight"] = tensors[src + "attn_q_norm.weight"]
        hf[dst + "self_attn.k_norm.weight"] = tensors[src + "attn_k_norm.weight"]
        hf[dst + "post_attention_layernorm.weight"] = tensors[src + "ffn_norm.weight"]
        hf[dst + "mlp.gate_proj.weight"] = tensors[src + "ffn_gate.weight"]
        hf[dst + "mlp.up_proj.weight"] = tensors[src + "ffn_up.weight"]
        hf[dst + "mlp.down_proj.weight"] = tensors[src + "ffn_down.weight"]

    for conv in ("conv1", "conv2", "conv3"):
        hf[f"audio_tower.conv2d{conv[-1]}.weight"] = tensors[f"aenc.{conv}.weight"]
        hf[f"audio_tower.conv2d{conv[-1]}.bias"] = tensors[f"aenc.{conv}.bias"]
    hf["audio_tower.conv_out.weight"] = tensors["aenc.conv_out.weight"]
    hf["audio_tower.ln_post.weight"] = tensors["aenc.ln_post.weight"]
    hf["audio_tower.ln_post.bias"] = tensors["aenc.ln_post.bias"]
    for proj in ("proj1", "proj2"):
        hf[f"audio_tower.{proj}.weight"] = tensors[f"aenc.{proj}.weight"]
        hf[f"audio_tower.{proj}.bias"] = tensors[f"aenc.{proj}.bias"]
    for i in range(cfg.audio.block_count):
        src = f"aenc.blk.{i}."
        dst = f"audio_tower.layers.{i}."
        hf[dst + "self_attn_layer_norm.weight"] = tensors[src + "attn_norm.weight"]
        hf[dst + "self_attn_layer_norm.bias"] = tensors[src + "attn_norm.bias"]
        for hf_name, our in (
            ("q_proj", "attn_q"),
            ("k_proj", "attn_k"),
            ("v_proj", "attn_v"),
            ("out_proj", "attn_output"),
        ):
            hf[dst + f"self_attn.{hf_name}.weight"] = tensors[src + our + ".weight"]
            hf[dst + f"self_attn.{hf_name}.bias"] = tensors[src + our + ".bias"]
        hf[dst + "final_layer_norm.weight"] = tensors[src + "ffn_norm.weight"]
        hf[dst + "final_layer_norm.bias"] = tensors[src + "ffn_norm.bias"]
        hf[dst + "fc1.weight"] = tensors[src + "ffn_up.weight"]
        hf[dst + "fc1.bias"] = tensors[src + "ffn_up.bias"]
        hf[dst + "fc2.weight"] = tensors[src + "ffn_down.weight"]
        hf[dst + "fc2.bias"] = tensors[src + "ffn_down.bias"]

    save_file(hf, str(tmp_path / "model.safetensors"))

    hf_config = {
        "audio_token_id": cfg.audio_token_id,
        "bos_token_id": cfg.bos_token_id,
        "eos_token_id": cfg.eos_token_id,
        "pad_token_id": cfg.pad_token_id,
        "tie_word_embeddings": True,
        "text_config": {
            "vocab_size": cfg.decoder.vocab_size,
            "hidden_size": cfg.decoder.embedding_length,
            "num_hidden_layers": cfg.decoder.block_count,
            "intermediate_size": cfg.decoder.feed_forward_length,
            "num_attention_heads": cfg.decoder.head_count,
            "num_key_value_heads": cfg.decoder.head_count_kv,
            "head_dim": cfg.decoder.key_length,
            "rms_norm_eps": cfg.decoder.rms_epsilon,
            "rope_theta": cfg.decoder.rope_freq_base,
            "max_position_embeddings": cfg.decoder.context_length,
        },
        "audio_config": {
            "num_mel_bins": cfg.audio.num_mel_bins,
            "d_model": cfg.audio.d_model,
            "encoder_layers": cfg.audio.block_count,
            "encoder_attention_heads": cfg.audio.head_count,
            "encoder_ffn_dim": cfg.audio.feed_forward_length,
            "downsample_hidden_size": cfg.audio.downsample_hidden_size,
            "output_dim": cfg.audio.output_dim,
            "n_window": cfg.audio.n_window,
            "n_window_infer": cfg.audio.n_window_infer,
            "max_source_positions": cfg.audio.max_source_positions,
        },
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_config))

    # minimal byte-level tokenizer.json
    from light_whisper_tpu.models.qwen3_asr.tokenizer import byte_to_unicode

    b2u = byte_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}
    added = [
        {"id": 256 + i, "content": t, "special": True}
        for i, t in enumerate(["<|pad|>", "<|im_start|>", "<|im_end|>", "<|audio|>", "<|en|>", "<|zh|>"])
    ]
    tokenizer = {"model": {"type": "BPE", "vocab": vocab, "merges": []}, "added_tokens": added}
    (tmp_path / "tokenizer.json").write_text(json.dumps(tokenizer))


def test_convert_roundtrip(tmp_path):
    pytest.importorskip("safetensors")
    cfg = tiny_config()
    tensors = tiny_tensors(cfg)
    _fake_hf_checkpoint(tmp_path, cfg, tensors)

    out = str(tmp_path / "model.gguf")
    converted_cfg = convert(str(tmp_path), out, quantize=False)
    assert converted_cfg.decoder == cfg.decoder
    assert converted_cfg.audio == cfg.audio

    weights = Qwen3ASRWeights(out)
    assert weights.config.decoder.block_count == cfg.decoder.block_count
    assert len(weights.tokenizer.tokens) == 262
    assert "<|im_start|>" in weights.tokenizer.special_tokens

    # spot-check one weight round trip (loader transposes dense to [in, out]
    # and fuses gate|up along out-features)
    ffn = weights.config.decoder.feed_forward_length
    got = np.asarray(weights.decoder_params["layers"]["gateup"]["w"][0, :, :ffn], dtype=np.float32)
    want = tensors["blk.0.ffn_gate.weight"].T
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_convert_quantized(tmp_path):
    pytest.importorskip("safetensors")
    cfg = tiny_config()
    _fake_hf_checkpoint(tmp_path, cfg, tiny_tensors(cfg))
    out = str(tmp_path / "model_q8.gguf")
    convert(str(tmp_path), out, quantize=True)
    weights = Qwen3ASRWeights(out)
    assert "q" in weights.decoder_params["embed"]
    assert weights.decoder_params["layers"]["gateup"]["q"].dtype == np.int8
