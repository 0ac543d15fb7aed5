"""Convert a HuggingFace Qwen3-ASR checkpoint into this framework's GGUF.

The reference consumes third-party GGUF quantizations
(``hf_cache_utils.py:11-26``); this tool makes the TPU engine self-sufficient:
point it at an HF snapshot (safetensors + config.json + tokenizer.json) and
it emits a Q8_0 (or f32) GGUF with the tensor names the loader expects.

Weight naming follows the Qwen3-Omni/Qwen2-Audio family layout
(``model.layers.N.self_attn.q_proj`` …, ``audio_tower.layers.N`` …); other
prefixes (e.g. ``thinker.``) are auto-detected by scanning the checkpoint.

Usage:
    python -m light_whisper_tpu.models.qwen3_asr.convert_hf \
        --checkpoint /path/to/hf_snapshot --out qwen3-asr.gguf [--no-quantize]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from typing import Any, Dict, List, Tuple

import numpy as np

from light_whisper_tpu.models.qwen3_asr.config import (
    AudioEncoderConfig,
    DecoderConfig,
    Qwen3ASRConfig,
)
from light_whisper_tpu.models.qwen3_asr.export import write_model
from light_whisper_tpu.models.qwen3_asr.tokenizer import TOKEN_TYPE_CONTROL, TOKEN_TYPE_NORMAL


def load_checkpoint_tensors(checkpoint_dir: str) -> Dict[str, np.ndarray]:
    """Read all safetensors shards into numpy arrays (f32)."""
    from safetensors.numpy import load_file

    tensors: Dict[str, np.ndarray] = {}
    shards = sorted(glob.glob(os.path.join(checkpoint_dir, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no .safetensors under {checkpoint_dir}")
    for shard in shards:
        for name, arr in load_file(shard).items():
            tensors[name] = np.asarray(arr, dtype=np.float32)
    return tensors


def detect_prefixes(names) -> Tuple[str, str]:
    """Find the decoder-layer and audio-tower prefixes in the checkpoint."""
    decoder_prefix = None
    audio_prefix = None
    for name in names:
        if decoder_prefix is None and ".layers.0.self_attn.q_proj.weight" in name:
            head = name.split(".layers.0.")[0]
            if "audio" not in head:
                decoder_prefix = head
        if audio_prefix is None and "audio_tower" in name:
            audio_prefix = name.split("audio_tower")[0] + "audio_tower"
    if decoder_prefix is None:
        raise ValueError("could not locate decoder layers in checkpoint")
    if audio_prefix is None:
        raise ValueError("could not locate audio tower in checkpoint")
    return decoder_prefix, audio_prefix


def config_from_hf(hf_config: Dict[str, Any]) -> Qwen3ASRConfig:
    text = hf_config.get("text_config") or hf_config
    audio = (
        hf_config.get("audio_config")
        or hf_config.get("audio_encoder_config")
        or {}
    )
    dec = DecoderConfig(
        vocab_size=text.get("vocab_size", 151_936),
        embedding_length=text.get("hidden_size", 1024),
        block_count=text.get("num_hidden_layers", 28),
        feed_forward_length=text.get("intermediate_size", 3072),
        head_count=text.get("num_attention_heads", 16),
        head_count_kv=text.get("num_key_value_heads", 8),
        key_length=text.get("head_dim", 128),
        rms_epsilon=text.get("rms_norm_eps", 1e-6),
        rope_freq_base=text.get("rope_theta", 1_000_000.0),
        context_length=text.get("max_position_embeddings", 32_768),
        tie_word_embeddings=bool(hf_config.get("tie_word_embeddings", text.get("tie_word_embeddings", True))),
    )
    enc = AudioEncoderConfig(
        num_mel_bins=audio.get("num_mel_bins", 128),
        d_model=audio.get("d_model", 1280),
        block_count=audio.get("encoder_layers", 32),
        head_count=audio.get("encoder_attention_heads", 20),
        feed_forward_length=audio.get("encoder_ffn_dim", 5120),
        downsample_hidden_size=audio.get("downsample_hidden_size", 480),
        output_dim=audio.get("output_dim", dec.embedding_length),
        n_window=audio.get("n_window", 50),
        n_window_infer=audio.get("n_window_infer", 400),
        max_source_positions=audio.get("max_source_positions", 1500),
    )
    return Qwen3ASRConfig(
        audio=enc,
        decoder=dec,
        audio_token_id=hf_config.get("audio_token_id", 151_676),
        bos_token_id=hf_config.get("bos_token_id", 151_644),
        eos_token_id=hf_config.get("eos_token_id", 151_645),
        pad_token_id=hf_config.get("pad_token_id", 151_643),
    )


def map_tensors(
    hf: Dict[str, np.ndarray], cfg: Qwen3ASRConfig
) -> Dict[str, np.ndarray]:
    dec_prefix, audio_prefix = detect_prefixes(hf.keys())

    def get(name: str) -> np.ndarray:
        if name not in hf:
            raise KeyError(f"checkpoint missing tensor {name}")
        return hf[name]

    out: Dict[str, np.ndarray] = {
        "token_embd.weight": get(f"{dec_prefix}.embed_tokens.weight"),
        "output_norm.weight": get(f"{dec_prefix}.norm.weight"),
    }
    lm_head = hf.get("lm_head.weight")
    if lm_head is not None and not cfg.decoder.tie_word_embeddings:
        out["output.weight"] = lm_head

    for i in range(cfg.decoder.block_count):
        src = f"{dec_prefix}.layers.{i}."
        dst = f"blk.{i}."
        out[dst + "attn_norm.weight"] = get(src + "input_layernorm.weight")
        out[dst + "attn_q.weight"] = get(src + "self_attn.q_proj.weight")
        out[dst + "attn_k.weight"] = get(src + "self_attn.k_proj.weight")
        out[dst + "attn_v.weight"] = get(src + "self_attn.v_proj.weight")
        out[dst + "attn_output.weight"] = get(src + "self_attn.o_proj.weight")
        out[dst + "attn_q_norm.weight"] = get(src + "self_attn.q_norm.weight")
        out[dst + "attn_k_norm.weight"] = get(src + "self_attn.k_norm.weight")
        out[dst + "ffn_norm.weight"] = get(src + "post_attention_layernorm.weight")
        out[dst + "ffn_gate.weight"] = get(src + "mlp.gate_proj.weight")
        out[dst + "ffn_up.weight"] = get(src + "mlp.up_proj.weight")
        out[dst + "ffn_down.weight"] = get(src + "mlp.down_proj.weight")

    ap = audio_prefix + "."
    for conv in ("conv2d1", "conv2d2", "conv2d3"):
        short = conv.replace("2d", "")
        out[f"aenc.{short}.weight"] = get(ap + conv + ".weight")
        out[f"aenc.{short}.bias"] = get(ap + conv + ".bias")
    out["aenc.conv_out.weight"] = get(ap + "conv_out.weight")
    out["aenc.ln_post.weight"] = get(ap + "ln_post.weight")
    out["aenc.ln_post.bias"] = get(ap + "ln_post.bias")
    for proj in ("proj1", "proj2"):
        out[f"aenc.{proj}.weight"] = get(ap + proj + ".weight")
        out[f"aenc.{proj}.bias"] = get(ap + proj + ".bias")

    for i in range(cfg.audio.block_count):
        src = f"{ap}layers.{i}."
        dst = f"aenc.blk.{i}."
        out[dst + "attn_norm.weight"] = get(src + "self_attn_layer_norm.weight")
        out[dst + "attn_norm.bias"] = get(src + "self_attn_layer_norm.bias")
        for hf_name, our_name in (
            ("q_proj", "attn_q"),
            ("k_proj", "attn_k"),
            ("v_proj", "attn_v"),
            ("out_proj", "attn_output"),
        ):
            out[dst + our_name + ".weight"] = get(src + f"self_attn.{hf_name}.weight")
            out[dst + our_name + ".bias"] = get(src + f"self_attn.{hf_name}.bias")
        out[dst + "ffn_norm.weight"] = get(src + "final_layer_norm.weight")
        out[dst + "ffn_norm.bias"] = get(src + "final_layer_norm.bias")
        out[dst + "ffn_up.weight"] = get(src + "fc1.weight")
        out[dst + "ffn_up.bias"] = get(src + "fc1.bias")
        out[dst + "ffn_down.weight"] = get(src + "fc2.weight")
        out[dst + "ffn_down.bias"] = get(src + "fc2.bias")
    return out


def tokenizer_metadata(checkpoint_dir: str) -> Dict[str, Any]:
    path = os.path.join(checkpoint_dir, "tokenizer.json")
    if not os.path.isfile(path):
        return {}
    with open(path, "r", encoding="utf-8") as f:
        tok = json.load(f)
    model = tok.get("model", {})
    vocab: Dict[str, int] = model.get("vocab", {})
    merges_raw = model.get("merges", [])
    merges: List[str] = [
        m if isinstance(m, str) else " ".join(m) for m in merges_raw
    ]

    added = {entry["id"]: entry for entry in tok.get("added_tokens", [])}
    size = max(max(vocab.values(), default=-1), max(added.keys(), default=-1)) + 1
    tokens = [""] * size
    types = [TOKEN_TYPE_NORMAL] * size
    for text, idx in vocab.items():
        tokens[idx] = text
    for idx, entry in added.items():
        tokens[idx] = entry["content"]
        if entry.get("special", False):
            types[idx] = TOKEN_TYPE_CONTROL

    meta = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": merges,
        "tokenizer.ggml.token_type": types,
    }
    return meta


def chat_template_metadata(checkpoint_dir: str) -> Dict[str, Any]:
    """Use a fixed ASR prompt; the HF jinja template is not needed at
    runtime — the engine always issues the same transcription request."""
    return {
        "tokenizer.chat_template": "<|im_start|>user\n{audio}<|im_end|>\n<|im_start|>assistant\n",
    }


def convert(checkpoint_dir: str, out_path: str, quantize: bool = True) -> Qwen3ASRConfig:
    with open(os.path.join(checkpoint_dir, "config.json"), "r", encoding="utf-8") as f:
        hf_config = json.load(f)
    cfg = config_from_hf(hf_config)
    tensors = map_tensors(load_checkpoint_tensors(checkpoint_dir), cfg)
    meta = tokenizer_metadata(checkpoint_dir)
    meta.update(chat_template_metadata(checkpoint_dir))
    write_model(out_path, cfg, tensors, tokenizer_meta=meta, quantize=quantize)
    return cfg


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--no-quantize", action="store_true")
    args = parser.parse_args()
    cfg = convert(args.checkpoint, args.out, quantize=not args.no_quantize)
    print(f"wrote {args.out} ({cfg.decoder.block_count}L decoder, {cfg.audio.block_count}L encoder)")


if __name__ == "__main__":
    main()
