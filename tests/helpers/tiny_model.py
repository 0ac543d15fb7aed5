"""Synthetic tiny Qwen3-ASR artifacts for tests.

Builds a structurally faithful miniature model (random weights), writes it
through the real GGUF export path, and provides the token vocabulary used to
drive tokenizer + end-to-end decode tests. This mirrors the reference's
fake-runtime test strategy (``test_qwen3_asr_server.py:15-57``) — no real
checkpoints needed anywhere in CI.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from light_whisper_tpu.models.qwen3_asr.config import (
    AudioEncoderConfig,
    DecoderConfig,
    Qwen3ASRConfig,
)
from light_whisper_tpu.models.qwen3_asr.export import write_model
from light_whisper_tpu.models.qwen3_asr.tokenizer import byte_to_unicode

SPECIALS = ["<|pad|>", "<|im_start|>", "<|im_end|>", "<|audio|>", "<|en|>", "<|zh|>"]


def tiny_vocab() -> Tuple[list, list]:
    """256 byte tokens + specials; types mark specials as control."""
    b2u = byte_to_unicode()
    tokens = [b2u[b] for b in range(256)] + SPECIALS
    types = [1] * 256 + [3] * len(SPECIALS)
    return tokens, types


def tiny_config(num_mel_bins: int = 128) -> Qwen3ASRConfig:
    tokens, _types = tiny_vocab()
    vocab = len(tokens)
    dec = DecoderConfig(
        vocab_size=vocab,
        embedding_length=64,
        block_count=2,
        feed_forward_length=128,
        head_count=4,
        head_count_kv=2,
        key_length=16,
        rms_epsilon=1e-6,
        rope_freq_base=1_000_000.0,
        context_length=2048,
        tie_word_embeddings=True,
    )
    enc = AudioEncoderConfig(
        num_mel_bins=num_mel_bins,
        d_model=64,
        block_count=2,
        head_count=4,
        feed_forward_length=128,
        downsample_hidden_size=32,
        output_dim=64,
        n_window=50,
        n_window_infer=400,
        max_source_positions=200,
    )
    return Qwen3ASRConfig(
        audio=enc,
        decoder=dec,
        audio_token_id=256 + SPECIALS.index("<|audio|>"),
        bos_token_id=256 + SPECIALS.index("<|im_start|>"),
        eos_token_id=256 + SPECIALS.index("<|im_end|>"),
        pad_token_id=256 + SPECIALS.index("<|pad|>"),
    )


def tiny_tensors(cfg: Qwen3ASRConfig, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    d = cfg.decoder
    a = cfg.audio

    def mat(out_f, in_f, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(in_f))
        return (rng.standard_normal((out_f, in_f)) * scale).astype(np.float32)

    tensors: Dict[str, np.ndarray] = {
        "token_embd.weight": mat(d.vocab_size, d.embedding_length, 0.05),
        "output_norm.weight": np.ones(d.embedding_length, np.float32)
        + rng.standard_normal(d.embedding_length).astype(np.float32) * 0.02,
    }
    for i in range(d.block_count):
        p = f"blk.{i}."
        qdim = d.head_count * d.key_length
        kvdim = d.head_count_kv * d.key_length
        tensors[p + "attn_norm.weight"] = np.ones(d.embedding_length, np.float32)
        tensors[p + "attn_q.weight"] = mat(qdim, d.embedding_length)
        tensors[p + "attn_k.weight"] = mat(kvdim, d.embedding_length)
        tensors[p + "attn_v.weight"] = mat(kvdim, d.embedding_length)
        tensors[p + "attn_output.weight"] = mat(d.embedding_length, qdim)
        tensors[p + "attn_q_norm.weight"] = np.ones(d.key_length, np.float32)
        tensors[p + "attn_k_norm.weight"] = np.ones(d.key_length, np.float32)
        tensors[p + "ffn_norm.weight"] = np.ones(d.embedding_length, np.float32)
        tensors[p + "ffn_gate.weight"] = mat(d.feed_forward_length, d.embedding_length)
        tensors[p + "ffn_up.weight"] = mat(d.feed_forward_length, d.embedding_length)
        tensors[p + "ffn_down.weight"] = mat(d.embedding_length, d.feed_forward_length)

    h = a.downsample_hidden_size
    tensors["aenc.conv1.weight"] = (rng.standard_normal((h, 1, 3, 3)) * 0.2).astype(np.float32)
    tensors["aenc.conv1.bias"] = np.zeros(h, np.float32)
    tensors["aenc.conv2.weight"] = (rng.standard_normal((h, h, 3, 3)) * (0.2 / np.sqrt(h))).astype(np.float32)
    tensors["aenc.conv2.bias"] = np.zeros(h, np.float32)
    tensors["aenc.conv3.weight"] = (rng.standard_normal((h, h, 3, 3)) * (0.2 / np.sqrt(h))).astype(np.float32)
    tensors["aenc.conv3.bias"] = np.zeros(h, np.float32)
    tensors["aenc.conv_out.weight"] = mat(a.d_model, h * a.freq_after_conv)
    for i in range(a.block_count):
        p = f"aenc.blk.{i}."
        tensors[p + "attn_norm.weight"] = np.ones(a.d_model, np.float32)
        tensors[p + "attn_norm.bias"] = np.zeros(a.d_model, np.float32)
        for name in ("attn_q", "attn_k", "attn_v", "attn_output"):
            tensors[p + name + ".weight"] = mat(a.d_model, a.d_model)
            tensors[p + name + ".bias"] = np.zeros(a.d_model, np.float32)
        tensors[p + "ffn_norm.weight"] = np.ones(a.d_model, np.float32)
        tensors[p + "ffn_norm.bias"] = np.zeros(a.d_model, np.float32)
        tensors[p + "ffn_up.weight"] = mat(a.feed_forward_length, a.d_model)
        tensors[p + "ffn_up.bias"] = np.zeros(a.feed_forward_length, np.float32)
        tensors[p + "ffn_down.weight"] = mat(a.d_model, a.feed_forward_length)
        tensors[p + "ffn_down.bias"] = np.zeros(a.d_model, np.float32)
    tensors["aenc.ln_post.weight"] = np.ones(a.d_model, np.float32)
    tensors["aenc.ln_post.bias"] = np.zeros(a.d_model, np.float32)
    tensors["aenc.proj1.weight"] = mat(a.d_model, a.d_model)
    tensors["aenc.proj1.bias"] = np.zeros(a.d_model, np.float32)
    tensors["aenc.proj2.weight"] = mat(a.output_dim, a.d_model)
    tensors["aenc.proj2.bias"] = np.zeros(a.output_dim, np.float32)
    return tensors


def write_tiny_model(path: str, quantize: bool = False, seed: int = 0, num_mel_bins: int = 128) -> Qwen3ASRConfig:
    cfg = tiny_config(num_mel_bins=num_mel_bins)
    tokens, types = tiny_vocab()
    tokenizer_meta = {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.token_type": types,
        "tokenizer.ggml.merges": [],
        "tokenizer.chat_template": "<|im_start|>user\n{audio}<|im_end|>\n<|im_start|>assistant\n",
    }
    write_model(path, cfg, tiny_tensors(cfg, seed), tokenizer_meta, quantize=quantize)
    return cfg
