"""Independent float64 numpy implementation of Qwen3-ASR semantics.

Deliberately structured differently from the JAX code (no caches, no shape
bucketing, flattened ragged attention windows as in the HF reference
implementation) so it can serve as a true oracle for:

- the audio encoder (chunked conv + block-diagonal attention),
- the decoder stack (GQA + q/k norm + NeoX RoPE + SwiGLU),
- greedy decoding with audio-embedding splicing.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np

from light_whisper_tpu.models.qwen3_asr.config import Qwen3ASRConfig, conv_output_length


def _gelu(x):
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / np.sqrt(2.0)))


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _rms_norm(x, w, eps):
    scale = 1.0 / np.sqrt((x * x).mean(axis=-1, keepdims=True) + eps)
    return x * scale * w


def _layer_norm(x, w, b, eps):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * w + b


def _conv2d_s2(x, w, b):
    """x: [Cin, H, W]; w: [Cout, Cin, 3, 3]; stride 2, pad 1."""
    cin, H, W = x.shape
    cout = w.shape[0]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    oh, ow = (H + 1) // 2, (W + 1) // 2
    out = np.zeros((cout, oh, ow))
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, 2 * i : 2 * i + 3, 2 * j : 2 * j + 3]
            out[:, i, j] = np.tensordot(w, patch, axes=([1, 2, 3], [0, 1, 2]))
    return out + b[:, None, None]


def sinusoids(length, channels):
    inc = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


def encoder_forward(cfg: Qwen3ASRConfig, T: Dict[str, np.ndarray], mel: np.ndarray) -> np.ndarray:
    """mel: [frames, mels] (unpadded). Returns [n_tokens, output_dim]."""
    a = cfg.audio
    chunk = a.chunk_frames
    frames = mel.shape[0]
    n_chunks = (frames + chunk - 1) // chunk

    chunk_outputs: List[np.ndarray] = []
    for c in range(n_chunks):
        piece = mel[c * chunk : (c + 1) * chunk]
        valid = conv_output_length(piece.shape[0])
        padded = np.zeros((chunk, a.num_mel_bins))
        padded[: piece.shape[0]] = piece
        x = padded.T[None, :, :]  # [Cin=1, H=mel, W=time] — HF orientation
        x = _gelu(_conv2d_s2(x, T["aenc.conv1.weight"], T["aenc.conv1.bias"]))
        x = _gelu(_conv2d_s2(x, T["aenc.conv2.weight"], T["aenc.conv2.bias"]))
        x = _gelu(_conv2d_s2(x, T["aenc.conv3.weight"], T["aenc.conv3.bias"]))
        ch, fdim, t = x.shape
        flat = x.transpose(2, 0, 1).reshape(t, ch * fdim)
        emb = flat @ T["aenc.conv_out.weight"].T  # [t, d_model]
        emb = emb + sinusoids(a.max_source_positions, a.d_model)[:t]
        chunk_outputs.append(emb[:valid])

    h = np.concatenate(chunk_outputs, axis=0)  # [n_tokens, d]
    n_tokens = h.shape[0]

    # Block-diagonal windows over the flattened valid sequence.
    wt = a.window_tokens
    bounds = list(range(0, n_tokens, wt)) + [n_tokens]

    for i in range(a.block_count):
        p = f"aenc.blk.{i}."
        normed = _layer_norm(h, T[p + "attn_norm.weight"], T[p + "attn_norm.bias"], a.layer_norm_epsilon)
        attn_out = np.zeros_like(h)
        H = a.head_count
        hd = a.d_model // H
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = normed[s:e]
            q = (seg @ T[p + "attn_q.weight"].T + T[p + "attn_q.bias"]).reshape(-1, H, hd)
            k = (seg @ T[p + "attn_k.weight"].T + T[p + "attn_k.bias"]).reshape(-1, H, hd)
            v = (seg @ T[p + "attn_v.weight"].T + T[p + "attn_v.bias"]).reshape(-1, H, hd)
            logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
            w = _softmax(logits, axis=-1)
            o = np.einsum("hqk,khd->qhd", w, v).reshape(seg.shape[0], -1)
            attn_out[s:e] = o @ T[p + "attn_output.weight"].T + T[p + "attn_output.bias"]
        h = h + attn_out
        normed = _layer_norm(h, T[p + "ffn_norm.weight"], T[p + "ffn_norm.bias"], a.layer_norm_epsilon)
        ff = _gelu(normed @ T[p + "ffn_up.weight"].T + T[p + "ffn_up.bias"])
        h = h + ff @ T[p + "ffn_down.weight"].T + T[p + "ffn_down.bias"]

    h = _layer_norm(h, T["aenc.ln_post.weight"], T["aenc.ln_post.bias"], a.layer_norm_epsilon)
    h = _gelu(h @ T["aenc.proj1.weight"].T + T["aenc.proj1.bias"])
    return h @ T["aenc.proj2.weight"].T + T["aenc.proj2.bias"]


def _rope(x, positions, base):
    """x: [T, H, hd]; rotate-half layout."""
    hd = x.shape[-1]
    inv = base ** (-np.arange(0, hd, 2) / hd)
    ang = positions[:, None] * inv[None, :]
    cos = np.concatenate([np.cos(ang)] * 2, axis=-1)[:, None, :]
    sin = np.concatenate([np.sin(ang)] * 2, axis=-1)[:, None, :]
    half = hd // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos + rot * sin


def decoder_forward(cfg: Qwen3ASRConfig, T: Dict[str, np.ndarray], embeds: np.ndarray) -> np.ndarray:
    """Full-sequence causal forward; returns logits [T, V]."""
    d = cfg.decoder
    x = embeds
    n = x.shape[0]
    positions = np.arange(n)
    hd = d.key_length
    groups = d.head_count // d.head_count_kv

    for i in range(d.block_count):
        p = f"blk.{i}."
        h = _rms_norm(x, T[p + "attn_norm.weight"], d.rms_epsilon)
        q = (h @ T[p + "attn_q.weight"].T).reshape(n, d.head_count, hd)
        k = (h @ T[p + "attn_k.weight"].T).reshape(n, d.head_count_kv, hd)
        v = (h @ T[p + "attn_v.weight"].T).reshape(n, d.head_count_kv, hd)
        q = _rms_norm(q, T[p + "attn_q_norm.weight"], d.rms_epsilon)
        k = _rms_norm(k, T[p + "attn_k_norm.weight"], d.rms_epsilon)
        q = _rope(q, positions, d.rope_freq_base)
        k = _rope(k, positions, d.rope_freq_base)
        k = np.repeat(k, groups, axis=1)
        v = np.repeat(v, groups, axis=1)
        logits = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
        mask = np.tril(np.ones((n, n), dtype=bool))
        logits = np.where(mask[None], logits, -1e30)
        w = _softmax(logits, axis=-1)
        attn = np.einsum("hqk,khd->qhd", w, v).reshape(n, -1)
        x = x + attn @ T[p + "attn_output.weight"].T

        h = _rms_norm(x, T[p + "ffn_norm.weight"], d.rms_epsilon)
        gate = h @ T[p + "ffn_gate.weight"].T
        up = h @ T[p + "ffn_up.weight"].T
        x = x + (_silu(gate) * up) @ T[p + "ffn_down.weight"].T

    x = _rms_norm(x, T["output_norm.weight"], d.rms_epsilon)
    head = T.get("output.weight", T["token_embd.weight"])
    return x @ head.T


def greedy_transcribe_ids(
    cfg: Qwen3ASRConfig,
    T: Dict[str, np.ndarray],
    prefix_ids: List[int],
    suffix_ids: List[int],
    mel: np.ndarray,
    max_new: int,
) -> List[int]:
    audio_embeds = encoder_forward(cfg, T, mel)
    n_audio = audio_embeds.shape[0]
    ids = list(prefix_ids) + [cfg.audio_token_id] * n_audio + list(suffix_ids)
    embed = T["token_embd.weight"]
    base = embed[np.array(ids)]
    base[len(prefix_ids) : len(prefix_ids) + n_audio] = audio_embeds

    generated: List[int] = []
    current = base
    for _ in range(max_new + 1):
        logits = decoder_forward(cfg, T, current)
        nxt = int(np.argmax(logits[-1]))
        if nxt == cfg.eos_token_id:
            break
        generated.append(nxt)
        if len(generated) >= max_new:
            break
        current = np.concatenate([current, embed[np.array([nxt])]], axis=0)
    return generated
