"""AuT audio encoder (Qwen3-Omni audio tower family) in JAX.

Structure (mirrors the semantics the reference's C++ runtime reproduces; see
the HF reference implementation ``Qwen3OmniMoeAudioEncoder``):

  128-mel log-mel [F, mels]
    → split into chunks of ``2·n_window`` frames (the conv never sees across
      a chunk boundary)
    → 3 × Conv2d(k=3, stride=2, pad=1) + GELU over (mel, time) per chunk
      (8× time downsample; HF kernel orientation — input [mels, T])
    → Linear to d_model, + sinusoidal positions restarting at each chunk
    → pre-LN transformer, bidirectional attention block-diagonal over
      windows of ``window_tokens`` post-conv frames
    → ln_post → proj1 → GELU → proj2 into the decoder embedding space.

TPU-first shaping: all chunks are processed as one batched conv (fixed
[C, chunk, mels] shape buckets); windowed attention is batched dense
attention over [G, window_tokens, d] with tail masking — no ragged
sequences, no dynamic shapes under jit. Because windows never attend across
group boundaries, prefix windows are reusable verbatim for streaming
incremental encoding (``serving.streaming``).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.models.qwen3_asr.config import AudioEncoderConfig, conv_output_length
from light_whisper_tpu.ops.linear import apply_linear

NEG_INF = -1e30


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10_000.0) -> np.ndarray:
    """Whisper-style sinusoid table: [length, channels] = [sin | cos]."""
    log_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_increment * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def _conv2d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x: [N, Cin, H, W]; w: [Cout, Cin, 3, 3]; stride 2, pad 1."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.astype(jnp.float32)[None, :, None, None]


def _layer_norm(x: jax.Array, p: Dict[str, jax.Array], eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["w"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def _windowed_attention(
    cfg: AudioEncoderConfig,
    layer: Dict,
    x: jax.Array,  # [G, W, D]
    mask: jax.Array,  # [G, W] validity
) -> jax.Array:
    G, W, D = x.shape
    H = cfg.head_count
    hd = D // H
    scale = hd ** -0.5

    q = apply_linear(layer["q"], x).reshape(G, W, H, hd)
    k = apply_linear(layer["k"], x).reshape(G, W, H, hd)
    v = apply_linear(layer["v"], x).reshape(G, W, H, hd)

    logits = jnp.einsum(
        "gqhd,gkhd->ghqk", q.astype(cfg.dtype), k.astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "ghqk,gkhd->gqhd", weights.astype(cfg.dtype), v.astype(cfg.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return apply_linear(layer["o"], out.reshape(G, W, D)).astype(x.dtype)


def _encoder_layer(cfg: AudioEncoderConfig, layer: Dict, x: jax.Array, mask: jax.Array) -> jax.Array:
    residual = x
    h = _layer_norm(x, layer["attn_norm"], cfg.layer_norm_epsilon)
    x = residual + _windowed_attention(cfg, layer, h, mask)

    residual = x
    h = _layer_norm(x, layer["ffn_norm"], cfg.layer_norm_epsilon)
    h = jax.nn.gelu(apply_linear(layer["fc1"], h), approximate=False).astype(x.dtype)
    return residual + apply_linear(layer["fc2"], h).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "num_chunks"))
def encode_chunks(
    cfg: AudioEncoderConfig,
    params: Dict,
    mel: jax.Array,  # [num_chunks * chunk_frames, mels] (zero-padded tail)
    valid_tokens: jax.Array,  # int32: post-conv valid token count
    num_chunks: int,
) -> jax.Array:
    """Returns [num_chunks * tokens_per_chunk, output_dim] audio embeddings.

    Rows ≥ ``valid_tokens`` are garbage and must be sliced off by the caller.
    """
    return encode_chunks_batch(
        cfg, params, mel[None], valid_tokens[None], num_chunks
    )[0]


@functools.partial(jax.jit, static_argnames=("cfg", "num_chunks"))
def encode_chunks_batch(
    cfg: AudioEncoderConfig,
    params: Dict,
    mel: jax.Array,  # [B, num_chunks * chunk_frames, mels] (zero-padded tails)
    valid_tokens: jax.Array,  # [B] int32: per-stream post-conv valid tokens
    num_chunks: int,
) -> jax.Array:
    """Batched encoder: B streams' chunks concatenate on the chunk axis.

    The conv never sees across chunk boundaries and attention is
    block-diagonal over window groups, so batching streams IS concatenating
    their (group-padded) chunk sets — the per-stream math is untouched, only
    the validity mask is per-stream. Returns [B, num_chunks * tokens_per_chunk,
    output_dim]; rows ≥ ``valid_tokens[b]`` are garbage.
    """
    B = mel.shape[0]
    chunk = cfg.chunk_frames
    tpc = cfg.tokens_per_chunk

    # HF orientation: conv kernels see (H=mel, W=time) — the layout the
    # authoritative Qwen3OmniMoeAudioEncoder applies its conv2d weights in
    # (input_features arrive [mels, T]). Round-2's (time, mel) orientation
    # was self-consistent with the repo's oracle but TRANSPOSED relative to
    # real artifacts' kernels; caught by tests/test_transformers_encoder_parity.py.
    x = mel.reshape(B * num_chunks, chunk, cfg.num_mel_bins).transpose(0, 2, 1)[
        :, None, :, :
    ]  # [BC, 1, M, T]
    x = jax.nn.gelu(_conv2d(x, params["conv1"]["w"], params["conv1"]["b"]), approximate=False)
    x = jax.nn.gelu(_conv2d(x, params["conv2"]["w"], params["conv2"]["b"]), approximate=False)
    x = jax.nn.gelu(_conv2d(x, params["conv3"]["w"], params["conv3"]["b"]), approximate=False)
    # [BC, hidden, freq, tpc] → [BC, tpc, hidden*freq] (c-major features,
    # matching HF's permute(0,3,1,2).view(b, t, c*f))
    BC, ch, f, t = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(BC, t, ch * f)
    x = apply_linear(params["conv_out"], x).astype(cfg.dtype)  # [BC, tpc, D]

    pos = jnp.asarray(params["pos_embd"])[:tpc].astype(x.dtype)
    x = x + pos[None, :, :]

    # Group each stream's chunks into attention windows (groups never span
    # streams: pad per stream, then flatten stream × group).
    C = num_chunks
    wt = cfg.window_tokens
    chunks_per_group = max(1, wt // tpc)
    G = (C + chunks_per_group - 1) // chunks_per_group
    pad_chunks = G * chunks_per_group - C
    x = x.reshape(B, C, tpc, -1)
    x = jnp.pad(x, ((0, 0), (0, pad_chunks), (0, 0), (0, 0)))
    W = chunks_per_group * tpc
    x = x.reshape(B * G, W, x.shape[-1])

    token_idx = jnp.arange(G * W).reshape(1, G, W)  # per-stream token index
    mask = (token_idx < valid_tokens[:, None, None]).reshape(B * G, W)

    def body(h, layer):
        return _encoder_layer(cfg, layer, h, mask), None

    x, _ = jax.lax.scan(body, x, params["layers"])

    x = x.reshape(B, G * W, -1)[:, : C * tpc]
    x = _layer_norm(x, params["ln_post"], cfg.layer_norm_epsilon)
    x = jax.nn.gelu(apply_linear(params["proj1"], x), approximate=False).astype(cfg.dtype)
    return apply_linear(params["proj2"], x).astype(cfg.dtype)


def encode(cfg: AudioEncoderConfig, params: Dict, mel: np.ndarray) -> Tuple[jax.Array, int]:
    """Host wrapper: pad mel to whole chunks, run, report valid token count."""
    frames = mel.shape[0]
    chunk = cfg.chunk_frames
    num_chunks = max(1, (frames + chunk - 1) // chunk)
    padded = np.zeros((num_chunks * chunk, cfg.num_mel_bins), dtype=np.float32)
    padded[:frames] = np.asarray(mel, dtype=np.float32)

    full_chunks, tail = divmod(frames, chunk)
    valid = full_chunks * cfg.tokens_per_chunk + (conv_output_length(tail) if tail else 0)
    out = encode_chunks(cfg, params, jnp.asarray(padded), jnp.int32(valid), num_chunks)
    return out, valid
