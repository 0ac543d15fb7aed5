"""GGUF → device parameter trees for Qwen3-ASR.

Tensor naming follows llama.cpp conventions for the decoder (``token_embd``,
``blk.N.attn_q`` …) and an ``aenc.*`` prefix for the audio tower. Q8_0
tensors are loaded as ``{"q": int8, "s": float16}`` pairs and stay quantized
in HBM (dequant fuses into the matmul — ``ops.linear``); float tensors are
converted to bf16 for MXU-friendly compute with f32 accumulation.

All conversion and layer stacking happens host-side in numpy, followed by a
single device transfer per leaf — on remote-compiled TPU backends a chain of
per-tensor on-device casts would pay one compile round trip each.

Layer parameters are stacked along a leading axis so the transformer layer
loop compiles once as a ``lax.scan`` body.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.formats import gguf
from light_whisper_tpu.models.qwen3_asr.config import (
    Qwen3ASRConfig,
    config_from_metadata,
)
from light_whisper_tpu.models.qwen3_asr.encoder import sinusoid_positions
from light_whisper_tpu.models.qwen3_asr.tokenizer import BPETokenizer, tokenizer_from_metadata
from light_whisper_tpu.utils.numerics import host_bf16, host_f32


def _linear_np(t: gguf.GGUFTensor, bias: Optional[gguf.GGUFTensor] = None) -> Dict:
    """Host-side linear param dict from an (out, in)-oriented GGUF tensor."""
    if t.ggml_type in (gguf.GGML_Q8_0, gguf.GGML_Q4_0):
        q, s = t.q8_0_parts()  # Q4_0 expands to int8 quants + same scales
        # scales go to bf16: the TPU kernel dialect has no f16 support
        p = {"q": q, "s": host_bf16(s)}
    else:
        p = {"w": host_bf16(t.array().T)}
    if bias is not None:
        p["b"] = host_f32(bias.array())
    return p


VOCAB_PAD_MULTIPLE = 1024  # logits matmul tiles best on 1024-row multiples


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    pad = -arr.shape[0] % multiple
    if pad == 0:
        return arr
    return np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)], axis=0)


def _embedding_np(t: gguf.GGUFTensor) -> Dict:
    """Embedding rows are padded to a tile multiple (the tied logits matmul
    over the raw 151936-row vocab would force 128-row kernel tiles);
    ``logits_for`` masks the padded slots out of the argmax."""
    if t.ggml_type in (gguf.GGML_Q8_0, gguf.GGML_Q4_0):
        q, s = t.q8_0_parts()
        return {
            "q": _pad_rows(q, VOCAB_PAD_MULTIPLE),
            "s": _pad_rows(host_bf16(s), VOCAB_PAD_MULTIPLE),
        }
    return {"w": _pad_rows(host_bf16(t.array()), VOCAB_PAD_MULTIPLE)}


def _fuse_linears_np(parts: List[Dict]) -> Dict:
    """Concatenate (out, in)-oriented linears along out-features.

    One fused projection = one kernel launch; kernel-launch count dominates
    decode steps (28 scanned layers × projections per layer)."""
    if "q" in parts[0]:
        return {
            "q": np.concatenate([p["q"] for p in parts], axis=0),
            "s": np.concatenate([p["s"] for p in parts], axis=0),
        }
    return {"w": np.concatenate([p["w"] for p in parts], axis=1)}  # [in, out]


def _vec(t: gguf.GGUFTensor) -> np.ndarray:
    return host_f32(t.array())


def _stack_layers(layers: List[Dict]) -> Dict:
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def _to_device(tree):
    return jax.tree.map(jnp.asarray, tree)


class Qwen3ASRWeights:
    """Parsed artifact: config, tokenizer, and device parameter trees."""

    def __init__(self, path: str):
        f = gguf.read_gguf(path)
        self.metadata: Dict[str, Any] = f.metadata
        self.config: Qwen3ASRConfig = config_from_metadata(f.metadata)
        self.tokenizer: BPETokenizer = tokenizer_from_metadata(f.metadata)
        self.decoder_params = _to_device(self._load_decoder(f))
        self.encoder_params = _to_device(self._load_encoder(f))
        f.close()

    # ------------------------------------------------------------------

    def _load_decoder(self, f: gguf.GGUFFile) -> Dict:
        cfg = self.config.decoder
        t = f.tensors
        layers = []
        for i in range(cfg.block_count):
            p = f"blk.{i}."
            layers.append(
                {
                    "attn_norm": _vec(t[p + "attn_norm.weight"]),
                    "qkv": _fuse_linears_np(
                        [
                            _linear_np(t[p + "attn_q.weight"]),
                            _linear_np(t[p + "attn_k.weight"]),
                            _linear_np(t[p + "attn_v.weight"]),
                        ]
                    ),
                    "o": _linear_np(t[p + "attn_output.weight"]),
                    "q_norm": _vec(t[p + "attn_q_norm.weight"]),
                    "k_norm": _vec(t[p + "attn_k_norm.weight"]),
                    "ffn_norm": _vec(t[p + "ffn_norm.weight"]),
                    "gateup": _fuse_linears_np(
                        [
                            _linear_np(t[p + "ffn_gate.weight"]),
                            _linear_np(t[p + "ffn_up.weight"]),
                        ]
                    ),
                    "down": _linear_np(t[p + "ffn_down.weight"]),
                }
            )
        params = {
            "embed": _embedding_np(t["token_embd.weight"]),
            "layers": _stack_layers(layers),
            "final_norm": _vec(t["output_norm.weight"]),
        }
        if "output.weight" in t and not cfg.tie_word_embeddings:
            params["lm_head"] = _linear_np(t["output.weight"])
        return params

    def _load_encoder(self, f: gguf.GGUFFile) -> Dict:
        cfg = self.config.audio
        t = f.tensors

        def conv(name: str) -> Dict:
            return {
                "w": host_f32(t[f"aenc.{name}.weight"].array()),
                "b": host_f32(t[f"aenc.{name}.bias"].array()),
            }

        def linear(name: str, bias: bool = True) -> Dict:
            return _linear_np(
                t[f"aenc.{name}.weight"],
                t.get(f"aenc.{name}.bias") if bias else None,
            )

        def norm(name: str) -> Dict:
            return {
                "w": _vec(t[f"aenc.{name}.weight"]),
                "b": _vec(t[f"aenc.{name}.bias"]),
            }

        layers = []
        for i in range(cfg.block_count):
            p = f"blk.{i}."
            layers.append(
                {
                    "attn_norm": norm(p + "attn_norm"),
                    "q": linear(p + "attn_q"),
                    "k": linear(p + "attn_k"),
                    "v": linear(p + "attn_v"),
                    "o": linear(p + "attn_output"),
                    "ffn_norm": norm(p + "ffn_norm"),
                    "fc1": linear(p + "ffn_up"),
                    "fc2": linear(p + "ffn_down"),
                }
            )
        return {
            "conv1": conv("conv1"),
            "conv2": conv("conv2"),
            "conv3": conv("conv3"),
            "conv_out": linear("conv_out", bias=False),
            "layers": _stack_layers(layers),
            "ln_post": norm("ln_post"),
            "proj1": linear("proj1"),
            "proj2": linear("proj2"),
            "pos_embd": sinusoid_positions(cfg.max_source_positions, cfg.d_model),
        }
