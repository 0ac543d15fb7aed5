"""GGUF → device parameter trees for Qwen3-ASR.

Tensor naming follows llama.cpp conventions for the decoder (``token_embd``,
``blk.N.attn_q`` …) and an ``aenc.*`` prefix for the audio tower. Q8_0
tensors are loaded as ``{"q": int8, "s": float16}`` pairs and stay quantized
in HBM (dequant fuses into the matmul — ``ops.linear``); float tensors are
cast to bf16 for MXU-friendly compute with f32 accumulation.

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


def _linear_from_tensor(t: gguf.GGUFTensor, bias: Optional[gguf.GGUFTensor] = None) -> Dict:
    """Build a linear param dict from an (out, in)-oriented GGUF tensor."""
    if t.ggml_type == gguf.GGML_Q8_0:
        q, s = t.q8_0_parts()
        p = {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    else:
        p = {"w": jnp.asarray(t.array().T.astype(np.float32)).astype(jnp.bfloat16)}
    if bias is not None:
        p["b"] = jnp.asarray(bias.array().astype(np.float32))
    return p


def _embedding_from_tensor(t: gguf.GGUFTensor) -> Dict:
    if t.ggml_type == gguf.GGML_Q8_0:
        q, s = t.q8_0_parts()
        return {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    return {"w": jnp.asarray(t.array().astype(np.float32)).astype(jnp.bfloat16)}


def _vec(t: gguf.GGUFTensor) -> jax.Array:
    return jnp.asarray(t.array().astype(np.float32))


def _stack_layers(layers: List[Dict]) -> Dict:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


class Qwen3ASRWeights:
    """Parsed artifact: config, tokenizer, and device parameter trees."""

    def __init__(self, path: str):
        f = gguf.read_gguf(path)
        self.metadata: Dict[str, Any] = f.metadata
        self.config: Qwen3ASRConfig = config_from_metadata(f.metadata)
        self.tokenizer: BPETokenizer = tokenizer_from_metadata(f.metadata)
        self.decoder_params = self._load_decoder(f)
        self.encoder_params = self._load_encoder(f)
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
                    "q": _linear_from_tensor(t[p + "attn_q.weight"]),
                    "k": _linear_from_tensor(t[p + "attn_k.weight"]),
                    "v": _linear_from_tensor(t[p + "attn_v.weight"]),
                    "o": _linear_from_tensor(t[p + "attn_output.weight"]),
                    "q_norm": _vec(t[p + "attn_q_norm.weight"]),
                    "k_norm": _vec(t[p + "attn_k_norm.weight"]),
                    "ffn_norm": _vec(t[p + "ffn_norm.weight"]),
                    "gate": _linear_from_tensor(t[p + "ffn_gate.weight"]),
                    "up": _linear_from_tensor(t[p + "ffn_up.weight"]),
                    "down": _linear_from_tensor(t[p + "ffn_down.weight"]),
                }
            )
        params = {
            "embed": _embedding_from_tensor(t["token_embd.weight"]),
            "layers": _stack_layers(layers),
            "final_norm": _vec(t["output_norm.weight"]),
        }
        if "output.weight" in t and not cfg.tie_word_embeddings:
            params["lm_head"] = _linear_from_tensor(t["output.weight"])
        return params

    def _load_encoder(self, f: gguf.GGUFFile) -> Dict:
        cfg = self.config.audio
        t = f.tensors

        def conv(name: str) -> Dict:
            return {
                "w": jnp.asarray(t[f"aenc.{name}.weight"].array().astype(np.float32)),
                "b": jnp.asarray(t[f"aenc.{name}.bias"].array().astype(np.float32)),
            }

        def linear(name: str, bias: bool = True) -> Dict:
            return _linear_from_tensor(
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
            "pos_embd": jnp.asarray(
                sinusoid_positions(cfg.max_source_positions, cfg.d_model)
            ),
        }
