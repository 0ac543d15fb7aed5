"""Linear layers over dense or Q8_0-quantized weights.

Weight layout conventions:

- dense:  ``{"w": [in, out]}`` (+ optional ``"b": [out]``), applied as ``x @ w``.
- Q8_0:   ``{"q": int8 [out, in], "s": float16 [out, in // 32]}`` — the GGUF
  on-disk orientation, kept quantized in HBM. The matmul dequantizes on the
  fly; on TPU the Pallas kernel (``ops.q8_matmul``) fuses dequant into the
  MXU contraction, and an XLA fallback covers CPU/interpret paths.

All contractions accumulate in float32 (``preferred_element_type``), which is
what keeps greedy transcripts stable against the reference's f32 CPU path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from light_whisper_tpu.formats.gguf import Q8_0_BLOCK

_PALLAS_MIN_OUT = 256  # below this, XLA fallback is faster than kernel launch


def q8_matmul_xla(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    """x[..., in] @ dequant(q, s).T → [..., out] via plain XLA ops.

    XLA fuses the (cast ∘ scale-expand) into the matmul's operand read, so
    this is already decent; the Pallas kernel exists to keep weights int8 all
    the way into VMEM (half the HBM traffic of a bf16 dequant materialize).
    """
    w = q.astype(jnp.bfloat16) * jnp.repeat(
        s.astype(jnp.bfloat16), Q8_0_BLOCK, axis=-1
    )  # [out, in]
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def apply_linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """Apply a dense or Q8_0 linear parameter dict to ``x`` (f32 result)."""
    if "q" in p:
        out = _q8_dispatch(x, p["q"], p["s"])
    else:
        out = jax.lax.dot_general(
            x,
            p["w"].astype(x.dtype) if p["w"].dtype != x.dtype else p["w"],
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def _q8_dispatch(x: jax.Array, q: jax.Array, s: jax.Array) -> jax.Array:
    # Pallas path is wired in lazily to keep CPU/test imports light.
    if _use_pallas(q):
        from light_whisper_tpu.ops.q8_matmul import q8_matmul_pallas

        return q8_matmul_pallas(x, q, s)
    return q8_matmul_xla(x, q, s)


def _use_pallas(q: jax.Array) -> bool:
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    if platform not in ("tpu", "axon"):
        return False
    out_features, in_features = q.shape
    return (
        out_features >= _PALLAS_MIN_OUT
        and out_features % 128 == 0
        and in_features % 512 == 0  # kernel's fixed reduction tile
    )


def dense_params(w, b: Optional[jax.Array] = None, dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Build a dense linear param dict from an (out, in)-oriented matrix."""
    p = {"w": jnp.asarray(w).T.astype(dtype)}
    if b is not None:
        p["b"] = jnp.asarray(b).astype(jnp.float32)
    return p
