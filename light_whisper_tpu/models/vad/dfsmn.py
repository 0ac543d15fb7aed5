"""FireRedVAD DFSMN frame classifier in JAX.

TPU-first re-expression of the reference's ONNX VAD (CPU onnxruntime,
``firered_vad.py:76-111``): per-frame MLPs become [T,·]×[·,·] matmuls on the
MXU; each memory block's lookback/lookahead pair fuses into one depthwise
conv; the whole probability computation is a single jitted program.

Shape bucketing with exact parity: callers pad the feature matrix to a bucket
length and pass the true frame count. Frames ≥ ``valid_frames`` are zeroed
*before every memory block*, which reproduces the zero-padded convolution
semantics of the original unpadded graph exactly (padding frames contribute
zeros to every conv window, and per-frame garbage beyond the boundary never
propagates). Outputs beyond ``valid_frames`` are meaningless and sliced off
by the caller.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from light_whisper_tpu.models.vad.onnx_import import FILTER_TAPS, NUM_BLOCKS


def combined_filter(back: jnp.ndarray, ahead: jnp.ndarray) -> jnp.ndarray:
    """Merge lookback/lookahead taps into one [2*TAPS, C] depthwise kernel.

    With input padded 19 left / 20 right, position ``j`` of the combined
    kernel sees frame ``t - 19 + j``: j∈[0,19] covers t-19..t (lookback taps
    in export order) and j∈[20,39] covers t+1..t+20 (lookahead taps).
    """
    return jnp.concatenate([back.T, ahead.T], axis=0)  # [40, C]


def _memory_block(x: jnp.ndarray, filt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """x: [T, C]; filt: [2*TAPS, C]; mask: [T, 1] validity."""
    x = x * mask
    xp = jnp.pad(x, ((FILTER_TAPS - 1, FILTER_TAPS), (0, 0)))
    # Depthwise correlation via conv_general_dilated on [N=1, C, T].
    out = jax.lax.conv_general_dilated(
        xp.T[None, :, :],
        filt.T[:, None, :],  # [C, 1, 40]
        window_strides=(1,),
        padding="VALID",
        feature_group_count=x.shape[1],
    )[0].T  # [T, C]
    return x + out


@functools.partial(jax.jit, static_argnames=())
def dfsmn_probs(params: Dict[str, jnp.ndarray], feat: jnp.ndarray, valid_frames: jnp.ndarray) -> jnp.ndarray:
    """Speech probability per frame.

    feat: [T, 80] CMVN-normalized fbank (possibly padded); valid_frames:
    scalar int32 — frames ≥ it are treated as absent. Returns [T] float32.
    """
    mask = (jnp.arange(feat.shape[0]) < valid_frames)[:, None].astype(feat.dtype)

    h = jax.nn.relu(feat @ params["fc1.w"] + params["fc1.b"])
    h = jax.nn.relu(h @ params["fc2.w"] + params["fc2.b"])

    prev = _memory_block(h, params["fsmn1.filt"], mask)
    for i in range(NUM_BLOCKS):
        z = jax.nn.relu(prev @ params[f"blocks.{i}.fc1.w"] + params[f"blocks.{i}.fc1.b"])
        z = z @ params[f"blocks.{i}.fc2.w"]
        z = _memory_block(z, params[f"blocks.{i}.filt"], mask)
        prev = z + prev

    h = jax.nn.relu(prev @ params["dnn.w"] + params["dnn.b"])
    logit = h @ params["out.w"] + params["out.b"]
    return jax.nn.sigmoid(logit[:, 0])


def prepare_device_params(flat: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """Fold raw filters into combined kernels and ship params to device."""
    out: Dict[str, jnp.ndarray] = {}
    for key, value in flat.items():
        if key.endswith(".back"):
            stem = key[: -len(".back")]
            out[f"{stem}.filt"] = combined_filter(
                jnp.asarray(flat[f"{stem}.back"]), jnp.asarray(flat[f"{stem}.ahead"])
            )
        elif key.endswith(".ahead"):
            continue
        else:
            out[key] = jnp.asarray(value)
    return out
