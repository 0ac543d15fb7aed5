"""Sequence-parallel long-form encoding over an ``sp`` mesh axis.

Long recordings (minutes of audio → hundreds of encoder chunks) encode
across chips with near-zero communication because the AuT encoder's
attention is block-diagonal over window groups (``models/qwen3_asr/
encoder.py``): groups never attend across group boundaries, the convs never
see across chunk boundaries, and positions restart per chunk. Sharding the
mel frame axis over ``sp`` therefore partitions the convs and every
transformer layer cleanly — GSPMD inserts one all-gather at the (requested
replicated) output and nothing per layer.

The reference has no analogue (single-GPU desktop app, SURVEY.md §2.5);
this is TPU surplus that pairs with ``serving/longform.py`` for batch
transcription of long captures.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from light_whisper_tpu.models.qwen3_asr.config import AudioEncoderConfig
from light_whisper_tpu.models.qwen3_asr.encoder import encode_chunks

SEQUENCE_AXIS = "sp"


def make_sp_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D sequence-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (SEQUENCE_AXIS,))


def replicate_params(params: Dict, mesh: Mesh) -> Dict:
    """Replicate the (small) encoder parameter tree onto every mesh device."""
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), params)


@functools.lru_cache(maxsize=None)
def _jitted_encoder(cfg: AudioEncoderConfig, num_chunks: int, mesh: Mesh):
    rep = NamedSharding(mesh, P())

    def run(params, mel, valid_tokens):
        return encode_chunks(cfg, params, mel, valid_tokens, num_chunks)

    return jax.jit(run, out_shardings=rep)


def encode_chunks_sp(
    cfg: AudioEncoderConfig,
    params: Dict,
    mel,  # [num_chunks * chunk_frames, mels]
    valid_tokens,
    num_chunks: int,
    mesh: Mesh,
) -> jax.Array:
    """Bit-identical to :func:`encode_chunks`, sharded over ``sp``.

    Requires the chunk count to divide evenly across the axis so each device
    gets whole chunks (whole window groups when the count is also a multiple
    of ``chunks_per_group × sp``, which is when communication is zero)."""
    sp = mesh.shape[SEQUENCE_AXIS]
    if num_chunks % sp != 0:
        raise ValueError(f"num_chunks={num_chunks} not divisible by sp={sp}")
    mel = jax.device_put(jnp.asarray(mel), NamedSharding(mesh, P(SEQUENCE_AXIS, None)))
    return _jitted_encoder(cfg, num_chunks, mesh)(
        params, mel, jnp.int32(valid_tokens)
    )
