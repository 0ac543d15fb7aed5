"""Device mesh construction for multi-chip inference and training.

The reference is a single-GPU desktop app with no model parallelism
(SURVEY.md §2.5); this module is where the TPU build goes beyond it: a
``jax.sharding.Mesh`` over ICI with named ``dp`` (data) and ``tp`` (tensor)
axes, so the 1.7B model can shard its attention heads and FFN across chips
while XLA inserts the collectives (GSPMD — no hand-written NCCL analogues).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


def make_mesh(
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (dp, tp) mesh over the given (default: all) devices.

    With only one size given, the other absorbs the remaining devices; with
    neither, all devices go to ``tp`` (model parallelism is what single-host
    serving wants).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
