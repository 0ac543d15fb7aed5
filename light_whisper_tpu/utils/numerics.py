"""Host-side dtype conversion helpers.

On remote-compiled TPU backends every distinct on-device op shape pays a
compilation round trip, so parameter loading must avoid per-tensor device
``astype`` chains: convert on host with ``ml_dtypes`` (numpy bf16) and ship
the final bytes in one transfer.
"""

from __future__ import annotations

import ml_dtypes
import numpy as np

NP_BF16 = np.dtype(ml_dtypes.bfloat16)


def host_bf16(x: np.ndarray) -> np.ndarray:
    """Convert to numpy-bfloat16 on host (no device round trip)."""
    return np.asarray(x).astype(NP_BF16)


def host_f32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)
