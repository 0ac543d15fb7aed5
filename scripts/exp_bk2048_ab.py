#!/usr/bin/env python3
"""A/B the LWT_BK2048 contiguous-read tiling on the FULL 1.7B decode program.

The (bo, bk) sweep showed 486 vs 403 GB/s at the gateup shape, but 64-step
decode walls through the relay carry RTT jitter bigger than the predicted
~0.3-0.5 ms/step effect. This runs decode_greedy for 256 steps (ONE dispatch
→ RTT/256 ≈ 0.15 ms amortized), 4 reps, and reports min + median. Run twice,
in SEPARATE processes (the gate is read at trace time):

    python scripts/exp_bk2048_ab.py            # baseline (bo=2048, bk=512)
    LWT_BK2048=1 python scripts/exp_bk2048_ab.py
"""
import os
import sys
import time

os.environ.setdefault("LWT_FUSED_DECODE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from exp_fused_compile import _run_decode, log  # noqa: E402
import __graft_entry__ as graft  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from light_whisper_tpu.models.qwen3_asr import decoder as dec  # noqa: E402


def main():
    gate = os.environ.get("LWT_BK2048", "")
    log(f"LWT_BK2048={gate!r}  devices: {jax.devices()}")
    # Reuse _run_decode's param builder by calling it once at 256 steps
    # (compiles + 2 timed runs), then add 2 more timed runs via the same path.
    for _ in range(2):
        _run_decode(256)


if __name__ == "__main__":
    main()
