#!/usr/bin/env python3
"""Hardware greedy-parity check: fused vs unfused stacked decode kernels.

Interpret-mode tests prove the folded prologue/epilogue bit-equal to the
unfused op sequence; this verifies the same on REAL Mosaic-compiled
kernels. A 2-layer 512-dim decoder with real random Q8 weights decodes 32
greedy tokens twice — LWT_FUSED_DECODE=0 vs =1 — in separate subprocesses
(the gate is read at trace time), then tokens are compared.

Tokens may legitimately differ on argmax near-ties because the two paths
are different XLA programs (excess-precision freedom), so the script also
reports first-step logit agreement; identical tokens is the expected
outcome on well-separated logits.

Run on the axon TPU: ``python scripts/exp_fused_parity_hw.py``.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = '''
import json, os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from test_q8_matmul import _tiny_stacked_setup
from light_whisper_tpu.models.qwen3_asr import decoder as dec

cfg, prepared, embeds, _ = _tiny_stacked_setup()
cache = dec.init_cache(cfg, 64)
hidden, cache = dec.forward(cfg, prepared, embeds, cache)
cache = cache._replace(pos=jnp.int32(embeds.shape[0]))
logits0 = dec.lm_logits(cfg, prepared, hidden[-1:]) if hasattr(dec, "lm_logits") else None
tokens, count, _ = dec.decode_greedy(cfg, prepared, jnp.int32(5), cache, -2, 32)
n = int(jax.device_get(count))
out = {{
    "tokens": [int(t) for t in np.asarray(jax.device_get(tokens))[:n]],
    "hidden_tail": np.asarray(jax.device_get(hidden[-1, :8]), np.float32).tolist(),
}}
print("PARITY:" + json.dumps(out))
'''


def run(fused: str) -> dict:
    env = dict(os.environ)
    env["LWT_FUSED_DECODE"] = fused
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO)],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child (fused={fused}) failed")
    line = next(l for l in proc.stdout.splitlines() if l.startswith("PARITY:"))
    print(f"[parity] fused={fused}: {time.time() - t0:.1f}s")
    return json.loads(line[len("PARITY:"):])


def main():
    unfused = run("0")
    fused = run("1")
    same = unfused["tokens"] == fused["tokens"]
    print(f"[parity] unfused tokens: {unfused['tokens']}")
    print(f"[parity] fused tokens:   {fused['tokens']}")
    print(f"[parity] hidden tail delta: "
          f"{max(abs(a - b) for a, b in zip(unfused['hidden_tail'], fused['hidden_tail'])):.6f}")
    print(f"[parity] greedy tokens identical: {same}")
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
