#!/usr/bin/env python3
"""Production-config cross-path token parity on real hardware (VERDICT r3 #6).

docs/SERVING.md's exactness doctrine says every serving path emits the SAME
tokens for the same audio. Interpret-mode/CPU tests prove it at toy scale;
this script proves it at the production 1.7B (or 0.6b) config on the real
chip, over a soak set of speechlike utterances:

  paths per fused-mode child (LWT_FUSED_DECODE is read at trace time, so
  each mode is its own subprocess):
    full       — Qwen3ASRModel.transcribe (offline one-shot)
    inc        — IncrementalTranscriber fresh window (interim first tick)
    inc-ext    — IncrementalTranscriber extend (KV rollback + draft verify)
    tickbatch  — serving/incremental_batch.tick_batch (B coalesced streams)
    decbatch   — Qwen3ASRModel.transcribe_batch (batched greedy)

  then every pairwise comparison is printed, within each fused mode and
  across fused on/off.

Run on the axon TPU:  python scripts/exp_crosspath_parity_hw.py
Smoke on CPU:         LIGHT_WHISPER_FORCE_CPU=1 BENCH_MODEL=tiny python ...
"""

from __future__ import annotations

import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r'''
import json, os, sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
import jax
if os.environ.get("LIGHT_WHISPER_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as graft
from light_whisper_tpu.models.qwen3_asr.model import Qwen3ASRModel
from light_whisper_tpu.serving.incremental import IncrementalTranscriber
from light_whisper_tpu.serving.incremental_batch import tick_batch
from light_whisper_tpu.eval.speechlike import speechlike

size = os.environ.get("BENCH_MODEL", "1.7b")
max_new = int(os.environ.get("PARITY_MAX_NEW", "24"))
if size == "tiny":
    import tempfile
    from helpers.tiny_model import write_tiny_model
    path = os.path.join(tempfile.gettempdir(), "lwt_parity_tiny.gguf")
    write_tiny_model(path, quantize=True)
    model = Qwen3ASRModel(path, max_new_tokens=max_new)
else:
    cfg = graft._flagship_config(size)
    enc_p, dec_p = graft._random_params(cfg, quantize_decoder=True)
    model = Qwen3ASRModel.__new__(Qwen3ASRModel)
    model.config = cfg
    model.decoder_params = dec_p
    model.encoder_params = enc_p
    model.max_new_tokens = max_new
    model.cache_dtype = jnp.bfloat16
    model.mesh = None
    model._cache_sharding = None
    model.prefix_ids = list(range(2, 10))
    model.suffix_ids = [3, 4, 5]
    model._caches = {{}}
    class _Tok:
        tokens = []
        def decode(self, ids, skip_special=True):
            return " ".join(str(i) for i in ids)
    model.tokenizer = _Tok()

sr = 16_000
# Soak set: varying lengths across audio buckets + an extend pair per clip.
clips = [
    speechlike(3.2, seed=11), speechlike(6.7, seed=22),
    speechlike(10.0, seed=33), speechlike(11.9, seed=44),
]
out = {{}}

# full offline
out["full"] = [model.transcribe(c).tokens for c in clips]

# incremental fresh + extend (extend re-sends the clip with 0.5 s appended)
inc_tokens, ext_tokens, full_ext = [], [], []
for i, c in enumerate(clips):
    inc = IncrementalTranscriber(model, max_new_tokens=max_new)
    inc_tokens.append(inc.transcribe_window(c, window_start_sample=0).tokens)
    grown = np.concatenate([c, speechlike(0.5, seed=100 + i)])
    ext_tokens.append(inc.transcribe_window(grown, window_start_sample=0).tokens)
    full_ext.append(model.transcribe(grown).tokens)
out["inc"] = inc_tokens
out["inc-ext"] = ext_tokens
out["full-ext"] = full_ext  # oracle for inc-ext

# batched coalesced ticks (fresh windows, one device program)
incs = [IncrementalTranscriber(model, max_new_tokens=max_new) for _ in clips]
out["tickbatch"] = [r.tokens for r in tick_batch(incs, clips)]

# batched greedy decode
out["decbatch"] = [r.tokens for r in model.transcribe_batch(clips)]

print("CHILD_RESULT " + json.dumps(out))
'''


def run_child(fused: str) -> dict:
    env = dict(os.environ, LWT_FUSED_DECODE=fused)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO)],
        capture_output=True,
        text=True,
        timeout=3600,
        env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            print(f"  fused={fused}: ok in {time.perf_counter() - t0:.0f}s")
            return json.loads(line[len("CHILD_RESULT "):])
    sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
    raise SystemExit(f"child (fused={fused}) produced no result")


def main() -> None:
    print(f"cross-path parity @ {os.environ.get('BENCH_MODEL', '1.7b')}")
    results = {f: run_child(f) for f in ("1", "0")}

    # inc-ext compares against the grown clips' offline decode
    failures = 0
    rows = []
    paths = ["full", "inc", "tickbatch", "decbatch"]
    for fused, r in results.items():
        for a, b in itertools.combinations(paths, 2):
            same = r[a] == r[b]
            rows.append((f"fused={fused}", a, b, same))
            failures += not same
        same = r["inc-ext"] == r["full-ext"]
        rows.append((f"fused={fused}", "inc-ext", "full(grown)", same))
        failures += not same
    for a in paths + ["inc-ext", "full-ext"]:
        same = results["1"][a] == results["0"][a]
        rows.append(("fused=1 vs 0", a, a, same))
        failures += not same

    for tag, a, b, same in rows:
        print(f"  [{tag}] {a:10s} vs {b:12s}: {'IDENTICAL' if same else 'MISMATCH'}")
    n_tokens = sum(len(t) for t in results["1"]["full"])
    print(
        json.dumps(
            {
                "experiment": "crosspath_parity",
                "model": os.environ.get("BENCH_MODEL", "1.7b"),
                "clips": 4,
                "pairwise_checks": len(rows),
                "mismatches": failures,
                "tokens_compared_full_path": n_tokens,
            }
        )
    )
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
