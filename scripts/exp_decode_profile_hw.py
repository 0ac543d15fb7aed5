#!/usr/bin/env python3
"""Device-profiled decode-step attribution (VERDICT r3 #5).

Captures a REAL device trace (jax.profiler → XLA op events on the TPU
timeline, which the axon relay forwards) of the production 256-step greedy
decode and attributes the per-step cost per fused op — replacing the
"best of six A/Bs" closure with measured per-phase numbers:

  - per-op device-busy ms/step (top ops named),
  - total device busy vs module wall (gaps = scheduling/sync),
  - the weights-bandwidth floor for comparison (Q8 bytes / 819 GB/s v5e).

Run on the axon TPU:  python scripts/exp_decode_profile_hw.py
CPU smoke:            LIGHT_WHISPER_FORCE_CPU=1 BENCH_MODEL=tiny python ...
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if os.environ.get("LIGHT_WHISPER_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import __graft_entry__ as graft  # noqa: E402
from light_whisper_tpu.models.qwen3_asr import decoder as dec  # noqa: E402

STEPS = int(os.environ.get("PROFILE_STEPS", "256"))
CAPACITY = 1024
POS0 = 160


def build(size: str):
    if size == "tiny":
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from helpers.tiny_model import tiny_config, tiny_tensors

        from light_whisper_tpu.models.qwen3_asr.loader import Qwen3ASRWeights
        import tempfile
        from helpers.tiny_model import write_tiny_model

        path = os.path.join(tempfile.gettempdir(), "lwt_profile_tiny.gguf")
        write_tiny_model(path, quantize=True)
        w = Qwen3ASRWeights(path)
        return w.config, dec.prepare_stacked_scales(w.decoder_params)
    cfg = graft._flagship_config(size)
    _enc, dparams = graft._random_params(cfg, quantize_decoder=True)
    return cfg, dparams


def device_pid_tracks(events):
    """pid of the TPU device timeline + tid→track-name map."""
    dev_pid = None
    for e in events:
        if e.get("ph") != "M" or e.get("name") != "process_name":
            continue
        name = (e.get("args") or {}).get("name", "")
        if name.startswith("/device:"):
            dev_pid = e["pid"]
    if dev_pid is None:
        # CPU smoke: no device timeline — use any pid carrying an XLA Ops track
        by_pid = defaultdict(dict)
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                by_pid[e["pid"]][e.get("tid")] = (e.get("args") or {}).get("name", "")
        for pid, tr in by_pid.items():
            if "XLA Ops" in tr.values():
                dev_pid = pid
                break
    tracks = {}
    for e in events:
        if e.get("ph") == "M" and e.get("pid") == dev_pid and e.get("name") == "thread_name":
            tracks[e.get("tid")] = (e.get("args") or {}).get("name", "")
    return dev_pid, tracks


def main() -> None:
    size = os.environ.get("BENCH_MODEL", "1.7b")
    t0 = time.perf_counter()
    cfg, dparams = build(size)
    print(f"[profile] params ready in {time.perf_counter() - t0:.1f}s", flush=True)
    dcfg = cfg.decoder

    def run():
        cache = dec.init_cache(dcfg, CAPACITY)._replace(pos=jnp.int32(POS0))
        _t, count, _c = dec.decode_greedy(
            dcfg, dparams, jnp.int32(7), cache, -2, STEPS
        )
        return int(jax.device_get(count))

    # compile + warm (twice — relay payload population)
    for i in range(2):
        t0 = time.perf_counter()
        n = run()
        print(f"[profile] warm {i}: {n} steps in {time.perf_counter() - t0:.1f}s", flush=True)

    trace_dir = os.path.join("/tmp", f"lwt_decode_trace_{os.getpid()}")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        run()
    wall_s = time.perf_counter() - t0
    print(f"[profile] traced run wall {wall_s:.2f}s", flush=True)

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    assert paths, f"no trace written under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    dev_pid, tracks = device_pid_tracks(events)
    if dev_pid is None:
        # CPU backends emit no XLA-op timeline — harness smoke only.
        print(json.dumps({
            "experiment": "decode_profile",
            "model": size,
            "steps": STEPS,
            "note": "no device timeline (CPU smoke) — run on the TPU",
            "traced_wall_s": round(wall_s, 3),
        }))
        return

    op_us = defaultdict(float)
    op_n = defaultdict(int)
    module_us = 0.0
    span_lo, span_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != dev_pid:
            continue
        track = tracks.get(e.get("tid"), "")
        dur = float(e.get("dur", 0.0))
        if track == "XLA Modules":
            module_us += dur
            span_lo = min(span_lo, e["ts"])
            span_hi = max(span_hi, e["ts"] + dur)
        elif track == "XLA Ops":
            op_us[e.get("name", "?")] += dur
            op_n[e.get("name", "?")] += 1

    busy_us = sum(op_us.values())
    per_step = lambda us: us / 1000.0 / STEPS
    top = sorted(op_us.items(), key=lambda kv: -kv[1])[:14]
    print(f"\n[profile] device busy {busy_us/1e3:.1f} ms over {STEPS} steps "
          f"({per_step(busy_us):.3f} ms/step); module span "
          f"{(span_hi - span_lo)/1e3 if module_us else 0:.1f} ms; "
          f"module busy {module_us/1e3:.1f} ms", flush=True)
    for name, us in top:
        print(f"  {per_step(us):8.4f} ms/step  ×{op_n[name]:<6d} {name[:90]}")

    # weights-bandwidth floor: Q8 decoder bytes read per step
    q_bytes = sum(
        x.size for x in jax.tree.leaves(dparams) if hasattr(x, "dtype") and x.dtype == jnp.int8
    )
    s_bytes = sum(
        x.size * 2
        for x in jax.tree.leaves(dparams)
        if hasattr(x, "dtype") and x.dtype in (jnp.bfloat16, jnp.float16)
    )
    floor_ms = (q_bytes + s_bytes) / 819e9 * 1000  # v5e HBM ~819 GB/s
    print(
        json.dumps(
            {
                "experiment": "decode_profile",
                "model": size,
                "steps": STEPS,
                "device_busy_ms_per_step": round(per_step(busy_us), 3),
                "module_span_ms_per_step": round(
                    (span_hi - span_lo) / 1000.0 / STEPS, 3
                ) if module_us else None,
                "gap_ms_per_step": round(
                    max(0.0, (span_hi - span_lo) - busy_us) / 1000.0 / STEPS, 3
                ) if module_us else None,
                "weights_bytes": q_bytes + s_bytes,
                "bandwidth_floor_ms_per_step_819GBs": round(floor_ms, 3),
                "top_ops_ms_per_step": {
                    name[:80]: round(per_step(us), 4) for name, us in top
                },
            }
        )
    )


if __name__ == "__main__":
    main()
