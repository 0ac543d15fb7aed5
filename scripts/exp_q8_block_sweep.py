#!/usr/bin/env python3
"""Block-size sweep for the stacked Q8 kernel (single-stream decode lever).

The shipped tiling is (bt=8, bo=2048, bk=512) → ~581 GB/s effective weight
bandwidth at 1.7B decode shapes (~71% of v5e's 819 GB/s). This sweeps
(bo, bk) at the dominant projection shapes using the in-dispatch-iteration
methodology (fori_loop with a carry feeding x so iterations can't CSE;
subtract one measured relay RTT) so each config's true device time is
resolvable through the relay.

Each (shape × config) is a fresh Mosaic payload compiled in its own
standalone request — the proven-safe path under the relay compile ceiling
(DEVNOTES round-3 payload seeding). Run AFTER any concurrent bench has
finished; relay contention distorts both.

Usage: python scripts/exp_q8_block_sweep.py [--all-shapes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from light_whisper_tpu.ops.q8_matmul import _q8_matmul_stacked_2d  # noqa: E402

L = 28
T = 8  # decode row tile (T=1 pads to 8)


def log(msg):
    print(f"[sweep {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def measure_rtt():
    trivial = jax.jit(lambda v: v + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    jax.device_get(trivial(z))
    samples = []
    for _ in range(11):
        t0 = time.perf_counter()
        jax.device_get(trivial(z))
        samples.append((time.perf_counter() - t0) * 1000)
    samples.sort()
    return samples[len(samples) // 2]


def bench_config(out_f, in_f, bo, bk, rtt_ms, iters=512, layers=None):
    # iters=512, not 32: one layer call is ~0.03-0.05 ms, so a 32-iteration
    # loop has ~1.4 ms of device time — unresolvable against the relay's
    # multi-ms RTT jitter (a 32-iter run once "measured" 26 TB/s). 512 iters
    # ≈ 20+ ms device time, the same floor the read-ceiling probe needs.
    rng = np.random.default_rng(0)
    nl = L if layers is None else layers
    q = jnp.asarray(
        rng.integers(-127, 127, size=(nl, out_f, in_f), dtype=np.int8)
    )
    s_t = jnp.asarray(
        (rng.standard_normal((nl, in_f // 32, out_f)) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((T, in_f)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    # q/s_t MUST be arguments, not closures: a closed-over device array is
    # embedded in the lowered module as a constant, and under remote compile
    # the 688 MB weight stack ships inside the compile request body — the
    # relay rejects it with HTTP 413 (observed 2026-08-18).
    @jax.jit
    def run(x0, q, s_t):
        def body(i, carry):
            layer = jax.lax.rem(i, nl)
            y = _q8_matmul_stacked_2d(
                x0 + (carry * 1e-9).astype(x0.dtype), q, s_t, layer, T, bo, bk
            )
            return jnp.sum(y).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    jax.device_get(run(x, q, s_t))  # compile (standalone payload request)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(x, q, s_t))
        best = min(best, time.perf_counter() - t0)
    per_call_ms = max(0.001, (best * 1000 - rtt_ms) / iters)
    weight_bytes = out_f * in_f + out_f * in_f // 32 * 2  # int8 q + bf16 scales
    gbps = weight_bytes / (per_call_ms / 1000) / 1e9
    return per_call_ms, gbps, compile_s


def bench_config_diff(out_f, in_f, bo, bk, iters_pair, layers=None, trials=5):
    """Differential timing: slope between two in-dispatch trip counts.

    min-wall(N) ≈ RTT_min + N·t_call, so the slope between two trip counts
    cancels the relay term exactly — the fix that made bench.py's prefill
    section stop printing clamped 0.01s (DEVNOTES session 7). This resolves
    shapes whose per-call device time (qkv/o ≤ 8.4 MB ≈ 15 µs) drowns in
    RTT jitter under single-point RTT subtraction.
    """
    rng = np.random.default_rng(0)
    nl = L if layers is None else layers
    q = jnp.asarray(
        rng.integers(-127, 127, size=(nl, out_f, in_f), dtype=np.int8)
    )
    s_t = jnp.asarray(
        (rng.standard_normal((nl, in_f // 32, out_f)) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((T, in_f)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    lo, hi = iters_pair
    walls = {}
    compile_total = 0.0
    for iters in (lo, hi):

        @jax.jit
        def run(x0, q, s_t, iters=iters):
            def body(i, carry):
                layer = jax.lax.rem(i, nl)
                y = _q8_matmul_stacked_2d(
                    x0 + (carry * 1e-9).astype(x0.dtype), q, s_t, layer, T, bo, bk
                )
                return jnp.sum(y).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        jax.device_get(run(x, q, s_t))
        compile_total += time.perf_counter() - t0
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.device_get(run(x, q, s_t))
            best = min(best, time.perf_counter() - t0)
        walls[iters] = best * 1000

    per_call_ms = max(1e-6, (walls[hi] - walls[lo]) / (hi - lo))
    weight_bytes = out_f * in_f + out_f * in_f // 32 * 2
    gbps = weight_bytes / (per_call_ms / 1000) / 1e9
    return per_call_ms, gbps, compile_total, walls


def main():
    # 1.7B projection shapes: (name, out, in)
    shapes = [("gateup", 12288, 2048)]
    if "--all-shapes" in sys.argv:
        shapes += [("qkv", 4096, 2048), ("o", 2048, 2048), ("down", 2048, 6144)]

    configs = [
        (2048, 512),  # shipped
        (2048, 1024),
        (4096, 512),
        (1024, 1024),
        (4096, 1024),
    ]
    if "--contig" in sys.argv:
        # bk=2048 makes every q-block row read a contiguous 2 KB burst from
        # the [L, O, K] stack (bk=512 reads 512 B bursts at stride K);
        # round-2 found bo=2048,bk=2048 fails compile (VMEM) — halve bo.
        configs = [
            (2048, 512),  # shipped baseline for this session
            (1024, 2048),
            (2048, 2048),
            (6144, 1024),
            (512, 2048),
        ]

    if "--diff" in sys.argv:
        # Differential-slope per-site A/B (RTT cancels exactly): the shapes
        # the single-point --ab mode could not resolve (qkv/o) plus the two
        # contested ones (down regressed; gateup/logits sanity anchors).
        # --model06 swaps in the 0.6B decode shapes, where the full-row
        # contiguous read is bk=1024 (D=1024), untested by the 1.7B sweeps.
        from light_whisper_tpu.ops.q8_matmul import _pick

        log(f"device {jax.devices()[0]} [--diff: slope between trip counts]")
        if "--model06" in sys.argv:
            diff_shapes = [
                ("qkv", 4096, 1024, 28, (512, 2048)),
                ("o", 1024, 2048, 28, (512, 2048)),
                ("down", 1024, 3072, 28, (512, 2048)),
                ("gateup", 6144, 1024, 28, (512, 2048)),
                ("logits", 152576, 1024, 1, (64, 256)),
            ]
            contig_bk = 1024
        else:
            diff_shapes = [
                # (name, out, in, layers, (lo, hi) trip counts)
                ("qkv", 4096, 2048, 28, (512, 2048)),
                ("o", 2048, 2048, 28, (512, 2048)),
                ("down", 2048, 6144, 28, (512, 2048)),
                ("gateup", 12288, 2048, 28, (256, 1024)),
                ("logits", 152576, 2048, 1, (64, 256)),
            ]
            contig_bk = 2048
        for name, out_f, in_f, nl, pair in diff_shapes:
            for tag, (bo, bk) in (
                ("default", (_pick(out_f, 2048), 512)),
                ("contig", (_pick(out_f, 2048 if contig_bk == 1024 else 1024), contig_bk)),
            ):
                try:
                    ms, gbps, compile_s, walls = bench_config_diff(
                        out_f, in_f, bo, bk, pair, layers=nl
                    )
                    log(
                        f"{name} [{out_f}x{in_f}]x{nl} {tag} bo={bo} bk={bk}: "
                        f"{ms * 1000:.1f} us/call → {gbps:.0f} GB/s "
                        f"(walls {walls} ms, compile {compile_s:.0f}s)"
                    )
                except Exception as exc:
                    log(f"{name} {tag} bo={bo} bk={bk}: FAILED {type(exc).__name__}: {exc}")
        return

    if "--ab" in sys.argv:
        # Per-site A/B: shipped tiling vs the LWT_BK2048 contig tiling, for
        # every matmul site the 1.7B decode step actually runs — the four
        # stacked projections (L=28) plus the tied-embed logits (layers=1
        # approximates the unstacked kernel; same block schedule). Answers
        # why the full-program win (4.50 → 4.38 ms/step) is smaller than
        # gateup's standalone +20%: which shapes regress at bo=1024?
        from light_whisper_tpu.ops.q8_matmul import _pick

        rtt = measure_rtt()
        log(f"device {jax.devices()[0]}, relay rtt p50 {rtt:.1f} ms [--ab]")
        ab_shapes = [
            ("qkv", 4096, 2048, 28),
            ("o", 2048, 2048, 28),
            ("gateup", 12288, 2048, 28),
            ("down", 2048, 6144, 28),
            ("logits", 152576, 2048, 1),
        ]
        for name, out_f, in_f, nl in ab_shapes:
            for tag, (bo, bk) in (
                ("default", (_pick(out_f, 2048), 512)),
                ("contig", (_pick(out_f, 1024), 2048)),
            ):
                try:
                    ms, gbps, compile_s = bench_config(
                        out_f, in_f, bo, bk, rtt, layers=nl
                    )
                    log(
                        f"{name} [{out_f}x{in_f}]x{nl} {tag} bo={bo} bk={bk}: "
                        f"{ms:.3f} ms/call → {gbps:.0f} GB/s "
                        f"(compile {compile_s:.0f}s)"
                    )
                except Exception as exc:
                    log(f"{name} {tag} bo={bo} bk={bk}: FAILED {type(exc).__name__}: {exc}")
        return

    rtt = measure_rtt()
    log(f"device {jax.devices()[0]}, relay rtt p50 {rtt:.1f} ms")

    if "--read-ceiling" in sys.argv or "--contig" in sys.argv:
        # Pure-read ceiling for the same stacked buffer: XLA reduce over one
        # layer per iteration — no MXU, no scales, just HBM → this is the
        # layout's attainable bandwidth, separating kernel overhead from
        # DMA reality.
        rng = np.random.default_rng(0)
        out_f, in_f = 12288, 2048
        q = jnp.asarray(rng.integers(-127, 127, size=(L, out_f, in_f), dtype=np.int8))

        READS = 512  # one 25 MB slice ≈ 30 µs at peak; need ≳15 ms total to
        # resolve above relay RTT jitter (32 iters was pure noise)

        @jax.jit
        def read_all(q, seed):
            def body(i, acc):
                layer = jax.lax.rem(i + seed, L)
                blk = jax.lax.dynamic_index_in_dim(q, layer, keepdims=False)
                # acc feeds nothing back into the read, but the data-dependent
                # sum keeps XLA from folding iterations
                return acc + jnp.sum(blk.astype(jnp.int32)) * (i + 1)

            return jax.lax.fori_loop(0, READS, body, jnp.int32(0))

        jax.device_get(read_all(q, jnp.int32(0)))
        best = float("inf")
        for trial in range(3):
            t0 = time.perf_counter()
            jax.device_get(read_all(q, jnp.int32(trial)))
            best = min(best, time.perf_counter() - t0)
        per_call = max(0.001, (best * 1000 - rtt) / READS)
        gbps = out_f * in_f / (per_call / 1000) / 1e9
        log(f"read-ceiling [12288x2048 int8 slice]: {per_call:.3f} ms → {gbps:.0f} GB/s")
    for name, out_f, in_f in shapes:
        for bo, bk in configs:
            if out_f % bo != 0 or in_f % bk != 0:
                log(f"{name} bo={bo} bk={bk}: skipped (indivisible)")
                continue
            try:
                ms, gbps, compile_s = bench_config(out_f, in_f, bo, bk, rtt)
                log(
                    f"{name} [{out_f}x{in_f}] bo={bo} bk={bk}: "
                    f"{ms:.3f} ms/layer-call → {gbps:.0f} GB/s weights "
                    f"(compile {compile_s:.0f}s)"
                )
            except Exception as exc:
                log(f"{name} bo={bo} bk={bk}: FAILED {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
