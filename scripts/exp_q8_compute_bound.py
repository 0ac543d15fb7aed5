#!/usr/bin/env python3
"""Is the stacked Q8 kernel DMA-bound or VPU-bound? (decode residual probe)

Round-4's device profiler attributed the 4.19 vs ~3.2 ms/step decode
residual to "50-60% HBM efficiency uniformly inside the Pallas kernels" —
but that number is derived as weight-bytes / kernel-busy-time, which
CANNOT distinguish slow DMA from the VPU dequant work hiding the DMA:

  per 2 MB weight block (gateup contig tiling, bo=1024 bk=2048):
    DMA at 819 GB/s ............ ~2.4 us
    int8->bf16 cast (2M elems) . ~1-2 us   (VPU)
    scale multiply (2M elems) .. ~1-2 us   (VPU)
    expand matmul (134M MAC) ... ~1.4 us   (MXU)
    main matmul (16.8M MAC) .... ~0.2 us   (MXU)

If the VPU terms dominate, the kernel is compute-bound and every tiling
A/B would sit in the same "efficiency" band — exactly what six A/Bs
measured. This script isolates the terms with three kernel variants over
the SAME block schedule and the differential-slope methodology (RTT
cancels):

  full    — the shipped dequant contraction (baseline)
  noscale — cast + main matmul only (drops expand matmul + scale mult)
  dma     — touch 8 sublanes of the fetched block (pipeline DMA ceiling)

Run on the axon TPU (AFTER any concurrent bench):
  python scripts/exp_q8_compute_bound.py [--default-tiling]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from light_whisper_tpu.formats.gguf import Q8_0_BLOCK  # noqa: E402

L = 28
T = 8


def log(msg):
    print(f"[q8probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


# --- kernel variants over the stacked layout --------------------------------

def _body_full(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    s = st_ref[0].T
    s_full = jax.lax.dot_general(
        s, expand_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    w = q.astype(jnp.bfloat16) * s_full
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _body_noscale(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[0].astype(jnp.bfloat16)  # cast only: no expand, no scale mult
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _body_subexpand(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    """Bit-exact variant: build s_full in 512-lane sub-tiles.

    The expand matrix has exactly one nonzero per column, so each s_full
    element is a pure copy of s[o, b] — sub-tiling the expand matmul
    changes NO value (no accumulation happens), only its MAC count:
    bo*nb*bk -> bo*(nb_sub)*bk with nb_sub = 512/32, i.e. 4x fewer at
    bk=2048 (134M -> 33.5M MACs vs the main contraction's 16.8M).
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    s = st_ref[0].T  # [bo, nb]
    bk = q.shape[1]
    sub = 512
    nb_sub = sub // Q8_0_BLOCK
    parts = []
    for j0 in range(0, bk, sub):
        b0 = j0 // Q8_0_BLOCK
        parts.append(
            jax.lax.dot_general(
                s[:, b0 : b0 + nb_sub],
                expand_ref[:nb_sub, :sub],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )
    s_full = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    w = q.astype(jnp.bfloat16) * s_full
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _body_repeatcost(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    """COST PROBE ONLY (wrong math): s_full via pltpu.repeat's tiled
    semantics instead of the expand matmul. If this runs at the noscale
    ceiling, an exact permuted-weight-layout design is worth building."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    s = st_ref[0].T  # [bo, nb]
    s_full = pltpu.repeat(s, Q8_0_BLOCK, 1)  # [bo, bk] tiled (k % nb)
    w = q.astype(jnp.bfloat16) * s_full
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _body_permexact(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    """EXACT math over the k-permuted weight layout.

    Caller contract: within every bk block, weight column j holds original
    column (j % nb) * 32 + j // nb, and x's k-axis is permuted identically
    (a (nb, 32) -> (32, nb) transpose per block, done outside the kernel).
    Under that layout the scale of permuted column j is s[o, j % nb] — which
    is exactly ``pltpu.repeat``'s tiled semantics, so the expand matmul
    (the measured 38%-over-DMA-floor term) disappears.
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    s = st_ref[0].T  # [bo, nb]
    s_full = pltpu.repeat(s, Q8_0_BLOCK, 1)  # [bo, bk]: s[o, j % nb] — exact here
    w = q.astype(jnp.bfloat16) * s_full
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def permute_weights_k(q_np, block_k):
    """Host-side k-permute: per bk block, new column a*nb+b <- old b*32+a."""
    nb = block_k // Q8_0_BLOCK
    L_, out_f, in_f = q_np.shape
    K = in_f // block_k
    return (
        q_np.reshape(L_, out_f, K, nb, Q8_0_BLOCK)
        .swapaxes(-1, -2)
        .reshape(L_, out_f, in_f)
    )


def permute_x_k(x, block_k):
    """The matching activation permute (traced, XLA): per bk block, a
    (nb, 32) -> (32, nb) transpose of the k-axis."""
    nb = block_k // Q8_0_BLOCK
    T_, in_f = x.shape
    K = in_f // block_k
    return (
        x.reshape(T_, K, nb, Q8_0_BLOCK)
        .transpose(0, 1, 3, 2)
        .reshape(T_, in_f)
    )


def _body_dma(idx_ref, x_ref, q_ref, st_ref, expand_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Touch only T sublanes of the fetched block: the BlockSpec still DMAs
    # the whole (1, bo, bk) block, so this is the pipeline's DMA ceiling.
    m = min(acc_ref.shape[1], q_ref.shape[2])
    acc_ref[:, :m] += q_ref[0][:T, :m].astype(jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant", "block_o", "block_k"))
def _run_variant(x, q, s_t, layer, variant: str, block_o: int, block_k: int):
    _, out_features, in_features = q.shape
    nb = block_k // Q8_0_BLOCK
    expand = jnp.repeat(jnp.eye(nb, dtype=jnp.bfloat16), Q8_0_BLOCK, axis=1)
    idx = jnp.reshape(layer.astype(jnp.int32), (1,))
    body = {"full": _body_full, "noscale": _body_noscale, "dma": _body_dma,
            "subexpand": _body_subexpand, "repeatcost": _body_repeatcost,
            "permexact": _body_permexact}[variant]
    if variant == "permexact":
        x = permute_x_k(x, block_k)  # honest: the permute is part of the call

    grid = (T // T, out_features // block_o, in_features // block_k)
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((T, out_features), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, block_k), lambda t, o, k, idx: (t, k)),
                pl.BlockSpec((1, block_o, block_k), lambda t, o, k, idx: (idx[0], o, k)),
                pl.BlockSpec(
                    (1, block_k // Q8_0_BLOCK, block_o),
                    lambda t, o, k, idx: (idx[0], k, o),
                ),
                pl.BlockSpec((nb, block_k), lambda t, o, k, idx: (0, 0)),
            ],
            out_specs=pl.BlockSpec((T, block_o), lambda t, o, k, idx: (t, o)),
            scratch_shapes=[pltpu.VMEM((T, block_o), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(idx, x.astype(jnp.bfloat16), q, s_t, expand)


def bench_variant(variant, out_f, in_f, bo, bk, iters_pair=(256, 1024), trials=5):
    rng = np.random.default_rng(0)
    q_np = rng.integers(-127, 127, size=(L, out_f, in_f), dtype=np.int8)
    if variant == "permexact":
        q_np = permute_weights_k(q_np, bk)
    q = jnp.asarray(q_np)
    s_t = jnp.asarray(
        (rng.standard_normal((L, in_f // 32, out_f)) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((T, in_f)).astype(np.float32)).astype(jnp.bfloat16)

    lo, hi = iters_pair
    walls = {}
    for iters in (lo, hi):

        @jax.jit
        def run(x0, q, s_t, iters=iters):
            def body(i, carry):
                layer = jax.lax.rem(i, L)
                y = _run_variant(
                    x0 + (carry * 1e-9).astype(x0.dtype), q, s_t, layer, variant, bo, bk
                )
                return jnp.sum(y).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        jax.device_get(run(x, q, s_t))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.device_get(run(x, q, s_t))
            best = min(best, time.perf_counter() - t0)
        walls[iters] = best * 1000

    per_call_ms = max(1e-6, (walls[hi] - walls[lo]) / (hi - lo))
    weight_bytes = out_f * in_f + out_f * in_f // 32 * 2
    gbps = weight_bytes / (per_call_ms / 1000) / 1e9
    return per_call_ms, gbps, walls, compile_s


def check_permexact(out_f, in_f, bo, bk):
    """Numeric check: permexact(q_perm, x) vs full(q, x) on one layer."""
    rng = np.random.default_rng(7)
    q_np = rng.integers(-127, 127, size=(2, out_f, in_f), dtype=np.int8)
    s_t = jnp.asarray(
        (rng.standard_normal((2, in_f // 32, out_f)) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((T, in_f)).astype(np.float32)).astype(jnp.bfloat16)
    layer = jnp.int32(1)
    global L
    L_saved = L
    L = 2
    try:
        y_ref = np.asarray(_run_variant(x, jnp.asarray(q_np), s_t, layer, "full", bo, bk))
        q_perm = jnp.asarray(permute_weights_k(q_np, bk))
        y_new = np.asarray(_run_variant(x, q_perm, s_t, layer, "permexact", bo, bk))
    finally:
        L = L_saved
    denom = np.maximum(np.abs(y_ref), 1e-6)
    max_rel = float(np.max(np.abs(y_new - y_ref) / denom))
    bitwise = bool(np.array_equal(y_new, y_ref))
    log(f"permexact check: bitwise={bitwise} max_rel={max_rel:.2e}")
    return max_rel


def bench_chain(variant, iters_pair=(64, 256), trials=5):
    """The 4-projection chain at 1.7B decode shapes, all streams as
    ``variant`` kernels. With variant="dma" (touch-only bodies) this is the
    chain's pure DMA ceiling: if it matches the shipped chain's ~3.3
    ms/step, the decode matmul chain is bound by sustained HBM throughput
    across alternating streams, not by anything inside the kernels."""
    shapes = {  # name: (out, in, bo, bk) — shipped tiling policy
        "qkv": (4096, 2048, 2048, 512),
        "o": (2048, 2048, 2048, 512),
        "gateup": (12288, 2048, 1024, 2048),
        "down": (2048, 6144, 2048, 512),
    }
    rng = np.random.default_rng(0)
    bufs = {}
    for name, (out_f, in_f, bo, bk) in shapes.items():
        q = jnp.asarray(
            rng.integers(-127, 127, size=(L, out_f, in_f), dtype=np.int8)
        )
        s_t = jnp.asarray(
            (rng.standard_normal((L, in_f // 32, out_f)) * 0.01).astype(np.float32)
        ).astype(jnp.bfloat16)
        bufs[name] = (q, s_t, bo, bk)

    # Seed each Mosaic payload standalone first — the full chain program
    # otherwise crosses the relay's per-request compile wall (the fused-
    # decode lesson from round 3, exp_fused_compile.py).
    for name, (q, s_t, bo, bk) in bufs.items():
        x_seed = jnp.zeros((T, q.shape[2]), jnp.bfloat16)
        t0 = time.perf_counter()
        jax.device_get(_run_variant(x_seed, q, s_t, jnp.int32(0), variant, bo, bk))
        log(f"  seeded {variant}/{name} in {time.perf_counter() - t0:.0f}s")

    lo, hi = iters_pair
    walls = {}
    for iters in (lo, hi):

        @jax.jit
        def run(seed, iters=iters):
            def layer(idx, x):
                def mm(name, h):
                    q, s_t, bo, bk = bufs[name]
                    y = _run_variant(h, q, s_t, idx, variant, bo, bk)
                    return y[:, : h.shape[1]].astype(jnp.bfloat16)

                x = mm("qkv", x)
                x = mm("o", x)
                x = mm("gateup", x)
                xf = jnp.pad(x, ((0, 0), (0, 6144 - x.shape[1])))
                y = mm("down", xf)
                return y[:, :2048]

            def step(i, x):
                return jax.lax.fori_loop(
                    0, L, lambda j, h: layer(j, h), x
                ) * jnp.bfloat16(1e-6) + seed

            x0 = jnp.zeros((T, 2048), jnp.bfloat16) + seed
            return jnp.sum(jax.lax.fori_loop(0, iters, step, x0))

        seed = jnp.bfloat16(0.0)
        t0 = time.perf_counter()
        jax.device_get(run(seed))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.device_get(run(seed))
            best = min(best, time.perf_counter() - t0)
        walls[iters] = best * 1000

    per_step_ms = (walls[hi] - walls[lo]) / (hi - lo)
    mb = sum(
        (o * i + o * i // 32 * 2) for o, i, _, _ in shapes.values()
    ) * L / 1e6
    gbps = mb * 1e6 / (per_step_ms / 1000) / 1e9
    log(
        f"chain[{variant}]: {per_step_ms:6.3f} ms/step → {gbps:4.0f} GB/s "
        f"sustained ({mb:.0f} MB/step, walls {walls}, compile {compile_s:.0f}s)"
    )


def main():
    if "--chain" in sys.argv:
        log(f"device {jax.devices()[0]} 4-projection chain, L={L} T={T}")
        for variant in ("dma", "permexact", "full"):
            try:
                bench_chain(variant)
            except Exception as exc:
                log(f"chain {variant}: FAILED {type(exc).__name__}: {str(exc)[:160]}")
        return
    out_f, in_f = 12288, 2048  # gateup: the largest per-layer stream
    if "--default-tiling" in sys.argv:
        bo, bk = 2048, 512
    else:
        bo, bk = 1024, 2048  # shipped contig policy for this shape
    log(f"device {jax.devices()[0]} gateup [{out_f}x{in_f}] bo={bo} bk={bk}")
    check_permexact(out_f, in_f, bo, bk)
    for variant in ("permexact", "full"):
        try:
            ms, gbps, walls, compile_s = bench_variant(variant, out_f, in_f, bo, bk)
            log(
                f"{variant:8s}: {ms * 1000:7.1f} us/call → {gbps:4.0f} GB/s "
                f"(walls {walls}, compile {compile_s:.0f}s)"
            )
        except Exception as exc:
            log(f"{variant}: FAILED {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
