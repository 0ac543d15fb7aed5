"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

The decoder's layer stack already lives on a leading layer axis scanned by
``lax.scan`` (``models/qwen3_asr/decoder.py``). Pipeline parallelism shards
THAT axis: each device holds a contiguous block of ``L / pp`` layers, and
activations flow stage→stage over ICI via ``lax.ppermute`` while ``M``
microbatches stream through — the classic GPipe schedule with ``pp - 1``
bubble ticks on each side. The whole loop is a ``lax.scan`` inside one
``shard_map``, so it is a single compiled program and fully differentiable
(autodiff of ``ppermute`` is the reverse permute, which yields the backward
pipeline schedule for free).

The reference is a single-GPU desktop app with no model parallelism
(SURVEY.md §2.5); like ``train.py``/``encoder_sp.py`` this is TPU-native
surplus — the memory-scaling story for fine-tuning models whose layer stack
outgrows one chip's HBM. Works identically on a virtual host-platform mesh
(tests / driver dry run) and real ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from light_whisper_tpu.models.qwen3_asr import decoder as dec
from light_whisper_tpu.models.qwen3_asr.config import DecoderConfig
from light_whisper_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pp"


def make_pp_mesh(
    pp: Optional[int] = None,
    dp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Pipeline mesh over the given (default: all) devices.

    ``dp > 1`` composes data parallelism with the pipeline: a (dp, pp) grid
    where each dp row runs an independent pipeline over its batch shard and
    layer-gradient all-reduces ride the ``dp`` axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    pp = n // dp if pp is None else pp
    if dp * pp != n:
        raise ValueError(f"mesh dp{dp}xpp{pp} != {n} devices")
    if dp == 1:
        return Mesh(np.asarray(devices), (PIPE_AXIS,))
    return Mesh(np.asarray(devices).reshape(dp, pp), (DATA_AXIS, PIPE_AXIS))


def shard_layers_pp(layers: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place stacked layer leaves ([L, ...]) block-wise over ``pp``: device
    ``i`` holds layers ``[i·L/pp, (i+1)·L/pp)`` — contiguous stages."""
    def place(leaf):
        spec = P(PIPE_AXIS, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, layers)


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    layers: Dict[str, Any],
    microbatches: jax.Array,  # [M, ...] stage-0 inputs
    batch_axis: Optional[int] = None,
) -> jax.Array:
    """Run ``microbatches`` through the full layer stack, pipelined.

    ``stage_fn(local_layers, x) -> y`` applies one stage's contiguous layer
    block (leaves ``[L/pp, ...]``) to one microbatch; activations must keep
    the microbatch's shape/dtype so they can ride the ``ppermute`` ring.
    Returns the last stage's outputs ``[M, ...]``, replicated on every
    device. Schedule: ``M + pp - 1`` ticks; on tick ``t`` stage 0 ingests
    microbatch ``min(t, M-1)`` (trailing feeds are don't-care bubble work)
    and the last stage emits microbatch ``t - (pp - 1)``.

    On a (dp, pp) mesh, pass ``batch_axis``: that microbatch dimension
    shards over ``dp`` and each dp row pipelines its own batch shard
    (layers are dp-replicated; their gradient all-reduce over ``dp`` falls
    out of the shard_map transpose).
    """
    pp = mesh.shape[PIPE_AXIS]
    mb_dims: list = [None] * microbatches.ndim
    if batch_axis is not None:
        if DATA_AXIS not in mesh.axis_names:
            raise ValueError(f"batch_axis given but mesh has no '{DATA_AXIS}' axis")
        mb_dims[batch_axis] = DATA_AXIS
    mb_spec = P(*mb_dims)

    def local(layers_local, mb):
        stage = jax.lax.axis_index(PIPE_AXIS)
        M = mb.shape[0]
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(carry, t):
            x, outs = carry
            feed = mb[jnp.minimum(t, M - 1)]
            x = jnp.where(stage == 0, feed, x)
            y = stage_fn(layers_local, x)
            # The last stage's tick t output is microbatch t-(pp-1). Bubble
            # ticks (t < pp-1) clip to slot 0, which the first REAL output
            # (t = pp-1) overwrites afterwards; non-final stages' writes are
            # masked out by the psum below.
            out_idx = jnp.clip(t - (pp - 1), 0, M - 1)
            outs = jax.lax.dynamic_update_index_in_dim(outs, y, out_idx, 0)
            x = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return (x, outs), None

        x0 = jnp.zeros_like(mb[0])
        outs0 = jnp.zeros_like(mb)
        (_, outs), _ = jax.lax.scan(tick, (x0, outs0), jnp.arange(M + pp - 1))
        is_last = (stage == pp - 1).astype(outs.dtype)
        return jax.lax.psum(outs * is_last, PIPE_AXIS)

    layer_specs = jax.tree.map(
        lambda leaf: P(PIPE_AXIS, *([None] * (leaf.ndim - 1))), layers
    )
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(layer_specs, mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )(layers, microbatches)


def forward_train_pp(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    embeds_mb: jax.Array,  # [M, T, D] or [M, B, T, D] microbatched embeddings
    mesh: Mesh,
) -> jax.Array:
    """Pipeline-parallel :func:`decoder.forward_train` over microbatches.

    Numerically identical (same scanned layer body via
    :func:`decoder.make_train_layer`) to running ``forward_train`` on each
    microbatch; the layer stack is split into ``pp`` contiguous stages.
    Requires ``block_count % pp == 0``. A 4-D ``[M, B, T, D]`` input adds a
    within-microbatch batch dimension; on a (dp, pp) mesh it shards over
    ``dp`` (each dp row pipelines ``B / dp`` examples per microbatch).
    """
    pp = mesh.shape[PIPE_AXIS]
    if cfg.block_count % pp != 0:
        raise ValueError(f"block_count={cfg.block_count} not divisible by pp={pp}")
    T = embeds_mb.shape[-2]
    layer_fn = dec.make_train_layer(cfg, T)

    def run_stack(local_layers, x):
        y, _ = jax.lax.scan(layer_fn, x, local_layers)
        return y

    if embeds_mb.ndim == 4:
        stage = lambda ll, x: jax.vmap(lambda xi: run_stack(ll, xi))(x)
        batch_axis = 1 if DATA_AXIS in mesh.axis_names else None
    else:
        stage = run_stack
        batch_axis = None

    hidden = pipeline_apply(mesh, stage, params["layers"], embeds_mb, batch_axis)
    return jax.vmap(
        lambda h: dec.rms_norm(h, params["final_norm"], cfg.rms_epsilon)
    )(hidden)


def make_train_step_pp(
    cfg: DecoderConfig,
    mesh: Mesh,
    optimizer,
):
    """Pipelined LM fine-tuning step for the decoder stack.

    ``step(params, opt_state, embeds_mb, labels_mb) -> (params, opt_state,
    loss)`` — mean next-token cross-entropy over ``[M, T]`` labels
    (``IGNORE_LABEL`` slots excluded), gradients flowing backward through
    the pipeline via autodiff of the forward schedule. Stage-sharded layer
    grads stay stage-sharded (each device updates only its own layers).
    """
    import optax

    from light_whisper_tpu.parallel.train import IGNORE_LABEL

    def loss_fn(params, embeds_mb, labels_mb):
        hidden = forward_train_pp(cfg, params, embeds_mb, mesh)
        logits = jax.vmap(lambda h: dec.logits_for(cfg, params, h))(hidden)
        mask = labels_mb != IGNORE_LABEL
        safe = jnp.where(mask, labels_mb, 0)
        ll = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_ll = jnp.take_along_axis(ll, safe[..., None], axis=-1)[..., 0]
        return -jnp.sum(jnp.where(mask, token_ll, 0.0)) / jnp.maximum(
            1, jnp.sum(mask)
        )

    @jax.jit
    def step(params, opt_state, embeds_mb, labels_mb):
        loss, grads = jax.value_and_grad(loss_fn)(params, embeds_mb, labels_mb)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def place_decoder_params_pp(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Stage-shard the stacked layers; replicate everything else (embed,
    final norm, lm head — shared by the first/last stages)."""
    rep = NamedSharding(mesh, P())
    placed = {
        k: jax.tree.map(lambda a: jax.device_put(a, rep), v)
        for k, v in params.items()
        if k != "layers"
    }
    placed["layers"] = shard_layers_pp(params["layers"], mesh)
    return placed
