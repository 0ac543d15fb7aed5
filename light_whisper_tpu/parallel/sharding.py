"""Partition specs for Qwen3-ASR parameter trees (GSPMD tensor parallelism).

Layout: attention q/k/v and FFN gate/up shard their *output* features over
the ``tp`` axis; attention output and FFN down shard their *input* features
— the classic Megatron split that needs exactly one all-reduce per block,
which XLA inserts automatically from these annotations and rides ICI.

Orientation reminders (see ``ops.linear`` / ``loader``): dense weights are
``[in, out]``; Q8_0 weights are ``[out, in]`` with scales ``[out, in/32]``;
stacked layer leaves carry a leading layer axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from light_whisper_tpu.parallel.mesh import MODEL_AXIS

# Leaf-name → (dense spec, q8 spec) for projections, keyed by whether the
# layer shards out-features or in-features.
_OUT_SHARDED = {"q", "k", "v", "qkv", "gate", "up", "gateup", "fc1"}
_IN_SHARDED = {"o", "down", "fc2"}


def _spec_for_linear(name: str, key: str, stacked: bool) -> P:
    lead = (None,) if stacked else ()
    if name in _OUT_SHARDED:
        if key == "w":  # [in, out]
            return P(*lead, None, MODEL_AXIS)
        if key in ("q", "s"):  # [out, in(/32)]
            return P(*lead, MODEL_AXIS, None)
        if key == "b":  # [out]
            return P(*lead, MODEL_AXIS)
    if name in _IN_SHARDED:
        if key == "w":  # [in, out]
            return P(*lead, MODEL_AXIS, None)
        if key in ("q", "s"):  # [out, in(/32)]
            return P(*lead, None, MODEL_AXIS)
        if key == "b":
            return P(*lead, None)
    return P()


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """Build a PartitionSpec tree matching a decoder/encoder param tree."""

    def walk(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        stacked = "layers" in names
        # nearest enclosing linear name, if any
        for name in reversed(names):
            if name in _OUT_SHARDED or name in _IN_SHARDED:
                return _spec_for_linear(name, names[-1], stacked)
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a parameter tree on the mesh according to :func:`param_specs`."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def named(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
