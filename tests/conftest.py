"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware is not required for the suite; multi-chip sharding paths are
exercised on a host-platform mesh, the pattern the driver also uses for
``__graft_entry__.dryrun_multichip``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU tunnel)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize registers the TPU plugin and forces
# jax_platforms="axon,cpu" via jax.config, which wins over the env var —
# override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
