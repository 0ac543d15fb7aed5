"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware is not required for the suite; multi-chip sharding paths are
exercised on a host-platform mesh, the pattern the driver also uses for
``__graft_entry__.dryrun_multichip``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
