"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware is not required for the suite; multi-chip sharding paths are
exercised on a host-platform mesh, the pattern the driver also uses for
``__graft_entry__.dryrun_multichip``.

``LWT_TEST_REAL_TPU=1`` skips the CPU forcing so a *selected* test (e.g. the
serving soak) can be driven against the real chip:

    LWT_TEST_REAL_TPU=1 python -m pytest tests/test_soak_serving.py -q

Only use it for single files — multi-device tests assume the 8-way virtual
mesh, and a full-suite run through the compile relay would take hours.
"""

import os

if os.environ.get("LWT_TEST_REAL_TPU", "") in ("", "0"):
    os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU tunnel)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The axon sitecustomize registers the TPU plugin and forces
    # jax_platforms="axon,cpu" via jax.config, which wins over the env var —
    # override it back before any backend initializes.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
else:
    # Real-hardware mode: keep the shell's axon backend, but persist relay
    # compiles like bench.py does so repeated soaks stay cheap.
    import jax  # noqa: E402

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
