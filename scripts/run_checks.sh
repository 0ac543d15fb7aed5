#!/usr/bin/env bash
# CI-equivalent checks (the reference gates releases on the same tiers:
# compileall + unit suites per language, ci.yml:104-149).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compileall =="
python -m compileall -q light_whisper_tpu scripts bench.py __graft_entry__.py

echo "== native toolchain =="
python - <<'EOF'
from light_whisper_tpu.native import binding
print("native library:", "built" if binding.available() else "unavailable (fallbacks active)")
EOF

echo "== unit + integration tests =="
python -m pytest tests/ -q

echo "== multi-chip dry run (virtual 8-device mesh) =="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as graft
graft.dryrun_multichip(8)
EOF

echo "All checks passed."
