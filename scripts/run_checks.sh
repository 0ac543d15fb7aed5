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

echo "== multi-chip dry run (bare invocation, driver conditions) =="
# No env provisioning on purpose: dryrun_multichip must self-provision the
# virtual CPU mesh exactly as when the driver calls it (MULTICHIP check).
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "All checks passed."
