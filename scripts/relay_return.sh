#!/bin/bash
# Wait for the axon relay to come back, then run the queued hardware work:
#   1. (bo, bk) contiguity sweep + read-ceiling probe (512 in-dispatch iters)
#   2. full driver-format bench (BENCH_MODEL=1.7b)
# Logs to /tmp/relay_return.log; each stage is individually bounded.
set -u
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/relay_return.log

probe() {
  timeout 90 python -c "import jax; jax.jit(lambda x: x+1)(1.0); print('RELAY_UP')" 2>/dev/null | grep -q RELAY_UP
}

echo "$(date -u +%FT%TZ) waiting for relay" >> "$LOG"
until probe; do sleep 120; done
echo "$(date -u +%FT%TZ) relay UP — starting hardware checklist" >> "$LOG"

echo "$(date -u +%FT%TZ) stage 1: contig sweep + read ceiling" >> "$LOG"
timeout 5400 python scripts/exp_q8_block_sweep.py --contig >> "$LOG" 2>&1
echo "$(date -u +%FT%TZ) stage 1 exit: $?" >> "$LOG"

echo "$(date -u +%FT%TZ) stage 2: driver-format bench (1.7b)" >> "$LOG"
BENCH_MODEL=1.7b timeout 7200 python bench.py > /tmp/bench_r3s5.json 2>> "$LOG"
echo "$(date -u +%FT%TZ) stage 2 exit: $?" >> "$LOG"
tail -c 2000 /tmp/bench_r3s5.json >> "$LOG"
echo "$(date -u +%FT%TZ) checklist done" >> "$LOG"
