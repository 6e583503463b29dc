#!/usr/bin/env bash
# Relay-return checklist (ROUND_NOTES.md): runs the full on-device pass
# SEQUENTIALLY (never two TPU jobs at once — relay contention makes
# compiles look wedged) and logs everything under benchmarks/logs/.
#
# Usage:  bash benchmarks/relay_return.sh [--skip-tests]
# Each stage is timeboxed; a failed stage logs and continues so one
# wedge cannot eat the whole pass.

set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
LOG=benchmarks/logs
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S), timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:"; tail -5 "$LOG/$name.log"
}

# 0. Probe (fast fail if the relay is still down).
if ! timeout 120 python -c "import jax, jax.numpy as jnp; \
    assert jax.devices()[0].platform != 'cpu'; \
    jnp.ones((2,2)).sum().block_until_ready(); print('relay up')"; then
  echo "relay still down; aborting checklist"; exit 1
fi

# 1. Full bench FIRST: if the relay window closes again, the headline
#    numbers and the last-good record are already captured.
run bench 3600 python bench.py

if [ "${1:-}" != "--skip-tests" ]; then
  # 2. On-device parity lane (solver/kernel code changed this round).
  run test-tpu 1500 make test-tpu
fi

# 2. Moments vs J-form assembly at N=5000 (flip _analytic_mode if moments
#    wins; see ROUND_NOTES checklist item 2).
run attrib-large-n 2400 python benchmarks/attrib_large_n.py

# 3. Staged vs unstaged fused sweep (tune STAGED_FUSED_MIN_N).
run staged-fused 1800 python benchmarks/staged_fused_bench.py
run staged-fused-host 1800 python benchmarks/staged_fused_bench.py --host-loop

# 4. Band-solver backend sweep at N=20000 (verdict r3 #7): superblock
#    size x {scan, cr}.
run superblock-20000 3000 python benchmarks/superblock_sweep.py --nodes 20000

# 5. Auto-LC end-to-end at GDC scale.
run auto-lc 1800 python benchmarks/auto_lc_bench.py

# 5b. CG preconditioner A/B (the very-large-N many-closure fallback).
run cg-precond 2400 python benchmarks/cg_band_precond_bench.py --nodes 4000

echo "=== checklist complete $(date +%H:%M:%S); logs in $LOG/ ==="
