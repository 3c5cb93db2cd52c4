#!/bin/bash
# Pending TPU validations (run when the axon tunnel is back up).
# Each step appends to /tmp/tpu_runbook.log and writes per-step artifacts
# under /tmp/tpu_runbook/. Safe to re-run; every step is under `timeout`.
set -u
cd /root/repo
mkdir -p /tmp/tpu_runbook
LOG=/tmp/tpu_runbook.log
note() { echo "=== [$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

note "0. device probe"
timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 || { note "TPU unreachable, abort"; exit 3; }

note "1. headline bench (2^25 f32) — confirm no regression vs 7.58M/0.746"
timeout 1800 python bench.py > /tmp/tpu_runbook/bench_default.log 2>&1
tail -3 /tmp/tpu_runbook/bench_default.log | tee -a "$LOG"

note "2. robustness: 2^26 f32 20 steps (old flaky InvalidArgument check)"
MEEPO_BENCH_CAP=$((1<<26)) MEEPO_BENCH_STEPS=20 timeout 2400 python bench.py \
  > /tmp/tpu_runbook/bench_2e26.log 2>&1
tail -3 /tmp/tpu_runbook/bench_2e26.log | tee -a "$LOG"

note "3. phase attribution at 2^25"
timeout 1800 python bench_phases.py > /tmp/tpu_runbook/bench_phases.log 2>&1
tail -20 /tmp/tpu_runbook/bench_phases.log | tee -a "$LOG"

note "4. stream-merge threshold experiment (MEEPO_STREAM_THRESHOLD=0)"
MEEPO_STREAM_THRESHOLD=0 timeout 1800 python bench.py \
  > /tmp/tpu_runbook/bench_stream0.log 2>&1
tail -3 /tmp/tpu_runbook/bench_stream0.log | tee -a "$LOG"

note "5. config-2 re-check: 2^27 bf16 (107M rows)"
MEEPO_BENCH_CAP=$((1<<27)) MEEPO_BENCH_DTYPE=bfloat16 timeout 3600 python bench.py \
  > /tmp/tpu_runbook/bench_cfg2.log 2>&1
tail -3 /tmp/tpu_runbook/bench_cfg2.log | tee -a "$LOG"

note "done"
