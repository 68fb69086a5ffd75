#!/bin/bash
# Round-4 chip measurement queue: run the moment the TPU tunnel is back.
#   bash tools/chip_queue.sh [logdir]
# Each step is independently timed out and logged; a failing step never
# blocks the rest. Review logs, then fold numbers into docs/bench.
set -u
LOG=${1:-/tmp/chipq}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}

run() { # run <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name (timeout ${to}s) $(date +%H:%M:%S) ==="
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:"
  tail -5 "$LOG/$name.log"
}

# 0) sanity: chip reachable (fast fail if the tunnel dropped again)
run probe       180  python -c "import jax, jax.numpy as jnp; print(jax.devices()); print((jnp.ones(8)+1).sum())"
grep -q "TPU" "$LOG/probe.log" || { echo "chip unreachable; aborting"; exit 1; }

# 1) all 9 verify flows (incl. the new exact+tuned pallas gates)
run drive       2400 python tools/drive_tpu.py

# 2) work-elimination sweep (quick mode)
run tune        5400 python tools/tune_megakernel.py --quick

# 3) official bench (self-tuning; target >= 7 G rays/s)
run bench       3600 python bench.py

# 4) first-light / re-dispatch overheads (default zero-config caches)
run jit_cold    1200 python tools/jit_overhead.py
run jit_warm    1200 python tools/jit_overhead.py   # warm-cache second process

# 5) lazy-native accuracy rows for docs/math.md (+ f16/bf16 poly rows)
run acc_lazy    2400 python tools/accuracy_table.py --lazy-native
run acc_f16     1800 python tools/accuracy_table.py --f16

# 6) vcall dispatch strategy crossover for docs/structs.md
run vcall       2400 python tools/bench_vcall.py

echo "=== queue done $(date +%H:%M:%S); logs in $LOG ==="
