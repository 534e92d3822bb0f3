#!/bin/bash
# Round-5 chip work queue: runs the pending on-chip A/Bs serially as soon as
# the tunnel answers, logging one JSON line per result to out/campaign_r5.jsonl
# and raw logs under /tmp/chipq/.  Safe to re-run; each stage skips if its
# log already ends in a bench line.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chipq out

probe() {
  python - <<'EOF'
import sys
sys.path.insert(0, ".")
from tpu_pathtracer.utils.backend import tpu_alive
sys.exit(0 if tpu_alive(timeout_s=240, attempts=2) else 1)
EOF
}

until probe; do
  echo "$(date -u +%H:%M:%S) tunnel down; sleeping 300s" >&2
  sleep 300
done
echo "$(date -u +%H:%M:%S) tunnel alive; starting queue" >&2

run_bench() {  # name, env...
  name=$1; shift
  log=/tmp/chipq/$name.log
  if grep -q '"metric"' "$log" 2>/dev/null; then
    echo "skip $name (done)" >&2
  else
    echo "=== $name: $* ===" >&2
    env "$@" timeout 1500 python bench.py >"$log" 2>&1
  fi
  line=$(grep '"metric"' "$log" | tail -1)
  [ -n "$line" ] && echo "{\"case\": \"$name\", \"bench\": $line}" >> out/campaign_r5.jsonl
}

# 1. Current defaults (flat light pdf + woop_rows landed since last bench).
run_bench base_r5 BENCH_NO_FIELD=1
# 2. Quad-pool texture gather A/B.
run_bench quad BENCH_NO_FIELD=1 TPU_PT_QUAD_MAX=100000000
# 3. Wavefront width 128k.
run_bench rpb131k BENCH_NO_FIELD=1 BENCH_RPB=131072
# 4. sort_key=none coherence pricing (smaller rep: ratio is the number).
run_bench sort_hint_8spp BENCH_NO_FIELD=1 BENCH_SPP=8
run_bench sort_none_8spp BENCH_NO_FIELD=1 BENCH_SPP=8 BENCH_SORT=none
echo "queue done" >&2
