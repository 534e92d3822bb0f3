#!/bin/bash
# Round-5 chip queue v2: per-stage tunnel wait + CPU-fallback rejection.
# A stage's bench result only counts if its metric line says "tpu"; a cpu
# fallback (flaky tunnel mid-probe) deletes the log and retries after a
# sleep.  Appends accepted lines to out/campaign_r5.jsonl.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/chipq out

probe() {
  python - <<'EOF'
import sys
sys.path.insert(0, ".")
from tpu_pathtracer.utils.backend import tpu_alive
sys.exit(0 if tpu_alive(timeout_s=240, attempts=1) else 1)
EOF
}

run_bench() {  # name, env...
  name=$1; shift
  log=/tmp/chipq/$name.log
  for attempt in 1 2 3 4 5 6 7 8; do
    if grep -q '"metric".*depth 8, tpu' "$log" 2>/dev/null; then
      line=$(grep '"metric"' "$log" | tail -1)
      echo "{\"case\": \"$name\", \"bench\": $line}" >> out/campaign_r5.jsonl
      echo "accepted $name" >&2
      return 0
    fi
    rm -f "$log"
    until probe; do
      echo "$(date -u +%H:%M:%S) tunnel down before $name; sleep 300" >&2
      sleep 300
    done
    echo "=== $name attempt $attempt: $* ===" >&2
    env "$@" timeout 1500 python bench.py >"$log" 2>&1
  done
  echo "GIVING UP on $name after 8 attempts" >&2
  return 1
}

for stage in "$@"; do
  case $stage in
    quad)      run_bench quad BENCH_NO_FIELD=1 TPU_PT_QUAD_MAX=100000000 ;;
    rpb131k)   run_bench rpb131k BENCH_NO_FIELD=1 BENCH_RPB=131072 ;;
    sort_hint) run_bench sort_hint_8spp BENCH_NO_FIELD=1 BENCH_SPP=8 ;;
    sort_none) run_bench sort_none_8spp BENCH_NO_FIELD=1 BENCH_SPP=8 BENCH_SORT=none ;;
    base)      run_bench base_r5 BENCH_NO_FIELD=1 ;;
    *)         echo "unknown stage $stage" >&2 ;;
  esac
done
echo "queue v2 done" >&2
