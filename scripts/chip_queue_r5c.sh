#!/bin/bash
# Round-5 chip queue v3: JSON-level accept.  v2's grep-level accept could
# match the "depth 8, tpu" text inside a CPU-fallback line's embedded
# last_on_chip_result and record a bogus row (caught live: glue_r5).
# Stages: name[:ENV=V[,ENV=V...]] pairs, e.g.  base  pp2:TPU_PT_PACKED_PERMUTE=2
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

accept() {  # log file -> 0 if the LAST metric line is a real on-chip result
  python - "$1" <<'EOF'
import json, sys
last = None
for line in open(sys.argv[1], errors="replace"):
    line = line.strip()
    if line.startswith("{") and '"metric"' in line:
        try:
            last = json.loads(line)
        except json.JSONDecodeError:
            pass
sys.exit(0 if last and "depth 8, tpu" in last.get("metric", "") else 1)
EOF
}

for stage in "$@"; do
  name=${stage%%:*}
  envs=${stage#*:}; [ "$envs" = "$stage" ] && envs=""
  for attempt in 1 2 3 4 5 6 7 8; do
    if accept /tmp/chipq/$name.log 2>/dev/null; then
      line=$(grep '"metric"' /tmp/chipq/$name.log | tail -1)
      echo "{\"case\": \"$name\", \"bench\": $line}" >> out/campaign_r5.jsonl
      echo "accepted $name" >&2
      break
    fi
    rm -f /tmp/chipq/$name.log
    until probe; do
      echo "$(date -u +%H:%M) tunnel down before $name; sleep 300" >&2
      sleep 300
    done
    echo "=== $name attempt $attempt [$envs] ===" >&2
    env $envs BENCH_NO_FIELD=1 timeout 1500 python bench.py \
      >/tmp/chipq/$name.log 2>&1
  done
done
echo "queue v3 done" >&2
