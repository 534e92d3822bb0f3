#!/bin/bash
# Round-3 on-chip measurement campaign: run the bench A/B matrix for the
# build/recheck levers, then the scale cases, logging one line per config to
# out/campaign_r3.jsonl.  Designed to run unattended the moment the tunnel
# recovers: each config is a fresh process (the intersector knobs are read
# at trace time), a dead tunnel downgrades bench.py to its CPU liveness
# fallback, so failed/cpu lines are tagged and retried once at the end.
#
# Usage: scripts/campaign_r3.sh [out/campaign_r3.jsonl]
cd "$(dirname "$0")/.."
LOG=${1:-out/campaign_r3.jsonl}
mkdir -p "$(dirname "$LOG")"

run_cfg() {
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(env "$@" python bench.py 2> >(tail -3 >&2) | tail -1)
  echo "{\"config\": \"$name\", \"ts\": \"$(date -Is)\", \"result\": $line}" >> "$LOG"
  echo "$name -> $line" >&2
}

# 1. Shipped defaults (SAH build, full rechecks) — the headline candidate.
run_cfg sah_default                   DUMMY=1
# 2-3. Recheck forms on top of SAH.
run_cfg sah_cheap2                    TPU_PT_CHEAP_RECHECK=2
run_cfg sah_cheap1                    TPU_PT_CHEAP_RECHECK=1
# 4. Build control: isolates the SAH-vs-Morton win at equal kernel config.
run_cfg morton_control                TPU_PT_BUILD=morton
# 5. Open-field cross-round comparability (r2 scene) on the new defaults.
run_cfg field82_sah                   BENCH_SCENE=field
# 6. Ladder sanity on the tighter build (unions shrank; the optimum cap may
#    have moved down).
run_cfg sah_near_2_6                  TPU_PT_NEAR=2,6
run_cfg sah_near_8_24                 TPU_PT_NEAR=8,24
echo "campaign done: $(wc -l < "$LOG") lines in $LOG" >&2
