#!/bin/bash
# Round-3 on-chip measurement campaign: run the bench A/B matrix for the
# build/recheck levers, then the scale cases, logging one line per config to
# out/campaign_r3.jsonl.  Designed to run unattended the moment the tunnel
# recovers: each config is a fresh process (the intersector knobs are read
# at trace time).  A dead tunnel downgrades bench.py to its CPU liveness
# fallback — those lines (and outright failures) are tagged "on_chip": false
# and the config is retried once after the matrix completes.
#
# Usage: scripts/campaign_r3.sh [out/campaign_r3.jsonl]
cd "$(dirname "$0")/.."
LOG=${1:-out/campaign_r3.jsonl}
mkdir -p "$(dirname "$LOG")"
RETRY_LIST=()

run_cfg() {
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" >&2
  local line on_chip
  line=$(env "$@" python bench.py 2> >(tail -3 >&2) | tail -1)
  case "$line" in
    {*\"metric\"*cpu*|{*FAILED*|"") on_chip=false ;;
    {*) on_chip=true ;;
    *) line='{"metric": "no output"}'; on_chip=false ;;
  esac
  echo "{\"config\": \"$name\", \"ts\": \"$(date -Is)\", \"on_chip\": $on_chip, \"result\": $line}" >> "$LOG"
  echo "$name -> on_chip=$on_chip $line" >&2
  if [ "$on_chip" = false ]; then
    RETRY_LIST+=("$name $*")
  fi
}

# 1. Shipped defaults (SAH build, full rechecks) — the headline candidate.
run_cfg sah_default                   DUMMY=1
# 2-3. Recheck forms on top of SAH.
run_cfg sah_cheap2                    BENCH_NO_FIELD=1 TPU_PT_CHEAP_RECHECK=2
run_cfg sah_cheap1                    BENCH_NO_FIELD=1 TPU_PT_CHEAP_RECHECK=1
# 4. Build control: isolates the SAH-vs-Morton win at equal kernel config.
run_cfg morton_control                BENCH_NO_FIELD=1 TPU_PT_BUILD=morton
# 5. Open-field cross-round comparability (r2 scene) on the new defaults.
run_cfg field82_sah                   BENCH_SCENE=field
# 6. Ladder sanity on the tighter build (unions shrank; the optimum cap may
#    have moved down).
run_cfg sah_near_2_6                  BENCH_NO_FIELD=1 TPU_PT_NEAR=2,6
run_cfg sah_near_8_24                 BENCH_NO_FIELD=1 TPU_PT_NEAR=8,24

# One retry pass for configs that fell back to CPU or failed outright.
if [ ${#RETRY_LIST[@]} -gt 0 ]; then
  echo "retrying ${#RETRY_LIST[@]} non-on-chip config(s)" >&2
  PENDING=("${RETRY_LIST[@]}")
  RETRY_LIST=()
  for entry in "${PENDING[@]}"; do
    name=${entry%% *}
    rest=${entry#* }
    [ "$rest" = "$entry" ] && rest=""
    # shellcheck disable=SC2086 — word-split the env assignments
    run_cfg "${name}_retry" $rest
  done
fi
echo "campaign done: $(wc -l < "$LOG") lines in $LOG" >&2
