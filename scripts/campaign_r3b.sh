#!/bin/bash
# Round-3 second-wave on-chip campaign: the levers landed after the first
# campaign (out/campaign_r3.jsonl picked TPU_PT_NEAR=2,6, now the default):
#   * live-block-gated rechecks (TPU_PT_GATE_RECHECK, default on) — skip
#     recheck grid steps whose column block has no active-untested group;
#   * super-block threshold (TPU_PT_SUPER_MIN) — 3 engages the coarse gate
#     at atrium scale (4 column blocks);
#   * deeper/shallower near ladders around the first campaign's winner;
#   * wavefront width (BENCH_RPB) — larger batches amortize fixed costs
#     and tighten 64-ray sub-tile unions (2x rays in the same sorted order
#     halve each sub-tile's spatial extent).
# Same contract as campaign_r3.sh: one JSON line per config, fresh process
# per config (knobs are read at trace time), CPU-fallback lines tagged
# "on_chip": false and retried once.
#
# Usage: scripts/campaign_r3b.sh [out/campaign_r3b.jsonl]
cd "$(dirname "$0")/.."
LOG=${1:-out/campaign_r3b.jsonl}
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

# 1. New defaults (NEAR=2,6 baked in, gated rechecks on).
run_cfg gate_default         BENCH_NO_FIELD=1
# 2. Gate isolation: rechecks ungated (first-campaign behavior + NEAR=2,6).
run_cfg gate_off             BENCH_NO_FIELD=1 TPU_PT_GATE_RECHECK=0
# 3. Super-block gate engaged at atrium scale (4 column blocks).
run_cfg super3               BENCH_NO_FIELD=1 TPU_PT_SUPER_MIN=3
# 4-5. Ladder neighborhood of the first campaign's winner.
run_cfg near_1_3             BENCH_NO_FIELD=1 TPU_PT_NEAR=1,3
run_cfg near_1_2_6           BENCH_NO_FIELD=1 TPU_PT_NEAR=1,2,6
# 6-7. Wavefront width.
run_cfg rpb128k              BENCH_NO_FIELD=1 BENCH_RPB=131072
run_cfg rpb256k              BENCH_NO_FIELD=1 BENCH_RPB=262144
# 8. All-in combo (re-ranked against the singles by the picker).
run_cfg combo_128k_super3    BENCH_NO_FIELD=1 BENCH_RPB=131072 TPU_PT_SUPER_MIN=3

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
