#!/bin/bash
# Round-3 third-wave on-chip campaign: cascade-overhead levers.  The
# post-SAH atrium body breakdown (scripts/probe_body.py, 2026-08-18) puts
# intersect at 37.0 ms/iter of the engine's ~63, and within intersect the
# pair ALU share shrank with the 2.3x tighter SAH unions — the cascade's
# FIXED costs (activity rechecks ~3 ms each, worklist glue ~2.4 ms per
# pass, 3 rounds with the 2,6 ladder) are now a comparable share.  Two
# shipped-but-never-A/B'd knobs attack exactly that overhead:
#   * TPU_PT_CHEAP_RECHECK 1/2 — replace the full slab-sweep recheck with
#     the stored-entry comparison (pure XLA, ~free; mode 2 keeps the full
#     per-ray recheck before the residual only);
#   * single-pass near ladders (TPU_PT_NEAR=4 / 8) — one near pass +
#     residual = one fewer recheck+glue round than the 2,6 default.
# Same contract as campaign_r3.sh / r3b.sh: one JSON line per config,
# fresh process per config (knobs are read at trace time), CPU-fallback
# lines tagged "on_chip": false and retried once.
#
# Usage: scripts/campaign_r3c.sh [out/campaign_r3c.jsonl]
cd "$(dirname "$0")/.."
LOG=${1:-out/campaign_r3c.jsonl}
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

# 1. Same-day baseline (defaults: NEAR=2,6, full gated rechecks, SUPER_MIN=3).
run_cfg base        BENCH_NO_FIELD=1
# 2-3. Recheck cost: hybrid (cheap between near passes, full before the
#      residual) and cheap-everywhere.
run_cfg cheap2      BENCH_NO_FIELD=1 TPU_PT_CHEAP_RECHECK=2
run_cfg cheap1      BENCH_NO_FIELD=1 TPU_PT_CHEAP_RECHECK=1
# 4-5. One fewer cascade round: single near pass + residual.
run_cfg near4       BENCH_NO_FIELD=1 TPU_PT_NEAR=4
run_cfg near8       BENCH_NO_FIELD=1 TPU_PT_NEAR=8
# 6. Combo of both overhead cuts (re-ranked against singles by the picker).
run_cfg cheap2_near4 BENCH_NO_FIELD=1 TPU_PT_CHEAP_RECHECK=2 TPU_PT_NEAR=4

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
