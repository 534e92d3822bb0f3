#!/bin/bash
# Unattended on-chip measurement pipeline for round 3.  Run when the tunnel
# recovers (the watcher invokes this): A/B campaign -> pick winner ->
# supervised headline render -> full-size sample sweep.  Every stage logs to
# out/ so progress survives the driver's session boundaries.
#
# Stages can be skipped via PIPELINE_SKIP (comma list: campaign,headline,sweep).
cd "$(dirname "$0")/.."
skip=",${PIPELINE_SKIP:-},"

if [[ "$skip" != *,campaign,* ]]; then
  echo "=== stage: campaign ($(date -Is)) ==="
  bash scripts/campaign_r3.sh out/campaign_r3.jsonl
fi

winner_env=$(python scripts/pick_campaign_winner.py out/campaign_r3.jsonl) || winner_env=""
echo "winner env: '${winner_env}'"

if [[ "$skip" != *,headline,* ]]; then
  echo "=== stage: headline ($(date -Is)) ==="
  # shellcheck disable=SC2086 — winner_env is intentionally word-split
  env $winner_env HEADLINE_SUPERVISE=1 \
    python scripts/run_headline.py 2>&1 | tail -200
fi

if [[ "$skip" != *,sweep,* ]]; then
  echo "=== stage: sweep ($(date -Is)) ==="
  # shellcheck disable=SC2086
  env $winner_env bash render-samples.sh
fi

echo "=== pipeline done ($(date -Is)) ==="
