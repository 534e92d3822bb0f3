#!/usr/bin/env python
"""Pick the winning intersector config from out/campaign_r3.jsonl.

Reads the campaign ledger (one JSON line per config, written by
scripts/campaign_r3.sh), keeps on-chip enclosed-atrium lines, ranks by
pixel_samples_per_s, and prints the winner's env assignments on stdout
(empty output = shipped defaults won).  Exit 1 if no usable line exists —
callers fall back to defaults.

Usage: env_overrides=$(python scripts/pick_campaign_winner.py [ledger])
"""

import json
import sys

ENV_BY_CONFIG = {
    "sah_default": "",
    "sah_cheap2": "TPU_PT_CHEAP_RECHECK=2",
    "sah_cheap1": "TPU_PT_CHEAP_RECHECK=1",
    "morton_control": "TPU_PT_BUILD=morton",
    "sah_near_2_6": "TPU_PT_NEAR=2,6",
    "sah_near_8_24": "TPU_PT_NEAR=8,24",
    # Second wave (campaign_r3b.sh; NEAR=2,6 became the code default, so
    # its winner env no longer needs to carry it).
    "gate_default": "",
    "gate_off": "TPU_PT_GATE_RECHECK=0",
    "super3": "TPU_PT_SUPER_MIN=3",
    "near_1_3": "TPU_PT_NEAR=1,3",
    "near_1_2_6": "TPU_PT_NEAR=1,2,6",
    "rpb128k": "BENCH_RPB=131072",
    "rpb256k": "BENCH_RPB=262144",
    "combo_128k_super3": "BENCH_RPB=131072 TPU_PT_SUPER_MIN=3",
    # Third wave (campaign_r3c.sh; SUPER_MIN=3 became the code default).
    "base": "",
    "cheap2": "TPU_PT_CHEAP_RECHECK=2",
    "cheap1": "TPU_PT_CHEAP_RECHECK=1",
    "near4": "TPU_PT_NEAR=4",
    "near8": "TPU_PT_NEAR=8",
    "cheap2_near4": "TPU_PT_CHEAP_RECHECK=2 TPU_PT_NEAR=4",
}


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "out/campaign_r3.jsonl"
    best = None
    try:
        lines = open(path).read().splitlines()
    except OSError:
        print(f"no ledger at {path}", file=sys.stderr)
        return 1
    for raw in lines:
        try:
            row = json.loads(raw)
        except json.JSONDecodeError:
            continue
        name = row.get("config", "").removesuffix("_retry")
        res = row.get("result", {})
        sps = res.get("pixel_samples_per_s")
        if (
            not row.get("on_chip")
            or name not in ENV_BY_CONFIG
            or "enclosed-atrium" not in res.get("metric", "")
            or not sps
        ):
            continue
        if best is None or sps > best[1]:
            best = (name, sps)
    if best is None:
        print("no on-chip atrium line in ledger", file=sys.stderr)
        return 1
    print(
        f"winner: {best[0]} at {best[1]:.0f} samples/s", file=sys.stderr
    )
    print(ENV_BY_CONFIG[best[0]])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
