#!/usr/bin/env python
"""Analyze a perfetto device trace for inter-op idle gaps.

trace_ops.py ranks ops by self time; this tool answers the complementary
question VERDICT r4 left open — where the ~8 ms/iter of engine time that no
op owns actually goes.  For every device-track leaf event inside the main
while loop it builds the busy timeline, then reports:

  * busy vs span time per while-iteration (slack = span - busy),
  * the largest individual gaps with the ops on either side (the XLA
    schedule points that stall),
  * a histogram of gap sizes.

Env: TRACE_OUT (default /tmp/pt_trace_r5), GAP_TOP (default 30).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def main() -> int:
    log_dir = os.environ.get("TRACE_OUT", "/tmp/pt_trace_r5")
    top = int(os.environ.get("GAP_TOP", "30"))
    paths = glob.glob(os.path.join(log_dir, "**", "*.json.gz"), recursive=True)
    if not paths:
        print(f"no perfetto trace under {log_dir}", file=sys.stderr)
        return 1
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid") if e["name"] == "thread_name" else None)
            names[key] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for (pid, tid), nm in names.items()
        if tid is None and re.search(r"tpu|device|/device", nm, re.I)
    }

    # Leaf = complete events that are not the jit wrapper / while parents.
    leaves = []
    parents = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        nm = e.get("name", "?")
        ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
        if nm.startswith("jit_") or nm.startswith("while"):
            parents.append((ts, dur, nm))
            continue
        leaves.append((ts, dur, nm))
    leaves.sort()
    if not leaves:
        print("no leaf events", file=sys.stderr)
        return 1

    # Busy timeline union (leaves can nest/overlap across tids).
    busy = 0.0
    gaps = []  # (gap_us, prev_name, next_name, at_ts)
    cur_end = None
    prev_name = None
    t0, t1 = leaves[0][0], max(ts + d for ts, d, _ in leaves)
    for ts, dur, nm in leaves:
        if cur_end is None:
            cur_end = ts + dur
            prev_name = nm
            busy += dur
            continue
        if ts > cur_end:
            gaps.append((ts - cur_end, prev_name, nm, cur_end))
            busy += dur
            cur_end = ts + dur
            prev_name = nm
        else:
            new_end = max(cur_end, ts + dur)
            busy += max(0.0, new_end - cur_end)
            if ts + dur >= cur_end:
                prev_name = nm
            cur_end = new_end
    span = t1 - t0
    # Iteration count: the most common leaf call count.
    cnt = collections.Counter(nm for _, _, nm in leaves)
    iters = collections.Counter(cnt.values()).most_common(1)[0][0]

    print(json.dumps({
        "trace": path,
        "span_ms": round(span / 1e3, 2),
        "busy_ms": round(busy / 1e3, 2),
        "idle_ms": round((span - busy) / 1e3, 2),
        "idle_pct": round(100 * (span - busy) / max(span, 1e-9), 2),
        "iters_est": iters,
        "idle_ms_per_iter": round((span - busy) / 1e3 / max(iters, 1), 3),
        "n_gaps": len(gaps),
    }))

    gaps.sort(reverse=True)
    print("--- largest gaps ---")
    for g, a, b, ts in gaps[:top]:
        print(json.dumps({"gap_us": round(g, 1), "after": a[:80],
                          "before": b[:80]}))

    # Aggregate gap time by the (after -> before) edge.
    edge = collections.Counter()
    edge_n = collections.Counter()
    for g, a, b, _ in gaps:
        k = f"{re.sub(r'[.\\d]+$', '', a)} -> {re.sub(r'[.\\d]+$', '', b)}"
        edge[k] += g
        edge_n[k] += 1
    print("--- gap edges (total us) ---")
    for k, us in edge.most_common(top):
        print(json.dumps({"edge": k[:110], "us_total": round(us, 1),
                          "n": edge_n[k],
                          "us_per_iter": round(us / max(iters, 1), 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
