#!/usr/bin/env python
"""Join a perfetto device trace with compiled-HLO metadata: per-source-line ms.

trace_ops.py ranks ops by name; this joins each op's total device time with
its HLO ``metadata={op_name=..., source_file=..., source_line=...}`` so the
ledger reads in *source* terms (pathtracer.py:171 = shade row gather, ...).

Usage: TRACE_OUT=/tmp/pt_trace_r5 HLO=/tmp/render_hlo.txt python
scripts/trace_attrib.py [iters]
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
    hlo_path = os.environ.get("HLO", "/tmp/render_hlo.txt")
    iters = float(sys.argv[1]) if len(sys.argv) > 1 else 22.0

    # op name -> (source_file:line, op_name label)
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\")?(?:.*?source_line=(\d+))?"
    )
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                nm, op_name, sf, sl = m.groups()
                src = f"{os.path.basename(sf)}:{sl}" if sf else "?"
                meta[nm] = (src, op_name)

    paths = glob.glob(os.path.join(log_dir, "**", "*.json.gz"), recursive=True)
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
    tot = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        nm = e.get("name", "?")
        if nm.startswith("jit_") or nm.startswith("while"):
            continue
        tot[nm] += float(e.get("dur", 0.0))

    by_src = collections.Counter()
    by_srcop = collections.Counter()
    unknown = 0.0
    for nm, us in tot.items():
        if nm in meta:
            src, op_name = meta[nm]
            by_src[src] += us
            # collapse op_name to its last two path segments
            tail = "/".join(op_name.split("/")[-2:])
            by_srcop[f"{src} {tail}"] += us
        else:
            unknown += us
    total = sum(tot.values())
    print(json.dumps({"total_ms": round(total / 1e3, 2),
                      "unknown_ms": round(unknown / 1e3, 2),
                      "iters": iters}))
    print("--- by source line ---")
    for src, us in by_src.most_common(40):
        print(json.dumps({"src": src, "ms_per_iter": round(us / 1e3 / iters, 3),
                          "pct": round(100 * us / total, 2)}))
    print("--- by source line + op ---")
    for k, us in by_srcop.most_common(50):
        print(json.dumps({"src_op": k[:130],
                          "ms_per_iter": round(us / 1e3 / iters, 3),
                          "pct": round(100 * us / total, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
