#!/usr/bin/env python
"""Scan compiled-HLO text for single-lane-tiled elementwise fusions.

[N, 1] (and [N, k] for small k) tensors in the row-major {1,0:T(8,128)}
layout occupy k of 128 lanes — elementwise chains anchored there run at
k/128 VPU occupancy.  The round-5 device trace priced one such divide pair
at 0.55 ms/iter.  This tool ranks every fusion whose ops touch such shapes
by the compiler's own estimated_cycles, so layout-waste fixes can be
targeted by number instead of archaeology.

Usage: HLO=/tmp/render_hlo.txt python scripts/scan_lane_waste.py [top_n]
"""

import json
import os
import re
import sys


def main() -> int:
    hlo_path = os.environ.get("HLO", "/tmp/render_hlo.txt")
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    text = open(hlo_path).read()
    lines = text.splitlines()

    # Pass 1: fusion name -> (called computation, estimated_cycles).
    fus = {}
    for m in re.finditer(
        r'%([\w.\-]+) = [^\n]*? fusion\([^\n]*?calls=%?([\w.\-]+)'
        r'[^\n]*?"estimated_cycles":"(\d+)"',
        text,
    ):
        fus[m.group(2)] = (m.group(1), int(m.group(3)))

    # Pass 2: walk each computation body, count narrow-lane {1,0} ops.
    bad = re.compile(r'\[(\d+),([1-7])\]\{1,0:T\(8,128\)')
    cur = None
    stats = {}  # comp -> (#narrow ops, sample op text)
    for line in lines:
        s = line.strip()
        m = re.match(r'^%?([\w.\-]+) \([\w.\-]*: ', s)
        if m and s.endswith('{'):
            cur = m.group(1)
        elif cur and s.startswith('}'):
            cur = None
        elif cur and ' = ' in s:
            rhs = s.split(' = ', 1)[1]
            shape = rhs.split(' ', 1)[0]
            op = rhs.split(' ', 1)[1] if ' ' in rhs else ''
            if bad.search(shape) and not op.startswith(
                ('parameter', 'constant', 'bitcast')
            ):
                n, sample = stats.get(cur, (0, ''))
                stats[cur] = (n + 1, sample or rhs[:110])

    rows = []
    for comp, (n, sample) in stats.items():
        if comp in fus:
            name, cyc = fus[comp]
            rows.append((cyc, name, comp, n, sample))
    rows.sort(reverse=True)
    for cyc, name, comp, n, sample in rows[:top_n]:
        print(json.dumps({
            "fusion": name, "est_us": round(cyc / 940.0, 1),
            "narrow_ops": n, "sample": sample,
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
