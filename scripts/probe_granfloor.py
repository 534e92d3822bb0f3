#!/usr/bin/env python
"""CPU proxy: t-bounded pair-ALU floors at EVERY (ray-block, tri-block)
granularity the current kernel layout could express.

The pair test keeps rays on sublanes and tris on lanes, so the finest
predication unit is one [8-ray, 128-tri] vreg — 8-ray sub-tiles at chunk
granularity — reachable with NESTED sub-tile masks (no transpose, no new
AABBs, no extra DMA).  The transposed layout (tris on sublanes) would give
[128-ray, 8-tri] units instead but needs a 10x-padded woop copy or
in-kernel relayouts.  This probe prints the t-bounded floor (pairs =
sum over blocks of |union| * block_rays * unit_tris) for ray blocks
8/16/32/64/128/512 at chunk (128-tri) granularity, plus the sub8/sub16
tri floors from probe_subchunk_proxy for side-by-side reading.  Reuses
the cached wavefront (hint order).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_PATHTRACER_PLATFORM", "cpu")

import numpy as np

from probe_subchunk_proxy import get_wavefront


def main() -> int:
    r = int(os.environ.get("PROBE_R", str(64 * 1024)))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    eps = 1e-4
    wf = get_wavefront(r, detail)
    o1, d1 = wf["o1"], wf["d1"]
    alive, t_best = wf["alive"], wf["t_best"]
    lo_c, hi_c = wf["chunk_lo"], wf["chunk_hi"]
    c = lo_c.shape[0]

    octant = (
        (d1[:, 0] > 0).astype(np.int64) * 4
        + (d1[:, 1] > 0) * 2
        + (d1[:, 2] > 0)
    )
    key = np.where(alive, octant * (c + 1) + wf["spawn_chunk"], 1 << 28)
    order = np.argsort(key, kind="stable")

    inv = 1.0 / np.where(d1 == 0.0, 1e-30, d1)
    bits = np.zeros((r, c), bool)
    for s in range(0, r, 8192):
        e = min(s + 8192, r)
        t_lo = np.full((e - s, c), -np.inf, np.float32)
        t_hi = np.full((e - s, c), np.inf, np.float32)
        for a in range(3):
            t1 = (lo_c[None, :, a] - o1[s:e, a, None]) * inv[s:e, a, None]
            t2 = (hi_c[None, :, a] - o1[s:e, a, None]) * inv[s:e, a, None]
            np.maximum(t_lo, np.minimum(t1, t2), out=t_lo)
            np.minimum(t_hi, np.maximum(t1, t2), out=t_hi)
        bits[s:e] = (
            (t_lo <= t_hi) & (t_hi >= eps) & (t_lo <= t_best[s:e, None])
        )
    sb = bits[order]
    out = {"rays": r, "chunks": c}
    for blk in (8, 16, 32, 64, 128, 256, 512):
        nb = r // blk
        un = sb[: nb * blk].reshape(nb, blk, c).any(axis=1)
        out[f"floor_chunk_r{blk}"] = int(un.sum()) * blk * 128
        # Active chunk-visits at (tile=512, chunk) level gated by this
        # sub-granularity: how many [blk,128] regions execute per 512-tile
        # chunk visit (the region-overhead driver).
        if blk < 512:
            per = r // 512
            reg = sb[: per * 512].reshape(per, 512 // blk, blk, c).any(axis=2)
            visits = sb[: per * 512].reshape(per, 512, c).any(axis=1).sum()
            out[f"regions_per_visit_r{blk}"] = round(
                float(reg.sum()) / max(float(visits), 1), 2
            )
    print(json.dumps(out), flush=True)
    os.makedirs("out", exist_ok=True)
    with open("out/probe_granfloor.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
