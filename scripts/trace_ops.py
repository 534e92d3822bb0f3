#!/usr/bin/env python
"""Capture a device trace of the bench workload and rank ops by self time.

Runs a short enclosed-atrium render (the bench scene at reduced spp) under
``jax.profiler.trace(..., create_perfetto_trace=True)`` and aggregates the
perfetto JSON by event name.  This is the tool that found the round-4
texture-pipeline win (flat corner-major gathers, commit fb8d6fa); keep it
runnable so every "unattributed ms/iter" question starts here instead of
with guesswork.

Env: TRACE_SIZE (default 256), TRACE_SPP (default 4), TRACE_TOP (default 40),
TRACE_OUT (default /tmp/pt_trace).  Prints one JSON line per op plus a
grouped summary (fusion names are collapsed by their leading op label).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(log_dir: str) -> None:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import render
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    size = int(os.environ.get("TRACE_SIZE", "256"))
    spp = int(os.environ.get("TRACE_SPP", "4"))
    config = RenderConfig(rays_per_batch=64 * 1024)
    tmp = tempfile.mkdtemp(prefix="trace_scene_")
    path = make_atrium_gltf(os.path.join(tmp, "atrium.gltf"), detail=2)
    scene = parse_gltf_scene(path, 1.0, config)
    import dataclasses

    scene = dataclasses.replace(
        scene, camera=scene.camera.with_dims(size, size)
    )

    # Warm-up OUTSIDE the trace so remote compiles don't pollute it.
    render(scene, spp, seed=7, config=config)

    with jax.profiler.trace(log_dir, create_perfetto_trace=True):
        render(scene, spp, seed=7, config=config)
    print(f"trace captured to {log_dir}", file=sys.stderr)


def analyze(log_dir: str, top: int) -> int:
    paths = glob.glob(os.path.join(log_dir, "**", "*.json.gz"), recursive=True)
    if not paths:
        print(f"no perfetto trace under {log_dir}", file=sys.stderr)
        return 1
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # Device tracks: pid/tid names containing TPU/device; fall back to every
    # complete event if the metadata is missing.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid") if e["name"] == "thread_name" else None)
            names[key] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for (pid, tid), nm in names.items()
        if tid is None and re.search(r"tpu|device|/device", nm, re.I)
    }

    total_by_name = collections.Counter()
    count_by_name = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # us
        nm = e.get("name", "?")
        total_by_name[nm] += dur
        count_by_name[nm] += 1
        total += dur

    print(json.dumps({"trace": path, "device_total_ms": round(total / 1e3, 2),
                      "n_names": len(total_by_name)}))
    for nm, us in total_by_name.most_common(top):
        print(json.dumps({
            "op": nm[:120], "ms": round(us / 1e3, 3),
            "pct": round(100 * us / max(total, 1e-9), 2),
            "calls": count_by_name[nm],
        }))

    # Grouped: collapse fusion suffixes (".NN", "fusion.1234") to families.
    fam = collections.Counter()
    for nm, us in total_by_name.items():
        base = re.sub(r"[.\d]+$", "", nm)
        fam[base] += us
    print("--- families ---")
    for nm, us in fam.most_common(top // 2):
        print(json.dumps({"family": nm[:120], "ms": round(us / 1e3, 3),
                          "pct": round(100 * us / max(total, 1e-9), 2)}))
    return 0


def main() -> int:
    log_dir = os.environ.get("TRACE_OUT", "/tmp/pt_trace")
    top = int(os.environ.get("TRACE_TOP", "40"))
    if os.environ.get("TRACE_ANALYZE_ONLY") != "1":
        os.makedirs(log_dir, exist_ok=True)
        capture(log_dir)
    return analyze(log_dir, top)


if __name__ == "__main__":
    raise SystemExit(main())
