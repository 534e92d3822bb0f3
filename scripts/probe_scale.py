#!/usr/bin/env python
"""Scene-size scaling probe: samples/s at 82k / 460k / 820k / 2M triangles.

VERDICT r2 missing #2's done-criterion: 820k-tri samples/s within 2x of the
82k scene (round 2 measured 3.4x).  Renders 512x512 @ SPP (default 8) on the
real chip with the production render() path and prints one JSON line per
scene.  Env: PROBE_SCENES=field82,atrium2,atrium3,field820,field2m (comma list),
PROBE_SPP, TPU_PT_NARROW_TILE_CHUNKS / BENCH_SORT as usual.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import render
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import (
        make_atrium_gltf,
        make_sphere_field_gltf,
    )

    spp = int(os.environ.get("PROBE_SPP", "8"))
    w = h = 512
    config = RenderConfig(
        rays_per_batch=1 << 16, spp_per_pass=spp,
        sort_key=os.environ.get("BENCH_SORT", "hint"),
    )
    builders = {
        "field82": lambda d: make_sphere_field_gltf(
            d + "/f.gltf", 64, 3, textured=True),
        "field820": lambda d: make_sphere_field_gltf(
            d + "/f.gltf", 160, 4, textured=True),
        # Next order of magnitude (VERDICT r2 missing #2's "2-5M scene
        # renders without the prepass dominating"); host build ~77 s.
        "field2m": lambda d: make_sphere_field_gltf(
            d + "/f.gltf", 400, 4, textured=True),
        # Round-4 (VERDICT r3 next #6): the next order of magnitude past 2M.
        # subdiv 5 = 20480 tris/sphere; 400 spheres -> 8.19M, 800 -> 16.4M.
        "field8m": lambda d: make_sphere_field_gltf(
            d + "/f.gltf", 400, 5, textured=True),
        "field16m": lambda d: make_sphere_field_gltf(
            d + "/f.gltf", 800, 5, textured=True),
        "atrium2": lambda d: make_atrium_gltf(d + "/a.gltf", detail=2),
        "atrium3": lambda d: make_atrium_gltf(d + "/a.gltf", detail=3),
    }
    names = os.environ.get("PROBE_SCENES", "field82,field820").split(",")
    # Optional in-process tuning A/B: PROBE_TUNING_AB="field=value,..."
    # renders each scene under the default tuning AND the override (a
    # different IntersectTuning is a different trace, so one scene build
    # serves both sides).
    ab = os.environ.get("PROBE_TUNING_AB", "")
    configs = [("", config)]
    if ab:
        over = {}
        for kv in ab.split(","):
            k, v = kv.split("=")
            over[k] = type(getattr(config.tuning, k))(v)
        configs.append((
            f" [{ab}]",
            dataclasses.replace(
                config, tuning=dataclasses.replace(config.tuning, **over)
            ),
        ))
    for name in names:
        path = builders[name](f"/tmp/probe_scale/{name}")
        for tag, cfg in configs:
            # Parse PER CONFIG: scene-build knobs (chunk_tris/build/
            # quad_max) are applied at parse time, so a single shared parse
            # would silently report an A/B that never happened for those
            # fields (code-review r4 finding).  Render-only overrides pay
            # a redundant parse; correctness of the ledger wins.
            scene = parse_gltf_scene(path, w / h, cfg)
            scene = dataclasses.replace(
                scene, camera=scene.camera.with_dims(w, h))
            render(scene, spp=spp, seed=0, config=cfg)  # warm-up + staging
            best = float("inf")
            rays = 0
            for _ in range(2):
                stats = {}
                t0 = time.time()
                render(scene, spp=spp, seed=1, config=cfg, stats=stats)
                dt = time.time() - t0
                if dt < best:
                    best, rays = dt, stats.get("measured_rays", 0)
            print(json.dumps({
                "scene": name + tag,
                "tris": int(scene.valid.sum()),
                "chunks": int(scene.chunk_woop.shape[0]),
                "seconds": round(best, 2),
                "samples_per_s": round(w * h * spp / best, 1),
                "measured_mrays_per_s": round(rays / best / 1e6, 3),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
