#!/usr/bin/env python
"""End-to-end render probe: wavefront width x pass size on the real chip.

The decisive numbers for bench tuning.  Env:
  PROBE_RPB   comma list of rays_per_batch (default "16384,65536")
  PROBE_SPPP  comma list of spp_per_pass  (default "4,8")
  PROBE_TEX   1 = textured scene (default untextured)
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
    from tpu_pathtracer.utils.testscenes import make_sphere_field_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    textured = bool(os.environ.get("PROBE_TEX"))
    path = make_sphere_field_gltf(
        "/tmp/probe_render/field.gltf", 64, 3, textured=textured
    )
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    emit(event="scene", tris=int(scene.valid.sum()), textured=textured)

    rpbs = [int(x) for x in os.environ.get("PROBE_RPB", "16384,65536").split(",")]
    sppps = [int(x) for x in os.environ.get("PROBE_SPPP", "4,8").split(",")]
    spp = int(os.environ.get("PROBE_SPP", "32"))
    for rpb in rpbs:
        for sppp in sppps:
            cfg = RenderConfig(rays_per_batch=rpb, spp_per_pass=sppp)
            t0 = time.time()
            render(scene, spp=sppp, seed=0, config=cfg)
            emit(event="compile", rpb=rpb, sppp=sppp, s=round(time.time() - t0, 1))
            t0 = time.time()
            render(scene, spp=spp, seed=1, config=cfg)
            dt = time.time() - t0
            emit(
                event="render", rpb=rpb, sppp=sppp, s=round(dt, 2),
                samples_per_s=int(512 * 512 * spp / dt),
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
