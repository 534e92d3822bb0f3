#!/usr/bin/env python
"""RMSE-vs-spp A/B for the low-discrepancy sampling stack (VERDICT r3
stretch #8 + r4 #6 done-bars): jitter = uniform | sobol (camera pair)
crossed with lowdisc = off | sobol (per-bounce VNDF + light-point pairs).
Renders the Cornell fixture at several spp per arm and reports linear-HDR
RMSE against a high-spp uniform reference.  Camera jitter concentrates its
win on edges (anti-aliasing integral); the bounce pairs stratify the
estimator's interior variance, so the full stack compounds.
Writes out/sobol_ab.json.  Env: AB_SIZE (default 64), AB_REF_SPP (512),
AB_SPP (comma list, default 4,16,64).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_PATHTRACER_PLATFORM", "cpu")

import numpy as np


def main() -> int:
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import render
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import (
        make_cornell_gltf,
        make_textured_cornell_gltf,
    )

    size = int(os.environ.get("AB_SIZE", "64"))
    ref_spp = int(os.environ.get("AB_REF_SPP", "512"))
    spps = [int(x) for x in os.environ.get("AB_SPP", "4,16,64").split(",")]

    # AB_SCENE=textured: the metallic/gradient-roughness Cornell — the VNDF
    # pair only has variance to remove on glossy surfaces.
    fixture = (make_textured_cornell_gltf
               if os.environ.get("AB_SCENE") == "textured"
               else make_cornell_gltf)
    p = fixture("/tmp/sobol_ab/c.gltf")
    s = parse_gltf_scene(p, 1.0)
    s = dataclasses.replace(s, camera=s.camera.with_dims(size, size))

    ref = render(s, spp=ref_spp, seed=0,
                 config=RenderConfig(spp_per_pass=64))
    arms = {
        "uniform": RenderConfig(),
        "sobol_cam": RenderConfig(jitter="sobol"),
        "sobol_bounce": RenderConfig(lowdisc="sobol"),
        "sobol_full": RenderConfig(jitter="sobol", lowdisc="sobol"),
    }
    out = {"size": size, "ref_spp": ref_spp, "rows": []}
    for spp in spps:
        row = {"spp": spp}
        for name, cfg in arms.items():
            img = render(s, spp=spp, seed=1, config=cfg)
            row[name] = float(np.sqrt(np.mean((img - ref) ** 2)))
        row["ratio_cam"] = round(row["uniform"] / row["sobol_cam"], 3)
        row["ratio_bounce"] = round(row["uniform"] / row["sobol_bounce"], 3)
        row["ratio_full"] = round(row["uniform"] / row["sobol_full"], 3)
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    os.makedirs("out", exist_ok=True)
    name = ("out/sobol_ab_textured.json"
        if os.environ.get("AB_SCENE") == "textured"
        else "out/sobol_ab.json")
    with open(name, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
