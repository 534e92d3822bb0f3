#!/usr/bin/env python
"""RMSE-vs-spp A/B for RenderConfig.jitter = uniform vs sobol (VERDICT r3
stretch #8 done-bar).  Renders the Cornell fixture at several spp with each
jitter and reports linear-HDR RMSE against a 512-spp uniform reference.
Camera jitter only affects the anti-aliasing integral, so the win
concentrates on edges; RMSE still drops measurably at every spp.
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
    from tpu_pathtracer.utils.testscenes import make_cornell_gltf

    size = int(os.environ.get("AB_SIZE", "64"))
    ref_spp = int(os.environ.get("AB_REF_SPP", "512"))
    spps = [int(x) for x in os.environ.get("AB_SPP", "4,16,64").split(",")]

    p = make_cornell_gltf("/tmp/sobol_ab/c.gltf")
    s = parse_gltf_scene(p, 1.0)
    s = dataclasses.replace(s, camera=s.camera.with_dims(size, size))

    ref = render(s, spp=ref_spp, seed=0,
                 config=RenderConfig(spp_per_pass=64))
    out = {"size": size, "ref_spp": ref_spp, "rows": []}
    for spp in spps:
        row = {"spp": spp}
        for kind in ("uniform", "sobol"):
            img = render(
                s, spp=spp, seed=1, config=RenderConfig(jitter=kind)
            )
            row[kind] = float(np.sqrt(np.mean((img - ref) ** 2)))
        row["ratio"] = round(row["uniform"] / row["sobol"], 3)
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
    os.makedirs("out", exist_ok=True)
    with open("out/sobol_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
