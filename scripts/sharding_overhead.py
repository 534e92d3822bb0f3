#!/usr/bin/env python
"""Measure the sharding tax on real silicon: the bench workload rendered
through render() (host chunk loop) vs render_sharded() on a 1-device mesh
(shard_map + psum machinery engaged, same chip).

This is the number that turns the linear spp-scaling projection into a
measured claim: sharded time = single-host time x (1 + tax), and spp
sharding splits the dominant per-rank work exactly (each rank runs the
single-chip program at spp/n with one [npix,3] psum per pass).  Writes
out/sharding_overhead_r4.json.
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
    import jax
    import numpy as np

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import render
    from tpu_pathtracer.parallel.mesh import make_mesh, render_sharded
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    size = int(os.environ.get("PROBE_SIZE", "512"))
    spp = int(os.environ.get("PROBE_SPP", "16"))
    config = RenderConfig(rays_per_batch=1 << 16, spp_per_pass=spp)
    path = make_atrium_gltf("/tmp/shard_tax/a.gltf", detail=2)
    scene = parse_gltf_scene(path, 1.0, config)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(size, size))
    mesh = make_mesh(devices=jax.devices()[:1], rays=1, spp=1)

    def best_of(fn, reps=2):
        fn()  # warm-up: compile + relay staging
        best = None
        img = None
        for _ in range(reps):
            t0 = time.time()
            img = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, img

    t_single, img_s = best_of(lambda: render(scene, spp, seed=1, config=config))
    t_shard, img_m = best_of(
        lambda: render_sharded(scene, spp, seed=1, config=config, mesh=mesh)
    )
    line = {
        "workload": f"enclosed-atrium {int(scene.valid.sum())} tris "
                    f"{size}x{size}@{spp}spp",
        "single_host_s": round(t_single, 3),
        "sharded_1dev_s": round(t_shard, 3),
        "tax_pct": round((t_shard / t_single - 1) * 100, 2),
        "max_abs_diff": float(np.max(np.abs(img_s - img_m))),
        "ts": time.time(),
    }
    os.makedirs("out", exist_ok=True)
    with open("out/sharding_overhead_r4.json", "w") as f:
        f.write(json.dumps(line, indent=1) + "\n")
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
