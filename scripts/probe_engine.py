#!/usr/bin/env python
"""Single persistent-engine call, timed on chip, vs its parts.

probe_body accounts ~22-25 ms/iter of sorted-stage cost on the field
scene while the bench's wall/iteration quotient reads ~48 ms — this
probe times ONE render_chunk_persistent call (64k lanes, 16 spp pool)
and reports wall seconds, measured rays, and implied ms per
64k-wavefront iteration, plus the same for the atrium.  Separates real
per-iteration cost from multi-call dispatch overhead and the
pool-drain tail.

Env: PROBE_R (lanes, default 65536), PROBE_SPP (default 16).
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
    import jax.numpy as jnp
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import render_chunk_persistent
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import (
        make_atrium_gltf,
        make_sphere_field_gltf,
    )

    r = int(os.environ.get("PROBE_R", "65536"))
    spp = int(os.environ.get("PROBE_SPP", "16"))
    config = RenderConfig(rays_per_batch=r, spp_per_pass=spp)

    for which in ("field", "atrium"):
        if which == "field":
            path = make_sphere_field_gltf(
                "/tmp/probe_engine/f.gltf", 64, 3, textured=True
            )
        else:
            path = make_atrium_gltf("/tmp/probe_engine/a.gltf", detail=2)
        scene = parse_gltf_scene(path, 1.0)
        scene = dataclasses.replace(
            scene, camera=scene.camera.with_dims(512, 512)
        )
        fn = jax.jit(
            lambda s, c0, key, s0: render_chunk_persistent(
                s, c0, key, s0, r, spp, config
            )
        )
        key = jax.random.key(0)
        # Center chunk: chunk_start=0 is the top rows, which for open
        # scenes is ALL SKY (every path length exactly 1 — meaningless).
        c0 = jnp.asarray((512 * 512 - r) // 2, jnp.int32)
        s0 = jnp.asarray(0, jnp.int32)
        acc, n = fn(scene, c0, key, s0)
        jax.block_until_ready((acc, n))
        best = None
        for _ in range(2):
            t0 = time.time()
            acc, n = fn(scene, c0, key, s0)
            n_host = int(n)  # readback forces completion
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        iters_min = n_host / r  # lower bound (full lanes every iter)
        print(json.dumps(dict(
            scene=which, wall_s=round(best, 3), rays=n_host,
            iters_lower_bound=round(iters_min, 1),
            ms_per_iter_upper=round(best * 1000 / iters_min, 1),
            samples=r * spp,
            samples_per_s=round(r * spp / best, 0),
        )), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
