#!/usr/bin/env python
"""Phase-level probe: where does a wavefront bounce spend its time?

Times, on the real backend, for a 16k-ray batch (primary and incoherent):
  - closest_hit_chunks alone (the Pallas intersector)
  - activity prepass alone
  - full bounce_step (intersect + shade + sample + pdf)
  - the per-bounce extras: ray sort key + argsort + apply, threefry draws
Prints one JSON line per measurement.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(f, *args, n=8):
    import jax
    import jax.numpy as jnp

    def first_leaf(out):
        return jax.tree_util.tree_leaves(out)[0]

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        # Force a scalar readback per iteration: through the axon tunnel,
        # block_until_ready returns at dispatch (probe_aluform measured
        # 8 ns/grid-step "timings" without this).
        float(jnp.sum(first_leaf(f(*args)).astype(jnp.float32)))
    return (time.time() - t0) / n * 1000.0


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import (
        _DRAWS,
        bounce_step,
        gen_rays,
        per_pixel_uniforms,
    )
    from tpu_pathtracer.ops.pallas_intersect import (
        closest_hit_chunks,
        ray_sort_key,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_sphere_field_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    textured = bool(os.environ.get("PROBE_TEXTURED"))
    if os.environ.get("PROBE_SCENE") == "atrium":
        from tpu_pathtracer.utils.testscenes import make_atrium_gltf

        path = make_atrium_gltf("/tmp/probe_bounce/at/a.gltf", detail=2)
    else:
        path = make_sphere_field_gltf(
            "/tmp/probe_bounce/field.gltf", n_spheres=64, subdiv=3,
            textured=textured,
        )
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    config = RenderConfig()
    r = int(os.environ.get("PROBE_R", "16384"))

    pix = jnp.arange(r) + 300 * 512
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    rng = np.random.default_rng(1)
    d2 = rng.normal(size=(r, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jnp.asarray(
        np.asarray(o) + rng.uniform(0, 5, size=(r, 1)).astype(np.float32) * np.asarray(d)
    )
    d2 = jnp.asarray(d2)

    draws = per_pixel_uniforms(jax.random.key(1), pix, _DRAWS)
    thr = jnp.ones((r, 3), jnp.float32)
    rad = jnp.zeros((r, 3), jnp.float32)
    alive = jnp.ones((r,), bool)

    scene_lo = jnp.min(scene.chunk_aabb_min, axis=0)
    scene_hi = jnp.max(scene.chunk_aabb_max, axis=0)

    ch = jax.jit(
        lambda oo, dd: closest_hit_chunks(
            oo, dd, scene.chunk_woop, scene.chunk_aabb_min,
            scene.chunk_aabb_max, scene.woop, 1e-4,
        )
    )

    bs = jax.jit(
        lambda oo, dd, dr: bounce_step(scene, config, oo, dd, thr, rad, alive, dr)
    )

    def sort_apply(oo, dd):
        k = ray_sort_key(oo, dd, alive, scene_lo, scene_hi)
        perm = jnp.argsort(k)
        return oo[perm], dd[perm], thr[perm], rad[perm], alive[perm]

    sort_apply = jax.jit(sort_apply)
    drawsf = jax.jit(lambda: per_pixel_uniforms(jax.random.key(2), pix, _DRAWS))

    for name, (oo, dd) in (("primary", (o, d)), ("incoherent", (o2, d2))):
        emit(case=name, ms_intersect=round(bench(ch, oo, dd), 2))
        emit(case=name, ms_bounce_step=round(bench(bs, oo, dd, draws), 2))
        emit(case=name, ms_sort=round(bench(sort_apply, oo, dd), 2))
    emit(case="draws", ms=round(bench(drawsf), 2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
