#!/usr/bin/env python
"""Sweep intersector knobs (tile width, pass-1 cap, mode) on the real chip.

Uses sorted 64k primary + secondary-like wavefronts (the render's actual
regime) on a selectable scene.  Env: PROBE_SCENE=field|atrium,
PROBE_DETAIL / PROBE_SPHERES / PROBE_SUBDIV, PROBE_TILES="128,256,512",
PROBE_CAPS="6,12,24", PROBE_MODES="twopass,dense".  Prints JSON lines.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(f, *args, n=8):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_pathtracer.models.pathtracer import gen_rays
    from tpu_pathtracer.ops.rng import lane_uniforms
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import (
        closest_hit_chunks,
        ray_sort_key,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import (
        make_atrium_gltf,
        make_sphere_field_gltf,
    )

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    kind = os.environ.get("PROBE_SCENE", "field")
    if kind == "atrium":
        detail = int(os.environ.get("PROBE_DETAIL", "2"))
        path = make_atrium_gltf(f"/tmp/probe_sweep/at{detail}/a.gltf", detail)
    else:
        ns = int(os.environ.get("PROBE_SPHERES", "64"))
        sd = int(os.environ.get("PROBE_SUBDIV", "3"))
        path = make_sphere_field_gltf(f"/tmp/probe_sweep/f{ns}_{sd}/f.gltf", ns, sd)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(256, 256))
    r = 256 * 256
    eps = 1e-4
    c = scene.chunk_woop.shape[0]
    emit(scene=kind, tris=int(scene.valid.sum()), chunks=c)

    pix = jnp.arange(r)
    offs = lane_uniforms(jax.random.key(0), 0, 0, pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)

    # Secondary wavefront: cosine bounce off primary hits (dead rays nulled
    # far away, like the render's sort does).
    hit0 = closest_hit_chunks(
        o, d, scene.chunk_woop, scene.chunk_aabb_min, scene.chunk_aabb_max,
        scene.woop, eps,
    )
    row = scene.shade_attrs[hit0.tri]
    v = row[:, 0:9].reshape(-1, 3, 3)
    gn = jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = jnp.where((jnp.sum(gn * d, axis=-1) > 0)[:, None], -gn, gn)
    u = lane_uniforms(jax.random.key(1), 0, 0, pix, 2)
    d1 = sampling.cosine_sample(gn, u[0], u[1])
    o1 = jnp.where(hit0.hit[:, None], o + hit0.t[:, None] * d, 1e30)

    scene_lo = jnp.min(scene.chunk_aabb_min, axis=0)
    scene_hi = jnp.max(scene.chunk_aabb_max, axis=0)

    def sorted_wave(oo, dd):
        alive = jnp.isfinite(oo[:, 0]) & (oo[:, 0] < 1e29)
        perm = jnp.argsort(ray_sort_key(oo, dd, alive, scene_lo, scene_hi))
        return oo[perm], dd[perm]

    waves = {
        "primary": sorted_wave(o, d),
        "secondary": sorted_wave(o1, d1),
    }

    tiles = [int(x) for x in os.environ.get("PROBE_TILES", "128,256,512").split(",")]
    caps = [int(x) for x in os.environ.get("PROBE_CAPS", "0").split(",")]
    modes = os.environ.get("PROBE_MODES", "twopass").split(",")

    for name, (oo, dd) in waves.items():
        for tile in tiles:
            for mode in modes:
                for cap in caps:
                    f = jax.jit(
                        lambda oo, dd, tile=tile, mode=mode, cap=cap: (
                            closest_hit_chunks(
                                oo, dd, scene.chunk_woop,
                                scene.chunk_aabb_min, scene.chunk_aabb_max,
                                scene.woop, eps, ray_tile=tile, mode=mode,
                                pass1_cap=(cap or None),
                            )
                        )
                    )
                    try:
                        h = f(oo, dd)
                        ms = bench(f, oo, dd)
                        emit(wave=name, tile=tile, mode=mode, cap=cap,
                             ms=round(ms, 2), hits=int(h.hit.sum()))
                    except Exception as err:  # noqa: BLE001
                        emit(wave=name, tile=tile, mode=mode, cap=cap,
                             error=str(err)[:200])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
