#!/usr/bin/env python
"""TPU performance probe: full-render timings first, then kernel sweeps.

Run on the real chip after changes to the intersector or wavefront loop.
Prints one JSON line per measurement (collect with `... | grep '^{'`).

Ordering is compile-cost-aware: each remote jit costs 60-280 s through the
tunnel, so the decisive end-to-end numbers come first and the wide sweeps
are opt-in:

  PROBE_TILES=1   adds the ray-tile sweep (256/1024 beyond the 512 default)
  PROBE_WIDTHS=1  adds the chunk-width sweep (256/512 beyond 128)
  PROBE_SCALE=1   adds the 820k-triangle scale case
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
    import numpy as np
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        render,
    )
    from tpu_pathtracer.ops.pallas_intersect import (
        build_chunk_woop,
        closest_hit_chunks,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_sphere_field_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    path = make_sphere_field_gltf("/tmp/perf_probe/field.gltf", n_spheres=64, subdiv=3)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    emit(event="scene", tris=int(scene.valid.sum()), chunks=int(scene.chunk_woop.shape[0]))

    # --- 1. full render sweep: engine x texturing (the decisive numbers) ----
    tex_path = make_sphere_field_gltf(
        "/tmp/perf_probe/field_tex.gltf", n_spheres=64, subdiv=3, textured=True
    )
    tex_scene = parse_gltf_scene(tex_path, 1.0)
    tex_scene = dataclasses.replace(
        tex_scene, camera=tex_scene.camera.with_dims(512, 512)
    )
    for name, sc in (("untextured", scene), ("textured", tex_scene)):
        for compaction in (True, False):
            cfg = RenderConfig(
                rays_per_batch=16384, spp_per_pass=4, compaction=compaction
            )
            t0 = time.time()
            render(sc, spp=4, seed=0, config=cfg)
            emit(event="compile", scene=name, compaction=compaction,
                 s=round(time.time() - t0, 1))
            t0 = time.time()
            render(sc, spp=32, seed=1, config=cfg)
            dt = time.time() - t0
            emit(
                event="render", scene=name, compaction=compaction,
                s=round(dt, 2), samples_per_s=int(512 * 512 * 32 / dt),
            )

    # --- 2. kernel sweep: primary vs incoherent rays -------------------------
    r = 16384
    pix = jnp.arange(r) + 300 * 512
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    rng = np.random.default_rng(1)
    d2 = rng.normal(size=(r, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = np.asarray(o) + rng.uniform(0, 5, size=(r, 1)).astype(np.float32) * np.asarray(d)
    cases = {"primary": (o, d), "incoherent": (jnp.asarray(o2), jnp.asarray(d2))}

    tiles = (512,) if not os.environ.get("PROBE_TILES") else (256, 512, 1024)
    widths = (128,) if not os.environ.get("PROBE_WIDTHS") else (128, 256, 512)

    verts = np.asarray(scene.verts)
    valid = np.asarray(scene.valid)

    def chunk_arrays(cw):
        if cw == 128:
            return scene.chunk_woop, scene.chunk_aabb_min, scene.chunk_aabb_max
        blocks = build_chunk_woop(np.asarray(scene.woop), cw)
        n = verts.shape[0]
        pad = (-n) % cw
        v = np.concatenate([verts, np.zeros((pad, 3, 3), verts.dtype)]) if pad else verts
        ok = np.concatenate([valid, np.zeros(pad, bool)]) if pad else valid
        c = v.shape[0] // cw
        vv = v.reshape(c, cw, 3, 3)
        oo = ok.reshape(c, cw)
        cmin = np.where(oo[..., None, None], vv, np.inf).min(axis=(1, 2))
        cmax = np.where(oo[..., None, None], vv, -np.inf).max(axis=(1, 2))
        return (jnp.asarray(blocks), jnp.asarray(cmin.astype(np.float32)),
                jnp.asarray(cmax.astype(np.float32)))

    groups = (
        (None,)
        if not os.environ.get("PROBE_GROUPS")
        else (8, 16, 32)
    )
    for cw in widths:
        cwoop, cmin, cmax = chunk_arrays(cw)
        for tile in tiles:
            for grp in groups:
                for name, (oo, dd) in cases.items():
                    f = jax.jit(
                        lambda oo, dd, tile=tile, grp=grp, cwoop=cwoop,
                        cmin=cmin, cmax=cmax: closest_hit_chunks(
                            oo, dd, cwoop, cmin, cmax, scene.woop, 1e-4,
                            ray_tile=tile, group=grp,
                        )
                    )
                    h = f(oo, dd)
                    jax.block_until_ready(h)
                    t0 = time.time()
                    for _ in range(8):
                        h = f(oo, dd)
                    jax.block_until_ready(h)
                    emit(
                        event="kernel", ray_tile=tile, chunk_tris=cw,
                        group=grp, rays=name,
                        ms=round((time.time() - t0) / 8 * 1000, 2),
                        hits=int(h.hit.sum()),
                    )

    # --- 3. scale validation: 820k tris (PROBE_SCALE=1) ---------------------
    if os.environ.get("PROBE_SCALE"):
        big_path = make_sphere_field_gltf(
            "/tmp/perf_probe/field_big.gltf", n_spheres=160, subdiv=4
        )
        big = parse_gltf_scene(big_path, 1.0)
        big = dataclasses.replace(big, camera=big.camera.with_dims(512, 512))
        emit(event="scene_big", tris=int(big.valid.sum()),
             chunks=int(big.chunk_woop.shape[0]))
        cfg = RenderConfig(rays_per_batch=16384, spp_per_pass=4)
        t0 = time.time()
        render(big, spp=4, seed=0, config=cfg)
        emit(event="compile_big", s=round(time.time() - t0, 1))
        t0 = time.time()
        render(big, spp=16, seed=1, config=cfg)
        dt = time.time() - t0
        emit(event="render_big", s=round(dt, 2),
             samples_per_s=int(512 * 512 * 16 / dt))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
