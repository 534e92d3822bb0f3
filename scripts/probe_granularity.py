#!/usr/bin/env python
"""How much chunk-activity union inflation does each ray-tile width cost?

For the enclosed-atrium secondary wavefront (the dominant render cost),
computes mean active chunks per W-ray union for W in {512, 256, 128, 64, 32,
8, 1} with both sort keys, bounded by each ray's final hit t (what an ideal
cutoff leaves).  Plain jnp on an 8k-ray subset of a sorted 64k wave — no
kernels, just the counting.  Prints JSON lines.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax
    import jax.numpy as jnp
    from tpu_pathtracer.models.pathtracer import gen_rays
    from tpu_pathtracer.ops.rng import lane_uniforms
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import (
        closest_hit_chunks,
        ray_sort_key,
        ray_sort_key_hint,
        CHUNK_TRIS,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    path = make_atrium_gltf(f"/tmp/probe_gran/at{detail}/a.gltf", detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(256, 256))
    r = 256 * 256
    eps = 1e-4
    c = scene.chunk_woop.shape[0]
    emit(tris=int(scene.valid.sum()), chunks=c)

    pix = jnp.arange(r)
    offs = lane_uniforms(jax.random.key(0), 0, 0, pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
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
    o1 = o + hit0.t[:, None] * d
    hint = hit0.tri // CHUNK_TRIS
    alive = hit0.hit

    scene_lo = jnp.min(scene.chunk_aabb_min, axis=0)
    scene_hi = jnp.max(scene.chunk_aabb_max, axis=0)

    hit1 = closest_hit_chunks(
        o1, d1, scene.chunk_woop, scene.chunk_aabb_min, scene.chunk_aabb_max,
        scene.woop, eps,
    )

    for key_name in ("hint", "cell"):
        if key_name == "hint":
            key = ray_sort_key_hint(d1, alive, hint, c)
        else:
            key = ray_sort_key(o1, d1, alive, scene_lo, scene_hi)
        perm = jnp.argsort(key)
        # 8k-ray contiguous subset from the middle of the sorted wave.
        sub = perm[r // 4 : r // 4 + 8192]
        os_, ds_, ts_ = o1[sub], d1[sub], hit1.t[sub]
        inv = 1.0 / jnp.where(ds_ == 0.0, 1e-30, ds_)
        t1s = (scene.chunk_aabb_min[None] - os_[:, None]) * inv[:, None]
        t2s = (scene.chunk_aabb_max[None] - os_[:, None]) * inv[:, None]
        lo = jnp.max(jnp.minimum(t1s, t2s), axis=-1)
        hi = jnp.min(jnp.maximum(t1s, t2s), axis=-1)
        act = (lo <= hi) & (hi >= eps) & (lo <= ts_[:, None])  # [8192, C]
        out = {"sort": key_name}
        for w_ in (1, 8, 32, 64, 128, 256, 512):
            g = act.reshape(8192 // w_, w_, c).any(axis=1)
            out[f"u{w_}"] = round(float(jnp.sum(g) / (8192 // w_)), 1)
        emit(**out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
