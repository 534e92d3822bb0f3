#!/usr/bin/env python
"""Does sorting secondaries by their NEAREST-ENTERED chunk cut tile unions?

The shipped sort keys are spawn-surface based (hint: octant x spawn chunk)
or origin-cell based; both measured far above the per-ray activity truth on
enclosed-scene secondaries (probe_granularity: 64-ray union 132 chunks vs
13.9 truth).  Hypothesis: the chunk a ray FIRST ENTERS along its new
direction (argmin of bounded slab entry over chunks) is the geometry-aware
key — rays sharing their first chunk share most of their front-to-back
worklist, so unions approach truth and the best-t recheck collapses the
rest.  This probe computes per-ray nearest chunk in blocked jnp (no
kernels) and reports W-ray unions for several candidate key layouts.
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
    from tpu_pathtracer.models.pathtracer import gen_rays, scene_closest_hit
    from tpu_pathtracer.ops.rng import lane_uniforms
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import (
        ray_sort_key,
        ray_sort_key_hint,
        CHUNK_TRIS,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    path = make_atrium_gltf(f"/tmp/probe_tgt/at{detail}/a.gltf", detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(256, 256))
    r = 256 * 256
    eps = 1e-4
    c = scene.chunk_woop.shape[0]
    emit(tris=int(scene.valid.sum()), chunks=c)

    pix = jnp.arange(r)
    offs = lane_uniforms(jax.random.key(0), 0, 0, pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    hit0 = scene_closest_hit(scene, o, d, eps)
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

    hit1 = scene_closest_hit(scene, o1, d1, eps)

    # Per-ray nearest entered chunk: blocked argmin of slab entry distance.
    BLK = 256
    cpad = -(-c // BLK) * BLK
    cmin = jnp.concatenate(
        [scene.chunk_aabb_min,
         jnp.full((cpad - c, 3), jnp.nan, jnp.float32)]
    ).reshape(-1, BLK, 3)
    cmax = jnp.concatenate(
        [scene.chunk_aabb_max,
         jnp.full((cpad - c, 3), jnp.nan, jnp.float32)]
    ).reshape(-1, BLK, 3)

    @jax.jit
    def nearest_chunk(o_, d_):
        inv = 1.0 / jnp.where(d_ == 0.0, 1e-30, d_)

        def body(carry, blk):
            tmin, arg, b = carry
            bmin, bmax = blk
            t1 = (bmin[None] - o_[:, None]) * inv[:, None]
            t2 = (bmax[None] - o_[:, None]) * inv[:, None]
            lo = jnp.max(jnp.minimum(t1, t2), axis=-1)
            hi = jnp.min(jnp.maximum(t1, t2), axis=-1)
            okb = (lo <= hi) & (hi >= eps)
            entry = jnp.where(okb, jnp.maximum(lo, eps), jnp.inf)
            bm = jnp.min(entry, axis=1)
            ba = jnp.argmin(entry, axis=1).astype(jnp.int32) + b * BLK
            better = bm < tmin
            return (
                jnp.where(better, bm, tmin),
                jnp.where(better, ba, arg),
                b + 1,
            ), None

        init = (
            jnp.full((r,), jnp.inf, jnp.float32),
            jnp.full((r,), c, jnp.int32),
            jnp.int32(0),
        )
        (tmin, arg, _), _ = jax.lax.scan(body, init, (cmin, cmax))
        return tmin, arg

    tgt_t, tgt = nearest_chunk(o1, d1)
    emit(
        note="nearest-chunk stats",
        frac_with_target=round(float(jnp.mean((tgt < c) & alive)), 3),
        mean_entry=round(float(jnp.nanmean(jnp.where(jnp.isfinite(tgt_t), tgt_t, jnp.nan))), 3),
    )

    octant = (
        (d1[:, 0] > 0).astype(jnp.int32) * 4
        + (d1[:, 1] > 0).astype(jnp.int32) * 2
        + (d1[:, 2] > 0).astype(jnp.int32)
    )
    dead = jnp.int32(1 << 28)
    tgtg = jnp.where(tgt < c, tgt // 8, c // 8)  # worklist-group granularity
    keys = {
        "hint": ray_sort_key_hint(d1, alive, hint, c),
        "cell": ray_sort_key(o1, d1, alive, scene_lo, scene_hi),
        "target": jnp.where(alive, tgt, dead),
        "target_oct": jnp.where(alive, tgt * 8 + octant, dead),
        "tgtgroup_oct": jnp.where(alive, tgtg * 8 + octant, dead),
        "oct_target": jnp.where(alive, octant * (c + 1) + tgt, dead),
        "hint_target": jnp.where(
            alive, hint * (c + 1) + tgt, dead
        ),
    }
    for key_name, key in keys.items():
        perm = jnp.argsort(key)
        sub = perm[r // 4 : r // 4 + 8192]
        os_, ds_, ts_ = o1[sub], d1[sub], hit1.t[sub]
        inv = 1.0 / jnp.where(ds_ == 0.0, 1e-30, ds_)
        t1s = (scene.chunk_aabb_min[None] - os_[:, None]) * inv[:, None]
        t2s = (scene.chunk_aabb_max[None] - os_[:, None]) * inv[:, None]
        lo = jnp.max(jnp.minimum(t1s, t2s), axis=-1)
        hi = jnp.min(jnp.maximum(t1s, t2s), axis=-1)
        act = (lo <= hi) & (hi >= eps) & (lo <= ts_[:, None])  # [8192, C]
        out = {"sort": key_name}
        for w_ in (1, 64, 256, 512):
            g = act.reshape(8192 // w_, w_, c).any(axis=1)
            out[f"u{w_}"] = round(float(jnp.sum(g) / (8192 // w_)), 1)
        emit(**out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
