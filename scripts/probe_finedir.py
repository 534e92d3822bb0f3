#!/usr/bin/env python
"""Does a fine-direction MINOR key tighten 64-ray sub-tile unions?

The shipped hint key is (direction octant MAJOR, spawn chunk minor) with
nothing below the chunk: rays inside one (octant, chunk) bucket land in
sub-tiles in arbitrary direction order, and probe_granularity measured the
64-ray union at 132 chunks vs the 13.9 per-ray truth — the pair-ALU floor
of the whole intersector.  Round 2 swept finer direction bins as a MAJOR
key and lost (fragmenting breaks spawn locality); this probe asks the
untried question: keep (octant, chunk) bucket structure and only ORDER rays
within each bucket by quantized direction, so sub-tile unions tighten while
tile composition barely moves.

Variants (union stats, final-t-bounded, 8k mid-wave subset like
probe_granularity):
  hint        octant * (C+1) + chunk                      [shipped]
  dir2        (octant, chunk, 1-bit/axis sub-octant)       3 extra bits
  dir4        (octant, chunk, 2-bit/axis, Morton-mixed)    6 extra bits
  dir16       (octant, chunk, 4-bit theta/phi grid)        8 extra bits

Prints one JSON line per variant.  Env: PROBE_DETAIL (2).
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
        CHUNK_TRIS,
        closest_hit_chunks,
        ray_sort_key_hint,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    path = make_atrium_gltf(f"/tmp/probe_fd/at{detail}/a.gltf", detail)
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
    hit1 = closest_hit_chunks(
        o1, d1, scene.chunk_woop, scene.chunk_aabb_min, scene.chunk_aabb_max,
        scene.woop, eps,
    )

    base = ray_sort_key_hint(d1, alive, hint, c).astype(jnp.int64)
    ax = jnp.abs(d1)

    def bits(x, n):
        # Quantize |component| in [0, 1] to n bits.
        q = jnp.clip((x * (1 << n)).astype(jnp.int32), 0, (1 << n) - 1)
        return q

    def fine_dir2():
        return bits(ax[:, 0], 1) * 4 + bits(ax[:, 1], 1) * 2 + bits(ax[:, 2], 1)

    def fine_dir4():
        qx, qy, qz = bits(ax[:, 0], 2), bits(ax[:, 1], 2), bits(ax[:, 2], 2)
        # Morton-mix the 2-bit axes so adjacent codes are angular neighbors.
        m = 0
        for b in range(2):
            m = m | (((qx >> b) & 1) << (3 * b + 2))
            m = m | (((qy >> b) & 1) << (3 * b + 1))
            m = m | (((qz >> b) & 1) << (3 * b))
        return m

    def fine_dir16():
        # 4-bit octahedral-ish grid: theta from |z|, phi from x/y balance.
        t_ = bits(ax[:, 2], 4)
        p_ = bits(ax[:, 0] / jnp.maximum(ax[:, 0] + ax[:, 1], 1e-20), 4)
        return t_ * 16 + p_

    variants = {
        "hint": jnp.zeros_like(base),
        "dir2": fine_dir2().astype(jnp.int64),
        "dir4": fine_dir4().astype(jnp.int64),
        "dir16": fine_dir16().astype(jnp.int64),
    }
    spans = {"hint": 1, "dir2": 8, "dir4": 64, "dir16": 256}

    for name, fine in variants.items():
        key = base * spans[name] + fine
        perm = jnp.argsort(key)
        sub = perm[r // 4 : r // 4 + 8192]
        os_, ds_, ts_ = o1[sub], d1[sub], hit1.t[sub]
        inv = 1.0 / jnp.where(ds_ == 0.0, 1e-30, ds_)
        t1s = (scene.chunk_aabb_min[None] - os_[:, None]) * inv[:, None]
        t2s = (scene.chunk_aabb_max[None] - os_[:, None]) * inv[:, None]
        lo = jnp.max(jnp.minimum(t1s, t2s), axis=-1)
        hi = jnp.min(jnp.maximum(t1s, t2s), axis=-1)
        act = (lo <= hi) & (hi >= eps) & (lo <= ts_[:, None])
        out = {"sort": name}
        for w_ in (1, 64, 128, 512):
            g = act.reshape(8192 // w_, w_, c).any(axis=1)
            out[f"u{w_}"] = round(float(jnp.sum(g) / (8192 // w_)), 1)
        emit(**out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
