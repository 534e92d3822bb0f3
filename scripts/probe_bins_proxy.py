#!/usr/bin/env python
"""CPU proxy for the bins mode: per-ray pierced GROUP statistics on the
atrium (the quantity that sets the binned pair count, the TPU_PT_BINS_CAP
default, and the expected ALU vs the sub-tile-union cascade).

Recipe mirrors probe_body's secondary wavefront (camera primaries ->
cosine bounce -> sort) at a reduced R so numpy stays fast.  Reports, for
primaries and secondaries: mean/p95 pierced groups per ray (unbounded
slab, group=8 chunks), total pair rows P, padded block count at BR=512,
and the implied pair ALU vs the 64-ray sub-tile union's.

Env: PROBE_R (default 16384), PROBE_DETAIL (default 2).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TPU_PATHTRACER_PLATFORM", "cpu")


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import _GROUP, CHUNK_TRIS
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    r = int(os.environ.get("PROBE_R", "16384"))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    path = make_atrium_gltf("/tmp/probe_bins/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    cmin = np.asarray(scene.chunk_aabb_min, np.float64)
    cmax = np.asarray(scene.chunk_aabb_max, np.float64)
    c = cmin.shape[0]
    cg = -(-c // _GROUP)
    print(json.dumps(dict(tris=int(scene.capacity), chunks=int(c),
                          groups=int(cg))), flush=True)

    pix = np.arange(r, dtype=np.int32) * (512 * 512 // r)
    offs = per_pixel_uniforms(jax.random.key(0), jnp.asarray(pix), 2)
    o, d = gen_rays(scene.camera, jnp.asarray(pix), offs)
    hit = scene_closest_hit(scene, o, d, 1e-4)
    gn_rows = np.asarray(scene.shade_attrs)[np.asarray(hit.tri)]
    v = gn_rows[:, 0:9].reshape(-1, 3, 3)
    gn = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = np.where((np.sum(gn * np.asarray(d), axis=-1) > 0)[:, None], -gn, gn)
    u = np.asarray(per_pixel_uniforms(jax.random.key(1), jnp.asarray(pix), 2))
    d1 = np.asarray(
        sampling.cosine_sample(jnp.asarray(gn), jnp.asarray(u[0]),
                               jnp.asarray(u[1]))
    )
    o1 = np.asarray(o) + np.asarray(hit.t)[:, None] * np.asarray(d)
    alive = np.asarray(hit.hit)

    def stats(name, oo, dd, mask):
        oo = oo[mask].astype(np.float64)
        dd = dd[mask].astype(np.float64)
        n = oo.shape[0]
        inv = 1.0 / np.where(dd == 0, 1e-30, dd)
        # Per-ray x per-chunk slab in blocks to bound memory.
        groups = np.zeros((n, cg), bool)
        B = 4096
        for s in range(0, n, B):
            t1 = (cmin[None] - oo[s:s + B, None]) * inv[s:s + B, None]
            t2 = (cmax[None] - oo[s:s + B, None]) * inv[s:s + B, None]
            lo = np.nanmax(np.minimum(t1, t2), axis=2)
            hi = np.nanmin(np.maximum(t1, t2), axis=2)
            ent = (lo <= hi) & (hi >= 1e-4)
            ent = np.where(np.isnan(lo) | np.isnan(hi), False, ent)
            gpad = cg * _GROUP - c
            if gpad:
                ent = np.concatenate(
                    [ent, np.zeros((ent.shape[0], gpad), bool)], axis=1
                )
            groups[s:s + B] = ent.reshape(-1, cg, _GROUP).any(axis=2)
        per_ray = groups.sum(axis=1)
        counts = groups.sum(axis=0)  # rays per group
        p = int(per_ray.sum())
        blocks = int(np.ceil(counts / 512.0).sum())
        pairs = blocks * 512 * _GROUP * CHUNK_TRIS
        print(json.dumps(dict(
            wavefront=name, rays=int(n),
            mean_groups=round(float(per_ray.mean()), 2),
            p95_groups=int(np.percentile(per_ray, 95)),
            max_groups=int(per_ray.max()),
            pair_rows=p, rows_per_ray=round(p / n, 2),
            padded_blocks=blocks,
            padded_pairs_m=round(pairs / 1e6, 1),
            ms_at_35g=round(pairs / 35e9 * 1000, 2),
        )), flush=True)

    stats("primary", np.asarray(o), np.asarray(d), np.ones(r, bool))
    stats("secondary", o1, d1, alive)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
