#!/usr/bin/env python
"""Quantify intersector chunk-work redundancy on the real chip.

For a primary and a secondary-like wavefront (sorted, render-sized):
  truth    per-ray pierced chunks, bounded by the ray's FINAL hit t
           (the work an ideal per-ray ordered traversal would do)
  ideal    tile-union of `truth` (lower bound for ANY tile-granular kernel)
  dense    tile-union slab activity (round-2 kernel's work)
  pass1/2  the two-pass worklist's actual work split
plus wall-clock for dense vs twopass modes.  Prints JSON lines.
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
        tile_chunk_activity,
        _group_stats,
        _worklist,
        _env_int,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_sphere_field_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    n_spheres = int(os.environ.get("PROBE_SPHERES", "64"))
    subdiv = int(os.environ.get("PROBE_SUBDIV", "3"))
    path = make_sphere_field_gltf(
        f"/tmp/probe_cutoff/field_{n_spheres}_{subdiv}.gltf", n_spheres, subdiv
    )
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(256, 256))
    r = 256 * 256  # one 64k wavefront
    tile = int(os.environ.get("PROBE_TILE", "512"))
    group = 8
    eps = 1e-4
    c = scene.chunk_woop.shape[0]
    cg = -(-c // group)
    emit(tris=int(scene.valid.sum()), chunks=c, groups=cg, tile=tile)

    pix = jnp.arange(r)
    offs = lane_uniforms(jax.random.key(0), 0, 0, pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)

    # Secondary-like wavefront: cosine bounce off the primary hit points.
    hit0 = closest_hit_chunks(
        o, d, scene.chunk_woop, scene.chunk_aabb_min, scene.chunk_aabb_max,
        scene.woop, eps, ray_tile=tile,
    )
    row = scene.shade_attrs[hit0.tri]
    v = row[:, 0:9].reshape(-1, 3, 3)
    e1, e2 = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    gn = jnp.cross(e1, e2)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = jnp.where((jnp.sum(gn * d, axis=-1) > 0)[:, None], -gn, gn)
    u = lane_uniforms(jax.random.key(1), 0, 0, pix, 2)
    d1 = sampling.cosine_sample(gn, u[0], u[1])
    o1 = o + hit0.t[:, None] * d
    alive1 = hit0.hit
    o1 = jnp.where(alive1[:, None], o1, 1e30)

    scene_lo = jnp.min(scene.chunk_aabb_min, axis=0)
    scene_hi = jnp.max(scene.chunk_aabb_max, axis=0)

    def ledger(oo, dd, name):
        perm = jnp.argsort(
            ray_sort_key(oo, dd, jnp.isfinite(oo[:, 0]) & (oo[:, 0] < 1e29),
                         scene_lo, scene_hi)
        )
        oo, dd = oo[perm], dd[perm]
        rays8 = jnp.concatenate(
            [oo, jnp.ones((r, 1), jnp.float32), dd,
             jnp.zeros((r, 1), jnp.float32)], axis=1)
        final = closest_hit_chunks(
            oo, dd, scene.chunk_woop, scene.chunk_aabb_min,
            scene.chunk_aabb_max, scene.woop, eps, ray_tile=tile,
        )
        # Unbounded tile activity (dense work) + entries.
        act, ent, _, _ = tile_chunk_activity(
            rays8, scene.chunk_aabb_min, scene.chunk_aabb_max, eps, tile)
        # Ideal tile activity: bounded by each ray's FINAL t.
        act_i, _, _, _ = tile_chunk_activity(
            rays8, scene.chunk_aabb_min, scene.chunk_aabb_max, eps, tile,
            tbest=final.t)
        # Per-ray truth (final-bounded) on a 4k-ray subset, plain jnp slab.
        sub = slice(0, r, r // 4096)
        os_, ds_, ts_ = oo[sub], dd[sub], final.t[sub]
        inv = 1.0 / jnp.where(ds_ == 0.0, 1e-30, ds_)
        t1s = (scene.chunk_aabb_min[None] - os_[:, None]) * inv[:, None]
        t2s = (scene.chunk_aabb_max[None] - os_[:, None]) * inv[:, None]
        lo = jnp.max(jnp.minimum(t1s, t2s), axis=-1)
        hi = jnp.min(jnp.maximum(t1s, t2s), axis=-1)
        act_r = (lo <= hi) & (hi >= eps) & (lo <= ts_[:, None])

        # Two-pass ledger (mirrors closest_hit_chunks's XLA logic).
        ga, ge = _group_stats(act, ent, group)
        cap1 = min(cg, max(_env_int("TPU_PT_PASS1_MIN", 12), cg // 16))
        idx1, counts1, _ = _worklist(ga, ge, cap1)
        t_tiles = r // tile
        rows = jnp.arange(t_tiles)[:, None]
        tested = jnp.zeros((t_tiles, cg), bool).at[rows, idx1].set(True)
        # chunk visits in pass1: active chunks within tested groups
        actg = act.reshape(t_tiles, cg, group)
        p1 = jnp.sum(jnp.where(tested[:, :, None], actg, 0))
        # recheck with pass-1 tmin: approximate with final t of pass1 ==
        # run pass1-only kernel?  Use the exact recheck: bound = t after
        # pass 1.  Recompute: t1 = min over pass-1-tested chunks.  Proxy:
        # use final.t where the winner chunk is in a tested group, else inf.
        win_group = final.tri // (128 * group)
        wg_tested = jnp.take_along_axis(
            tested, win_group.reshape(t_tiles, tile), axis=1).reshape(-1)
        t1 = jnp.where(final.hit & wg_tested, final.t, jnp.inf)
        act2, _, _, _ = tile_chunk_activity(
            rays8, scene.chunk_aabb_min, scene.chunk_aabb_max, eps, tile,
            tbest=t1)
        ga2, _ = _group_stats(act2, ent, group)
        ga2 = ga2 & ~tested
        p2 = jnp.sum(jnp.where(ga2[:, :, None],
                               act2.reshape(t_tiles, cg, group), 0))
        counts2 = jnp.sum(ga2.astype(jnp.int32), axis=1)

        emit(
            wave=name,
            dense_chunk_visits=int(jnp.sum(act)),
            ideal_tile_visits=int(jnp.sum(act_i)),
            per_ray_mean_chunks=float(jnp.mean(jnp.sum(act_r, axis=1))),
            twopass_p1=int(p1),
            twopass_p2=int(p2),
            mean_counts1=float(jnp.mean(counts1)),
            mean_counts2=float(jnp.mean(counts2)),
            max_counts2=int(jnp.max(counts2)),
            hits=int(jnp.sum(final.hit)),
        )
        for mode in ("dense", "twopass"):
            f = jax.jit(lambda oo, dd, mode=mode: closest_hit_chunks(
                oo, dd, scene.chunk_woop, scene.chunk_aabb_min,
                scene.chunk_aabb_max, scene.woop, eps, ray_tile=tile,
                mode=mode))
            emit(wave=name, mode=mode, ms=round(bench(f, oo, dd), 2))

    ledger(o, d, "primary")
    ledger(o1, d1, "secondary")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
