#!/usr/bin/env python
"""On-device breakdown of closest_hit_chunks (the 64 ms/iter intersect).

probe_shade established the engine's per-iteration split: intersect ~64 ms,
shade ~22 ms (64k atrium secondaries).  Pair-test ALU accounts for only
~half of the 64 (sub-tile unions x 128 tris / 35 Gpairs/s); this probe
times the cascade's other moving parts the same RTT-immune way (chained
fori_loop, one readback):

  activity    one unbounded tile_chunk_activity prepass (the cascade runs
              1 + len(ladder) + residual-iters of these)
  activity_b  one best-t-bounded recheck (tbest from the real secondary hit)
  glue        group stats + front-to-back worklist + mask pack + select
              (the XLA work between passes)
  full        closest_hit_chunks, shipped twopass defaults  [= engine cost]
  dense       mode="dense" (no cascade: one prepass + bit-gated dense grid)
  p1_8        pass1_cap=8  (ladder 8,24)
  p1_32       pass1_cap=32 (ladder 32,96)

Also emits the pair-ALU floor implied by the CURRENT sub-tile activity
(sum of active (sub-tile, chunk) pairs x 64 x 128 / 35e9) so kernel
overhead = measured - floor is visible per config.

Env: PROBE_K (16), PROBE_R (65536), PROBE_DETAIL (2).
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
    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import (
        CHUNK_TRIS,
        RAY_TILE,
        _GROUP,
        _group_stats,
        _pack_group_masks,
        _worklist,
        closest_hit_chunks,
        ray_sort_key_hint,
        tile_chunk_activity,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    k_iter = int(os.environ.get("PROBE_K", "16"))
    r = int(os.environ.get("PROBE_R", "65536"))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_isect/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    del RenderConfig

    # Sorted secondary wavefront (same construction as probe_shade).
    pix = jnp.arange(r, dtype=jnp.int32) % (512 * 512)
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    hit0 = scene_closest_hit(scene, o, d, eps)
    row = scene.shade_attrs[hit0.tri]
    v = row[:, 0:9].reshape(-1, 3, 3)
    gn = jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = jnp.where((jnp.sum(gn * d, axis=-1) > 0)[:, None], -gn, gn)
    u = per_pixel_uniforms(jax.random.key(1), pix, 2)
    d1 = sampling.cosine_sample(gn, u[0], u[1])
    o1 = o + hit0.t[:, None] * d
    hint = hit0.tri // CHUNK_TRIS
    alive = hit0.hit
    key_s = ray_sort_key_hint(d1, alive, hint, c)
    perm = jnp.argsort(key_s)
    o1, d1 = o1[perm], d1[perm]
    alive_s = alive[perm]
    o1 = jnp.where(alive_s[:, None], o1, 1e30)
    hit1 = scene_closest_hit(scene, o1, d1, eps)

    rays8 = jnp.concatenate(
        [o1, jnp.ones((r, 1)), d1, jnp.zeros((r, 1))], axis=1
    ).astype(jnp.float32)
    group = _GROUP
    cg = -(-c // group)
    padc = cg * group - c
    cmin = scene.chunk_aabb_min
    cmax = scene.chunk_aabb_max
    if padc:
        cmin = jnp.concatenate([cmin, jnp.full((padc, 3), jnp.nan)])
        cmax = jnp.concatenate([cmax, jnp.full((padc, 3), jnp.nan)])

    def timeit(name, fn, *args, extra=None):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        best = None
        for _ in range(2):
            t0 = time.time()
            s = float(jnp.sum(jax.tree_util.tree_leaves(f(*args))[0]
                              .astype(jnp.float32).ravel()[:1]))
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        emit(case=name, ms_total=round(best, 1),
             ms_per_iter=round(best / k_iter, 2), k=k_iter, chk=s,
             **(extra or {}))

    def chained(body):
        def run():
            def step(i, carry):
                off, acc = carry
                out = body(off)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(leaf.astype(jnp.float32).ravel()[:8])
                return ((off + 1) % 7, acc)

            return jax.lax.fori_loop(0, k_iter, step, (jnp.int32(0), 0.0))[1]

        return run

    def shift_rays(off):
        # Chain: nudge origins by a tiny off-dependent epsilon (keeps the
        # wavefront identical in distribution, defeats loop hoisting).
        return rays8 + (off.astype(jnp.float32) * 1e-7)

    n_sub = 8

    # Pair-ALU floor from the current activity (one-off, not timed).
    _, _, sub, _ = tile_chunk_activity(rays8, cmin, cmax, eps, RAY_TILE,
                                    False, n_sub=n_sub)
    pairs = float(jnp.sum(sub > 0)) * (RAY_TILE // n_sub) * CHUNK_TRIS
    emit(case="alu_floor", pairs=pairs,
         ms_at_35g=round(pairs / 35e9 * 1000, 2))
    tb = jnp.where(jnp.isfinite(hit1.t), hit1.t, jnp.inf)
    _, _, sub_b, _ = tile_chunk_activity(rays8, cmin, cmax, eps, RAY_TILE,
                                      False, tbest=tb, n_sub=n_sub)
    pairs_b = float(jnp.sum(sub_b > 0)) * (RAY_TILE // n_sub) * CHUNK_TRIS
    emit(case="alu_floor_final_t", pairs=pairs_b,
         ms_at_35g=round(pairs_b / 35e9 * 1000, 2))

    timeit(
        "activity",
        chained(lambda off: tile_chunk_activity(
            shift_rays(off), cmin, cmax, eps, RAY_TILE, False, n_sub=n_sub
        )[2]),
    )
    timeit(
        "activity_b",
        chained(lambda off: tile_chunk_activity(
            shift_rays(off), cmin, cmax, eps, RAY_TILE, False,
            tbest=tb, n_sub=n_sub,
        )[2]),
    )

    act, ent, sub0, _ = tile_chunk_activity(
        rays8, cmin, cmax, eps, RAY_TILE, False, n_sub=n_sub
    )

    def glue_body(off):
        ga, ge = _group_stats(
            jnp.roll(act, off, axis=0), ent, group
        )
        idx, counts, _ = _worklist(ga, ge, 16)
        masks = jnp.take_along_axis(
            _pack_group_masks(jnp.roll(sub0, off, axis=0), group),
            idx[:, :, None], axis=1,
        )
        return masks

    timeit("glue", chained(glue_body))

    def full_body(mode=None, pass1_cap=None):
        def body(off):
            rr = shift_rays(off)
            return closest_hit_chunks(
                rr[:, 0:3], rr[:, 4:7], scene.chunk_woop,
                scene.chunk_aabb_min, scene.chunk_aabb_max, scene.woop,
                eps, mode=mode, pass1_cap=pass1_cap,
            ).t
        return body

    timeit("full", chained(full_body()))
    timeit("dense", chained(full_body(mode="dense")))
    timeit("p1_8", chained(full_body(pass1_cap=8)))
    timeit("p1_32", chained(full_body(pass1_cap=32)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
