#!/usr/bin/env python
"""Round-4 de-risk probe for the FUSED per-ray bins intersector (VERDICT r3
next #1): before building bins2, measure each candidate primitive of the
design on chip, because round 3's bins mode died on exactly these XLA-glue
costs (scatter-min 25.4 ms over 895k rows, gather 5.5 ms, glue 4.3 —
probe_bins_parts).

Stages measured (atrium detail 2, 64k cosine secondaries, chained fori_loop
with one readback — the RTT-immune method):

  scatter_cap6      the r3 scatter-min epilogue at a TIGHT row cap (the r3
                    probe ran 895k rows = cap 12R + group padding; true live
                    rows are ~278k, so cap 6R halves the dead work)
  scatter_sorted    same, ray-major-sorted ids + indices_are_sorted=True
                    (ray-major binning gives sorted ids for free)
  segmin_scan       segmented min via associative_scan over ray-major rows
                    (flags = segment starts) + per-ray pick at segment ends
                    — the scatter-free epilogue candidate
  topk_groups       jax.lax.top_k(K=12) over the per-ray [R, CG] group-entry
                    matrix — the "per-ray traversal list without nonzero"
                    candidate
  gather_p          [P, 8] f32 row gather from the [R, 8] ray array at
                    P = 2R/4R/6R (the binned-ray fetch)
  rank_cumsum       cumsum of the [CG, R] bit matrix along rays (the rank
                    glue that connects chunk-major and ray-major orders)
  nonzero_p         jnp.nonzero over the [CG, R] bits at size = cap
                    (worklist build)

Env: PROBE_K (default 8), PROBE_R (65536), PROBE_DETAIL (2).
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

    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import _GROUP, ray_group_bools
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    k_iter = int(os.environ.get("PROBE_K", "8"))
    r = int(os.environ.get("PROBE_R", "65536"))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_bins2/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    cg = -(-c // _GROUP)

    # Secondary wavefront (probe_bins_parts recipe).
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
    o1 = jnp.where(hit0.hit[:, None], o + hit0.t[:, None] * d, 1e30)
    rays = jnp.concatenate(
        [o1, jnp.ones((r, 1), jnp.float32), d1,
         jnp.zeros((r, 1), jnp.float32)],
        axis=1,
    )
    jax.block_until_ready(rays)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

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

    gb = ray_group_bools(rays, scene.chunk_aabb_min, scene.chunk_aabb_max,
                         eps)[:cg]
    jax.block_until_ready(gb)
    live_pairs = int(jnp.sum(gb))
    emit(case="shape", groups=int(cg), rays=r, live_pairs=live_pairs,
         pairs_per_ray=round(live_pairs / r, 2))

    # --- ray-major pair list (rows sorted by ray id) --------------------
    # nonzero over gb.T scans ray-major; the clean structural basis for a
    # scatter-free segmented-min epilogue.
    def build_raymajor(cap):
        (fid,) = jnp.nonzero(gb.T.reshape(-1) > 0, size=cap,
                             fill_value=r * cg)
        valid = fid < r * cg
        rid = jnp.where(valid, fid // cg, r).astype(jnp.int32)
        gidx = jnp.where(valid, fid % cg, 0).astype(jnp.int32)
        return rid, gidx, valid

    for mult in (4, 6):
        cap = r * mult
        rid, gidx, valid = build_raymajor(cap)
        jax.block_until_ready(rid)
        t_fake = jnp.where(valid, 1.0 + (gidx % 7).astype(jnp.float32),
                           jnp.inf)

        def loop_scatter_sorted(tt, rid=rid, cap=cap):
            def body(i, acc):
                tb = (
                    jnp.full((r + 1,), jnp.inf, jnp.float32)
                    .at[rid]
                    .min(tt + i * 1e-9, mode="drop",
                         indices_are_sorted=True)
                )
                return acc + jnp.where(jnp.isfinite(tb[:1]), tb[:1], 0.0)

            return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

        def loop_scatter_unsorted(tt, rid=rid, cap=cap):
            def body(i, acc):
                tb = (
                    jnp.full((r + 1,), jnp.inf, jnp.float32)
                    .at[rid]
                    .min(tt + i * 1e-9, mode="drop")
                )
                return acc + jnp.where(jnp.isfinite(tb[:1]), tb[:1], 0.0)

            return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

        def loop_segmin(tt, rid=rid, cap=cap):
            # Segment starts where the ray id changes; associative scan
            # carries (reset_flag, running_min); per-ray result sits at the
            # LAST row of its segment, picked by a scatter-free reverse
            # trick: seg ends = positions where the NEXT rid differs, and
            # per-ray values land via one [R]-sized gather of seg-end
            # positions derived from counts cumsum.
            def body(i, acc):
                t_i = tt + i * 1e-9
                prev = jnp.concatenate(
                    [jnp.full((1,), -1, rid.dtype), rid[:-1]]
                )
                flags = rid != prev

                def op(a, b):
                    fa, va = a
                    fb, vb = b
                    return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))

                _, vmin = jax.lax.associative_scan(op, (flags, t_i))
                counts = jnp.zeros((r + 1,), jnp.int32).at[rid].add(
                    1, mode="drop", indices_are_sorted=True
                )[:r]
                ends = jnp.cumsum(counts) - 1  # [R], -1 where count 0
                tb = jnp.where(
                    counts > 0,
                    vmin[jnp.clip(ends, 0, cap - 1)],
                    jnp.inf,
                )
                return acc + jnp.where(jnp.isfinite(tb[:1]), tb[:1], 0.0)

            return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

        def loop_gather(rr, rid=rid, cap=cap):
            def body(i, acc):
                rb = rr[jnp.clip(rid + i * 0, 0, r - 1)]
                return acc + rb[0, :1] * 1e-12

            return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

        timeit(f"scatter_sorted_cap{mult}", loop_scatter_sorted, t_fake)
        timeit(f"scatter_unsorted_cap{mult}", loop_scatter_unsorted, t_fake)
        timeit(f"segmin_scan_cap{mult}", loop_segmin, t_fake)
        timeit(f"gather_p_cap{mult}", loop_gather, rays)

    # --- per-ray K-list via top_k over the [R, CG] group matrix ---------
    gbt = (gb.T).astype(jnp.float32)  # [R, CG]
    jax.block_until_ready(gbt)

    def loop_topk(m):
        def body(i, acc):
            vals, idx = jax.lax.top_k(m + i * 0.0, 12)
            return acc + vals[:1, :1] * 1e-9 + idx[:1, :1].astype(
                jnp.float32
            ) * 1e-9

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1, 1)))

    timeit("topk12_groups", loop_topk, gbt)

    # --- rank cumsum over [CG, R] (chunk-major <-> ray-major connector) --
    def loop_rank(m):
        def body(i, acc):
            rank = jnp.cumsum(m + i * 0, axis=0)
            return acc + rank[:1, :1].astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1, 1)))

    timeit("rank_cumsum", loop_rank, gb)

    # --- nonzero worklist build at tight caps ----------------------------
    for mult in (4, 6):
        def loop_nonzero(m, mult=mult):
            def body(i, acc):
                (fid,) = jnp.nonzero(
                    (m + i * 0).reshape(-1) > 0, size=r * mult,
                    fill_value=r * cg,
                )
                return acc + fid[:1].astype(jnp.float32) * 1e-9

            return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

        timeit(f"nonzero_cap{mult}", loop_nonzero, gb)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
