#!/usr/bin/env python
"""On-device breakdown of the persistent-engine iteration OUTSIDE the
intersector (probe_iter's ledger: intersect 64.4 + shade ~22 + sort 3.1 +
draws 2.5 != bounce_step 119.1 — this probe hunts the unaccounted ms).

Same tunnel-RTT-free method as probe_iter: each case runs PROBE_K
iterations of one phase inside a single jitted fori_loop with chained
outputs, one dispatch, one scalar readback.

Cases (64k sorted secondary wavefront):
  intersect    scene_closest_hit (anchor, same as probe_iter)
  bounce_step  the full bounce
  hit_info     packed-row gather + normals + 4-texture fetch
  env          env_radiance over d (field scene only; atrium has no env)
  sampling     vndf/cosine/light sample + vndf/cosine pdf (no light pdf)
  light_pdf    the mixture's all-hits light pdf term (cluster or dense path)
  bsdf         pbr_brdf
  permute10    sort key + argsort + the ENGINE's 10-array carry permute
               (probe_iter's "sort" case permutes only 3 arrays)
  refill       post-bounce glue: done scatter-add, cumsum ranks, spawn
               (gen_rays + jitter draws), the where-chain
Env: PROBE_K (default 16), PROBE_R (default 65536),
     PROBE_SCENE=atrium|field (default atrium).
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
        _DRAWS,
        JITTER_DEPTH,
        bounce_step,
        gen_rays,
        hit_info,
        light_pdf_sum,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import bsdf, sampling, texture
    from tpu_pathtracer.ops.rng import lane_uniforms
    from tpu_pathtracer.ops.pallas_intersect import (
        CHUNK_TRIS,
        ray_sort_key_hint,
    )
    from tpu_pathtracer.ops.vecmath import dot, where3
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import (
        make_atrium_gltf,
        make_sphere_field_gltf,
    )

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    k_iter = int(os.environ.get("PROBE_K", "16"))
    r = int(os.environ.get("PROBE_R", "65536"))
    eps = 1e-4
    which = os.environ.get("PROBE_SCENE", "atrium")
    if which == "field":
        path = make_sphere_field_gltf(
            "/tmp/probe_body/f.gltf", 64, 3, textured=True
        )
    else:
        path = make_atrium_gltf("/tmp/probe_body/a.gltf", detail=2)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    config = RenderConfig()
    emit(scene=which, tris=int(scene.capacity), chunks=int(c),
         has_env=bool(scene.has_env), lights=int(scene.lights.capacity))

    # Realistic sorted secondary wavefront (same recipe as probe_iter).
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
    o1, d1, hint = o1[perm], d1[perm], hint[perm]
    alive_s = alive[perm]
    o1w = jnp.where(alive_s[:, None], o1, 1e30)
    hit1 = scene_closest_hit(scene, o1w, d1, eps)
    info1 = hit_info(scene, d1, hit1, config)
    pos1 = o1w + hit1.t[:, None] * d1
    thr = jnp.ones((r, 3), jnp.float32)
    rad = jnp.zeros((r, 3), jnp.float32)
    draws = per_pixel_uniforms(jax.random.key(2), pix, _DRAWS)
    jax.block_until_ready((hit1.t, info1["color"], pos1))

    def timeit(name, fn, *args):
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
             ms_per_iter=round(best / k_iter, 2), k=k_iter, chk=s)

    def loop_intersect(oo, dd):
        def body(_, carry):
            oc, dc = carry
            h = scene_closest_hit(scene, oc, dc, eps)
            t = jnp.where(jnp.isfinite(h.t), h.t, 0.0)
            return (oc + (t * 1e-9)[:, None] * dc, dc)

        return jax.lax.fori_loop(0, k_iter, body, (o1w, d1))[0]

    def loop_bounce(oo, dd):
        def body(_, carry):
            oc, dc, tc, rc, ac = carry
            oc, dc, tc, rc, ac, _ = bounce_step(
                scene, config, oc, dc, tc, rc, ac, draws
            )
            return (oc, dc, tc, rc, ac)

        return jax.lax.fori_loop(0, k_iter, body, (o1w, d1, thr, rad, alive_s))[0]

    def loop_hit_info(bb):
        def body(_, b):
            h = hit1._replace(beta=b)
            info = hit_info(scene, d1, h, config)
            return b + info["color"][:, 0] * 1e-9  # chain

        return jax.lax.fori_loop(0, k_iter, body, bb)

    def loop_env(dd):
        def body(_, dc):
            env = texture.env_radiance(
                scene.atlas, scene.env_tex, scene.bg_color, dc, True
            )
            return dc + env * 1e-12

        return jax.lax.fori_loop(0, k_iter, body, dd)

    def loop_sampling(dd):
        alpha_r2 = jnp.maximum(info1["roughness"], config.min_roughness) ** 2
        lights = scene.lights

        def body(_, dc):
            vd = sampling.vndf_sample(
                alpha_r2, dc, info1["shading_normal"], draws[2], draws[3]
            )
            cd = sampling.cosine_sample(info1["normal"], draws[5], draws[6])
            if lights.capacity > 0:
                li = sampling.pick_uniform(draws[7], lights.count)
                lv = lights.verts[li]
                ld = sampling.light_triangle_sample(
                    pos1, lv[:, 0], lv[:, 1], lv[:, 2], draws[8], draws[9]
                )
                nd = where3(draws[1] <= config.vndf_factor, vd,
                            where3(draws[4] < 0.5, ld, cd))
            else:
                nd = where3(draws[1] <= config.vndf_factor, vd, cd)
            pv = sampling.vndf_pdf(
                alpha_r2, dc, info1["shading_normal"], nd, eps
            )
            pc = sampling.cosine_pdf(info1["normal"], nd)
            return dc + nd * 1e-12 + (pv + pc)[:, None] * 1e-15

        return jax.lax.fori_loop(0, k_iter, body, dd)

    def loop_light_pdf(dd):
        lights = scene.lights
        use_clusters = (
            lights.has_clusters and lights.capacity > 512
            and jax.default_backend() in ("tpu", "axon") and r % 256 == 0
        )
        emit(light_path="clusters" if use_clusters else "dense",
             light_cap=int(lights.capacity))

        def body(_, dc):
            if use_clusters:
                from tpu_pathtracer.ops.pallas_intersect import (
                    RAY_TILE, light_pdf_sum_chunks,
                )
                p = light_pdf_sum_chunks(
                    pos1, dc, lights.cluster_woop, lights.cluster_k,
                    lights.cluster_min, lights.cluster_max, lights.count,
                    eps, ray_tile=RAY_TILE if r % RAY_TILE == 0 else 256,
                )
            else:
                p = light_pdf_sum(
                    pos1, dc, lights.verts, lights.normal, lights.area,
                    lights.count, eps,
                )
            return dc + p[:, None] * 1e-15

        return jax.lax.fori_loop(0, k_iter, body, dd)

    def loop_bsdf(dd):
        def body(_, dc):
            f = bsdf.pbr_brdf(
                dc, d1, info1["shading_normal"], info1["color"][:, :3],
                info1["metallic"], info1["roughness"], info1["ior"],
                config.min_roughness,
            )
            return dc + f * 1e-12

        return jax.lax.fori_loop(0, k_iter, body, dd)

    def loop_permute10(oo, dd, hh):
        # The engine's real sort: key + argsort + 10-array carry permute
        # (three [r,3] f32, one [r,3] f32 radiance, six [r] scalars).
        tc, rc = thr, rad

        def body(i, carry):
            oc, dc, hc, tc_, rc_, a1, a2, a3, a4, a5 = carry
            kk = ray_sort_key_hint(dc, alive_s, hc, c)
            p = jnp.argsort(kk + i)
            return (oc[p], dc[p], hc[p], tc_[p], rc_[p],
                    a1[p], a2[p], a3[p], a4[p], a5[p])

        z = jnp.zeros((r,), jnp.int32)
        return jax.lax.fori_loop(
            0, k_iter, body,
            (oo, dd, hh, tc, rc, z, z + 1, z + 2, alive_s.astype(jnp.int32),
             z + 3),
        )[0]

    def loop_refill(oo):
        # Post-bounce glue, shapes/ops matching persistent_accum's body.
        slot0 = jnp.arange(r, dtype=jnp.int32)
        accum0 = jnp.zeros((r, 3), jnp.float32)

        def body(i, carry):
            oc, accum, nw = carry
            done = (slot0 + i) % 3 == 0  # ~1/3 lanes finish
            contrib = jnp.where(done[:, None], rad + 1.0, 0.0)
            accum = accum.at[jnp.where(done, slot0, r)].add(
                contrib, mode="drop"
            )
            free = done
            rank = jnp.cumsum(free.astype(jnp.int32)) - 1
            work_ids = nw + rank
            take = free & (work_ids < (1 << 24))
            w = jnp.where(take, work_ids, 0)
            slot = (w % r).astype(jnp.int32)
            s = (w // r).astype(jnp.int32)
            offs2 = lane_uniforms(jax.random.key(9), s, JITTER_DEPTH, slot, 2)
            no, nd = gen_rays(scene.camera, slot, offs2)
            oc = where3(take, no, oc)
            nw = nw + jnp.sum(free.astype(jnp.int32))
            return (oc, accum, nw)

        return jax.lax.fori_loop(
            0, k_iter, body, (oo, accum0, jnp.asarray(r, jnp.int32))
        )[0]

    timeit("intersect", loop_intersect, o1w, d1)
    timeit("bounce_step", loop_bounce, o1w, d1)
    timeit("hit_info", loop_hit_info, hit1.beta)
    if scene.has_env:
        timeit("env", loop_env, d1)
    timeit("sampling", loop_sampling, d1)
    if scene.lights.capacity > 0:
        timeit("light_pdf", loop_light_pdf, d1)
    timeit("bsdf", loop_bsdf, d1)
    timeit("permute10", loop_permute10, o1w, d1, hint)
    timeit("refill", loop_refill, o1w)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
