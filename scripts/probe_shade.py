#!/usr/bin/env python
"""On-device breakdown of the SHADE stage (everything in bounce_step that is
not the intersector).  probe_iter measured shade/NEE at ~55 ms per 64k-ray
iteration on atrium secondaries — nearly as large as intersect — but as one
opaque lump.  This probe times each component in the same RTT-immune way
(K iterations inside one jitted fori_loop, outputs chained into inputs, one
scalar readback).

Cases (64k sorted secondary wavefront, atrium detail 2):
  gather48      the [R, 48] shade_attrs row gather alone
  hitinfo_tex   full hit_info (gather + 4-texture fetch + frames)
  hitinfo_untex hit_info with textures off
  tex4          sample_many (fused 16-corner bilinear + gamma) alone
  vndf          vndf_sample + vndf_pdf
  cosine        cosine_sample + cosine_pdf
  lightsmp      light pick + triangle sample + dense light_pdf_sum
  bsdf          pbr_brdf
  bounce        full bounce_step (reference total)

Env: PROBE_K (default 16), PROBE_R (default 65536), PROBE_DETAIL (2).
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
        bounce_step,
        gen_rays,
        hit_info,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import bsdf, sampling, texture
    from tpu_pathtracer.ops.intersect import light_pdf_sum
    from tpu_pathtracer.ops.pallas_intersect import (
        CHUNK_TRIS,
        ray_sort_key_hint,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    k_iter = int(os.environ.get("PROBE_K", "16"))
    r = int(os.environ.get("PROBE_R", "65536"))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_shade/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    config = RenderConfig()
    lights = scene.lights

    # Same realistic secondary wavefront construction as probe_iter.
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
    # The shade inputs: the REAL secondary hit (what bounce_step shades).
    hit1 = scene_closest_hit(scene, o1, d1, eps)
    gn1 = gn[perm]
    draws = per_pixel_uniforms(jax.random.key(2), pix, _DRAWS)
    thr = jnp.ones((r, 3), jnp.float32)
    rad = jnp.zeros((r, 3), jnp.float32)
    n_tris = scene.shade_attrs.shape[0]

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

    def chained(body):
        """fori_loop wrapper chaining an int32 offset through iterations so
        nothing is loop-invariant (XLA hoists invariant work out of loops)."""

        def run():
            def step(i, carry):
                off, acc = carry
                out = body(off)
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(leaf.astype(jnp.float32).ravel()[:8])
                off = (off + 1) % 7
                return (off, acc)

            return jax.lax.fori_loop(0, k_iter, step, (jnp.int32(0), 0.0))[1]

        return run

    def tri_of(off):
        return (hit1.tri + off) % n_tris

    def hit_of(off):
        return hit1._replace(tri=tri_of(off))

    timeit("gather48", chained(lambda off: scene.shade_attrs[tri_of(off)]))
    timeit(
        "hitinfo_tex",
        chained(lambda off: hit_info(scene, d1, hit_of(off), config)),
    )
    config_untex = dataclasses.replace(config, use_textures=False)
    timeit(
        "hitinfo_untex",
        chained(lambda off: hit_info(scene, d1, hit_of(off), config_untex)),
    )

    uv0 = per_pixel_uniforms(jax.random.key(4), pix, 2)
    uvs = jnp.stack([uv0[0], uv0[1]], axis=-1)
    tex_ids = jnp.stack(
        [
            row[:, 43].astype(jnp.int32),
            row[:, 44].astype(jnp.int32),
            row[:, 45].astype(jnp.int32),
            row[:, 46].astype(jnp.int32),
        ],
        axis=1,
    )

    def tex4_body(off):
        uv = jnp.mod(uvs + off.astype(jnp.float32) * 0.013, 1.0)
        return texture.sample_many(scene.atlas, tex_ids, uv, (2.2, 2.2, 1.0, 1.0))

    timeit("tex4", chained(tex4_body))

    alpha2 = jnp.full((r,), 0.25**2, jnp.float32)

    def vndf_body(off):
        dd = sampling.vndf_sample(
            alpha2, d1, gn1, draws[2] * (1.0 - 1e-6) ** off, draws[3]
        )
        return sampling.vndf_pdf(alpha2, d1, gn1, dd, eps)

    timeit("vndf", chained(vndf_body))

    def cos_body(off):
        dd = sampling.cosine_sample(gn1, draws[5] * (1.0 - 1e-6) ** off, draws[6])
        return sampling.cosine_pdf(gn1, dd)

    timeit("cosine", chained(cos_body))

    pos1 = o1 + jnp.where(jnp.isfinite(hit1.t), hit1.t, 0.0)[:, None] * d1

    def light_body(off):
        li = sampling.pick_uniform(
            jnp.mod(draws[7] + off.astype(jnp.float32) * 0.013, 1.0),
            lights.count,
        )
        lv = lights.verts[li]
        ld = sampling.light_triangle_sample(
            pos1, lv[:, 0], lv[:, 1], lv[:, 2], draws[8], draws[9]
        )
        return light_pdf_sum(
            pos1, ld, lights.verts, lights.normal, lights.area, lights.count,
            eps,
        )

    timeit("lightsmp", chained(light_body))

    color = jnp.broadcast_to(jnp.array([0.7, 0.6, 0.5]), (r, 3))
    metallic = jnp.full((r,), 0.3, jnp.float32)
    rough = jnp.full((r,), 0.4, jnp.float32)
    ior = jnp.full((r,), 1.5, jnp.float32)

    def bsdf_body(off):
        dd = sampling.cosine_sample(gn1, draws[5] * (1.0 - 1e-6) ** off, draws[6])
        return bsdf.pbr_brdf(
            d1, dd, gn1, color, metallic, rough, ior, config.min_roughness
        )

    timeit("bsdf", chained(bsdf_body))

    def loop_bounce(oo, dd):
        def body(_, carry):
            oc, dc, tc, rc, ac = carry
            oc, dc, tc, rc, ac, _ = bounce_step(
                scene, config, oc, dc, tc, rc, ac, draws
            )
            return (oc, dc, tc, rc, ac)

        return jax.lax.fori_loop(0, k_iter, body, (oo, dd, thr, rad, alive_s))[0]

    timeit("bounce", loop_bounce, o1, d1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
