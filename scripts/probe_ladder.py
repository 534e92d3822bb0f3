#!/usr/bin/env python
"""Near-ladder cap sweep for the cascade (RTT-immune chained fori_loop).

probe_isect measured pass1_cap=32 (ladder 32,96) at 61.6 ms/iter vs the
shipped (4,16) default's 70.7 on 64k atrium secondaries — the small ladder
pays 3 activity+glue+grid rounds for pruning the recheck mostly already
gives.  This sweep locates the optimum cap (and re-checks the shipped
default after any kernel change).

Env: PROBE_K (16), PROBE_R (65536), PROBE_DETAIL (2),
PROBE_CAPS (comma list, default "0,16,24,32,48,64" — 0 = shipped default).
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
    from tpu_pathtracer.ops.pallas_intersect import (
        CHUNK_TRIS,
        closest_hit_chunks,
        ray_sort_key_hint,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    k_iter = int(os.environ.get("PROBE_K", "16"))
    r = int(os.environ.get("PROBE_R", "65536"))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    caps = [int(x) for x in os.environ.get(
        "PROBE_CAPS", "0,16,24,32,48,64").split(",")]
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_ladder/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]

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
    rays8 = jnp.concatenate(
        [o1, jnp.ones((r, 1)), d1, jnp.zeros((r, 1))], axis=1
    ).astype(jnp.float32)

    def timeit(name, fn):
        f = jax.jit(fn)
        out = f()
        jax.block_until_ready(out)
        best = None
        for _ in range(2):
            t0 = time.time()
            s = float(jnp.asarray(f()).astype(jnp.float32).ravel()[0])
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        emit(case=name, ms_per_iter=round(best / k_iter, 2), k=k_iter, chk=s)

    def chained(body):
        def run():
            def step(i, carry):
                off, acc = carry
                out = body(off)
                acc = acc + jnp.sum(out.astype(jnp.float32).ravel()[:8])
                return ((off + 1) % 7, acc)

            return jax.lax.fori_loop(0, k_iter, step, (jnp.int32(0), 0.0))[1]

        return run

    for cap in caps:
        def body(off, cap=cap):
            rr = rays8 + (off.astype(jnp.float32) * 1e-7)
            return closest_hit_chunks(
                rr[:, 0:3], rr[:, 4:7], scene.chunk_woop,
                scene.chunk_aabb_min, scene.chunk_aabb_max, scene.woop,
                eps, pass1_cap=cap or None,
            ).t

        timeit(f"p1_{cap or 'default'}", chained(body))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
