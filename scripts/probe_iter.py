#!/usr/bin/env python
"""On-device per-iteration phase breakdown (tunnel-RTT-free).

Each case runs K iterations of one bounce phase inside a single jitted
fori_loop (outputs chained into inputs so nothing folds away), ONE
dispatch, one scalar readback — per-iteration cost is then accurate to
well under a millisecond, unlike per-call probes whose every sample pays
an unknown tunnel round-trip (probe_bounce's draws-only case measured
94 ms — that is all RTT).

Cases (64k sorted secondary wavefront on the atrium, detail 2):
  intersect   closest_hit_chunks
  sort        sort key + argsort + permute of the 8-array carry
  shade       bounce_step minus its intersect (reported as difference)
  draws       threefry lane draws
Env: PROBE_K (iterations, default 16), PROBE_R (rays, default 65536).
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
    import numpy as np
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import (
        _DRAWS,
        bounce_step,
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops.rng import lane_uniforms
    from tpu_pathtracer.ops import sampling
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
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_iter/a.gltf", detail=2)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    config = RenderConfig()

    # Realistic secondary wavefront: trace primaries, cosine-bounce, SORT
    # by the shipped hint key (what the engine's intersector actually sees).
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
    o1 = jnp.where(alive_s[:, None], o1, 1e30)

    thr = jnp.ones((r, 3), jnp.float32)
    rad = jnp.zeros((r, 3), jnp.float32)
    draws = per_pixel_uniforms(jax.random.key(2), pix, _DRAWS)

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
            # Chain: nudge origins by a hit-dependent epsilon (keeps rays
            # in place so per-iteration work stays realistic).
            t = jnp.where(jnp.isfinite(h.t), h.t, 0.0)
            oc = oc + (t * 1e-9)[:, None] * dc
            return (oc, dc)

        return jax.lax.fori_loop(0, k_iter, body, (oo, dd))[0]

    def loop_sort(oo, dd, hh):
        def body(i, carry):
            oc, dc, hc = carry
            kk = ray_sort_key_hint(dc, alive_s, hc, c)
            p = jnp.argsort(kk + i)  # +i: new key each iter, no caching
            return (oc[p], dc[p], hc[p])

        return jax.lax.fori_loop(0, k_iter, body, (oo, dd, hh))[0]

    def loop_bounce(oo, dd):
        def body(_, carry):
            oc, dc, tc, rc, ac = carry
            oc, dc, tc, rc, ac, _ = bounce_step(
                scene, config, oc, dc, tc, rc, ac, draws
            )
            return (oc, dc, tc, rc, ac)

        return jax.lax.fori_loop(
            0, k_iter, body, (oo, dd, thr, rad, alive_s)
        )[0]

    def loop_draws(px):
        def body(i, carry):
            dr = lane_uniforms(jax.random.key(3), 0, i, carry, _DRAWS)
            return px + dr[0].astype(jnp.int32)  # chain

        return jax.lax.fori_loop(0, k_iter, body, px)

    config_untex = dataclasses.replace(config, use_textures=False)

    def loop_bounce_untex(oo, dd):
        def body(_, carry):
            oc, dc, tc, rc, ac = carry
            oc, dc, tc, rc, ac, _ = bounce_step(
                scene, config_untex, oc, dc, tc, rc, ac, draws
            )
            return (oc, dc, tc, rc, ac)

        return jax.lax.fori_loop(
            0, k_iter, body, (oo, dd, thr, rad, alive_s)
        )[0]

    timeit("intersect", loop_intersect, o1, d1)
    timeit("sort", loop_sort, o1, d1, hint)
    timeit("bounce_step", loop_bounce, o1, d1)
    timeit("bounce_untex", loop_bounce_untex, o1, d1)
    timeit("draws", loop_draws, pix)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
