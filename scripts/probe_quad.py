#!/usr/bin/env python
"""Single-session A/B: sample_many with the quad pool vs the flat pool.

Cross-session chip timings vary with relay congestion; this probe times
both texture-fetch layouts (and full hit_info with each) in ONE process so
the comparison is clean.  Env: PROBE_K (16), PROBE_R (65536).

The quad pool is opt-in (TPU_PT_QUAD_MAX texel cap, default 0 = off); the
probe force-enables it for its own scene load so the A/B always has both
layouts to time."""

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
        hit_info,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import texture
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    k_iter = int(os.environ.get("PROBE_K", "16"))
    r = int(os.environ.get("PROBE_R", "65536"))
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_quad/a.gltf", detail=2)
    os.environ.setdefault("TPU_PT_QUAD_MAX", str(1 << 26))  # force the pool on
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    config = RenderConfig()
    assert scene.atlas.quad is not None
    scene_flat = dataclasses.replace(
        scene, atlas=dataclasses.replace(scene.atlas, quad=None)
    )

    pix = jnp.arange(r, dtype=jnp.int32) % (512 * 512)
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    hit0 = scene_closest_hit(scene, o, d, eps)
    row = scene.shade_attrs[hit0.tri]
    tex_ids = jnp.stack(
        [row[:, 43 + i].astype(jnp.int32) for i in range(4)], axis=1
    )
    uv0 = per_pixel_uniforms(jax.random.key(4), pix, 2)
    uvs = jnp.stack([uv0[0], uv0[1]], axis=-1)
    n_tris = scene.shade_attrs.shape[0]

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
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(leaf.astype(jnp.float32).ravel()[:8])
                return ((off + 1) % 7, acc)

            return jax.lax.fori_loop(0, k_iter, step, (jnp.int32(0), 0.0))[1]

        return run

    for name, sc in (("quad", scene), ("flat", scene_flat)):
        def tex_body(off, sc=sc):
            uv = jnp.mod(uvs + off.astype(jnp.float32) * 0.013, 1.0)
            return texture.sample_many(
                sc.atlas, tex_ids, uv, (2.2, 2.2, 1.0, 1.0)
            )

        def hi_body(off, sc=sc):
            h = hit0._replace(tri=(hit0.tri + off) % n_tris)
            return hit_info(sc, d, h, config)

        timeit(f"tex4_{name}", chained(tex_body))
        timeit(f"hitinfo_{name}", chained(hi_body))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
