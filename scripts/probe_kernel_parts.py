#!/usr/bin/env python
"""Isolate intersector sub-kernels on the real chip.

Times (per call, 16 iters, minus an empty-dispatch baseline):
  - noop: a trivial jitted fn (measures dispatch/tunnel floor)
  - activity: the slab-test prepass kernel alone
  - main: the grouped chunk kernel alone (prepass precomputed)
  - full: closest_hit_chunks end to end
for primary and incoherent 16k-ray batches, plus group sweep.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(f, *args, n=16):
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
    from tpu_pathtracer.ops.pallas_intersect import (
        closest_hit_chunks,
        tile_chunk_activity,
        _bitpack,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_sphere_field_gltf

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    path = make_sphere_field_gltf("/tmp/probe_parts/field.gltf", 64, 3)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    r = 16384

    pix = jnp.arange(r) + 300 * 512
    offs = lane_uniforms(jax.random.key(0), 0, 0, pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    rng = np.random.default_rng(1)
    d2 = rng.normal(size=(r, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    o2 = jnp.asarray(
        np.asarray(o)
        + rng.uniform(0, 5, size=(r, 1)).astype(np.float32) * np.asarray(d)
    )
    d2 = jnp.asarray(d2)

    noop = jax.jit(lambda x: x + 1.0)
    base = bench(noop, jnp.zeros((8, 128), jnp.float32))
    emit(part="noop", ms=round(base, 2))

    def pack_rays(oo, dd):
        return jnp.concatenate(
            [oo, jnp.ones((r, 1), jnp.float32), dd,
             jnp.zeros((r, 1), jnp.float32)], axis=1,
        )

    act_f = jax.jit(
        lambda oo, dd: tile_chunk_activity(
            pack_rays(oo, dd), scene.chunk_aabb_min, scene.chunk_aabb_max,
            1e-4,
        )
    )
    for name, (oo, dd) in (("primary", (o, d)), ("incoherent", (o2, d2))):
        a, _ent, _sub, _sub_ent = act_f(oo, dd)
        emit(
            part="activity", rays=name, ms=round(bench(act_f, oo, dd) - base, 2),
            frac_active=round(float(jnp.mean(a.astype(jnp.float32))), 3),
        )
        for mode in ("dense", "twopass"):
            f = jax.jit(
                lambda oo, dd, mode=mode: closest_hit_chunks(
                    oo, dd, scene.chunk_woop, scene.chunk_aabb_min,
                    scene.chunk_aabb_max, scene.woop, 1e-4, mode=mode,
                )
            )
            h = f(oo, dd)
            emit(
                part="full", rays=name, mode=mode,
                ms=round(bench(f, oo, dd) - base, 2), hits=int(h.hit.sum()),
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
