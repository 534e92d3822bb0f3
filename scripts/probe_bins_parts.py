#!/usr/bin/env python
"""Decompose the bins-mode loss (probe_isect measured 168.9 ms/iter vs the
cascade's 36.4 on atrium secondaries): time each stage of the binned
intersect separately — the per-ray activity kernel, the worklist glue
(nonzero + cumsums + scatters), the binned ray gather, the items-kernel
pass, and the scatter-min epilogue — so the dead end is charged to the
right line before round 4 considers fusing any of it into Pallas.

Same RTT-immune method as probe_isect: chained fori_loop, one readback.
Env: PROBE_K (default 8), PROBE_R (default 65536).
"""

import dataclasses
import functools
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

    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.ops.pallas_intersect import (
        _GROUP,
        _bins_worklist,
        ray_group_bools,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    k_iter = int(os.environ.get("PROBE_K", "8"))
    r = int(os.environ.get("PROBE_R", "65536"))
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_binsp/a.gltf", detail=2)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    cg = -(-c // _GROUP)

    # Secondary wavefront (probe_body recipe, unsorted is fine here — the
    # bins structure is sort-independent by construction).
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
        [o1, jnp.ones((r, 1), jnp.float32), d1, jnp.zeros((r, 1), jnp.float32)],
        axis=1,
    )
    jax.block_until_ready(rays)

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
        print(json.dumps(dict(case=name, ms_total=round(best, 1),
                              ms_per_iter=round(best / k_iter, 2),
                              k=k_iter, chk=s)), flush=True)

    cmin, cmax = scene.chunk_aabb_min, scene.chunk_aabb_max
    p_cap = r * 12

    def loop_gb(rr):
        def body(_, acc):
            gb = ray_group_bools(rr, cmin, cmax, eps)
            return acc + gb[0, :1].astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    gb0 = ray_group_bools(rays, cmin, cmax, eps)[:cg]
    jax.block_until_ready(gb0)

    def loop_worklist(gb):
        def body(i, acc):
            r_pad, bgrp, n_blocks, ovf = _bins_worklist(gb + i * 0, 512, p_cap)
            return acc + n_blocks.astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros(()))

    r_pad0, bgrp0, n_blocks0, ovf0 = _bins_worklist(gb0, 512, p_cap)
    jax.block_until_ready((r_pad0, bgrp0))
    print(json.dumps(dict(
        case="shape", groups=int(cg), p_cap=int(p_cap),
        p_pad_cap=int(r_pad0.shape[0]),
        n_blocks=int(n_blocks0), overflow=bool(ovf0),
        live_rows=int(jnp.sum(r_pad0 >= 0)),
    )), flush=True)

    def loop_gather(rr):
        def body(i, acc):
            live = r_pad0 >= 0
            rb = rr[jnp.clip(r_pad0 + i * 0, 0)]
            rb = jnp.concatenate(
                [jnp.where(live[:, None], rb[:, 0:4], 1e30), rb[:, 4:8]],
                axis=1,
            )
            return acc + rb[0, :1] * 1e-12

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    def loop_scatter(tt):
        def body(i, acc):
            live = r_pad0 >= 0
            rid = jnp.where(live, r_pad0, r)
            t_flat = jnp.where(live, tt + i * 1e-9, jnp.inf)
            tb = (
                jnp.full((r + 1,), jnp.inf, jnp.float32)
                .at[rid].min(t_flat, mode="drop")
            )
            won = live & jnp.isfinite(t_flat) & (t_flat == tb[rid])
            trib = (
                jnp.full((r + 1,), jnp.int32(1 << 30))
                .at[jnp.where(won, rid, r)]
                .min((r_pad0 * 3) % 1000, mode="drop")
            )
            return acc + jnp.where(jnp.isfinite(tb[:1]), tb[:1], 0.0) \
                + trib[:1].astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    t_fake = jnp.where(r_pad0 >= 0, 1.0 + (r_pad0 % 7).astype(jnp.float32),
                       jnp.inf)

    timeit("gb_kernel", loop_gb, rays)
    timeit("worklist_glue", loop_worklist, gb0)
    timeit("ray_gather", loop_gather, rays)
    timeit("scatter_min", loop_scatter, t_fake)

    # The items-kernel pass alone on the precomputed binned rows.
    import jax.experimental.pallas as pl  # noqa: F401  (import check)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpu_pathtracer.ops.pallas_intersect import _kernel_items

    live = r_pad0 >= 0
    rb0 = rays[jnp.clip(r_pad0, 0)]
    rb0 = jnp.concatenate(
        [jnp.where(live[:, None], rb0[:, 0:4], 1e30), rb0[:, 4:8]], axis=1
    )
    nb_cap = r_pad0.shape[0] // 512
    wl0 = jnp.stack(
        [
            jnp.arange(nb_cap, dtype=jnp.int32),
            bgrp0,
            jnp.full((nb_cap,), -1, jnp.int32),
            jnp.full((nb_cap,), -1, jnp.int32),
        ]
    )
    p_pad = r_pad0.shape[0]
    jax.block_until_ready((rb0, wl0))

    def loop_kernel(rb):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(jnp.maximum(n_blocks0, 1),),
            in_specs=[
                pl.BlockSpec(
                    (512, 8), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (512, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (512, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (_GROUP, 12, 128), lambda s, wl_ref: (wl_ref[1, s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (512, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (512, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        )

        def body(i, acc):
            t_rows, _ = pl.pallas_call(
                functools.partial(
                    _kernel_items, min_dst=eps, group=_GROUP, n_sub=1
                ),
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
                    jax.ShapeDtypeStruct((p_pad, 1), jnp.int32),
                ],
            )(wl0, rb + i * 0.0,
              jnp.full((p_pad, 1), jnp.inf, jnp.float32),
              jnp.zeros((p_pad, 1), jnp.int32), scene.chunk_woop)
            return acc + jnp.where(
                jnp.isfinite(t_rows[:1, 0]), t_rows[:1, 0], 0.0
            ) * 1e-9

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("kernel_pass", loop_kernel, rb0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
