#!/usr/bin/env python
"""On-chip microprobe: what does a predicated sub-tile REGION cost?

probe_granfloor measured the t-bounded pair-ALU floors: r8 sub-tiles cut
pair work 4.0x vs the production r64 (135.8M vs 536.6M pairs) at 5.02 vs
2.48 active regions per chunk visit.  Whether that is a real win depends
entirely on the fixed cost of one @pl.when region ([rows, 128] pair test,
min-accumulate) — round 3 measured sub_rows 32 neutral-to-worse, implying
~0.2-0.3 us/region, which would ERASE the r8 gain.  This probe prices the
region directly: an items-style kernel (one 8-chunk group per grid step,
scalar-prefetched multi-word masks, the production _contract forms) runs
M steps at sub_rows in {512, 64, 32, 16, 8} with random masks whose
active-region density per chunk matches the measured regions/visit
(probe_granfloor), plus a BANDED variant at sub_rows 8 (outer @pl.when on
each 64-ray band's 8-bit field, inner on the fine bits) that skips dead
bands' region setup wholesale.

Prints per-config: ms/step, effective Gpairs/s on ACTIVE pairs, and the
implied per-region overhead vs the straight-line n_sub=1 baseline.
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# regions/visit measured by probe_granfloor (t-bounded atrium secondaries).
DENSITY = {8: 5.02, 16: 4.06, 32: 3.23, 64: 2.48, 512: 1.0}


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_pathtracer.ops.pallas_intersect import (
        _chunk_body, _chunk_body_sub,
    )
    from tpu_pathtracer.models.pathtracer import (
        gen_rays, per_pixel_uniforms,
    )
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    m_steps = int(os.environ.get("PROBE_M", "8192"))
    group = 8
    ray_tile = 512
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_region/a.gltf", detail=2)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    wc = scene.chunk_woop
    cg = wc.shape[0] // group

    pix = jnp.arange(ray_tile, dtype=jnp.int32) * 29 % (512 * 512)
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    rays = jnp.concatenate(
        [o, jnp.ones((ray_tile, 1), jnp.float32), d,
         jnp.zeros((ray_tile, 1), jnp.float32)], axis=1)
    jax.block_until_ready(rays)
    rng = np.random.default_rng(7)
    groups_np = rng.integers(0, cg, size=m_steps).astype(np.int32)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def make_kernel(n_sub, banded):
        words = max(1, n_sub // 32) if n_sub > 1 else 1
        rows = ray_tile // n_sub if n_sub > 1 else ray_tile

        def kernel(wl_ref, rays_ref, wc_ref, tmin_ref, tidx_ref):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _init():
                tmin_ref[:] = jnp.full_like(tmin_ref, jnp.inf)
                tidx_ref[:] = jnp.zeros_like(tidx_ref)

            r_blk = rays_ref[:]
            o1 = r_blk[:, 0:4]
            d0 = r_blk[:, 4:8]
            for g in range(group):
                if n_sub == 1:
                    word = wl_ref[1 + g * words, s]

                    @pl.when(word != 0)
                    def _chunk(g=g):
                        _chunk_body(o1, d0, wc_ref, tmin_ref, tidx_ref, g,
                                    g, eps)
                elif not banded:
                    for st in range(n_sub):
                        word = wl_ref[1 + g * words + st // 32, s]

                        @pl.when(((word >> (st % 32)) & 1) != 0)
                        def _sub(g=g, st=st):
                            _chunk_body_sub(o1, d0, wc_ref, tmin_ref,
                                            tidx_ref, g, g, st, rows, eps)
                else:
                    # Banded: outer gate per 64-ray band (8 fine bits),
                    # inner gate per fine sub-tile.
                    fine_per_band = n_sub // 8
                    for band in range(8):
                        base = band * fine_per_band
                        word_b = wl_ref[1 + g * words + base // 32, s]
                        shift = base % 32
                        fld = (word_b >> shift) & ((1 << fine_per_band) - 1)

                        @pl.when(fld != 0)
                        def _band(g=g, base=base, word_b=word_b,
                                  shift=shift, fine_per_band=fine_per_band):
                            for k in range(fine_per_band):
                                @pl.when(((word_b >> (shift + k)) & 1) != 0)
                                def _sub(g=g, st=base + k):
                                    _chunk_body_sub(
                                        o1, d0, wc_ref, tmin_ref, tidx_ref,
                                        g, g, st, rows, eps)

        return kernel, words, rows

    results = {}
    for n_sub, banded in ((1, False), (8, False), (16, False), (32, False),
                          (64, False), (64, True)):
        kernel, words, rows = make_kernel(n_sub, banded)
        sub_key = 512 // n_sub if n_sub > 1 else 512
        density = DENSITY[sub_key] / n_sub if n_sub > 1 else 1.0
        bits = rng.random((m_steps, group, max(n_sub, 1))) < density
        # Guarantee at least the fully-dead chunk case also appears: leave
        # bits as drawn (some chunks get zero active regions).
        wl = np.zeros((1 + group * words, m_steps), np.int32)
        wl[0] = groups_np
        if n_sub == 1:
            for g in range(group):
                wl[1 + g] = bits[:, g, 0]
        else:
            for g in range(group):
                for st in range(n_sub):
                    wl[1 + g * words + st // 32] |= (
                        bits[:, g, st].astype(np.int32) << (st % 32)
                    )
        active_regions = int(bits.sum())
        pairs = active_regions * rows * wc.shape[-1]
        wl_j = jnp.asarray(wl)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_steps,),
            in_specs=[
                pl.BlockSpec((ray_tile, 8), lambda s, wl_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((group, 12, wc.shape[-1]),
                             lambda s, wl_ref: (wl_ref[0, s], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((ray_tile, 1), lambda s, wl_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ray_tile, 1), lambda s, wl_ref: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        wc_g = wc.reshape(cg, group, 12, wc.shape[-1]).reshape(
            cg * group, 12, wc.shape[-1])

        fn = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((ray_tile, 1), jnp.float32),
                jax.ShapeDtypeStruct((ray_tile, 1), jnp.int32),
            ],
        )
        f = jax.jit(lambda w, r: fn(w, r, wc_g))
        t_out, _ = f(wl_j, rays)
        jax.block_until_ready(t_out)
        best = None
        for _ in range(3):
            t0 = time.time()
            out = f(wl_j, rays)
            jax.block_until_ready(out)
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        name = f"sub{512 // n_sub if n_sub > 1 else 512}" + (
            "_banded" if banded else "")
        us_step = best * 1000 / m_steps
        gpairs = pairs / (best / 1000) / 1e9
        results[name] = {
            "ms": round(best, 2), "us_per_step": round(us_step, 3),
            "active_regions": active_regions,
            "gpairs_active": round(gpairs, 1),
        }
        emit(case=name, **results[name])

    # Implied net on the bench floors: pairs at each granularity
    # (probe_granfloor) / the measured active-pair rate + region tax.
    os.makedirs("out", exist_ok=True)
    with open("out/probe_region.json", "w") as f_:
        json.dump(results, f_, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
