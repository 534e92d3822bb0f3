#!/usr/bin/env python
"""On-chip probe: name the engine's ~12 ms/iter gap (engine ~63 ms vs the
~51 ms sum of stage timings, docs/STATUS.md item 27).

Candidates the stage probes never isolated, each fori-chained (RTT-immune):

  argsort        jnp.argsort of the [R] int32 sort key
  permute_all    take-along of the engine's FULL carry bundle (the stage
                 ledger counted only the 10-uniform permute): o, d,
                 throughput, radiance (4x [R,3]), plus 6 [R] int/bool
                 carries — 18 columns
  cond_sync      a while_loop whose body is one cheap vector op and whose
                 cond is any(alive) — prices the per-iteration
                 vector->scalar sync + loop overhead at the engine's trip
                 count
  spawn          refill math: lane_uniforms(2) + gen_rays + selects

Env: PROBE_K iterations (default 32), PROBE_R rays (65536).
"""

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

    from tpu_pathtracer.models.pathtracer import gen_rays
    from tpu_pathtracer.ops.rng import lane_uniforms
    from tpu_pathtracer.scene.types import Camera

    k_iter = int(os.environ.get("PROBE_K", "32"))
    r = int(os.environ.get("PROBE_R", str(64 * 1024)))
    key = jax.random.key(0)
    rng = jax.random.split(key, 4)
    keys = jnp.arange(r, dtype=jnp.int32) * 97103 % (1 << 20)
    vec3s = [jax.random.uniform(k, (r, 3)) for k in rng]
    ints = [
        (jnp.arange(r, dtype=jnp.int32) * m) % 7919
        for m in (3, 5, 7, 11, 13, 17)
    ]
    jax.block_until_ready((keys, vec3s, ints))

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        best = None
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(*args))
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        emit(case=name, ms_total=round(best, 2),
             ms_per_iter=round(best / k_iter, 3), k=k_iter)

    # Position-weighted sums force the FULL permutation: consuming only
    # element 0 lets XLA reduce argsort+slice to argmin (first attempt
    # measured 0.002 ms/iter -- dead code, not a sort).
    w = jax.random.uniform(rng[0], (r,))

    def loop_argsort(kk):
        def body(i, acc):
            p = jnp.argsort(kk + i)
            return acc + jnp.sum(p.astype(jnp.float32) * w)[None]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("argsort", loop_argsort, keys)

    def loop_permute(kk, v0, v1, v2, v3, i0, i1, i2, i3, i4, i5):
        def body(i, acc):
            p = jnp.argsort(kk + i)
            tot = jnp.zeros(())
            for v in (v0, v1, v2, v3):
                tot = tot + jnp.sum(v[p][:, 0] * w)
            for x in (i0, i1, i2, i3, i4, i5):
                tot = tot + jnp.sum(x[p].astype(jnp.float32) * w)
            return acc + tot[None]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("argsort_plus_permute_all", loop_permute, keys, *vec3s, *ints)

    # --- round-4b variants: can the 3.7 ms/iter carry permute be bought
    # cheaper?  Same forcing discipline (position-weighted sums). ---

    def loop_permute_vec3s(kk, v0, v1, v2, v3):
        def body(i, acc):
            p = jnp.argsort(kk + i)
            tot = jnp.zeros(())
            for v in (v0, v1, v2, v3):
                tot = tot + jnp.sum(v[p][:, 0] * w)
            return acc + tot[None]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("argsort_plus_permute_vec3s_only", loop_permute_vec3s, keys, *vec3s)

    def loop_permute_ints(kk, i0, i1, i2, i3, i4, i5):
        def body(i, acc):
            p = jnp.argsort(kk + i)
            tot = jnp.zeros(())
            for x in (i0, i1, i2, i3, i4, i5):
                tot = tot + jnp.sum(x[p].astype(jnp.float32) * w)
            return acc + tot[None]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("argsort_plus_permute_ints_only", loop_permute_ints, keys, *ints)

    # Packed: concatenate every carry into ONE [R, 18] f32 (ints bitcast),
    # permute once, split back — prices pack + 1 wide-row gather + unpack
    # against 10 narrow gathers (the flat-texture lesson: wide contiguous
    # rows gather at far better lane occupancy than minor-dim-3 arrays).
    def loop_permute_packed(kk, v0, v1, v2, v3, i0, i1, i2, i3, i4, i5):
        ivals = (i0, i1, i2, i3, i4, i5)

        def body(i, acc):
            p = jnp.argsort(kk + i)
            packed = jnp.concatenate(
                [v0, v1, v2, v3]
                + [jax.lax.bitcast_convert_type(x, jnp.float32)[:, None]
                   for x in ivals],
                axis=1,
            )
            g = packed[p]
            tot = jnp.zeros(())
            for j in range(4):
                tot = tot + jnp.sum(g[:, 3 * j] * w)
            for j in range(6):
                col = jax.lax.bitcast_convert_type(g[:, 12 + j], jnp.int32)
                tot = tot + jnp.sum(col.astype(jnp.float32) * w)
            return acc + tot[None]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("argsort_plus_permute_packed18", loop_permute_packed,
           keys, *vec3s, *ints)

    # Min-IO: sort only the intersector's inputs (o, d, one mask), run a
    # stand-in kernel, inverse-gather 4 per-ray outputs back to lane order —
    # models a "shade unsorted" engine where the other 7 carries never move.
    def loop_permute_minio(kk, v0, v1, i0):
        iota_r = jnp.arange(r, dtype=jnp.int32)

        def body(i, acc):
            p = jnp.argsort(kk + i)
            so, sd = v0[p], v1[p]
            smask = i0[p]
            # stand-in intersect outputs (4 per-ray columns)
            t = so[:, 0] * sd[:, 0] + smask.astype(jnp.float32)
            tri = (smask * 3) % 7919
            u_ = so[:, 1] * 0.5
            v_ = sd[:, 1] * 0.5
            inv = jnp.zeros((r,), jnp.int32).at[p].set(iota_r)
            tot = (jnp.sum(t[inv] * w)
                   + jnp.sum(tri[inv].astype(jnp.float32) * w)
                   + jnp.sum(u_[inv] * w) + jnp.sum(v_[inv] * w))
            return acc + tot[None]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("argsort_plus_permute_minio", loop_permute_minio,
           keys, vec3s[0], vec3s[1], ints[0])

    def loop_cond(v):
        def cond(st):
            i, x = st
            return (i < k_iter) & jnp.any(x[:, 0] < 1e30)

        def body(st):
            i, x = st
            return i + 1, x * 1.0000001

        return jax.lax.while_loop(cond, body, (jnp.int32(0), v))

    timeit("cond_sync_loop", loop_cond, vec3s[0])

    cam = Camera(
        position=jnp.zeros(3), right=jnp.array([1.0, 0, 0]),
        up=jnp.array([0, 1.0, 0]), forward=jnp.array([0, 0, 1.0]),
        fov_x=jnp.asarray(1.2), width=512, height=512,
    )

    def loop_spawn(i0):
        def body(i, acc):
            pids = (i0 + i) % (512 * 512)
            offs = lane_uniforms(key, i, 0x7FFFFFFF, pids, 2)
            o, d = gen_rays(cam, pids, offs)
            return acc + o[:1, 0] + d[:1, 0]

        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("spawn_refill", loop_spawn, ints[0])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
