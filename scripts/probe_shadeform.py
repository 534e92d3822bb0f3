#!/usr/bin/env python
"""On-chip probe: shade-stage structure in [R,3]-row vs component-[R] form.

The round-5 device trace showed ~2 ms/iter of pure layout-conversion copies
({1,0:T(8,128)} row-major <-> {0,1:T(4,128)} transposed) around the shade
stage's [R,3]/[R,1] tensors: XLA linearizes minor-dim-3 elementwise chains
into transposed layouts, then pays copies at every row-major boundary
(gather outputs, pallas inputs, concatenates).  This probe mimics the real
structure — row gather in, ~10 dots + ~40 elementwise + selects, row-major
consumer out — in both forms, fori-chained (RTT-immune).

If the component form wins big, the shade stage gets the refactor; if it's
neutral, the copies are intrinsic to the gather/kernel boundary and the
lever is dead.  Env: PROBE_K (64), PROBE_R (65536).
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

    k_iter = int(os.environ.get("PROBE_K", "64"))
    r = int(os.environ.get("PROBE_R", str(64 * 1024)))
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    table = jax.random.uniform(ks[0], (200_000, 48)) + 0.1
    tri = jax.random.randint(ks[1], (r,), 0, 200_000)
    d_in = jax.random.normal(ks[2], (r, 3))
    d_in = d_in / jnp.linalg.norm(d_in, axis=1, keepdims=True)
    u = jax.random.uniform(ks[3], (10, r))
    w = jax.random.uniform(ks[4], (r,))
    jax.block_until_ready((table, tri, d_in, u, w))

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        jax.block_until_ready(f(*args))
        best = None
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(*args))
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        emit(case=name, ms_total=round(best, 2),
             ms_per_iter=round(best / k_iter, 3), k=k_iter)

    # ---- rows form: [R,3] vectors, [:, None] broadcasts (mirrors today) ----
    def rows_once(i, d):
        row = table[(tri + i) % 200_000]  # [R, 48] gather
        e1 = row[:, 3:6] - row[:, 0:3]
        e2 = row[:, 6:9] - row[:, 0:3]
        gn = jnp.stack([
            e1[:, 1] * e2[:, 2] - e1[:, 2] * e2[:, 1],
            e1[:, 2] * e2[:, 0] - e1[:, 0] * e2[:, 2],
            e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]], axis=-1)
        gn = gn / jnp.sqrt(jnp.sum(gn * gn, axis=1, keepdims=True))
        inside = jnp.sum(gn * d, axis=1) > 0
        gn = jnp.where(inside[:, None], -gn, gn)
        # fake half-vector / sampling / brdf chain (~40 elementwise, 8 dots)
        h = gn + d
        h = h / jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
        c = jnp.stack([row[:, 33] * u[0], row[:, 34] * u[1],
                       row[:, 35] * u[2]], axis=-1)
        ndh = jnp.maximum(jnp.sum(gn * h, axis=1), 0.0)
        ndd = jnp.abs(jnp.sum(gn * d, axis=1)) + 1e-3
        a2 = jnp.maximum(row[:, 41], 0.04) ** 2
        dterm = a2 / (jnp.pi * ((ndh * ndh * (a2 - 1) + 1) ** 2) + 1e-9)
        f0 = c + (1.0 - c) * ((1.0 - ndh[:, None]) ** 5)
        spec = f0 * (dterm / (4 * ndd * ndd))[:, None]
        diff = c * (1.0 / jnp.pi)
        fr = jnp.where((u[3] < 0.5)[:, None], spec, diff)
        p = 0.333 * dterm + 0.667 * jnp.maximum(ndh, 1e-4)
        scl = fr / p[:, None] * ndh[:, None]
        newd = jnp.where((u[4] < 0.9)[:, None], h, d)
        tput = jnp.where((p > 1e-4)[:, None], scl, jnp.zeros_like(scl))
        # row-major consumer boundary (the "pallas input"):
        rays = jnp.concatenate(
            [newd * 2.0, jnp.ones((r, 1)), tput, jnp.zeros((r, 1))], axis=1
        )
        return jnp.sum(rays[:, 0] * w) + jnp.sum(rays[:, 5] * w)

    def loop_rows(d):
        def body(i, acc):
            return acc + rows_once(i, d)[None]
        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("rows_form", loop_rows, d_in)

    # ---- component form: every vector is three [R] 1-D arrays ----------
    dx, dy, dz = d_in[:, 0], d_in[:, 1], d_in[:, 2]

    def comp_once(i, dx, dy, dz):
        row = table[(tri + i) % 200_000]  # [R, 48] gather (same boundary)
        v = [row[:, j] for j in range(9)]
        e1 = [v[3] - v[0], v[4] - v[1], v[5] - v[2]]
        e2 = [v[6] - v[0], v[7] - v[1], v[8] - v[2]]
        gn = [e1[1] * e2[2] - e1[2] * e2[1],
              e1[2] * e2[0] - e1[0] * e2[2],
              e1[0] * e2[1] - e1[1] * e2[0]]
        gl = jnp.sqrt(gn[0] * gn[0] + gn[1] * gn[1] + gn[2] * gn[2])
        gn = [g / gl for g in gn]
        inside = gn[0] * dx + gn[1] * dy + gn[2] * dz > 0
        gn = [jnp.where(inside, -g, g) for g in gn]
        h = [gn[0] + dx, gn[1] + dy, gn[2] + dz]
        hl = jnp.sqrt(h[0] * h[0] + h[1] * h[1] + h[2] * h[2])
        h = [x / hl for x in h]
        c = [row[:, 33] * u[0], row[:, 34] * u[1], row[:, 35] * u[2]]
        ndh = jnp.maximum(gn[0] * h[0] + gn[1] * h[1] + gn[2] * h[2], 0.0)
        ndd = jnp.abs(gn[0] * dx + gn[1] * dy + gn[2] * dz) + 1e-3
        a2 = jnp.maximum(row[:, 41], 0.04) ** 2
        dterm = a2 / (jnp.pi * ((ndh * ndh * (a2 - 1) + 1) ** 2) + 1e-9)
        f5 = (1.0 - ndh) ** 5
        f0 = [cc + (1.0 - cc) * f5 for cc in c]
        sden = dterm / (4 * ndd * ndd)
        spec = [ff * sden for ff in f0]
        diff = [cc * (1.0 / jnp.pi) for cc in c]
        coin = u[3] < 0.5
        fr = [jnp.where(coin, s, q) for s, q in zip(spec, diff)]
        p = 0.333 * dterm + 0.667 * jnp.maximum(ndh, 1e-4)
        scl = [ff / p * ndh for ff in fr]
        coin2 = u[4] < 0.9
        nd = [jnp.where(coin2, a, b) for a, b in zip(h, (dx, dy, dz))]
        ok = p > 1e-4
        tput = [jnp.where(ok, s, 0.0) for s in scl]
        rays = jnp.stack(
            [nd[0] * 2.0, nd[1] * 2.0, nd[2] * 2.0, jnp.ones((r,)),
             tput[0], tput[1], tput[2], jnp.zeros((r,))], axis=1
        )
        return jnp.sum(rays[:, 0] * w) + jnp.sum(rays[:, 5] * w)

    def loop_comp(dx, dy, dz):
        def body(i, acc):
            return acc + comp_once(i, dx, dy, dz)[None]
        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("component_form", loop_comp, dx, dy, dz)

    # ---- planar form: [3, R] component-major vectors --------------------
    dpl = d_in.T  # [3, R]

    def planar_once(i, d):
        row = table[(tri + i) % 200_000]  # [R, 48]
        vtx = row[:, 0:9].T.reshape(3, 3, r)  # [vert, comp, R]
        e1 = vtx[1] - vtx[0]
        e2 = vtx[2] - vtx[0]
        gn = jnp.stack([
            e1[1] * e2[2] - e1[2] * e2[1],
            e1[2] * e2[0] - e1[0] * e2[2],
            e1[0] * e2[1] - e1[1] * e2[0]], axis=0)
        gn = gn / jnp.sqrt(jnp.sum(gn * gn, axis=0, keepdims=True))
        inside = jnp.sum(gn * d, axis=0) > 0
        gn = jnp.where(inside[None, :], -gn, gn)
        h = gn + d
        h = h / jnp.sqrt(jnp.sum(h * h, axis=0, keepdims=True))
        c = jnp.stack([row[:, 33] * u[0], row[:, 34] * u[1],
                       row[:, 35] * u[2]], axis=0)
        ndh = jnp.maximum(jnp.sum(gn * h, axis=0), 0.0)
        ndd = jnp.abs(jnp.sum(gn * d, axis=0)) + 1e-3
        a2 = jnp.maximum(row[:, 41], 0.04) ** 2
        dterm = a2 / (jnp.pi * ((ndh * ndh * (a2 - 1) + 1) ** 2) + 1e-9)
        f0 = c + (1.0 - c) * ((1.0 - ndh[None, :]) ** 5)
        spec = f0 * (dterm / (4 * ndd * ndd))[None, :]
        diff = c * (1.0 / jnp.pi)
        fr = jnp.where((u[3] < 0.5)[None, :], spec, diff)
        p = 0.333 * dterm + 0.667 * jnp.maximum(ndh, 1e-4)
        scl = fr / p[None, :] * ndh[None, :]
        newd = jnp.where((u[4] < 0.9)[None, :], h, d)
        tput = jnp.where((p > 1e-4)[None, :], scl, jnp.zeros_like(scl))
        rays = jnp.concatenate(
            [newd.T * 2.0, jnp.ones((r, 1)), tput.T, jnp.zeros((r, 1))],
            axis=1,
        )
        return jnp.sum(rays[:, 0] * w) + jnp.sum(rays[:, 5] * w)

    def loop_planar(d):
        def body(i, acc):
            return acc + planar_once(i, d)[None]
        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("planar_form", loop_planar, dpl)

    a = jax.jit(lambda d: rows_once(0, d))(d_in)
    b = jax.jit(lambda x, y, z: comp_once(0, x, y, z))(dx, dy, dz)
    c = jax.jit(lambda d: planar_once(0, d))(dpl)
    emit(case="value_agreement",
         rel_comp=float(abs(a - b) / (abs(a) + 1e-9)),
         rel_planar=float(abs(a - c) / (abs(a) + 1e-9)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
