#!/usr/bin/env python
"""On-chip probe: elementwise/dot cost of [R,3] vs [3,R] vs 3x[R] layouts.

Round 4 found minor-dim-4 texture arrays tile as (8,128) vregs at 1/32 lane
occupancy; this prices the SAME effect for the wavefront's vec3 math (o, d,
throughput, radiance and every sampling/bsdf intermediate are [R,3]).  Each
case runs an identical arithmetic chain (mul/add/select/dot/normalize-like)
fori-chained K times (RTT-immune, position-weighted sum forces the work).

Env: PROBE_K (default 64), PROBE_R (default 65536).
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
    ks = jax.random.split(key, 6)
    a = jax.random.uniform(ks[0], (r, 3)) + 0.5
    b = jax.random.uniform(ks[1], (r, 3)) + 0.5
    c = jax.random.uniform(ks[2], (r, 3)) + 0.5
    m = jax.random.uniform(ks[3], (r,)) > 0.5
    w = jax.random.uniform(ks[4], (r,))
    jax.block_until_ready((a, b, c, m, w))

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
             ms_per_iter=round(best / k_iter, 4), k=k_iter)

    # The chain: e = a*b + c; f = where(m, e, a); g = f/(dot(f,b)+1);
    # s = sum(g * b) -- executed identically in each layout.
    def chain_rows(i, a, b, c, m):
        aa = a + i * 1e-9
        e = aa * b + c
        f = jnp.where(m[:, None], e, aa)
        d = jnp.sum(f * b, axis=1, keepdims=True)
        g = f / (d + 1.0)
        return jnp.sum(g * b, axis=1)

    def loop_rows(a, b, c, m):
        def body(i, acc):
            s = chain_rows(i.astype(jnp.float32), a, b, c, m)
            return acc + jnp.sum(s * w)[None]
        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("rows_Rx3", loop_rows, a, b, c, m)

    at, bt, ct = a.T, b.T, c.T  # [3, R]

    def chain_planar(i, a, b, c, m):
        aa = a + i * 1e-9
        e = aa * b + c
        f = jnp.where(m[None, :], e, aa)
        d = jnp.sum(f * b, axis=0, keepdims=True)
        g = f / (d + 1.0)
        return jnp.sum(g * b, axis=0)

    def loop_planar(a, b, c, m):
        def body(i, acc):
            s = chain_planar(i.astype(jnp.float32), a, b, c, m)
            return acc + jnp.sum(s * w)[None]
        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("planar_3xR", loop_planar, at, bt, ct, m)

    a3 = [a[:, j] for j in range(3)]
    b3 = [b[:, j] for j in range(3)]
    c3 = [c[:, j] for j in range(3)]

    def loop_comp(a0, a1, a2, b0, b1, b2, c0, c1, c2, m):
        def body(i, acc):
            ii = i.astype(jnp.float32)
            aa = [a0 + ii * 1e-9, a1 + ii * 1e-9, a2 + ii * 1e-9]
            bb = [b0, b1, b2]
            cc = [c0, c1, c2]
            e = [aa[j] * bb[j] + cc[j] for j in range(3)]
            f = [jnp.where(m, e[j], aa[j]) for j in range(3)]
            d = f[0] * bb[0] + f[1] * bb[1] + f[2] * bb[2]
            g = [f[j] / (d + 1.0) for j in range(3)]
            s = g[0] * bb[0] + g[1] * bb[1] + g[2] * bb[2]
            return acc + jnp.sum(s * w)[None]
        return jax.lax.fori_loop(0, k_iter, body, jnp.zeros((1,)))

    timeit("components_3_of_R", loop_comp, *a3, *b3, *c3, m)

    # Equality check (components vs rows) on a single application.
    s_rows = chain_rows(0.0, a, b, c, m)
    f0 = jnp.where(m, a[:, 0] * b[:, 0] + c[:, 0], a[:, 0])
    f1 = jnp.where(m, a[:, 1] * b[:, 1] + c[:, 1], a[:, 1])
    f2 = jnp.where(m, a[:, 2] * b[:, 2] + c[:, 2], a[:, 2])
    d = f0 * b[:, 0] + f1 * b[:, 1] + f2 * b[:, 2]
    s_comp = (f0 / (d + 1) * b[:, 0] + f1 / (d + 1) * b[:, 1]
              + f2 / (d + 1) * b[:, 2])
    emit(case="bit_equal_rows_vs_components",
         equal=bool(jnp.all(s_rows == s_comp)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
