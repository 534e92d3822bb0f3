#!/usr/bin/env python
"""On-chip probe: does the while-loop CARRY layout anchor the body's math?

scan_lane_waste.py (round 5) showed most of the engine body's [R, 3]
elementwise fusions in the row-major {1,0:T(8,128)} layout — 3/128 lane
occupancy — while probe_shadeform's standalone (no while loop) rows-form
chain compiled efficiently.  Hypothesis: the [R, 3] while carries anchor
the row-major layout; inside a loop XLA propagates the carry layout into
the body instead of transposing.

Three arms, same math (argsort-permute + ~40-op sampling/pdf-style chain +
row-gather + row-major [R, 8] boundary consumed by an optimization_barrier):

  rows        [R, 3] carries, [R, 3] math (the engine today)
  planar_car  [3, R] carries, transpose to [R, 3] at body start, SAME row
              math, transpose back at body end (2 explicit relayouts/iter)
  planar      [3, R] carries, planar math (vecmath p* twins)

Env: PROBE_K (64), PROBE_R (65536).
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
    tri0 = jax.random.randint(ks[1], (r,), 0, 200_000)
    d_in = jax.random.normal(ks[2], (r, 3))
    d_in = d_in / jnp.linalg.norm(d_in, axis=1, keepdims=True)
    o_in = jax.random.normal(ks[3], (r, 3))
    u = jax.random.uniform(ks[4], (10, r))
    jax.block_until_ready((table, tri0, d_in, o_in, u))

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        out = jax.block_until_ready(f(*args))
        best = None
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(f(*args))
            dt = (time.time() - t0) * 1000
            best = dt if best is None else min(best, dt)
        emit(case=name, ms_total=round(best, 2),
             ms_per_iter=round(best / k_iter, 3), k=k_iter,
             checksum=float(jnp.sum(out[0][:8])))

    # Shared row-form math chain: mimics sampling+pdf+throughput update.
    def row_math(i, o, d, tp, rad):
        row = table[(tri0 + i) % 200_000]  # [R, 48] shade-row gather
        n = row[:, 9:12]
        n = n / jnp.sqrt(jnp.sum(n * n, axis=1, keepdims=True))
        h = n - d
        h = h / jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True))
        ndh = jnp.maximum(jnp.sum(n * h, axis=1), 0.0)
        ndd = jnp.abs(jnp.sum(n * d, axis=1)) + 1e-3
        a2 = jnp.maximum(row[:, 41], 0.04) ** 2
        dterm = a2 / (3.14159 * ((ndh * ndh * (a2 - 1) + 1) ** 2) + 1e-9)
        c = row[:, 33:36] * u[0][:, None]
        f0 = c + (1.0 - c) * ((1.0 - ndh[:, None]) ** 5)
        spec = f0 * (dterm / (4 * ndd * ndd))[:, None]
        fr = jnp.where((u[3] < 0.5)[:, None], spec, c * 0.318)
        p = 0.333 * dterm + 0.667 * jnp.maximum(ndh, 1e-4)
        scl = fr * (ndh / p)[:, None]
        new_d = jnp.where((u[4] < 0.9)[:, None], h, d)
        cont = (p > 1e-4) & (u[5] > 0.1)
        tp = jnp.where(cont[:, None], tp * scl, tp)
        rad = rad + jnp.where(cont[:, None], tp * dterm[:, None], 0.0)
        o = jnp.where(cont[:, None], o + new_d, o)
        d = jnp.where(cont[:, None], new_d, d)
        return o, d, tp, rad, cont

    def boundary(o, d):
        rays = jnp.concatenate(
            [o, jnp.ones((r, 1)), d, jnp.zeros((r, 1))], axis=1
        )
        (rays,) = jax.lax.optimization_barrier((rays,))
        return jnp.sum(rays[:, 0]) + jnp.sum(rays[:, 4])

    # ---- arm 1: rows carries -------------------------------------------
    def loop_rows(o0, d0):
        def body(i, st):
            o, d, tp, rad, acc = st
            perm = jnp.argsort(d[:, 0] + u[6])
            o, d, tp, rad = o[perm], d[perm], tp[perm], rad[perm]
            o, d, tp, rad, cont = row_math(i, o, d, tp, rad)
            acc = acc + boundary(o, d) + jnp.sum(cont)
            return o, d, tp, rad, acc

        o, d, tp, rad, acc = jax.lax.fori_loop(
            0, k_iter, body,
            (o0, d0, jnp.ones_like(o0), jnp.zeros_like(o0), 0.0),
        )
        return rad, acc

    timeit("rows_carry", loop_rows, o_in, d_in)

    # ---- arm 2: planar carries, row math -------------------------------
    def loop_planar_carry(o0, d0):
        def body(i, st):
            op, dp, tpp, radp, acc = st  # [3, R] planar carries
            perm = jnp.argsort(dp[0] + u[6])
            op, dp, tpp, radp = (
                op[:, perm], dp[:, perm], tpp[:, perm], radp[:, perm]
            )
            o, d, tp, rad = op.T, dp.T, tpp.T, radp.T  # explicit relayout
            o, d, tp, rad, cont = row_math(i, o, d, tp, rad)
            acc = acc + boundary(o, d) + jnp.sum(cont)
            return o.T, d.T, tp.T, rad.T, acc

        op, dp, tpp, radp, acc = jax.lax.fori_loop(
            0, k_iter, body,
            (o0.T, d0.T, jnp.ones_like(o0).T, jnp.zeros_like(o0).T, 0.0),
        )
        return radp.T, acc

    timeit("planar_carry_row_math", loop_planar_carry, o_in, d_in)

    # ---- arm 3: full planar --------------------------------------------
    def loop_planar(o0, d0):
        def body(i, st):
            o, d, tp, rad, acc = st  # [3, R]
            perm = jnp.argsort(d[0] + u[6])
            o, d, tp, rad = o[:, perm], d[:, perm], tp[:, perm], rad[:, perm]
            row = table[(tri0 + i) % 200_000]  # row gather stays row-major
            n = row[:, 9:12].T
            n = n / jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
            h = n - d
            h = h / jnp.sqrt(jnp.sum(h * h, axis=0, keepdims=True))
            ndh = jnp.maximum(jnp.sum(n * h, axis=0), 0.0)
            ndd = jnp.abs(jnp.sum(n * d, axis=0)) + 1e-3
            a2 = jnp.maximum(row[:, 41], 0.04) ** 2
            dterm = a2 / (3.14159 * ((ndh * ndh * (a2 - 1) + 1) ** 2) + 1e-9)
            c = row[:, 33:36].T * u[0][None, :]
            f0 = c + (1.0 - c) * ((1.0 - ndh[None, :]) ** 5)
            spec = f0 * (dterm / (4 * ndd * ndd))[None, :]
            fr = jnp.where((u[3] < 0.5)[None, :], spec, c * 0.318)
            p = 0.333 * dterm + 0.667 * jnp.maximum(ndh, 1e-4)
            scl = fr * (ndh / p)[None, :]
            new_d = jnp.where((u[4] < 0.9)[None, :], h, d)
            cont = (p > 1e-4) & (u[5] > 0.1)
            tp = jnp.where(cont[None, :], tp * scl, tp)
            rad = rad + jnp.where(cont[None, :], tp * dterm[None, :], 0.0)
            o = jnp.where(cont[None, :], o + new_d, o)
            d = jnp.where(cont[None, :], new_d, d)
            rays = jnp.concatenate(
                [o.T, jnp.ones((r, 1)), d.T, jnp.zeros((r, 1))], axis=1
            )
            (rays,) = jax.lax.optimization_barrier((rays,))
            acc = acc + jnp.sum(rays[:, 0]) + jnp.sum(rays[:, 4]) + jnp.sum(cont)
            return o, d, tp, rad, acc

        o, d, tp, rad, acc = jax.lax.fori_loop(
            0, k_iter, body,
            (o_in.T, d_in.T, jnp.ones_like(o_in).T, jnp.zeros_like(o_in).T,
             0.0),
        )
        return rad.T, acc

    timeit("planar_full", loop_planar, o_in, d_in)

    # ---- arm 4: component carries (12 x 1-D [R]), 1-D takes, comp math --
    def loop_comp(o0, d0):
        def body(i, st):
            ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, acc = st
            perm = jnp.argsort(dx + u[6])
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz) = (
                v[perm] for v in (ox, oy, oz, dx, dy, dz, tx, ty, tz,
                                  rx, ry, rz)
            )
            row = table[(tri0 + i) % 200_000]  # [R, 48] row gather
            nx_, ny_, nz_ = row[:, 9], row[:, 10], row[:, 11]
            nl = jnp.sqrt(nx_ * nx_ + ny_ * ny_ + nz_ * nz_)
            nx_, ny_, nz_ = nx_ / nl, ny_ / nl, nz_ / nl
            hx, hy, hz = nx_ - dx, ny_ - dy, nz_ - dz
            hl = jnp.sqrt(hx * hx + hy * hy + hz * hz)
            hx, hy, hz = hx / hl, hy / hl, hz / hl
            ndh = jnp.maximum(nx_ * hx + ny_ * hy + nz_ * hz, 0.0)
            ndd = jnp.abs(nx_ * dx + ny_ * dy + nz_ * dz) + 1e-3
            a2 = jnp.maximum(row[:, 41], 0.04) ** 2
            dterm = a2 / (3.14159 * ((ndh * ndh * (a2 - 1) + 1) ** 2) + 1e-9)
            cx, cy, cz = (row[:, 33] * u[0], row[:, 34] * u[0],
                          row[:, 35] * u[0])
            f5 = (1.0 - ndh) ** 5
            sden = dterm / (4 * ndd * ndd)
            coin = u[3] < 0.5
            frx = jnp.where(coin, (cx + (1 - cx) * f5) * sden, cx * 0.318)
            fry = jnp.where(coin, (cy + (1 - cy) * f5) * sden, cy * 0.318)
            frz = jnp.where(coin, (cz + (1 - cz) * f5) * sden, cz * 0.318)
            p = 0.333 * dterm + 0.667 * jnp.maximum(ndh, 1e-4)
            s = ndh / p
            coin2 = u[4] < 0.9
            ndx = jnp.where(coin2, hx, dx)
            ndy = jnp.where(coin2, hy, dy)
            ndz = jnp.where(coin2, hz, dz)
            cont = (p > 1e-4) & (u[5] > 0.1)
            tx = jnp.where(cont, tx * frx * s, tx)
            ty = jnp.where(cont, ty * fry * s, ty)
            tz = jnp.where(cont, tz * frz * s, tz)
            rx = rx + jnp.where(cont, tx * dterm, 0.0)
            ry = ry + jnp.where(cont, ty * dterm, 0.0)
            rz = rz + jnp.where(cont, tz * dterm, 0.0)
            ox = jnp.where(cont, ox + ndx, ox)
            oy = jnp.where(cont, oy + ndy, oy)
            oz = jnp.where(cont, oz + ndz, oz)
            dx = jnp.where(cont, ndx, dx)
            dy = jnp.where(cont, ndy, dy)
            dz = jnp.where(cont, ndz, dz)
            rays = jnp.stack(
                [ox, oy, oz, jnp.ones((r,)), dx, dy, dz, jnp.zeros((r,))],
                axis=1,
            )
            (rays,) = jax.lax.optimization_barrier((rays,))
            acc = acc + jnp.sum(rays[:, 0]) + jnp.sum(rays[:, 4]) + jnp.sum(cont)
            return (ox, oy, oz, dx, dy, dz, tx, ty, tz, rx, ry, rz, acc)

        st = jax.lax.fori_loop(
            0, k_iter, body,
            (o0[:, 0], o0[:, 1], o0[:, 2], d0[:, 0], d0[:, 1], d0[:, 2],
             jnp.ones((r,)), jnp.ones((r,)), jnp.ones((r,)),
             jnp.zeros((r,)), jnp.zeros((r,)), jnp.zeros((r,)), 0.0),
        )
        return jnp.stack(st[9:12], axis=1), st[12]

    timeit("component_carry", loop_comp, o_in, d_in)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
