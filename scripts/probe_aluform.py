#!/usr/bin/env python
"""Pair-test ALU speed-of-light probe: which compute form is fastest?

The intersector's inner unit is a [64-ray, 4] x [4, CW-tri] Woop contraction
(6 of them per (sub-tile, chunk) pair).  This probe times a dense grid of
pure pair tests (no gating, no worklists — every (tile, chunk) step runs)
in several forms:

  dot    — the shipped jnp.dot contraction (Mosaic picks the unit)
  fma    — explicit broadcast-FMA: sum_k o[:, k:k+1] * w[r0+k][None, :]
           (guaranteed VPU; tests whether the dot lowers to wasteful MXU)
  bf16   — jnp.dot with bfloat16 inputs, f32 accumulate (2x VPU/MXU rate
           if precision tolerates it — NOT shippable without a refine pass,
           this measures the ceiling)

Reports ms per dispatch and pair-tests/s.  Env: PROBE_R (rays, default
65536), PROBE_C (chunks, default 512), PROBE_CW (chunk width, 128).
"""

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpu_pathtracer.ops.intersect import _PRECISION

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    r = int(os.environ.get("PROBE_R", 65536))
    c = int(os.environ.get("PROBE_C", 512))
    cw = int(os.environ.get("PROBE_CW", 128))
    tile = 512
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.normal(size=(r, 8)).astype(np.float32))
    wc = jnp.asarray(rng.normal(size=(c, 12, cw)).astype(np.float32))

    def body_dot(o1, d0, w, dtype):
        ow = o1.astype(dtype)
        dw = d0.astype(dtype)
        wt = w.astype(dtype)

        def contract(x, r0):
            return jnp.dot(
                x, wt[r0 : r0 + 4, :], preferred_element_type=jnp.float32,
                precision=None if dtype == jnp.bfloat16 else _PRECISION,
            )

        p0, p1, p2 = contract(ow, 0), contract(ow, 4), contract(ow, 8)
        q0, q1, q2 = contract(dw, 0), contract(dw, 4), contract(dw, 8)
        t = -p2 / q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= 1e-4)
        return jnp.where(ok, t, jnp.inf)

    def body_fma(o1, d0, w, dtype):
        def contract(x, r0):
            acc = x[:, 0:1] * w[r0, :][None, :]
            for k in range(1, 4):
                acc = acc + x[:, k : k + 1] * w[r0 + k, :][None, :]
            return acc

        p0, p1, p2 = contract(o1, 0), contract(o1, 4), contract(o1, 8)
        q0, q1, q2 = contract(d0, 0), contract(d0, 4), contract(d0, 8)
        t = -p2 / q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= 1e-4)
        return jnp.where(ok, t, jnp.inf)

    def body_fma_spec(o1, d0, w, dtype):
        # The shipped specialized form: o.w = 1 (constant-row add),
        # d.w = 0 (row dropped).
        def co(x, r0):
            acc = x[:, 0:1] * w[r0, :][None, :] + w[r0 + 3, :][None, :]
            acc = acc + x[:, 1:2] * w[r0 + 1, :][None, :]
            return acc + x[:, 2:3] * w[r0 + 2, :][None, :]

        def cd(x, r0):
            acc = x[:, 0:1] * w[r0, :][None, :]
            acc = acc + x[:, 1:2] * w[r0 + 1, :][None, :]
            return acc + x[:, 2:3] * w[r0 + 2, :][None, :]

        p0, p1, p2 = co(o1, 0), co(o1, 4), co(o1, 8)
        q0, q1, q2 = cd(d0, 0), cd(d0, 4), cd(d0, 8)
        t = -p2 / q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= 1e-4)
        return jnp.where(ok, t, jnp.inf)

    def body_fma_nodiv(o1, d0, w, dtype):
        # TIMING-ONLY variant (wrong math): t = -p2 * q2 instead of the
        # divide, to isolate the f32 division's share of the pair test.
        def cd(x, r0):
            acc = x[:, 0:1] * w[r0, :][None, :]
            acc = acc + x[:, 1:2] * w[r0 + 1, :][None, :]
            return acc + x[:, 2:3] * w[r0 + 2, :][None, :]

        p0, p1, p2 = cd(o1, 0), cd(o1, 4), cd(o1, 8)
        q0, q1, q2 = cd(d0, 0), cd(d0, 4), cd(d0, 8)
        t = -p2 * q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= 1e-4)
        return jnp.where(ok, t, jnp.inf)

    def make_kernel(body, dtype):
        def kernel(rays_ref, wc_ref, tmin_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _init():
                tmin_ref[:] = jnp.full_like(tmin_ref, jnp.inf)

            rays_t = rays_ref[:]
            o1 = rays_t[:, 0:4]
            d0 = rays_t[:, 4:8]
            t_m = body(o1, d0, wc_ref[0], dtype)
            cm = jnp.min(t_m, axis=1, keepdims=True)
            cur = tmin_ref[:]
            tmin_ref[:] = jnp.where(cm < cur, cm, cur)

        @jax.jit
        def run(rays_, wc_):
            return pl.pallas_call(
                kernel,
                grid=(r // tile, c),
                in_specs=[
                    pl.BlockSpec(
                        (tile, 8), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 12, cw), lambda i, j: (j, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((r, 1), jnp.float32),
            )(rays_, wc_)

        return run

    forms = {
        "dot_f32": make_kernel(body_dot, jnp.float32),
        "fma_f32": make_kernel(body_fma, jnp.float32),
        "fma_spec": make_kernel(body_fma_spec, jnp.float32),
        "fma_nodiv": make_kernel(body_fma_nodiv, jnp.float32),
        "dot_bf16": make_kernel(body_dot, jnp.bfloat16),
    }
    pairs = r * c * cw
    for name, f in forms.items():
        try:
            out = f(rays, wc)
            check = float(jnp.sum(jnp.where(jnp.isfinite(out), out, 0.0)))
            n = 8
            t0 = time.time()
            for _ in range(n):
                # Force a device round-trip per iteration: through the
                # remote tunnel, block_until_ready alone returned after
                # ~dispatch (8 ns/step "timings"); a scalar readback
                # cannot complete before the dispatch has executed.
                s = float(jnp.min(f(rays, wc)))
            ms = (time.time() - t0) / n * 1000
            emit(form=name, ms=round(ms, 2), check=round(check, 1),
                 s=round(s, 3), gpairs_per_s=round(pairs / ms / 1e6, 1))
        except Exception as err:  # noqa: BLE001
            emit(form=name, error=str(err)[:200])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
