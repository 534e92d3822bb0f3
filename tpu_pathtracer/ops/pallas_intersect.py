"""Pallas TPU kernel: chunk-skipping wavefront intersector.

The hot loop of the whole framework.  Measurement on real scenes showed the
gather-based leaf traversal (ops/traverse.py) is HBM-bound: a secondary ray
pierces ~70 leaf AABBs, and gathering each pierced leaf's triangle block from
HBM costs ~50 KB of random-access traffic per ray-bounce.  This kernel
inverts the dataflow so triangle data *streams* HBM->VMEM in large
sequential blocks instead:

* triangles (already Morton-ordered) are grouped into chunks of
  ``CHUNK_TRIS`` = 128 — one full VPU lane width;
* a cheap XLA prepass computes, per (ray-tile, chunk), whether ANY ray in
  the tile enters the chunk's AABB (the wavefront analog of a BVH node
  test, src/bvh.h:195-235);
* the kernel runs on a (ray_tile, chunk) grid: inactive (tile, chunk) steps
  are predicated off with ``@pl.when`` — Morton locality makes most steps
  inactive for coherent tiles — and active steps evaluate the exact
  Woop/Cramer test for all RT x 128 (ray, triangle) pairs on the VPU,
  min-accumulating (t, triangle id) into VMEM-resident outputs.

No per-ray gathers, no sorting, no divergence: skipped work is the only
control flow, at tile granularity, which is exactly what the TPU's
SIMD-with-predication model executes well.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, _PRECISION

RAY_TILE = 512  # rays per grid tile
CHUNK_TRIS = 128  # triangles per chunk (= 8 leaves of 16)


def _kernel(active_ref, rays_ref, wc_ref, tmin_ref, tidx_ref, *, min_dst):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        tmin_ref[:] = jnp.full_like(tmin_ref, jnp.inf)
        tidx_ref[:] = jnp.zeros_like(tidx_ref)

    # Activity is bit-packed 32 chunks per int32 so the SMEM-resident mask
    # stays tiny even for Sponza-class chunk counts.
    word = active_ref[i, j // 32]
    bit = (word >> (j % 32)) & 1

    @pl.when(bit > 0)
    def _body():
        rays = rays_ref[:]  # [RT, 8] = (o, 1, d, 0)
        w = wc_ref[0]  # [12, chunk width]
        cw = w.shape[-1]
        o1 = rays[:, 0:4]
        d0 = rays[:, 4:8]

        def contract(x, r0):
            return jnp.dot(
                x, w[r0 : r0 + 4, :], preferred_element_type=jnp.float32,
                precision=_PRECISION,
            )

        p0, p1, p2 = contract(o1, 0), contract(o1, 4), contract(o1, 8)
        q0, q1, q2 = contract(d0, 0), contract(d0, 4), contract(d0, 8)
        t = -p2 / q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= min_dst)
        t_m = jnp.where(ok, t, jnp.inf)

        chunk_min = jnp.min(t_m, axis=1, keepdims=True)  # [RT, 1]
        chunk_arg = jnp.argmin(t_m, axis=1).astype(jnp.int32)  # [RT]
        cur = tmin_ref[:]
        better = chunk_min < cur
        tmin_ref[:] = jnp.where(better, chunk_min, cur)
        tidx_ref[:] = jnp.where(
            better, j * cw + chunk_arg[:, None], tidx_ref[:]
        )


_ACT_TILE = 256  # rays per activity-kernel tile (bounds VMEM at large C)


def _activity_kernel(rays_ref, aabb_ref, out_ref, *, min_dst):
    """Per-tile chunk-AABB slab test, fully fused in VMEM: out[c] = 1 iff any
    ray in this tile enters chunk c's AABB (the XLA version materialized
    [R, C, 3] intermediates in HBM)."""
    rays = rays_ref[:]  # [AT, 8]
    aabb = aabb_ref[:]  # [8, C]: rows minx..maxz
    t_lo = None
    t_hi = None
    for a in range(3):
        o = rays[:, a : a + 1]
        inv = 1.0 / rays[:, 4 + a : 5 + a]
        t1 = (aabb[a][None, :] - o) * inv  # [AT, C]
        t2 = (aabb[3 + a][None, :] - o) * inv
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        t_lo = lo if t_lo is None else jnp.maximum(t_lo, lo)
        t_hi = hi if t_hi is None else jnp.minimum(t_hi, hi)
    hit = (t_lo <= t_hi) & (t_hi >= min_dst)
    out_ref[pl.program_id(0), :] = jnp.any(hit, axis=0).astype(jnp.int32)


def tile_chunk_activity(
    rays: jnp.ndarray,  # [R, 8] packed (o, 1, d, 0)
    aabb_rows: jnp.ndarray,  # [8, C] rows minx,miny,minz,maxx,maxy,maxz,0,0
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
) -> jnp.ndarray:  # [T, C] int32 (1 where any ray in tile enters the chunk)
    r = rays.shape[0]
    c = aabb_rows.shape[1]
    at = min(_ACT_TILE, ray_tile)
    sub = r // at
    out = pl.pallas_call(
        functools.partial(_activity_kernel, min_dst=min_dst),
        grid=(sub,),
        in_specs=[
            pl.BlockSpec((at, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        # Whole-array output block (rows aren't 8-divisible per tile); each
        # grid step writes its own row.
        out_specs=pl.BlockSpec((sub, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sub, c), jnp.int32),
        interpret=interpret,
    )(rays, aabb_rows)
    # OR-reduce sub-tiles up to the intersector's tile granularity.
    group = ray_tile // at
    t_tiles = r // ray_tile
    return jnp.any(out.reshape(t_tiles, group, c) > 0, axis=1).astype(jnp.int32)


_SUPER = 128  # chunks per super-chunk (level-1 activity granularity)


def _gated_activity_kernel(
    sup_ref, rays_ref, aabb_ref, out_ref, *, min_dst, group
):
    """Level-2 chunk activity, gated by the level-1 super-chunk mask: grid
    step (s, i) tests ray sub-tile i against super-chunk s's _SUPER chunk
    AABBs only when any ray of i's parent tile entered the super AABB.

    Grid order is (s outer, i inner) so the (sub, _SUPER) output block —
    indexed by s alone — stays resident in VMEM while every row i is
    written, then flushes complete.  (A per-row output block is not
    lowerable, and revisiting an output block after it flushed clobbers
    rows: Pallas output buffers don't reload on block switch.)"""
    s = pl.program_id(0)
    i = pl.program_id(1)
    active = sup_ref[i // group, s]

    @pl.when(active == 0)
    def _skip():
        out_ref[i, :] = jnp.zeros((out_ref.shape[-1],), jnp.int32)

    @pl.when(active > 0)
    def _body():
        rays = rays_ref[:]  # [AT, 8]
        aabb = aabb_ref[:]  # [8, _SUPER]
        t_lo = None
        t_hi = None
        for a in range(3):
            o = rays[:, a : a + 1]
            inv = 1.0 / rays[:, 4 + a : 5 + a]
            t1 = (aabb[a][None, :] - o) * inv
            t2 = (aabb[3 + a][None, :] - o) * inv
            lo = jnp.minimum(t1, t2)
            hi = jnp.maximum(t1, t2)
            t_lo = lo if t_lo is None else jnp.maximum(t_lo, lo)
            t_hi = hi if t_hi is None else jnp.minimum(t_hi, hi)
        hit = (t_lo <= t_hi) & (t_hi >= min_dst)
        out_ref[i, :] = jnp.any(hit, axis=0).astype(jnp.int32)


def tile_chunk_activity_2level(
    rays: jnp.ndarray,  # [R, 8]
    aabb_rows: jnp.ndarray,  # [8, C]
    chunk_min: jnp.ndarray,  # [C, 3]
    chunk_max: jnp.ndarray,  # [C, 3]
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
) -> jnp.ndarray:  # [T, C] int32
    """Hierarchical activity for Sponza+-scale chunk counts: level 1 tests
    per-tile super-chunk AABBs (C/_SUPER columns), level 2 evaluates the
    per-chunk slab tests only inside active super-chunks.  This keeps the
    prepass ~O(R * C/128 + R * C_active) instead of O(R * C) — the wavefront
    analog of descending a 2-level BVH."""
    r = rays.shape[0]
    c = aabb_rows.shape[1]
    ns = -(-c // _SUPER)
    pad = ns * _SUPER - c
    if pad:
        # NaN-padded AABB columns can never pass the slab test.
        aabb_rows = jnp.concatenate(
            [aabb_rows, jnp.full((8, pad), jnp.nan, aabb_rows.dtype)], axis=1
        )
        chunk_min = jnp.concatenate(
            [chunk_min, jnp.full((pad, 3), jnp.nan, chunk_min.dtype)], axis=0
        )
        chunk_max = jnp.concatenate(
            [chunk_max, jnp.full((pad, 3), jnp.nan, chunk_max.dtype)], axis=0
        )
    # Super AABBs: nan-aware reductions so padded chunks vanish.
    sup_min = jnp.nanmin(chunk_min.reshape(ns, _SUPER, 3), axis=1)
    sup_max = jnp.nanmax(chunk_max.reshape(ns, _SUPER, 3), axis=1)
    sup_rows = jnp.concatenate(
        [sup_min.T, sup_max.T, jnp.zeros((2, ns), sup_min.dtype)], axis=0
    )
    sup_act = tile_chunk_activity(rays, sup_rows, min_dst, ray_tile, interpret)

    at = min(_ACT_TILE, ray_tile)
    sub = r // at
    group = ray_tile // at
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # sup_act [T, ns] in SMEM
        grid=(ns, sub),
        in_specs=[
            pl.BlockSpec(
                (at, 8), lambda s, i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, _SUPER), lambda s, i, *_: (0, s), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (sub, _SUPER), lambda s, i, *_: (0, s), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _gated_activity_kernel, min_dst=min_dst, group=group
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sub, ns * _SUPER), jnp.int32),
        interpret=interpret,
    )(sup_act, rays, aabb_rows)
    t_tiles = r // ray_tile
    act = jnp.any(out.reshape(t_tiles, group, ns * _SUPER) > 0, axis=1)
    return act[:, :c].astype(jnp.int32)


def _bitpack(act: jnp.ndarray) -> jnp.ndarray:
    """[T, C] 0/1 -> [T, ceil(C/32)] int32 words (SMEM-friendly mask)."""
    t_tiles, c = act.shape
    pad = (-c) % 32
    if pad:
        act = jnp.concatenate(
            [act, jnp.zeros((t_tiles, pad), act.dtype)], axis=1
        )
    bits = act.astype(jnp.int32).reshape(t_tiles, -1, 32)
    weights = (1 << jnp.arange(32, dtype=jnp.int32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("min_dst", "ray_tile", "interpret", "compact")
)
def closest_hit_chunks(
    origin: jnp.ndarray,  # [R, 3], R % ray_tile == 0
    direction: jnp.ndarray,  # [R, 3]
    chunk_woop: jnp.ndarray,  # [C, 12, CHUNK_TRIS]
    chunk_min: jnp.ndarray,  # [C, 3]
    chunk_max: jnp.ndarray,  # [C, 3]
    woop_cols: jnp.ndarray,  # [4, 3N] (winner barycentric recompute)
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
    compact: bool = False,
) -> Hit:
    r = origin.shape[0]
    c = chunk_woop.shape[0]
    assert r % ray_tile == 0, (r, ray_tile)
    t_tiles = r // ray_tile

    rays = jnp.concatenate(
        [
            origin,
            jnp.ones((r, 1), origin.dtype),
            direction,
            jnp.zeros((r, 1), origin.dtype),
        ],
        axis=1,
    )  # [R, 8]
    aabb_rows = jnp.concatenate(
        [chunk_min.T, chunk_max.T, jnp.zeros((2, c), chunk_min.dtype)], axis=0
    )  # [8, C]
    if c > 4 * _SUPER:
        # Sponza+-scale chunk counts: hierarchical activity so the prepass
        # stops being O(R x C).
        active = tile_chunk_activity_2level(
            rays, aabb_rows, chunk_min, chunk_max, min_dst, ray_tile, interpret
        )
    else:
        active = tile_chunk_activity(rays, aabb_rows, min_dst, ray_tile, interpret)

    def run_dense(active):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # the bit-packed activity mask, in SMEM
            grid=(t_tiles, c),
            in_specs=[
                pl.BlockSpec(
                    (ray_tile, 8), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 12, chunk_woop.shape[-1]), lambda i, j, *_: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (ray_tile, 1), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ray_tile, 1), lambda i, j, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, min_dst=min_dst),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((r, 1), jnp.float32),
                jax.ShapeDtypeStruct((r, 1), jnp.int32),
            ],
            interpret=interpret,
        )(_bitpack(active), rays, chunk_woop)

    if compact and c > 16:
        # Compacted grid: slot s -> s-th active chunk, DMA-indexed through
        # the prefetched id list.  Rare tiles with more than `cap` active
        # chunks fall back to the dense grid (exactness preserved).
        cap = min(c, max(8, (c // 4 + 7) // 8 * 8))
        overflow = jnp.any(jnp.sum(active, axis=1) > cap)
        t_best, tri = jax.lax.cond(
            overflow,
            lambda a: run_dense(a),
            lambda a: _run_compact(
                rays, chunk_woop, a, min_dst, ray_tile, cap, interpret
            ),
            active,
        )
    else:
        t_best, tri = run_dense(active)

    t_best = t_best[:, 0]
    tri = tri[:, 0]
    hit = jnp.isfinite(t_best)
    # Winner barycentric recompute (same epilogue as the dense path).
    tri_safe = jnp.where(hit, tri, 0)
    cols = tri_safe[:, None] * 3 + jnp.arange(3)[None, :]
    w = jnp.moveaxis(woop_cols[:, cols], 0, 1)  # [R, 4, 3]
    o1 = rays[:, 0:4]
    d0 = rays[:, 4:8]
    p = jnp.einsum("rk,rkj->rj", o1, w, precision=_PRECISION)
    q = jnp.einsum("rk,rkj->rj", d0, w, precision=_PRECISION)
    t_r = -p[..., 2] / q[..., 2]
    beta = p[..., 0] + t_r * q[..., 0]
    gamma = p[..., 1] + t_r * q[..., 1]
    return Hit(
        t=jnp.where(hit, t_best, jnp.inf),
        tri=tri_safe,
        beta=jnp.where(hit, beta, 0.0),
        gamma=jnp.where(hit, gamma, 0.0),
        hit=hit,
    )


def _compact_kernel(idx_ref, cnt_ref, rays_ref, wc_ref, tmin_ref, tidx_ref, *, min_dst):
    """Compacted-grid variant: grid slot s of tile i processes the s-th
    ACTIVE chunk (idx_ref[i, s]); the chunk block DMA itself is indexed
    through the prefetched id, so inactive chunks cost nothing at all."""
    i = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        tmin_ref[:] = jnp.full_like(tmin_ref, jnp.inf)
        tidx_ref[:] = jnp.zeros_like(tidx_ref)

    @pl.when(s < cnt_ref[i, 0])
    def _body():
        rays = rays_ref[:]
        w = wc_ref[0]
        cw = w.shape[-1]
        o1 = rays[:, 0:4]
        d0 = rays[:, 4:8]

        def contract(x, r0):
            return jnp.dot(
                x, w[r0 : r0 + 4, :], preferred_element_type=jnp.float32,
                precision=_PRECISION,
            )

        p0, p1, p2 = contract(o1, 0), contract(o1, 4), contract(o1, 8)
        q0, q1, q2 = contract(d0, 0), contract(d0, 4), contract(d0, 8)
        t = -p2 / q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= min_dst)
        t_m = jnp.where(ok, t, jnp.inf)
        chunk_min = jnp.min(t_m, axis=1, keepdims=True)
        chunk_arg = jnp.argmin(t_m, axis=1).astype(jnp.int32)
        cur = tmin_ref[:]
        better = chunk_min < cur
        j_chunk = idx_ref[i, s]
        tmin_ref[:] = jnp.where(better, chunk_min, cur)
        tidx_ref[:] = jnp.where(
            better, j_chunk * cw + chunk_arg[:, None], tidx_ref[:]
        )


def _run_compact(
    rays, chunk_woop, active, min_dst, ray_tile, cap, interpret
):
    """Compact path: per-tile active-chunk id lists + indexed chunk DMA."""
    r = rays.shape[0]
    t_tiles = r // ray_tile
    c = chunk_woop.shape[0]
    # Active chunk ids in ascending order first (stable: key pushes inactive
    # chunks past C).
    order_key = (1 - active) * c + jax.lax.broadcasted_iota(
        jnp.int32, active.shape, 1
    )
    idx = jnp.argsort(order_key, axis=1)[:, :cap].astype(jnp.int32)
    counts = jnp.minimum(jnp.sum(active, axis=1), cap).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # idx [T, cap], counts [T, 1]
        grid=(t_tiles, cap),
        in_specs=[
            pl.BlockSpec(
                (ray_tile, 8), lambda i, s, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 12, chunk_woop.shape[-1]),
                lambda i, s, idx_ref, cnt_ref: (idx_ref[i, s], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (ray_tile, 1), lambda i, s, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ray_tile, 1), lambda i, s, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
    )
    return pl.pallas_call(
        functools.partial(_compact_kernel, min_dst=min_dst),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
        interpret=interpret,
    )(idx, counts[:, None], rays, chunk_woop)


def ray_sort_key(
    origin: jnp.ndarray,  # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    alive: jnp.ndarray,  # [R] bool
    scene_lo: jnp.ndarray,  # [3]
    scene_hi: jnp.ndarray,  # [3]
) -> jnp.ndarray:  # [R] int32
    """Coherence key for wavefront ray sorting: direction octant (3 bits) x
    origin cell in an 8^3 grid over the scene bounds (9 bits).  Rays sorted
    by this key land in tiles whose chunk-activity unions approach the
    per-ray minimum; dead rays sort last so their tiles skip every chunk.
    """
    # 2 bits per direction axis (64 bins: octant + per-axis magnitude).
    def dbits(x):
        return (x > 0).astype(jnp.int32) * 2 + (jnp.abs(x) > 0.55).astype(
            jnp.int32
        )

    dir_bin = dbits(direction[:, 0]) * 16 + dbits(direction[:, 1]) * 4 + dbits(
        direction[:, 2]
    )
    ext = jnp.maximum(scene_hi - scene_lo, 1e-30)
    cell = jnp.clip(
        ((origin - scene_lo) / ext * 8.0).astype(jnp.int32), 0, 7
    )
    cell_id = cell[:, 0] * 64 + cell[:, 1] * 8 + cell[:, 2]
    key = dir_bin * 512 + cell_id
    return jnp.where(alive, key, jnp.int32(1 << 20))


def build_chunk_woop(
    woop_cols: np.ndarray, chunk_tris: int = CHUNK_TRIS
) -> np.ndarray:
    """[4, 3N] -> [C, 12, chunk_tris] chunk blocks (row = 4*comp + coef)."""
    four, n3 = woop_cols.shape
    n = n3 // 3
    pad = (-n) % chunk_tris
    w = woop_cols.reshape(4, n, 3)
    if pad:
        w = np.concatenate([w, np.full((4, pad, 3), np.nan, w.dtype)], axis=1)
        n += pad
    c = n // chunk_tris
    w = np.transpose(w, (2, 0, 1)).reshape(12, c, chunk_tris)
    return np.ascontiguousarray(np.transpose(w, (1, 0, 2)).astype(np.float32))
