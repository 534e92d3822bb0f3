"""Pallas chunk intersector vs the dense oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops.intersect import build_woop, closest_hit, tri_capacity
from tpu_pathtracer.ops.pallas_intersect import (
    CHUNK_TRIS,
    build_chunk_woop,
    closest_hit_chunks,
)
from tpu_pathtracer.scene.accel import (
    LEAF_SIZE,
    build_leaves,
    chunk_aabbs,
    leaf_woop,
    morton_order,
)

EPS = 1e-4


def _scene(n_tris, seed, spread=5.0):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-spread, spread, size=(n_tris, 1, 3))
    verts = center + rng.uniform(-0.5, 0.5, size=(n_tris, 3, 3))
    cap = tri_capacity(n_tris)
    out = np.full((cap, 3, 3), 1e30, dtype=np.float64)
    out[:n_tris] = verts
    valid = np.zeros(cap, dtype=bool)
    valid[:n_tris] = True
    perm = morton_order(out, valid)
    return out[perm], valid[perm]


def test_chunk_kernel_matches_dense_interpret():
    verts, valid = _scene(2000, seed=0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(1)
    r = 256
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    pk = closest_hit_chunks(
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(cw),
        jnp.asarray(cmin),
        jnp.asarray(cmax),
        jnp.asarray(woop),
        EPS,
        ray_tile=128,
        interpret=True,
    )
    hd, hp = np.asarray(dense.hit), np.asarray(pk.hit)
    assert (hd == hp).mean() > 0.995
    both = hd & hp
    np.testing.assert_allclose(
        np.asarray(pk.t)[both], np.asarray(dense.t)[both], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(pk.tri)[both] == np.asarray(dense.tri)[both]).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(pk.beta)[both], np.asarray(dense.beta)[both],
        rtol=1e-4, atol=1e-5,
    )


def test_compact_grid_matches_dense_interpret():
    """Compacted-grid variant (indexed chunk DMA) must agree with the dense
    kernel — both the genuinely-compacted path (localized rays, few active
    chunks) and the overflow fallback (rays piercing everything)."""
    verts, valid = _scene(6000, seed=3, spread=12.0)  # 48 chunks -> cap 16
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    assert cw.shape[0] > 16

    rng = np.random.default_rng(4)
    r = 256
    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)

    # Case 1: localized short-baseline rays -> few active chunks per tile.
    target = verts[valid][0, 0]
    o1 = (target + rng.normal(scale=0.5, size=(r, 3))).astype(np.float32)
    d1 = rng.normal(size=(r, 3)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    # Case 2: wide rays crossing the whole scene -> overflow fallback.
    o2 = rng.uniform(-14, 14, size=(r, 3)).astype(np.float32)
    d2 = rng.normal(size=(r, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)

    for o, d in [(o1, d1), (o2, d2)]:
        dense = closest_hit_chunks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
            jnp.asarray(cmax), jnp.asarray(woop), **kw,
        )
        comp = closest_hit_chunks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
            jnp.asarray(cmax), jnp.asarray(woop), compact=True, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(dense.hit), np.asarray(comp.hit)
        )
        both = np.asarray(dense.hit)
        np.testing.assert_allclose(
            np.asarray(comp.t)[both], np.asarray(dense.t)[both], rtol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(comp.tri)[both], np.asarray(dense.tri)[both]
        )


def test_two_level_activity_matches_flat_interpret():
    """Hierarchical (super-chunk gated) activity is exactly the flat
    activity: a chunk's AABB is inside its super AABB, so gating can never
    drop an active chunk."""
    import jax.numpy as jnp
    from tpu_pathtracer.ops.pallas_intersect import (
        tile_chunk_activity,
        tile_chunk_activity_2level,
    )

    rng = np.random.default_rng(5)
    c = 700  # > 4 * _SUPER and not a multiple of 128
    lo = rng.uniform(-50, 50, (c, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.5, 6.0, (c, 3)).astype(np.float32)
    r = 512
    o = rng.uniform(-60, 60, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, np.ones((r, 1), np.float32), d, np.zeros((r, 1), np.float32)],
        axis=1,
    )
    rows = jnp.asarray(np.concatenate(
        [lo.T, hi.T, np.zeros((2, c), np.float32)], axis=0
    ))
    kw = dict(min_dst=1e-4, ray_tile=256, interpret=True)
    flat = np.asarray(tile_chunk_activity(jnp.asarray(rays), rows, **kw))
    two = np.asarray(tile_chunk_activity_2level(
        jnp.asarray(rays), rows, jnp.asarray(lo), jnp.asarray(hi), **kw
    ))
    assert flat.sum() > 0
    np.testing.assert_array_equal(two, flat)
