"""Morton-leaf traversal must agree with the dense brute-force sweep."""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops.intersect import build_woop, closest_hit, tri_capacity
from tpu_pathtracer.ops.traverse import closest_hit_leaves
from tpu_pathtracer.scene.accel import (
    LEAF_SIZE,
    build_leaves,
    leaf_woop,
    morton_order,
)

EPS = 1e-4


def _scene(n_tris, seed, spread=5.0, tri_size=0.5):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-spread, spread, size=(n_tris, 1, 3))
    verts = center + rng.uniform(-tri_size, tri_size, size=(n_tris, 3, 3))
    cap = tri_capacity(n_tris)
    out = np.full((cap, 3, 3), 1e30, dtype=np.float64)
    out[:n_tris] = verts
    valid = np.zeros(cap, dtype=bool)
    valid[:n_tris] = True
    perm = morton_order(out, valid)
    return out[perm], valid[perm]


def _rays(n, seed, spread=8.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_leaf_traversal_matches_dense():
    verts, valid = _scene(3000, seed=0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    lw = leaf_woop(woop, LEAF_SIZE)
    o, d = _rays(512, seed=1)

    dense = closest_hit(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(woop), EPS,
    )
    leaves = closest_hit_leaves(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(lmin), jnp.asarray(lmax), jnp.asarray(lw), EPS, k=4,
    )
    hit_d = np.asarray(dense.hit)
    hit_l = np.asarray(leaves.hit)
    # Slab culling in f32 may disagree on razor-thin grazing hits only.
    assert (hit_d == hit_l).mean() > 0.995
    both = hit_d & hit_l
    np.testing.assert_allclose(
        np.asarray(leaves.t)[both], np.asarray(dense.t)[both], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(leaves.tri)[both] == np.asarray(dense.tri)[both]).mean() > 0.99


def test_leaf_traversal_small_k_forces_multiround():
    """k=1 forces many while_loop rounds; result must still be exact."""
    verts, valid = _scene(320, seed=2, spread=2.0, tri_size=0.8)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    lw = leaf_woop(woop, LEAF_SIZE)
    o, d = _rays(128, seed=3, spread=4.0)
    dense = closest_hit(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(woop), EPS,
    )
    leaves = closest_hit_leaves(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(lmin), jnp.asarray(lmax), jnp.asarray(lw), EPS, k=1,
    )
    both = np.asarray(dense.hit) & np.asarray(leaves.hit)
    assert (np.asarray(dense.hit) == np.asarray(leaves.hit)).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(leaves.t)[both], np.asarray(dense.t)[both], rtol=1e-5, atol=1e-6
    )
