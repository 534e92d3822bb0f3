"""Intersection kernels vs a trusted numpy Cramer oracle (src/bvh.h:36-65)."""

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops.intersect import (
    TRI_BLOCK,
    build_woop,
    closest_hit,
    light_pdf_sum,
    tri_capacity,
)

EPS = 1e-4


def _cramer_closest(o, d, verts, valid, min_dst):
    """Float64 port of the reference math: per-(ray, tri) determinants."""
    a = verts[:, 0]
    av = verts[:, 1] - a
    au = verts[:, 2] - a
    at = -d[:, None, :]
    y = o[:, None, :] - a[None]

    def det(c1, c2, c3):
        return np.einsum("...i,...i->...", c1, np.cross(c2, c3))

    avb = np.broadcast_to(av[None], y.shape)
    aub = np.broadcast_to(au[None], y.shape)
    denom = det(avb, aub, at)
    beta = det(y, aub, at) / denom
    gamma = det(avb, y, at) / denom
    t = det(avb, aub, y) / denom
    ok = (
        (beta >= 0)
        & (gamma >= 0)
        & (beta + gamma <= 1)
        & (t >= min_dst)
        & valid[None, :]
    )
    t = np.where(ok, t, np.inf)
    idx = np.argmin(t, axis=1)
    best = t[np.arange(t.shape[0]), idx]
    return best, idx, np.isfinite(best)


def _random_scene(n_tris, seed, spread=2.0):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-spread, spread, size=(n_tris, 1, 3))
    verts = center + rng.uniform(-0.8, 0.8, size=(n_tris, 3, 3))
    return verts.astype(np.float64)


def _pad_scene(verts):
    n = verts.shape[0]
    cap = tri_capacity(n)
    out = np.full((cap, 3, 3), 1e30, dtype=np.float64)
    out[:n] = verts
    valid = np.zeros(cap, dtype=bool)
    valid[:n] = True
    return out, valid


def test_closest_hit_matches_cramer_small():
    verts, valid = _pad_scene(_random_scene(37, seed=1))
    woop = build_woop(verts, valid)
    rng = np.random.default_rng(2)
    o = rng.uniform(-4, 4, size=(256, 3))
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = closest_hit(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                      jnp.asarray(woop), EPS)
    t_ref, idx_ref, hit_ref = _cramer_closest(o, d, verts, valid, EPS)

    got_hit = np.asarray(hit.hit)
    # f32 vs f64 can disagree on razor-thin grazing hits; demand 99%+ agreement
    agree = got_hit == hit_ref
    assert agree.mean() > 0.99, f"hit agreement {agree.mean()}"
    both = got_hit & hit_ref & agree
    np.testing.assert_allclose(
        np.asarray(hit.t)[both], t_ref[both], rtol=2e-3, atol=1e-4
    )
    # Winning triangle should match whenever ts are distinct
    same_tri = np.asarray(hit.tri)[both] == idx_ref[both]
    assert same_tri.mean() > 0.98


def test_closest_hit_scanned_blocks():
    """Scenes larger than TRI_BLOCK go through the lax.scan path."""
    n = TRI_BLOCK * 2 + 1  # capacity pads to 3 * TRI_BLOCK
    verts, valid = _pad_scene(_random_scene(n, seed=3, spread=6.0))
    woop = build_woop(verts, valid)
    rng = np.random.default_rng(4)
    o = rng.uniform(-8, 8, size=(64, 3))
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = closest_hit(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                      jnp.asarray(woop), EPS)
    t_ref, idx_ref, hit_ref = _cramer_closest(o, d, verts, valid, EPS)
    agree = np.asarray(hit.hit) == hit_ref
    assert agree.mean() > 0.98
    both = np.asarray(hit.hit) & hit_ref & agree
    np.testing.assert_allclose(
        np.asarray(hit.t)[both], t_ref[both], rtol=2e-3, atol=1e-4
    )


def test_barycentrics_on_known_triangle():
    verts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], dtype=np.float64)
    verts, valid = _pad_scene(verts)
    woop = build_woop(verts, valid)
    # Ray straight down onto barycentric point beta=.25 (towards b), gamma=.5
    o = np.array([[0.25, 0.5, 1.0]])
    d = np.array([[0.0, 0.0, -1.0]])
    hit = closest_hit(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
                      jnp.asarray(woop), EPS)
    assert bool(hit.hit[0])
    assert abs(float(hit.t[0]) - 1.0) < 1e-5
    assert abs(float(hit.beta[0]) - 0.25) < 1e-5
    assert abs(float(hit.gamma[0]) - 0.5) < 1e-5


def test_light_pdf_sum_matches_reference_formula():
    """pdf = sum over pierced lights of |x-y|^2/(|<d,n>| area) / count
    (src/raytracer.h:363-376, 79-84, 241-253)."""
    rng = np.random.default_rng(5)
    lights = _random_scene(9, seed=6)
    cap = 16
    lverts = np.full((cap, 3, 3), 1e30)
    lverts[:9] = lights
    e1 = lverts[:, 1] - lverts[:, 0]
    e2 = lverts[:, 2] - lverts[:, 0]
    cr = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(cr, axis=-1)
    with np.errstate(invalid="ignore"):
        nrm = cr / np.linalg.norm(cr, axis=-1, keepdims=True)
    nrm = np.nan_to_num(nrm)

    o = rng.uniform(-4, 4, size=(128, 3))
    d = rng.normal(size=(128, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    got = np.asarray(
        light_pdf_sum(
            jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32),
            jnp.asarray(lverts, jnp.float32),
            jnp.asarray(nrm, jnp.float32),
            jnp.asarray(area, jnp.float32),
            jnp.asarray(9, jnp.int32),
            EPS,
        )
    )

    # Oracle: loop over lights with the Cramer validity window.
    want = np.zeros(128)
    for li in range(9):
        v = lights[li]
        a, av, au = v[0], v[1] - v[0], v[2] - v[0]
        at = -d
        y = o - a

        def det(c1, c2, c3):
            return np.einsum("...i,...i->...", c1, np.cross(c2, c3))

        avb = np.broadcast_to(av, d.shape)
        aub = np.broadcast_to(au, d.shape)
        denom = det(avb, aub, at)
        beta = det(y, aub, at) / denom
        gamma = det(avb, y, at) / denom
        t = det(avb, aub, y) / denom
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= EPS)
        yhit = o + t[:, None] * d
        dist2 = np.sum((yhit - o) ** 2, axis=-1)
        proj = dist2 / np.abs(np.einsum("ri,i->r", d, nrm[li]))
        want += np.where(ok, proj / area[li], 0.0)
    want /= 9

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
