"""Sampling distributions: sample <-> pdf consistency (src/raytracer.h:54-262).

Strategy: for each distribution, check that the pdf integrates to ~1 over the
sphere (MC with uniform sphere samples) and that sample() draws are
distributed according to pdf() (importance-weighted mean test).
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_pathtracer.ops import sampling

EPS = 1e-4


def _uniform_sphere(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_sphere_uniform_sample_is_unit_and_symmetric():
    k = jax.random.key(0)
    u = jax.random.uniform(k, (20000, 2))
    d = np.asarray(sampling.sphere_uniform_sample(u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.02


def test_cosine_pdf_integrates_to_one():
    n = np.array([0.0, 0.0, 1.0])
    dirs = _uniform_sphere(200000, 1)
    pdf = np.asarray(
        sampling.cosine_pdf(jnp.asarray(n)[None, :], jnp.asarray(dirs, jnp.float32))
    )
    integral = pdf.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.02


def test_cosine_sample_matches_pdf():
    """E[f(d)] under sample() vs MC integral of f * pdf over the sphere."""
    normal = np.array([0.3, -0.5, 0.81], dtype=np.float32)
    normal /= np.linalg.norm(normal)
    k = jax.random.key(2)
    u = jax.random.uniform(k, (200000, 2))
    nn = jnp.broadcast_to(jnp.asarray(normal), (u.shape[0], 3))
    d = np.asarray(sampling.cosine_sample(nn, u[:, 0], u[:, 1]))
    # f(d) = (1 + <d, ref>)^2 for an arbitrary fixed ref
    ref = np.array([0.2, 0.9, -0.1])
    f_sampled = ((1 + d @ ref) ** 2).mean()

    dirs = _uniform_sphere(400000, 3)
    pdf = np.asarray(
        sampling.cosine_pdf(jnp.asarray(normal)[None], jnp.asarray(dirs, jnp.float32))
    )
    f_int = (((1 + dirs @ ref) ** 2) * pdf).mean() * 4 * np.pi
    assert abs(f_sampled - f_int) < 0.03 * max(1.0, abs(f_int))


def _vndf_pdf_oracle(alpha, in_dir, normal, dirv):
    """Float64 port of VNDF_dist::pdf (src/raytracer.h:175-219), scalar.

    Note: the reference pdf is deliberately NOT normalized over the sphere for
    grazing view directions (numerical integration gives e.g. 1.128 at
    alpha=1, in_dir z=-0.77) — parity means matching their density exactly,
    so the test is oracle equality, not integral-to-one.
    """
    n = normal
    res = np.ones(3)
    if abs(n[0]) > 0.5:
        res[0] -= res @ n / n[0]
    elif abs(n[1]) > 0.5:
        res[1] -= res @ n / n[1]
    else:
        res[2] -= res @ n / n[2]
    nx = res / np.linalg.norm(res)
    ny = np.cross(n, nx)
    v = -np.array([nx @ in_dir, ny @ in_dir, n @ in_dir])
    nv = dirv - in_dir
    nv = nv / np.linalg.norm(nv)
    h = np.array([nx @ nv, ny @ nv, n @ nv])
    vdn = v @ h
    if vdn <= 0:
        return 0.0
    lam = (-1 + np.sqrt(1 + (v[0] ** 2 + v[1] ** 2) * alpha**2 / v[2] ** 2)) / 2
    g1 = 1 / (1 + lam)
    dn = 1 / np.pi / alpha / alpha / ((h[0] / alpha) ** 2 + (h[1] / alpha) ** 2 + h[2] ** 2) ** 2
    dv = g1 * vdn * dn / max(EPS, v[2])
    return dv / 4 / vdn


def test_vndf_pdf_matches_cpp_oracle():
    rng = np.random.default_rng(11)
    for alpha in (0.04**2, 0.09, 0.3, 1.0):
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal)
        in_dir = rng.normal(size=3)
        in_dir /= np.linalg.norm(in_dir)
        if in_dir @ normal > -0.05:
            in_dir -= 2 * normal * (in_dir @ normal)  # make it incoming
        dirs = _uniform_sphere(512, int(alpha * 1000) + 13)
        want = np.array([_vndf_pdf_oracle(alpha, in_dir, normal, d) for d in dirs])
        got = np.asarray(
            sampling.vndf_pdf(
                jnp.full((dirs.shape[0],), alpha, jnp.float32),
                jnp.broadcast_to(jnp.asarray(in_dir, jnp.float32), (dirs.shape[0], 3)),
                jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (dirs.shape[0], 3)),
                jnp.asarray(dirs, jnp.float32),
                EPS,
            )
        )
        big = want > 1e-3
        np.testing.assert_allclose(got[big], want[big], rtol=2e-3)
        assert (got[~big] <= 2e-3 + want[~big] * 1.01).all()


def test_vndf_sample_matches_pdf():
    """Importance identity: E_sample[f/pdf(sample)] == uniform-MC of f."""
    normal = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    in_dir = np.array([0.4, -0.3, -0.87], dtype=np.float32)
    in_dir /= np.linalg.norm(in_dir)
    alpha = 0.5
    n = 200000
    k = jax.random.key(5)
    u = jax.random.uniform(k, (n, 2))
    nn = jnp.broadcast_to(jnp.asarray(normal), (n, 3))
    ii = jnp.broadcast_to(jnp.asarray(in_dir), (n, 3))
    al = jnp.full((n,), alpha, jnp.float32)
    d = sampling.vndf_sample(al, ii, nn, u[:, 0], u[:, 1])
    pdf_at_sample = np.asarray(sampling.vndf_pdf(al, ii, nn, d, EPS))
    d = np.asarray(d)
    ref = np.array([0.1, 0.2, 0.97])
    f = (1 + d @ ref) ** 2
    ok = pdf_at_sample > 1e-6
    est = (f[ok] / pdf_at_sample[ok]).sum() / n  # integral of f over support

    dirs = _uniform_sphere(400000, 6)
    pdf_u = np.asarray(
        sampling.vndf_pdf(
            jnp.full((dirs.shape[0],), alpha, jnp.float32),
            jnp.broadcast_to(jnp.asarray(in_dir), (dirs.shape[0], 3)),
            jnp.broadcast_to(jnp.asarray(normal), (dirs.shape[0], 3)),
            jnp.asarray(dirs, jnp.float32),
            EPS,
        )
    )
    fu = (1 + dirs @ ref) ** 2
    want = (fu * (pdf_u > 1e-6)).mean() * 4 * np.pi  # integral of f over support
    # both estimate integral f d(omega) over the pdf's support
    est_support = ((pdf_u > 1e-6) * fu).mean() * 4 * np.pi
    assert abs(est - est_support) / abs(est_support) < 0.08, (est, est_support)


def test_light_triangle_sample_hits_triangle():
    a = np.array([0.0, 2.0, 0.0], np.float32)
    b = np.array([1.0, 2.0, 0.0], np.float32)
    c = np.array([0.0, 2.0, 1.0], np.float32)
    x = np.zeros(3, np.float32)
    k = jax.random.key(7)
    u = jax.random.uniform(k, (1000, 2))
    d = np.asarray(
        sampling.light_triangle_sample(
            jnp.broadcast_to(x, (1000, 3)),
            jnp.broadcast_to(a, (1000, 3)),
            jnp.broadcast_to(b, (1000, 3)),
            jnp.broadcast_to(c, (1000, 3)),
            u[:, 0],
            u[:, 1],
        )
    )
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # All directions must pierce the light plane y=2 with x,z inside the tri
    t = 2.0 / d[:, 1]
    assert (t > 0).all()
    px = t * d[:, 0]
    pz = t * d[:, 2]
    assert (px >= -1e-4).all() and (pz >= -1e-4).all()
    assert (px + pz <= 1 + 1e-4).all()


def test_pick_uniform_bounds():
    u = jnp.asarray(np.linspace(0, 0.999999, 1000), jnp.float32)
    idx = np.asarray(sampling.pick_uniform(u, jnp.asarray(7)))
    assert idx.min() == 0 and idx.max() == 6
    counts = np.bincount(idx, minlength=7)
    assert (counts > 100).all()
