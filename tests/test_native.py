"""Native (C++) accel packer vs the numpy reference implementation."""

import os

import numpy as np
import pytest

from tpu_pathtracer.scene import native


def _scene(n, seed):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-5, 5, size=(n, 1, 3)) + rng.uniform(
        -0.5, 0.5, size=(n, 3, 3)
    )
    cap = ((n + 127) // 128) * 128
    out = np.full((cap, 3, 3), 1e30, dtype=np.float64)
    out[:n] = verts
    valid = np.zeros(cap, dtype=bool)
    valid[:n] = True
    return out, valid


@pytest.fixture(scope="module")
def lib():
    lib = native.load_library()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def _numpy_env(monkeypatch):
    monkeypatch.setenv("TPU_PATHTRACER_NO_NATIVE", "1")


def test_morton_order_matches_numpy(lib, monkeypatch):
    from tpu_pathtracer.scene.accel import morton_order

    verts, valid = _scene(3000, 0)
    got = native.morton_argsort(verts, valid)
    _numpy_env(monkeypatch)
    want = morton_order(verts, valid)
    np.testing.assert_array_equal(got, want)


def test_build_woop_matches_numpy(lib, monkeypatch):
    from tpu_pathtracer.ops.intersect import build_woop

    verts, valid = _scene(1500, 1)
    got = native.build_woop(verts, valid)
    _numpy_env(monkeypatch)
    want = build_woop(verts, valid)
    assert got.shape == want.shape
    nan_g, nan_w = np.isnan(got), np.isnan(want)
    np.testing.assert_array_equal(nan_g, nan_w)
    # Adjugate (native) vs LAPACK (numpy) inverses agree to f32 rounding.
    np.testing.assert_allclose(
        got[~nan_g], want[~nan_w], rtol=5e-5, atol=1e-5
    )


def test_build_leaf_aabbs_matches_numpy(lib, monkeypatch):
    from tpu_pathtracer.scene.accel import build_leaves, morton_order

    verts, valid = _scene(2048, 2)
    perm = morton_order(verts, valid)
    verts, valid = verts[perm], valid[perm]
    gmin, gmax = native.build_leaf_aabbs(verts, valid, 16)
    _numpy_env(monkeypatch)
    wmin, wmax = build_leaves(verts, valid, 16)
    np.testing.assert_allclose(gmin, wmin)
    np.testing.assert_allclose(gmax, wmax)


def test_native_sah_quality():
    """The native sweep-SAH twin must produce a valid chunk-aligned
    permutation of equal split quality to the numpy build (tie order inside
    sorts may differ -> permutations need not be bit-equal)."""
    import tpu_pathtracer.scene.accel as accel
    from tpu_pathtracer.scene import native

    if native.load_library() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    n = 40_000
    centers = rng.uniform(-20, 20, (40, 3))
    base = centers[rng.integers(0, 40, n)]
    verts = (base[:, None, :] + rng.normal(scale=0.4, size=(n, 3, 3))).astype(
        np.float32
    )
    valid = np.ones(n, bool)
    valid[-17:] = False
    p_nat = native.sah_chunk_order(verts, valid, 128)
    orig = accel._use_native
    accel._use_native = lambda: False
    try:
        p_np = accel.sah_chunk_order(verts, valid, 128)
    finally:
        accel._use_native = orig

    def chunk_sa(perm):
        v = verts[perm][: valid.sum()]
        c = v.shape[0] // 128
        v = v[: c * 128].reshape(c, 128, 3, 3)
        d = v.max(axis=(1, 2)) - v.min(axis=(1, 2))
        return float((d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                      + d[:, 2] * d[:, 0]).sum())

    assert sorted(p_nat.tolist()) == list(range(n))  # a permutation
    assert not valid[p_nat[-17:]].any()  # invalid rows last
    ratio = chunk_sa(p_nat) / chunk_sa(p_np)
    assert 0.98 < ratio < 1.02, f"split quality diverged: SA ratio {ratio}"
