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
