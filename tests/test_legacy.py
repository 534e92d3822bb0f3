"""Homebrew integrators: Whitted + course MC over analytic primitives."""

import dataclasses
import os

import numpy as np
import pytest

from tpu_pathtracer.models.legacy import render_homebrew
from tpu_pathtracer.scene.homebrew import parse_homebrew_scene
from tpu_pathtracer.utils.image import quantize_u8

REF_SAMPLES = "/root/reference/sample_data"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_SAMPLES), reason="reference not mounted"
)


def _render(path, w, h, **kw):
    scene = parse_homebrew_scene(path)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(w, h), **kw)
    return render_homebrew(scene, seed=0)


@needs_ref
def test_scene000_flat_colors():
    """scene-000 is stage-1 homework: flat primitive colors over the bg."""
    hdr = _render(os.path.join(REF_SAMPLES, "scene-000.txt"), 160, 120)
    img = np.asarray(quantize_u8(hdr))
    np.testing.assert_array_equal(img[0, 0], [0, 0, 205])  # bg (0,0,0.5)
    np.testing.assert_array_equal(img[115, 80], [0, 231, 0])  # green plane
    np.testing.assert_array_equal(img[60, 30], [231, 0, 0])  # red ellipsoid
    np.testing.assert_array_equal(img[28, 125], [231, 231, 0])  # yellow box


@needs_ref
def test_scene001_lit_is_shaded():
    """Lit Whitted scenes produce non-flat diffuse shading + shadows."""
    hdr = _render(os.path.join(REF_SAMPLES, "scene-001.txt"), 96, 64)
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0
    # Shading varies across surfaces (not flat fills).
    assert len(np.unique(np.asarray(quantize_u8(hdr)).reshape(-1, 3), axis=0)) > 30


@needs_ref
def test_practice2_dielectric_and_metal():
    hdr = _render(
        os.path.join(REF_SAMPLES, "homebrew_primitives", "practice2.txt"), 64, 36,
        ray_depth=4,  # keep the unrolled recursion small for CPU test speed
    )
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0.1


@needs_ref
def test_practice5_mc_converges():
    """MC mode: two seeds converge to the same mean radiance."""
    p = os.path.join(REF_SAMPLES, "homebrew_primitives", "practice5_1.txt")
    scene = parse_homebrew_scene(p)
    scene = dataclasses.replace(
        scene, camera=scene.camera.with_dims(48, 36), samples=64
    )
    a = render_homebrew(scene, seed=0)
    b = render_homebrew(scene, seed=1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # Identical estimator, independent streams: means agree within MC noise.
    assert abs(a.mean() - b.mean()) < 0.02 * max(a.mean(), 1e-3)


@needs_ref
def test_whitted_deep_depth():
    """RAY_DEPTH beyond the default stack floor must not be silently
    truncated: the stack is sized from the scene (depth + 1 slots), so a
    depth-16 render runs and is converged vs depth-20 (practice2's actual
    reflect/refract chains die out well before 16 via the weight cutoff)."""
    p = os.path.join(REF_SAMPLES, "homebrew_primitives", "practice2.txt")
    a = _render(p, 48, 27, ray_depth=16)
    b = _render(p, 48, 27, ray_depth=20)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@needs_ref
def test_whitted_deterministic():
    p = os.path.join(REF_SAMPLES, "scene-002.txt")
    a = _render(p, 32, 24)
    b = _render(p, 32, 24)
    np.testing.assert_array_equal(a, b)
