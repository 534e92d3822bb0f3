"""High-level Renderer facade."""

import numpy as np

from tpu_pathtracer.renderer import Renderer
from tpu_pathtracer.utils.image import read_ppm
from tpu_pathtracer.utils.testscenes import make_cornell_gltf


def test_renderer_roundtrip(tmp_path):
    p = make_cornell_gltf(str(tmp_path / "c.gltf"))
    r = Renderer(p)
    hdr = r.render(24, 24, spp=2, seed=0)
    assert hdr.shape == (24, 24, 3) and np.isfinite(hdr).all()
    out = str(tmp_path / "f.ppm")
    r.write(out, hdr)
    assert read_ppm(out).shape == (24, 24, 3)


def test_renderer_look_at_changes_view(tmp_path):
    p = make_cornell_gltf(str(tmp_path / "c.gltf"))
    r = Renderer(p)
    a = r.render_ldr(16, 16, spp=2)
    r.look_at(eye=(0, 1.0, 0.5), target=(0, 1.0, -1.0), fov_x=1.2)
    b = r.render_ldr(16, 16, spp=2)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0


def test_renderer_homebrew(tmp_path):
    import os
    import pytest

    scene = "/root/reference/sample_data/scene-000.txt"
    if not os.path.exists(scene):
        pytest.skip("reference not mounted")
    r = Renderer(scene)
    img = r.render_ldr(32, 24, spp=1)
    assert img.shape == (24, 32, 3)


def test_camera_moves_do_not_recompile(tmp_path):
    """Camera vectors are pytree data (scene/types.py Camera): look_at between
    frames of the same size must hit the jit cache, not re-trace."""
    from tpu_pathtracer.models import pathtracer as pt

    p = make_cornell_gltf(str(tmp_path / "c.gltf"))
    r = Renderer(p)
    r.look_at(eye=(0, 1.0, 3.8), target=(0, 1.0, 0.0))
    a = r.render(16, 16, spp=1, seed=0)
    engine = pt.render_chunk_persistent if r.config.compaction else pt.render_chunk
    n_compiled = engine._cache_size()
    for eye in [(0.2, 1.1, 3.5), (-0.3, 0.9, 3.9), (0.0, 1.4, 3.0)]:
        r.look_at(eye=eye, target=(0, 1.0, 0.0), fov_x=1.1)
        b = r.render(16, 16, spp=1, seed=0)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() > 0  # the view actually moved
    assert engine._cache_size() == n_compiled, "camera move re-jitted"
