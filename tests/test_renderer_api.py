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
