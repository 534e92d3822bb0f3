"""Multi-device tests on the faked 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""

import dataclasses

import jax
import numpy as np
import pytest

from tpu_pathtracer.models.pathtracer import render
from tpu_pathtracer.parallel.mesh import make_mesh, render_sharded
from tpu_pathtracer.scene.gltf import parse_gltf_scene
from tpu_pathtracer.utils.testscenes import make_cornell_gltf


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    p = make_cornell_gltf(str(tmp_path_factory.mktemp("s") / "c.gltf"))
    s = parse_gltf_scene(p, 1.0)
    return dataclasses.replace(s, camera=s.camera.with_dims(16, 16))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device(scene):
    """Per-pixel counter RNG gives every pixel the same sample stream under
    any sharding, so sharded output matches the single-device render to fp
    scheduling noise (XLA may reassociate reductions for different shapes;
    psum reassociates the spp sum) — a few ulps, not MC-noise-scale drift."""
    want = render(scene, spp=8, seed=3)
    for rays, spp_axis in [(8, 1), (4, 2), (2, 4), (1, 8)]:
        mesh = make_mesh(rays=rays, spp=spp_axis)
        got = render_sharded(scene, spp=8, seed=3, mesh=mesh)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_sharded_uses_all_devices(scene):
    # smoke: just ensure a (2,4) mesh runs and returns finite values
    mesh = make_mesh(rays=2, spp=4)
    img = render_sharded(scene, spp=8, seed=0, mesh=mesh)
    assert np.isfinite(img).all()
    assert img.shape == (16, 16, 3)


def test_multihost_single_process(scene):
    """With one process render_multihost degrades to the sharded render."""
    from tpu_pathtracer.parallel.multihost import (
        maybe_initialize_distributed,
        render_multihost,
    )

    assert maybe_initialize_distributed() is False
    img = render_multihost(scene, spp=8, seed=3)
    want = render(scene, spp=8, seed=3)
    np.testing.assert_allclose(img, want, rtol=0, atol=1e-5)
