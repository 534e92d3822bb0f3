"""Checkpoint/resume: interrupted renders must equal uninterrupted ones."""

import dataclasses
import os

import numpy as np

from tpu_pathtracer.models.pathtracer import render
from tpu_pathtracer.parallel.checkpoint import (
    RenderState,
    render_with_checkpoints,
)
from tpu_pathtracer.scene.gltf import parse_gltf_scene
from tpu_pathtracer.utils.testscenes import make_cornell_gltf


def _scene(tmp_path, w=16, h=16):
    p = make_cornell_gltf(str(tmp_path / "c.gltf"))
    s = parse_gltf_scene(p, w / h)
    return dataclasses.replace(s, camera=s.camera.with_dims(w, h))


def test_checkpointed_matches_plain(tmp_path):
    scene = _scene(tmp_path)
    want = render(scene, spp=6, seed=5)
    got = render_with_checkpoints(
        scene, spp=6, seed=5, checkpoint_path=str(tmp_path / "ck.npz"),
        checkpoint_every=2,
    )
    # Pass-chunked accumulation reassociates the sample sum -> ulp noise.
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_checkpointed_frame_pool_matches_plain(tmp_path):
    """frame_pool pools the whole frame per call inside the checkpoint loop
    too; paths are identical, only fp summation order moves."""
    from tpu_pathtracer.config import RenderConfig

    scene = _scene(tmp_path, w=48, h=16)  # 768 px > one 512-lane chunk
    cfg = RenderConfig(rays_per_batch=512, frame_pool=True)
    want = render(scene, spp=6, seed=5, config=RenderConfig(rays_per_batch=512))
    got = render_with_checkpoints(
        scene, spp=6, seed=5, config=cfg,
        checkpoint_path=str(tmp_path / "ckfp.npz"), checkpoint_every=2,
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_resume_after_interruption(tmp_path):
    scene = _scene(tmp_path)
    ck = str(tmp_path / "ck.npz")
    # Render only the first 4 samples (simulates dying at a checkpoint).
    render_with_checkpoints(scene, spp=4, seed=9, checkpoint_path=ck,
                            checkpoint_every=2)
    st = RenderState.load(ck)
    assert st.samples_done == 4
    # Resume to 8: must continue the sample counter, not restart it.
    resumed = render_with_checkpoints(scene, spp=8, seed=9, checkpoint_path=ck,
                                      checkpoint_every=2)
    uninterrupted = render_with_checkpoints(
        scene, spp=8, seed=9, checkpoint_path=str(tmp_path / "ck2.npz"),
        checkpoint_every=2,
    )
    np.testing.assert_array_equal(resumed, uninterrupted)


def test_mismatched_checkpoint_ignored(tmp_path):
    scene = _scene(tmp_path)
    ck = str(tmp_path / "ck.npz")
    render_with_checkpoints(scene, spp=2, seed=1, checkpoint_path=ck)
    # Different seed -> checkpoint must be ignored, not silently mixed in.
    a = render_with_checkpoints(scene, spp=2, seed=2, checkpoint_path=ck)
    b = render(scene, spp=2, seed=2)
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def test_checkpoint_rejects_different_scene(tmp_path):
    """A checkpoint from a different scene at the same (W, H, seed) must be
    ignored, not blended in (scene/config fingerprint in the npz)."""
    import dataclasses

    from tpu_pathtracer.parallel.checkpoint import render_with_checkpoints
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.models.pathtracer import render
    from tpu_pathtracer.utils.testscenes import (
        make_cornell_gltf,
        make_textured_cornell_gltf,
    )

    def load(fixture, name):
        p = fixture(str(tmp_path / name / (name + ".gltf")))
        s = parse_gltf_scene(p, 1.0)
        return dataclasses.replace(s, camera=s.camera.with_dims(16, 16))

    a = load(make_cornell_gltf, "a")
    b = load(make_textured_cornell_gltf, "b")
    ckpt = str(tmp_path / "state.npz")
    render_with_checkpoints(a, spp=4, seed=5, checkpoint_path=ckpt)
    # Resume with a DIFFERENT scene: the stale checkpoint must be discarded.
    img = render_with_checkpoints(b, spp=4, seed=5, checkpoint_path=ckpt)
    want = render(b, spp=4, seed=5)
    np.testing.assert_allclose(img, want, rtol=0, atol=1e-6)
