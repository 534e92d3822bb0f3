"""Randomized parity fuzz: render random glTF scenes with both
implementations and compare mean radiance (bias check at MC-noise scale).

Needs g++ + the mounted reference to build the oracle binary; skipped
otherwise.  Seeds are fixed so failures reproduce.
"""

import dataclasses
import os
import shutil
import subprocess

import numpy as np
import pytest

from tpu_pathtracer.models.pathtracer import render
from tpu_pathtracer.scene.gltf import parse_gltf_scene
from tpu_pathtracer.utils.fuzz import make_fuzz_gltf
from tpu_pathtracer.utils.image import quantize_u8, read_ppm

REF_MAIN = "/root/reference/src/main.cpp"


@pytest.fixture(scope="module")
def ref_binary(tmp_path_factory):
    if not os.path.exists(REF_MAIN) or shutil.which("g++") is None:
        pytest.skip("reference source or g++ unavailable")
    out = str(tmp_path_factory.mktemp("bin") / "raytracer")
    subprocess.check_call(["g++", "-O2", "-std=c++20", "-o", out, REF_MAIN])
    return out


@pytest.mark.parametrize("seed", [11, 23, 47, 104, 111, 117])
def test_fuzz_scene_mean_parity(tmp_path, ref_binary, seed):
    scene_path = make_fuzz_gltf(str(tmp_path / f"fuzz{seed}.gltf"), seed)
    w = h = 48
    ref_out = str(tmp_path / "ref.ppm")
    subprocess.check_call(
        [ref_binary, scene_path, str(w), str(h), "192", ref_out],
        stderr=subprocess.DEVNULL,
        stdout=subprocess.DEVNULL,
    )
    ref = read_ppm(ref_out).astype(np.float64)

    scene = parse_gltf_scene(scene_path, w / h)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(w, h))
    img = render(scene, spp=96, seed=0)
    ours = np.asarray(quantize_u8(img), dtype=np.float64)

    mean_diff = np.abs(ours.mean(axis=(0, 1)) - ref.mean(axis=(0, 1)))
    assert mean_diff.max() < 4.0, (
        f"seed {seed}: per-channel mean diff {mean_diff} "
        f"(ours {ours.mean(axis=(0, 1))} vs ref {ref.mean(axis=(0, 1))})"
    )
    rmse = float(np.sqrt(((ours - ref) ** 2).mean()))
    assert rmse < 30.0, f"seed {seed}: RMSE {rmse}"  # noise-dominated bound
