#!/usr/bin/env python
"""One-shot TPU validation: golden RMSE + kernel agreement on the real chip.

The CI suite runs on CPU; this script re-runs the correctness anchors on the
actual TPU backend (where the Pallas intersector and f32 MXU paths differ
from the CPU interpret/XLA paths).  Prints one JSON line per check.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import (
        gen_rays, per_pixel_uniforms, render,
    )
    from tpu_pathtracer.ops.pallas_intersect import closest_hit_chunks
    from tpu_pathtracer.ops.traverse import closest_hit_leaves
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.image import quantize_u8, read_ppm
    from tpu_pathtracer.utils.testscenes import (
        make_cornell_gltf,
        make_sphere_field_gltf,
        make_textured_cornell_gltf,
    )

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    golden_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    cfg = RenderConfig(rays_per_batch=1 << 14, spp_per_pass=4)
    ok_all = True

    for name, fixture, golden in [
        ("cornell", make_cornell_gltf, "cornell_64x64_4096spp.ppm"),
        ("textured", make_textured_cornell_gltf, "textured_64x64_4096spp.ppm"),
    ]:
        p = fixture(f"/tmp/tpu_smoke/{name}/{name}.gltf")
        scene = parse_gltf_scene(p, 1.0, cfg)
        scene = dataclasses.replace(scene, camera=scene.camera.with_dims(64, 64))
        img = render(scene, spp=64, seed=0, config=cfg)
        ours = np.asarray(quantize_u8(img), dtype=np.float64)
        ref = read_ppm(os.path.join(golden_dir, golden)).astype(np.float64)
        rmse = float(np.sqrt(((ours - ref) ** 2).mean()))
        mean_diff = float(abs(ours.mean() - ref.mean()))
        passed = rmse < 14.0 and mean_diff < 3.0
        ok_all &= passed
        emit(check=f"golden-{name}", rmse=round(rmse, 2),
             mean_diff=round(mean_diff, 3), passed=passed)

    # Pallas kernel vs XLA leaf traversal on the device.
    p = make_sphere_field_gltf("/tmp/tpu_smoke/field/field.gltf", 64, 3)
    scene = parse_gltf_scene(p, 1.0, cfg)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    r = 8192
    pix = jnp.arange(r) + 280 * 512
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    hk = closest_hit_chunks(
        o, d, scene.chunk_woop, scene.chunk_aabb_min, scene.chunk_aabb_max,
        scene.woop, 1e-4,
    )
    hl = closest_hit_leaves(
        o, d, scene.leaf_aabb_min, scene.leaf_aabb_max, scene.leaf_woop, 1e-4
    )
    agree = float((np.asarray(hk.hit) == np.asarray(hl.hit)).mean())
    both = np.asarray(hk.hit) & np.asarray(hl.hit)
    tdiff = float(np.abs(np.asarray(hk.t)[both] - np.asarray(hl.t)[both]).max()) if both.any() else 0.0
    passed = agree > 0.999 and tdiff < 1e-3
    ok_all &= passed
    emit(check="pallas-vs-leaves", hit_agreement=agree,
         max_t_diff=tdiff, passed=passed)

    emit(check="ALL", passed=ok_all)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
