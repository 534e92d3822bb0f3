#!/usr/bin/env python
"""Benchmark: Mrays/s on a Sponza-class synthetic scene (single chip).

The reference's headline number is Sponza 1000x1000 @1000 spp in ~47 min on a
multi-core CPU — ~3.5e5 pixel-samples/s, i.e. ~1.4-2.8 Mrays/s counting <=8
bounces per sample (BASELINE.md).  The course Sponza glTF is not
redistributable (gitignored in the reference), so this bench renders a
procedural scene of comparable triangle count (~82k tris: icosphere field +
floor + area light) with the full estimator (VNDF/cosine/light MIS, textures
path, alpha RR) and reports Mrays/s using the same ray-counting convention
(pixels * spp * ray_depth).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is speedup over the top of the reference's derived range
(2.8 Mrays/s).
"""

import dataclasses
import json
import os
import sys
import tempfile
import time

WIDTH = 512
HEIGHT = 512
SPP = 32
BASELINE_MRAYS = 2.8  # top of the reference's derived range (BASELINE.md)


def main() -> int:
    from tpu_pathtracer.cli import setup_backend
    from tpu_pathtracer.utils.backend import tpu_alive

    global WIDTH, HEIGHT, SPP
    if not os.environ.get("TPU_PATHTRACER_PLATFORM") and not tpu_alive():
        print("TPU unavailable; falling back to CPU at reduced size",
              file=sys.stderr)
        os.environ["TPU_PATHTRACER_PLATFORM"] = "cpu"
    if os.environ.get("TPU_PATHTRACER_PLATFORM") == "cpu":
        # Keep the CPU fallback under ~3 minutes on one core; the number is
        # a liveness signal, not a performance claim (metric says "cpu").
        WIDTH, HEIGHT, SPP = 96, 96, 2

    setup_backend()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.models.pathtracer import render
    from tpu_pathtracer.utils.testscenes import make_sphere_field_gltf

    # On-chip sweep winner (scripts/probe_render.py): 64k-ray wavefronts,
    # whole-bench-spp passes (4 dispatches total at 512^2@32spp).
    config = RenderConfig(rays_per_batch=1 << 16, spp_per_pass=32)
    tmp = tempfile.mkdtemp(prefix="bench_scene_")
    # Textured like the real Sponza headline workload (README.md:4-5): the
    # bilinear-fetch path carries bench load, not just the intersector.
    path = make_sphere_field_gltf(
        os.path.join(tmp, "field.gltf"), n_spheres=64, subdiv=3, textured=True
    )
    scene = parse_gltf_scene(path, WIDTH / HEIGHT, config)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(WIDTH, HEIGHT))
    n_tris = int(scene.valid.sum())
    print(f"bench scene: {n_tris} triangles (textured), {WIDTH}x{HEIGHT} @ {SPP} spp",
          file=sys.stderr)

    # Warm-up: one spp pass compiles the exact shapes the timed run uses.
    try:
        t0 = time.perf_counter()
        render(scene, spp=config.spp_per_pass, seed=0, config=config)
        warm = time.perf_counter() - t0
        print(f"warm-up (incl. compile): {warm:.1f}s", file=sys.stderr)

        # Best of 2: the shared tunnel-backed chip has multi-minute slow
        # phases (congestion on the relay); the best run reflects the
        # hardware, the mean reflects the neighbours.
        rep_times = []
        for rep in range(2):
            t0 = time.perf_counter()
            img = render(scene, spp=SPP, seed=1, config=config)
            rep_times.append(round(time.perf_counter() - t0, 3))
        dt = min(rep_times)
        assert img.shape == (HEIGHT, WIDTH, 3)
    except Exception as err:  # noqa: BLE001 — always emit the metric line
        print(f"bench render failed: {err}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "synthetic-sponza Mrays/s (RENDER FAILED)",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                }
            )
        )
        return 1

    rays = WIDTH * HEIGHT * SPP * scene.ray_depth
    mrays = rays / dt / 1e6
    print(
        f"render: {dt:.2f}s, {WIDTH*HEIGHT*SPP/dt:.0f} pixel-samples/s",
        file=sys.stderr,
    )
    backend = os.environ.get("TPU_PATHTRACER_PLATFORM") or "tpu"
    print(
        json.dumps(
            {
                "metric": (
                    f"synthetic-sponza-{n_tris//1000}k-tris-textured Mrays/s "
                    f"({WIDTH}x{HEIGHT}@{SPP}spp, depth {scene.ray_depth}, "
                    f"{backend})"
                ),
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
                # Methodology record (ADVICE r2): the shared tunnel-backed
                # chip has multi-minute congestion phases; best-of-N reflects
                # the hardware, the per-rep times expose the spread.
                "timing": "best_of_2",
                "rep_times_s": rep_times,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
