"""Command-line entry point with the reference's exact argv contract.

``main.cpp`` (src/main.cpp:16-49) takes five positional arguments:

    raytracer <scene> <width> <height> <samples> <out.ppm>

and exits 1 with a message on stderr for too-few args or a runtime error.
This CLI keeps that contract bit-for-bit (so ``run.sh``/``run-test.sh``-style
harnesses work unchanged) and extends the scene front-end: ``.gltf`` goes to
the glTF loader like the reference, anything else to the homebrew
``scene-NNN.txt`` parser — the format the reference ships data for but can no
longer parse (SURVEY §2 C19).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import List, Optional

from .config import DEFAULT_CONFIG, RenderConfig


def _strtol(s: str) -> int:
    """std::strtol semantics: skip leading whitespace, parse the leading
    integer, 0 if none (src/main.cpp:23-25)."""
    i = 0
    while i < len(s) and s[i] in " \t\n\v\f\r":
        i += 1
    if i < len(s) and s[i] in "+-":
        i += 1
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    if j == i:
        return 0
    return int(s[: j])


def render_scene_file(
    scene_path: str,
    width: int,
    height: int,
    samples: int,
    config: RenderConfig = DEFAULT_CONFIG,
    seed: int = 0,
    progress: bool = True,
    timer=None,
):
    """Load + render any supported scene file -> (HDR numpy image, metrics)."""
    from .utils.metrics import RenderMetrics

    # The 5-arg CLI contract has no flag slots (parity with main.cpp), so
    # the estimator-VISIBLE extension the reference lacks is reachable via
    # env: TPU_PATHTRACER_JITTER=sobol swaps the camera jitter for the
    # Owen-scrambled (0,2)-sequence (config.py `jitter`; perf knobs go
    # through TPU_PT_* / IntersectTuning instead).
    env_jitter = os.environ.get("TPU_PATHTRACER_JITTER")
    if env_jitter and env_jitter != config.jitter:
        config = dataclasses.replace(config, jitter=env_jitter)
    # TPU_PATHTRACER_LOWDISC=sobol: Owen-Sobol for the per-bounce VNDF and
    # light-point pairs too (config.py `lowdisc`).
    env_ld = os.environ.get("TPU_PATHTRACER_LOWDISC")
    if env_ld and env_ld != config.lowdisc:
        config = dataclasses.replace(config, lowdisc=env_ld)

    t0 = time.perf_counter()
    if scene_path.endswith(".gltf") or scene_path.endswith(".glb"):
        from .scene.gltf import parse_gltf_scene
        from .models.pathtracer import render

        scene = parse_gltf_scene(scene_path, width / height, config)
        scene = dataclasses.replace(
            scene, camera=scene.camera.with_dims(width, height), samples=samples
        )
        t_load = time.perf_counter() - t0
        t1 = time.perf_counter()
        run_stats: dict = {}
        hdr = render(
            scene, spp=samples, seed=seed, config=config, progress=progress,
            timer=timer, stats=run_stats,
        )
        depth = scene.ray_depth
    else:
        from .scene.homebrew import parse_homebrew_scene
        from .models.legacy import render_homebrew

        scene = parse_homebrew_scene(scene_path)
        scene = dataclasses.replace(
            scene, camera=scene.camera.with_dims(width, height)
        )
        if samples > 0 and scene.monte_carlo:
            scene = dataclasses.replace(scene, samples=samples)
        t_load = time.perf_counter() - t0
        t1 = time.perf_counter()
        hdr = render_homebrew(scene, seed=seed, config=config)
        depth = scene.ray_depth
        run_stats = {}
    t_render = time.perf_counter() - t1

    metrics = RenderMetrics(
        width=width,
        height=height,
        samples=samples,
        ray_depth=depth,
        load_seconds=t_load,
        render_seconds=t_render,
        measured_rays=run_stats.get("measured_rays"),
    )
    return hdr, metrics


def setup_backend() -> None:
    """Apply backend env overrides + persistent compilation cache.

    ``TPU_PATHTRACER_PLATFORM=cpu`` forces a backend; the compilation cache
    (default ``~/.cache/tpu_pathtracer/jit``) makes repeat renders skip the
    multi-minute XLA compile — disable with TPU_PATHTRACER_NO_CACHE=1.
    """
    import jax

    platform = os.environ.get("TPU_PATHTRACER_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    # Debug/observability hooks (SURVEY §5: the race-detector/NaN-check
    # analog).  Note the reference's estimator *intentionally* produces NaNs
    # that per-sample sanitization zeroes (src/raytracer.h:607-616), so
    # jax_debug_nans is a kernel-debugging tool, not a default.
    if os.environ.get("TPU_PATHTRACER_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    if not os.environ.get("TPU_PATHTRACER_NO_CACHE"):
        cache_dir = os.environ.get(
            "TPU_PATHTRACER_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "tpu_pathtracer", "jit"),
        )
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # cache is an optimization; never fail a render over it


def main(argv: Optional[List[str]] = None) -> int:
    setup_backend()

    argv = list(sys.argv if argv is None else argv)
    if len(argv) < 6:
        print(
            f"Too few arguments: expected 6, got {len(argv) - 1}",
            file=sys.stderr,
        )
        return 1

    try:
        width = _strtol(argv[2])
        height = _strtol(argv[3])
        samples = _strtol(argv[4])

        from .utils.profiling import PhaseTimer, device_trace

        timer = PhaseTimer()
        with device_trace(os.environ.get("TPU_PATHTRACER_TRACE_DIR")):
            with timer.phase("load_render"):
                hdr, metrics = render_scene_file(
                    argv[1], width, height, samples, timer=timer
                )

        from .utils.image import quantize_u8, write_ppm
        import numpy as np

        out_path = argv[5]
        parent = os.path.dirname(out_path)
        if parent:
            os.makedirs(parent, exist_ok=True)  # create_directories, main.cpp:41
        with timer.phase("tonemap_write"):
            pixels = np.asarray(quantize_u8(hdr))
            if out_path.lower().endswith(".png"):
                # Capability superset: the reference only writes P6 PPM.
                from PIL import Image

                Image.fromarray(pixels).save(out_path)
            else:
                write_ppm(out_path, pixels)
        timer.report()  # per-phase seconds (SURVEY §5 tracing contract)
        print(metrics.to_json(), file=sys.stderr)
        return 0
    except (RuntimeError, OSError, ValueError) as err:
        print(str(err), file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
