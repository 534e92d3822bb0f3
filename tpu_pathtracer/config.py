"""Runtime render configuration.

The reference keeps all knobs as compile-time ``constexpr`` flags
(``src/config.h:7-47``) so changing any of them requires a rebuild.  Here the
same knobs — same names (snake_cased) and same defaults — live in a frozen
dataclass resolved at trace time, so a change only triggers an XLA re-jit, not
a recompile of the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Mirrors the reference's compile-time flag block (``src/config.h``).

    Every field is static for tracing purposes: it is baked into the jitted
    render function, exactly like the ``constexpr`` originals were baked into
    the binary.
    """

    # Numerical epsilon used for intersection validity windows and pdf guards
    # (src/config.h:15).
    eps: float = 1e-4

    # Path depth when the scene does not specify one (src/config.h:17).
    default_ray_depth: int = 8

    # Roughness clamp: anything below is treated as this (src/config.h:20).
    min_roughness: float = 0.04

    # MIS weight of the VNDF strategy; the cosine/light mixture gets
    # (1 - vndf_factor) (src/config.h:26).
    vndf_factor: float = 1.0 / 3.0

    # When False only 1x1 textures are honored (src/config.h:29).
    use_textures: bool = True

    # Environment map trio (src/config.h:36-38).  The CLI always sets the
    # background color to (env_map_intensity,)*3, matching src/main.cpp:28-31.
    env_map_intensity: float = 1.0
    use_env_map: bool = False
    env_map_path: str = "env.hdr"

    # Extra camera-space light triangle (src/config.h:41-47).
    add_light_triangle: bool = False
    light_triangle_intensity: float = 10.0
    light_triangle_relative_pos: Tuple[Tuple[float, float, float], ...] = (
        (10.0, 0.0, -0.1),
        (0.0, 10.0, -0.1),
        (0.0, -10.0, -0.1),
    )

    # --- TPU-specific execution knobs (no reference analog; replaces the
    # --- SPAN_SIZE/USE_MULTITHREADING thread-pool pair, src/config.h:7-13).
    # Number of rays processed per device per wavefront megabatch.  Spans of
    # 256 pixels fed a CPU thread pool in the reference; here a megabatch
    # feeds the whole chip and XLA tiles it over the VPU/MXU.  On-chip sweep
    # (512^2@32spp, 82k tris): 64k beats 16k by ~13% (sorted tiles get more
    # coherent, fixed per-dispatch costs amortize) and beats 256k (argsort
    # growth).  The traversal workspace scales with rays, bounding HBM use.
    rays_per_batch: int = 1 << 16

    # Samples per pixel accumulated per device pass.  The accumulator is
    # checkpointable between passes (the reference had no checkpointing).
    spp_per_pass: int = 16

    # Failed device executions (worker crash, preemption) are repaired by
    # recomputing the affected pixel chunk — counter-based RNG makes every
    # chunk a pure function of (scene, seed, range), so recovery is exact
    # (SURVEY §5 failure-detection contract).  0 disables.
    failure_retries: int = 2

    # Wavefront coherence sort key for large scenes.  "hint": direction
    # octant x the Morton chunk id of the surface the ray spawned from
    # (surface-adaptive — much tighter tile unions for incoherent enclosed
    # secondaries); "cell": direction octant x 16^3 Morton origin cell (the
    # round-2 key, kept for A/B probes); "target": the worklist group each
    # ray will FIRST ENTER (Pallas argmin of slab entry over group AABBs) x
    # octant — geometry-aware, tracks where the ray is GOING rather than
    # where it spawned.  Purely a perf knob: sorting is observationally
    # free (per-pixel counter RNG).
    sort_key: str = "hint"

    # Frame pool (compaction engine, single-host render() path only): each
    # persistent call's work pool covers the WHOLE frame — the accumulator
    # sizes to the frame while lanes stay rays_per_batch wide — so the
    # pool-drain tail (lanes dying over the last ~ray_depth iterations once
    # the pool empties) is paid once per spp pass instead of once per
    # lane-sized pixel chunk.  Estimator-identical (same (pixel, sample,
    # depth) counter-RNG streams; only per-pixel fp summation order moves).
    # Device executions get longer by the frame/chunk ratio: bound them with
    # spp_per_pass.
    frame_pool: bool = False

    # Wavefront engine: True = persistent wavefront with path regeneration
    # (true stream compaction: dead lanes refill with fresh samples each
    # iteration, ~100% lane occupancy); False = fixed scan over ray_depth
    # bounces.  Both produce the same estimator sample-for-sample.
    compaction: bool = True


DEFAULT_CONFIG = RenderConfig()
