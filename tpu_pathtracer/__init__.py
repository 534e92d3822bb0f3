"""tpu_pathtracer — a TPU-native wavefront path-tracing framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the CPU
renderer in ``firelion9/raytracing-course-hw-public`` (see SURVEY.md for the
component map): glTF 2.0 subset + homebrew scene formats, glTF
metallic-roughness BSDF with VNDF/cosine/light-mixture MIS, environment maps,
ACES tone mapping, PPM output — rendered as megabatched wavefronts on TPU
with counter-based RNG and mesh-sharded accumulation.
"""

from .config import RenderConfig, DEFAULT_CONFIG

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level API (keeps `import tpu_pathtracer` free of jax init).
    if name == "Renderer":
        from .renderer import Renderer

        return Renderer
    if name == "render_scene_file":
        from .cli import render_scene_file

        return render_scene_file
    raise AttributeError(name)


__all__ = ["RenderConfig", "DEFAULT_CONFIG", "Renderer", "render_scene_file"]
