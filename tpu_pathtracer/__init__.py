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

__all__ = ["RenderConfig", "DEFAULT_CONFIG"]
