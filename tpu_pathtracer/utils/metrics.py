"""Structured render metrics (the reference's only telemetry was a span
counter printed with ``\\r`` — src/raytracer.h:647; BASELINE.json asks for
Mrays/s and spp/s as JSON)."""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class RenderMetrics:
    width: int
    height: int
    samples: int
    ray_depth: int
    load_seconds: float
    render_seconds: float
    # TRUE rays traced (live lanes entering each bounce), reported by the
    # persistent engine (models/pathtracer.py render(stats=...)); None when
    # the scan engine ran (it executes full depth regardless of liveness).
    measured_rays: Optional[int] = None

    @property
    def pixel_samples(self) -> int:
        return self.width * self.height * self.samples

    @property
    def samples_per_second(self) -> float:
        return self.pixel_samples / max(self.render_seconds, 1e-9)

    @property
    def mrays_per_second(self) -> float:
        """Upper-bound ray count: every sample traces up to ray_depth rays
        (matches how the derived BASELINE.md numbers were computed).  Prefer
        ``measured_mrays_per_second`` when available — it counts actual
        bounce executions instead of assuming full-depth paths."""
        return self.pixel_samples * self.ray_depth / max(self.render_seconds, 1e-9) / 1e6

    @property
    def measured_mrays_per_second(self) -> Optional[float]:
        if self.measured_rays is None:
            return None
        return self.measured_rays / max(self.render_seconds, 1e-9) / 1e6

    def to_json(self) -> str:
        out = {
            "width": self.width,
            "height": self.height,
            "samples": self.samples,
            "ray_depth": self.ray_depth,
            "load_seconds": round(self.load_seconds, 4),
            "render_seconds": round(self.render_seconds, 4),
            "samples_per_second": round(self.samples_per_second, 1),
            "mrays_per_second_depth_bound": round(self.mrays_per_second, 3),
        }
        if self.measured_rays is not None:
            out["measured_rays"] = self.measured_rays
            out["measured_mrays_per_second"] = round(
                self.measured_mrays_per_second, 3
            )
        return json.dumps(out)
