#!/usr/bin/env python
"""Dump the optimized HLO of the persistent-engine dispatch at trace shapes.

Produces the ``HLO=`` input for trace_attrib.py: lowers + compiles the same
``render_chunk_persistent`` call ``trace_ops.py`` traces (atrium detail-2,
256 px chunk dims, 64k lanes) and writes ``compiled.as_text()`` — which
carries ``metadata={op_name=..., source_file=..., source_line=...}`` — to
$HLO_OUT (default /tmp/render_hlo.txt).
"""

import dataclasses
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.models.pathtracer import render_chunk_persistent
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    out = os.environ.get("HLO_OUT", "/tmp/render_hlo.txt")
    size = int(os.environ.get("TRACE_SIZE", "256"))
    config = RenderConfig(rays_per_batch=64 * 1024)
    tmp = tempfile.mkdtemp(prefix="hlo_scene_")
    path = make_atrium_gltf(os.path.join(tmp, "atrium.gltf"), detail=2)
    scene = parse_gltf_scene(path, 1.0, config)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(size, size))

    n_rays = config.rays_per_batch
    spp = int(os.environ.get("TRACE_SPP", "4"))
    lowered = render_chunk_persistent.lower(
        scene,
        jnp.asarray(0, jnp.int32),
        jax.random.key(7),
        jnp.asarray(0, jnp.int32),
        n_rays,
        spp,
        config,
        pix_count=jnp.asarray(n_rays, jnp.int32),
    )
    txt = lowered.compile().as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
