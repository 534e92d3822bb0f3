#!/usr/bin/env python
"""Worker process for the multi-host render test (and for manual pod-style
CPU experiments): joins a jax.distributed job, renders its sample slice via
``render_multihost``, and rank 0 writes the merged image.

Usage: multihost_worker.py <rank> <nprocs> <coordinator> <scene.gltf> <spp>
       <out.npy> [ckpt_template] [ckpt_every]

``ckpt_template`` (e.g. ``/tmp/ck{rank}.npz``) gives each process its OWN
checkpoint file — the production pod layout (no shared filesystem) whose
resume-desync handling (rank-0 broadcast) the 2-process test validates.
"""

import os
import sys


def main() -> int:
    rank, nprocs = int(sys.argv[1]), int(sys.argv[2])
    coordinator, scene_path = sys.argv[3], sys.argv[4]
    spp, out_path = int(sys.argv[5]), sys.argv[6]
    ckpt = sys.argv[7].format(rank=rank) if len(sys.argv) > 7 else None
    ckpt_every = int(sys.argv[8]) if len(sys.argv) > 8 else None

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nprocs, process_id=rank
    )
    assert jax.process_count() == nprocs

    import dataclasses

    import numpy as np

    from tpu_pathtracer.parallel.multihost import render_multihost
    from tpu_pathtracer.scene.gltf import parse_gltf_scene

    scene = parse_gltf_scene(scene_path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(16, 16))
    img = render_multihost(
        scene, spp=spp, seed=3, checkpoint_path=ckpt,
        checkpoint_every=ckpt_every,
    )
    if rank == 0:
        np.save(out_path, img)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
