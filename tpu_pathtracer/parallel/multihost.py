"""Multi-host (pod / DCN) rendering.

The reference has no distributed story at all (one process, one shared
memory, SURVEY §2 C10); this module defines the pod-scale contract for the
TPU build.  The design follows SURVEY §5: DCN only enters for spp/pixel
farming — every host renders disjoint sample ranges or pixel rows of the
same replicated scene, and a final reduction merges accumulators.  Because
the RNG is keyed per (pixel, sample), the union of any disjoint work split
is exactly the single-host render.

On a real pod, launch one process per host with the standard JAX env
(``JAX_COORDINATOR_ADDRESS`` etc.) and call :func:`render_multihost`.  The
code paths below only assume ``jax.process_count()``-style SPMD, so they run
unchanged (and are tested) with a single process.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..config import RenderConfig
from ..scene.types import TriangleScene
from .mesh import make_mesh, render_sharded


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Returns True when running as part of a multi-process job.  Safe to call
    unconditionally: without coordinator env vars it is a no-op.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()
    return jax.process_count() > 1


def render_multihost(
    scene: TriangleScene,
    spp: int,
    seed: int = 0,
    config: Optional[RenderConfig] = None,
) -> np.ndarray:
    """Pod-scale render: each process renders a disjoint sample range on its
    local chips, and accumulators are summed over DCN.

    spp is split evenly across processes (process p renders samples
    [p*spp/P, (p+1)*spp/P) via the checkpoint-style ``sample_start``
    offset); the cross-host allreduce is one [H*W, 3] psum — bandwidth-
    trivial next to the render itself.
    """
    config = config or RenderConfig()
    p = jax.process_count()
    rank = jax.process_index()
    if p == 1:
        return render_sharded(scene, spp, seed, config)

    # Split spp across hosts with the remainder spread over the first ranks
    # (no divisibility requirement); sample_start offsets the counter stream
    # so the slices are disjoint by construction and their union is exactly
    # the single-host sample set.
    base_spp, rem = divmod(spp, p)
    local_spp = base_spp + (1 if rank < rem else 0)
    sample_start = rank * base_spp + min(rank, rem)

    # Render this host's sample slice over ALL its local chips (the local
    # device mesh), not a single device.
    local_mesh = make_mesh(jax.local_devices())
    cam = scene.camera
    if local_spp > 0:
        local = render_sharded(
            scene, local_spp, seed, config, local_mesh,
            sample_start=sample_start,
        ).reshape(-1, 3)
        local = local * (local_spp / spp)  # slice mean -> weighted share
    else:  # more hosts than samples: this host contributes nothing
        local = np.zeros((cam.height * cam.width, 3), dtype=np.float32)

    # Merge host accumulators over DCN.
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(local)  # [P, npix, 3]
    return total.sum(axis=0).reshape(cam.height, cam.width, 3)
