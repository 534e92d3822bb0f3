"""Counter-based RNG key discipline.

The reference uses one ``std::minstd_rand`` LCG per worker thread, seeded with
the pixel-span index so results are deterministic regardless of the thread
schedule (``src/raytracer.h:456-508,648``).  A sequential LCG cannot feed a
wavefront of 10^5+ rays, so the TPU build uses JAX's counter-based threefry:
every (pass, bounce) pair gets an independent key folded from a base seed, and
uniform draws are generated as dense [rays, draws] blocks.  Determinism holds
for any device count or sharding because the counter stream depends only on
logical indices, never on execution order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def pass_key(key: jax.Array, pass_idx) -> jax.Array:
    """Key for one spp accumulation pass (resume-safe: pure counter fold)."""
    return jax.random.fold_in(key, pass_idx)


def bounce_key(key: jax.Array, bounce_idx) -> jax.Array:
    return jax.random.fold_in(key, bounce_idx)


def uniforms(key: jax.Array, n_rays: int, n_draws: int) -> jnp.ndarray:
    """Dense block of U[0,1) draws, one row per ray.

    Replaces the per-thread ``uniform_real_distribution`` pulls; a bounce
    consumes a fixed number of draws per ray (unused ones are dead lanes,
    which is the TPU-friendly trade: fixed shapes over saved entropy).
    """
    return jax.random.uniform(key, (n_rays, n_draws), dtype=jnp.float32)
