"""Counter-based threefry-2x32 uniforms in TPU-friendly lane-major layout.

The estimator draws ~10 uniforms per (pixel, sample, depth) lane.  Routing
those through ``jax.random`` (vmapped ``fold_in`` + per-lane ``uniform``)
produces ``[R, n_draws]`` intermediates whose minor dim is the *draw* axis —
5-10 lanes of a 128-lane vector register, i.e. >90% of every VPU op wasted;
measured at ~4 ms per 16k-ray bounce on chip, comparable to the whole
intersection kernel.  This module computes the same *kind* of stream (full
threefry-2x32, the same PRNG family jax uses) directly in counter mode with
the ray axis minor, so every u32 op runs at full lane occupancy.

Stream discipline (the framework's reproducibility anchor — replaces the
reference's per-span LCG seeding, src/raytracer.h:648): every uniform is
``tf2x32(stage_key, (pixel, block))`` where ``stage_key`` folds
(sample, depth) into the user seed.  The draw for a given
(seed, pixel, sample, depth, draw index) is a pure function of those five
integers — independent of batch split, device sharding, engine (scan vs
persistent wavefront), chunk order, and checkpoint/resume boundaries.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = 0x1BD11BDA

U32 = jnp.uint32
_Int = Union[int, jnp.ndarray]


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << U32(r)) | (x >> U32(32 - r))


def tf2x32(
    k0: _Int, k1: _Int, c0: _Int, c1: _Int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Threefry-2x32, 20 rounds (the Random123 KAT-validated variant).

    All inputs broadcast; u32 semantics.  Returns two u32 words.
    """
    def u(x):
        import numpy as np

        if isinstance(x, int):
            return U32(np.uint32(x & 0xFFFFFFFF))
        return jnp.asarray(x).astype(U32)

    k0, k1, x0, x1 = u(k0), u(k1), u(c0), u(c1)
    x0 = x0 + k0
    x1 = x1 + k1
    ks = (k0, k1, k0 ^ k1 ^ U32(_PARITY))
    for i in range(5):
        for j in range(4):
            r = _ROT[(i % 2) * 4 + j]
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + U32(i + 1)
    return x0, x1


def _bits_to_unit(bits: jnp.ndarray) -> jnp.ndarray:
    """u32 -> f32 in [0, 1): top 23 bits into a [1,2) mantissa, minus 1."""
    f = jax.lax.bitcast_convert_type(
        (bits >> U32(9)) | U32(0x3F800000), jnp.float32
    )
    return f - 1.0


def key_words(key: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The two u32 words of a jax PRNG key (threefry impl)."""
    data = jax.random.key_data(key)
    return data[..., 0].astype(U32), data[..., 1].astype(U32)


# Reserved depth id for the pixel-jitter draws of a sample (a sample's
# camera jitter is conceptually "before bounce 0").  Scene ray depth is
# capped far below this.
JITTER_DEPTH = 0x7FFFFFFF


def lane_uniforms(
    key: jax.Array,
    sample: _Int,  # scalar or [R] global sample index
    depth: _Int,  # scalar or [R] bounce index (or JITTER_DEPTH)
    pixel: jnp.ndarray,  # [R] linear pixel ids
    n_draws: int,
) -> jnp.ndarray:  # [n_draws, R] f32 in [0, 1)
    """U[0,1) draws keyed per (pixel, sample, depth) lane.

    ``sample``/``depth`` may be scalars (scan engine: the whole wavefront
    shares one (sample, depth)) or per-lane vectors (persistent engine:
    heterogeneous lanes) — the stream is identical either way, which is what
    makes the two engines produce bit-equal estimators.
    """
    k0, k1 = key_words(key)
    s = jnp.asarray(sample).astype(U32)
    b = jnp.asarray(depth).astype(U32)
    p = pixel.astype(U32)
    # Stage key: fold (sample, depth) through one block.  For the scan
    # engine this is scalar work (free); for the persistent engine it is one
    # [R]-wide block.
    a0, a1 = tf2x32(k0, k1, s, b)
    draws = []
    for blk in range((n_draws + 1) // 2):
        x0, x1 = tf2x32(a0, a1, p, U32(blk))
        draws.append(_bits_to_unit(x0))
        draws.append(_bits_to_unit(x1))
    return jnp.stack(draws[:n_draws], axis=0)
