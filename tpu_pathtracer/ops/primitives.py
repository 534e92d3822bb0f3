"""Analytic-primitive intersection (PLANE / ELLIPSOID / BOX / TRIANGLE).

The homebrew ``scene-NNN.txt`` format describes analytic primitives with a
local-space definition plus a position and rotation quaternion (SURVEY §2
C19).  The current reference C++ cannot render these scenes at all — its only
leftover is the unused ``intersect_ray_sphere`` (src/raytracer.h:61-77) whose
scaled-sphere quadratic is the basis of the ellipsoid test here.  Everything
is dense [R, P] broadcast work: P is tiny (< 32), so brute force over the
primitive set *is* the acceleration structure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.types import (
    PRIM_BOX,
    PRIM_ELLIPSOID,
    PRIM_PLANE,
    PRIM_TRIANGLE,
    PrimitiveScene,
)
from .vecmath import cross, dot, normalize


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by unit quaternion q=(x,y,z,w): the reference's
    ``operator*(vec3, quaternion)`` (src/geometry.h:143-147)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * cross(qv, v)
    return v + qw * t + cross(qv, t)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


class PrimHit(NamedTuple):
    t: jnp.ndarray  # [R] float32 (inf on miss)
    prim: jnp.ndarray  # [R] int32
    normal: jnp.ndarray  # [R, 3] world-space, flipped to face the ray
    inside: jnp.ndarray  # [R] bool (ray origin inside the solid)
    hit: jnp.ndarray  # [R] bool


def closest_hit(
    origin: jnp.ndarray,  # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    scene: PrimitiveScene,
    min_dst: float,
) -> PrimHit:
    r = origin.shape[0]
    p = scene.capacity
    q = scene.rotation[None, :, :]  # [1, P, 4]
    qc = quat_conj(q)
    lo = quat_rotate(qc, (origin[:, None, :] - scene.position[None]))  # [R, P, 3]
    ld = quat_rotate(jnp.broadcast_to(qc, (r, p, 4)), jnp.broadcast_to(direction[:, None, :], (r, p, 3)))

    kind = scene.kind[None, :]  # [1, P]
    par = scene.param[None]  # [1, P, 9]

    # --- PLANE: local plane through origin with normal n -------------------
    n_pl = par[..., 0:3]
    t_pl = -dot(lo, n_pl) / dot(ld, n_pl)
    ok_pl = jnp.isfinite(t_pl) & (t_pl >= min_dst)
    in_pl = jnp.zeros_like(ok_pl)
    nrm_pl = jnp.broadcast_to(n_pl, lo.shape)

    # --- ELLIPSOID: scaled unit sphere (src/raytracer.h:61-77) -------------
    rad = par[..., 0:3]
    lor = lo / rad
    ldr = ld / rad
    a = dot(ldr, ldr)
    hb = dot(lor, ldr)
    c = dot(lor, lor) - 1.0
    h2 = hb * hb - a * c
    hd = jnp.sqrt(jnp.maximum(h2, 0.0))
    t1 = (-hb - hd) / a
    t2 = (-hb + hd) / a
    in_el = (t1 < min_dst) & (t2 >= min_dst)
    t_el = jnp.where(t1 >= min_dst, t1, t2)
    ok_el = (h2 >= 0) & (t_el >= min_dst)
    p_el = lo + t_el[..., None] * ld
    nrm_el = normalize(p_el / (rad * rad))

    # --- BOX: slab test against half-sizes s -------------------------------
    s = par[..., 0:3]
    i1 = (-s - lo) / ld
    i2 = (s - lo) / ld
    tn = jnp.max(jnp.minimum(i1, i2), axis=-1)
    tf = jnp.min(jnp.maximum(i1, i2), axis=-1)
    in_bx = tn < min_dst
    t_bx = jnp.where(tn >= min_dst, tn, tf)
    ok_bx = (tn <= tf) & (t_bx >= min_dst)
    p_bx = lo + t_bx[..., None] * ld
    rel = p_bx / s
    ax = jnp.argmax(jnp.abs(rel), axis=-1)
    nrm_bx = jnp.sign(
        jnp.take_along_axis(rel, ax[..., None], axis=-1)
    ) * jnp.eye(3)[ax]

    # --- TRIANGLE: Cramer in local space (src/bvh.h:36-50 math) ------------
    ta = par[..., 0:3]
    av = par[..., 3:6] - ta
    au = par[..., 6:9] - ta
    y = lo - ta
    at = -ld
    denom = dot(av, cross(au, at))
    beta = dot(y, cross(jnp.broadcast_to(au, y.shape), at)) / denom
    gamma = dot(jnp.broadcast_to(av, y.shape), cross(y, at)) / denom
    t_tr = dot(jnp.broadcast_to(av, y.shape), cross(jnp.broadcast_to(au, y.shape), y)) / denom
    ok_tr = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t_tr >= min_dst)
    in_tr = jnp.zeros_like(ok_tr)
    nrm_tr = jnp.broadcast_to(normalize(cross(av, au)), lo.shape)

    def sel(pl, el, bx, tr):
        k = kind if pl.ndim == 2 else kind[..., None]
        return jnp.where(
            k == PRIM_PLANE,
            pl,
            jnp.where(k == PRIM_ELLIPSOID, el, jnp.where(k == PRIM_BOX, bx, tr)),
        )

    t = sel(t_pl, t_el, t_bx, t_tr)
    ok = sel(ok_pl, ok_el, ok_bx, ok_tr) & scene.valid[None, :]
    inside = sel(in_pl, in_el, in_bx, in_tr)
    nrm_local = sel(nrm_pl, nrm_el, nrm_bx, nrm_tr)

    t = jnp.where(ok, t, jnp.inf)
    best = jnp.argmin(t, axis=-1)
    t_best = jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0]
    hit = jnp.isfinite(t_best)

    take = lambda arr: jnp.take_along_axis(arr, best[:, None], axis=1)[:, 0]
    take3 = lambda arr: jnp.take_along_axis(arr, best[:, None, None], axis=1)[:, 0]
    nrm_l = take3(nrm_local)
    inside_best = take(inside)
    q_best = scene.rotation[best]
    nrm_w = normalize(quat_rotate(q_best, nrm_l))
    # Flip to face the incoming ray (two-sided shading, as the triangle path
    # does via is_inside — src/bvh.h:92,111-112).
    facing = dot(nrm_w, direction) > 0
    nrm_w = jnp.where(facing[:, None], -nrm_w, nrm_w)

    return PrimHit(
        t=t_best,
        prim=best.astype(jnp.int32),
        normal=nrm_w,
        inside=inside_best,
        hit=hit,
    )
