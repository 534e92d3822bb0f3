"""Integrators for the homebrew scene format (SURVEY §2 C19).

The reference repo ships 13 ``scene-NNN.txt`` / ``practice*.txt`` scenes from
the course's earlier homework stages but its C++ can only parse glTF — this
module restores the two render modes those stages defined:

* **Whitted mode** (no SAMPLES keyword — hw2/3 scenes): deterministic
  recursive ray tracing.  Diffuse surfaces gather ambient + shadow-tested
  point/directional lights with distance attenuation; METALLIC surfaces are
  perfect mirrors tinted by COLOR; DIELECTRIC surfaces split into
  Schlick-weighted reflection and refraction (refracted component tinted by
  COLOR on entry).  The recursion is unrolled at trace time (depth is static),
  each level a masked wavefront over all pixels.

* **Monte-Carlo mode** (SAMPLES present — practice5+ scenes): a wavefront
  path tracer with the course's simple material semantics: diffuse =
  cosine-sampled bounce with albedo throughput, metallic = mirror bounce,
  dielectric = Schlick-probability reflect/refract Russian roulette.

The exact Whitted/MC conventions are documented choices: the reference has no
in-tree implementation to diff against (its code predates the glTF port's
deletion of these stages), so the course's canonical semantics are used.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..ops.primitives import closest_hit
from ..ops.sampling import cosine_sample
from ..ops.vecmath import dot, normalize, reflect, where3
from ..scene.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE,
    MAT_METALLIC,
    PrimitiveScene,
)
from .pathtracer import gen_rays, per_pixel_uniforms, sanitize_nans


def _schlick(cos_i: jnp.ndarray, ior: jnp.ndarray) -> jnp.ndarray:
    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cos_i) ** 5


def _refract(d, n, eta, cos_i):
    """Refract d about n (n faces the ray, cos_i = -<d,n> >= 0).  Returns
    (dir, total_internal_reflection mask)."""
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    refr = eta[..., None] * d + (eta * cos_i - cos_t)[..., None] * n
    return normalize(refr), tir


def _direct_light(scene: PrimitiveScene, pos, normal, eps):
    """Ambient + shadow-tested directional/point lights -> [R, 3] irradiance."""
    total = jnp.broadcast_to(scene.ambient, pos.shape)

    for i in range(scene.dir_light_dir.shape[0]):
        ldir = scene.dir_light_dir[i]
        lint = scene.dir_light_intensity[i]
        lvalid = scene.dir_light_valid[i]
        ld = jnp.broadcast_to(ldir, pos.shape)
        sh = closest_hit(pos, ld, scene, eps)
        lit = ~sh.hit
        lam = jnp.maximum(0.0, dot(normal, ld))
        total = total + jnp.where(
            (lvalid & lit & (lam > 0))[:, None], lint * lam[:, None], 0.0
        )

    for i in range(scene.point_light_pos.shape[0]):
        lpos = scene.point_light_pos[i]
        lint = scene.point_light_intensity[i]
        att = scene.point_light_atten[i]
        lvalid = scene.point_light_valid[i]
        lvec = lpos - pos
        dist = jnp.sqrt(dot(lvec, lvec))
        ld = lvec / dist[:, None]
        sh = closest_hit(pos, ld, scene, eps)
        lit = ~sh.hit | (sh.t > dist)
        lam = jnp.maximum(0.0, dot(normal, ld))
        atten = 1.0 / (att[0] + att[1] * dist + att[2] * dist * dist)
        total = total + jnp.where(
            (lvalid & lit & (lam > 0))[:, None],
            lint * (lam * atten)[:, None],
            0.0,
        )
    return total


# Whitted DFS minimum stack capacity: a two-way split tree of depth d needs
# at most d + 1 pending entries per ray, so the stack is sized from the
# scene's actual ray depth (no silent truncation for deep scenes).  Weight
# cutoff prunes negligible subtrees.
_WHITTED_STACK = 12
_WHITTED_CUTOFF = 1e-4


def _whitted_trace(scene, origin, direction, depth, eps):
    """Deterministic Whitted tracing as a wavefront DFS.

    A literal unroll of the reflect/refract recursion costs 2^depth inlined
    intersector copies (minutes of XLA compile); instead every ray carries a
    small explicit stack of pending (origin, dir, weight, depth) entries and
    a ``while_loop`` pops one entry per ray per iteration — one intersector
    in the graph, runtime adapting to each pixel's actual branching.
    """
    r = origin.shape[0]
    c = max(_WHITTED_STACK, depth + 1)

    st_o = jnp.zeros((r, c, 3)).at[:, 0].set(origin)
    st_d = jnp.zeros((r, c, 3)).at[:, 0].set(direction)
    st_w = jnp.zeros((r, c, 3)).at[:, 0].set(1.0)
    st_dep = jnp.zeros((r, c), jnp.int32).at[:, 0].set(depth)
    top = jnp.ones((r,), jnp.int32)
    radiance = jnp.zeros((r, 3))

    def cond(state):
        return jnp.any(state[5] > 0)

    def body(state):
        st_o, st_d, st_w, st_dep, radiance, top = state
        active = top > 0
        slot = jnp.maximum(top - 1, 0)
        take = lambda st: jnp.take_along_axis(st, slot[:, None, None], axis=1)[:, 0]
        o = take(st_o)
        d = take(st_d)
        w = take(st_w)
        dep = jnp.take_along_axis(st_dep, slot[:, None], axis=1)[:, 0]
        top = jnp.where(active, top - 1, top)

        hit = closest_hit(o, d, scene, eps)
        live = active & hit.hit
        bg = jnp.broadcast_to(scene.bg_color, o.shape)
        pos = jnp.where(live[:, None], o + hit.t[:, None] * d, o)

        mat = scene.mat_kind[hit.prim]
        color = scene.color[hit.prim]
        ior = scene.ior[hit.prim]
        n = hit.normal

        # Local term: miss -> bg; diffuse -> lit (or flat for stage-1 scenes).
        if scene.lit:
            diffuse = color * _direct_light(scene, pos + n * eps, n, eps)
        else:
            diffuse = color
        local = jnp.where(
            live[:, None],
            jnp.where((mat == MAT_DIFFUSE)[:, None], diffuse, 0.0),
            bg,
        )
        radiance = radiance + jnp.where(active[:, None], w * local, 0.0)

        # Children: mirror branch (metallic / dielectric-reflect) and the
        # dielectric refract branch.
        rdir = normalize(reflect(n, d))
        cos_i = jnp.maximum(0.0, -dot(d, n))
        eta = jnp.where(hit.inside, ior, 1.0 / ior)
        refr_dir, tir = _refract(d, n, eta, cos_i)
        fr = jnp.where(tir, 1.0, _schlick(cos_i, ior))

        is_met = mat == MAT_METALLIC
        is_diel = mat == MAT_DIELECTRIC
        can_spawn = live & (dep > 1)

        w_refl = jnp.where(
            is_met[:, None], w * color, w * fr[:, None]
        )
        push_refl = can_spawn & (is_met | is_diel) & (
            jnp.max(w_refl, axis=-1) > _WHITTED_CUTOFF
        )
        # Refracted component tinted by COLOR on entry (documented choice).
        tint = jnp.where(hit.inside[:, None], jnp.ones_like(color), color)
        w_refr = w * (1.0 - fr[:, None]) * tint
        push_refr = can_spawn & is_diel & ~tir & (
            jnp.max(w_refr, axis=-1) > _WHITTED_CUTOFF
        )

        def push(state, mask, o_new, d_new, w_new, dep_new):
            st_o, st_d, st_w, st_dep, top = state
            slot = jnp.minimum(top, c - 1)
            sel = lambda st, val: jnp.where(
                (mask[:, None, None])
                & (jnp.arange(c)[None, :, None] == slot[:, None, None]),
                val[:, None, :],
                st,
            )
            st_o = sel(st_o, o_new)
            st_d = sel(st_d, d_new)
            st_w = sel(st_w, w_new)
            st_dep = jnp.where(
                mask[:, None] & (jnp.arange(c)[None, :] == slot[:, None]),
                dep_new[:, None],
                st_dep,
            )
            top = jnp.where(mask, jnp.minimum(top + 1, c), top)
            return (st_o, st_d, st_w, st_dep, top)

        state5 = (st_o, st_d, st_w, st_dep, top)
        state5 = push(state5, push_refl, pos + n * eps, rdir, w_refl, dep - 1)
        state5 = push(state5, push_refr, pos - n * eps, refr_dir, w_refr, dep - 1)
        st_o, st_d, st_w, st_dep, top = state5
        return (st_o, st_d, st_w, st_dep, radiance, top)

    state = (st_o, st_d, st_w, st_dep, radiance, top)
    state = jax.lax.while_loop(cond, body, state)
    return state[4]


def _mc_trace(scene, origin, direction, key, pixel_ids, eps):
    """Course-style MC path over primitives: scan over ray_depth bounces."""
    r = origin.shape[0]

    def bounce(carry, bounce_idx):
        o, d, throughput, radiance, alive = carry
        k = jax.random.fold_in(key, bounce_idx)
        draws = per_pixel_uniforms(k, pixel_ids, 4)

        hit = closest_hit(o, d, scene, eps)
        bg = jnp.broadcast_to(scene.bg_color, o.shape)
        miss = alive & ~hit.hit
        radiance = radiance + jnp.where(miss[:, None], throughput * bg, 0.0)
        live = alive & hit.hit

        pos = o + hit.t[:, None] * d
        mat = scene.mat_kind[hit.prim]
        color = scene.color[hit.prim]
        emission = scene.emission[hit.prim]
        ior = scene.ior[hit.prim]
        n = hit.normal

        radiance = radiance + jnp.where(live[:, None], throughput * emission, 0.0)

        # Diffuse: cosine bounce; cos/pi pdf cancels albedo/pi * cos -> albedo.
        diff_dir = cosine_sample(n, draws[0], draws[1])
        # Metallic: mirror.
        mirr_dir = normalize(reflect(n, d))
        # Dielectric: reflect with prob fr else refract.
        cos_i = jnp.maximum(0.0, -dot(d, n))
        eta = jnp.where(hit.inside, ior, 1.0 / ior)
        refr_dir, tir = _refract(d, n, eta, cos_i)
        fr = jnp.where(tir, 1.0, _schlick(cos_i, ior))
        choose_refl = draws[2] <= fr
        diel_dir = where3(choose_refl, mirr_dir, refr_dir)

        is_diff = mat == MAT_DIFFUSE
        is_met = mat == MAT_METALLIC
        new_dir = where3(is_diff, diff_dir, where3(is_met, mirr_dir, diel_dir))
        # Throughput factors: albedo for diffuse/metal; dielectric tints only
        # the refracted-on-entry branch.
        diel_scale = jnp.where(
            (choose_refl | hit.inside)[:, None], jnp.ones_like(color), color
        )
        scale = where3(is_diff | is_met, color, diel_scale)
        throughput = jnp.where(live[:, None], throughput * scale, throughput)

        # Offset origin along the chosen side of the surface.
        going_in = (~choose_refl) & ~tir
        off = jnp.where(
            (is_diff | is_met | choose_refl | tir)[:, None], n * eps, -n * eps
        )
        o = where3(live, pos + off, o)
        d = where3(live, new_dir, d)
        return (o, d, throughput, radiance, live), None

    # Varying-typed carry inits (see pathtracer.trace).
    init = (
        origin,
        direction,
        origin * 0.0 + 1.0,
        origin * 0.0,
        jnp.isfinite(origin[:, 0]),
    )
    (o, d, throughput, radiance, alive), _ = jax.lax.scan(
        bounce, init, jnp.arange(scene.ray_depth)
    )
    return radiance


@partial(jax.jit, static_argnames=("n_rays", "spp", "config", "mc"))
def _render_chunk(scene, chunk_start, key, n_rays, spp, config, mc):
    pixel_ids = chunk_start + jnp.arange(n_rays)
    if not mc:
        half = jnp.full((2, n_rays), 0.5, jnp.float32)
        o, d = gen_rays(scene.camera, pixel_ids, half)
        return _whitted_trace(scene, o, d, scene.ray_depth, config.eps)

    def body(s, acc):
        k = jax.random.fold_in(key, s)
        offsets = per_pixel_uniforms(
            jax.random.fold_in(k, 0x7FFFFFFF), pixel_ids, 2
        )
        o, d = gen_rays(scene.camera, pixel_ids, offsets)
        rad = _mc_trace(scene, o, d, k, pixel_ids, config.eps)
        return acc + sanitize_nans(rad)

    acc = jax.lax.fori_loop(0, spp, body, jnp.zeros((n_rays, 3), jnp.float32))
    return acc / spp


def render_homebrew(
    scene: PrimitiveScene,
    seed: int = 0,
    config: RenderConfig = None,
):
    """Render a homebrew scene -> numpy [H, W, 3] float32 HDR."""
    config = config or RenderConfig()
    cam = scene.camera
    h, w = cam.height, cam.width
    npix = h * w
    if scene.ray_depth == 0:
        return np.broadcast_to(
            np.asarray(scene.bg_color, dtype=np.float32), (h, w, 3)
        ).copy()

    mc = scene.monte_carlo
    spp = scene.samples if mc else 1
    chunk = min(config.rays_per_batch, npix)
    base = jax.random.key(seed)
    out = np.zeros((npix, 3), dtype=np.float32)
    for start in range(0, npix, chunk):
        n = min(chunk, npix - start)
        rad = _render_chunk(
            scene, jnp.asarray(start, jnp.int32), base, chunk, spp, config, mc
        )
        out[start : start + n] = np.asarray(rad[:n])
    return out.reshape(h, w, 3)
