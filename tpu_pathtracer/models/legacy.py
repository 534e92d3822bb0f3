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


def _whitted_trace(scene, origin, direction, depth, eps):
    """Deterministic recursion, unrolled over static depth."""
    if depth == 0:
        return jnp.zeros_like(origin)

    hit = closest_hit(origin, direction, scene, eps)
    bg = jnp.broadcast_to(scene.bg_color, origin.shape)
    pos = origin + hit.t[:, None] * direction
    pos = jnp.where(hit.hit[:, None], pos, origin)  # keep dead lanes finite

    mat = scene.mat_kind[hit.prim]
    color = scene.color[hit.prim]
    ior = scene.ior[hit.prim]
    n = hit.normal

    # Diffuse: local illumination only.  Lightless non-MC scenes are stage-1
    # homework (scene-000 class) where COLOR is the final pixel value.
    if scene.lit:
        diffuse = color * _direct_light(scene, pos + n * eps, n, eps)
    else:
        diffuse = color

    # Mirror reflection branch (METALLIC, and the reflective half of
    # DIELECTRIC).
    rdir = normalize(reflect(n, direction))
    reflected = _whitted_trace(scene, pos + n * eps, rdir, depth - 1, eps)
    metallic = color * reflected

    # Dielectric: Schlick-weighted reflection + refraction.
    cos_i = jnp.maximum(0.0, -dot(direction, n))
    eta = jnp.where(hit.inside, ior, 1.0 / ior)
    refr_dir, tir = _refract(direction, n, eta, cos_i)
    refracted = _whitted_trace(scene, pos - n * eps, refr_dir, depth - 1, eps)
    refracted = jnp.where(
        hit.inside[:, None], refracted, refracted * color
    )  # tint on entry
    fr = jnp.where(tir, 1.0, _schlick(cos_i, ior))
    dielectric = fr[:, None] * reflected + (1.0 - fr[:, None]) * jnp.where(
        tir[:, None], 0.0, refracted
    )

    shaded = jnp.where(
        (mat == MAT_DIFFUSE)[:, None],
        diffuse,
        jnp.where((mat == MAT_METALLIC)[:, None], metallic, dielectric),
    )
    return jnp.where(hit.hit[:, None], shaded, bg)


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
        diff_dir = cosine_sample(n, draws[:, 0], draws[:, 1])
        # Metallic: mirror.
        mirr_dir = normalize(reflect(n, d))
        # Dielectric: reflect with prob fr else refract.
        cos_i = jnp.maximum(0.0, -dot(d, n))
        eta = jnp.where(hit.inside, ior, 1.0 / ior)
        refr_dir, tir = _refract(d, n, eta, cos_i)
        fr = jnp.where(tir, 1.0, _schlick(cos_i, ior))
        choose_refl = draws[:, 2] <= fr
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
        half = jnp.full((n_rays, 2), 0.5, jnp.float32)
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
