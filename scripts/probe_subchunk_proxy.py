#!/usr/bin/env python
"""CPU proxy: pair-ALU floor if the pair kernel predicated 8/16-tri
SUB-CHUNKS instead of whole 128-tri chunks.

The cascade's ALU unit is (64-ray sub-tile) x (128-tri chunk).  A ray that
enters a chunk's AABB typically crosses only a few of its 16 8-tri
sub-slabs (the chunk is SAH-spatial, so consecutive 8-tri runs occupy
compact sub-boxes).  A transposed pair layout (tris on sublanes, rays on
lanes) would make one vreg = (8 tris x 128 rays), so predication could gate
8-tri sub-chunks — at the cost of coarsening the RAY granularity to the
128-lane tile.  This probe measures, on the same real atrium secondary
wavefront as probe_sortkey_proxy (hint-sorted, t-bounded):

  floor_chunk64    sum over 64-ray blocks of |union chunks| * 64 * 128
                   (the current architecture's floor — should reproduce
                   ~553M pairs at 64k rays)
  floor_sub{8,16}_r{64,128}
                   sum over {64,128}-ray blocks of |union sub-chunks| *
                   rays * {8,16} — the transposed-layout floors
  per_ray_sub8     per-ray t-bounded pierced 8-tri sub-chunks (the truth)

Writes out/probe_subchunk_proxy.json; caches the wavefront in
/tmp/probe_sortkey/wavefront.npz for reuse.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_PATHTRACER_PLATFORM", "cpu")

import numpy as np

CACHE = "/tmp/probe_sortkey/wavefront.npz"


def get_wavefront(r, detail):
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        if z["o1"].shape[0] == r and int(z["detail"]) == detail:
            return {k: z[k] for k in z.files}
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_sortkey/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    chunk_tris = scene.chunk_woop.shape[-1]
    pix = jnp.arange(r, dtype=jnp.int32) % (512 * 512)
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    hit0 = scene_closest_hit(scene, o, d, eps)
    row = scene.shade_attrs[hit0.tri]
    v = row[:, 0:9].reshape(-1, 3, 3)
    gn = jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = jnp.where((jnp.sum(gn * d, axis=-1) > 0)[:, None], -gn, gn)
    u = per_pixel_uniforms(jax.random.key(1), pix, 2)
    d1 = np.asarray(sampling.cosine_sample(gn, u[0], u[1]))
    o1 = np.asarray(
        jnp.where(hit0.hit[:, None], o + hit0.t[:, None] * d, 1e30)
    )
    alive = np.asarray(hit0.hit)
    spawn_chunk = np.where(alive, np.asarray(hit0.tri) // chunk_tris, -1)
    hit1 = scene_closest_hit(scene, jnp.asarray(o1), jnp.asarray(d1), eps)
    t_best = np.where(np.asarray(hit1.hit), np.asarray(hit1.t), np.inf)
    t_best = np.where(alive, t_best, -np.inf)
    data = dict(
        o1=o1, d1=d1, alive=alive, spawn_chunk=spawn_chunk, t_best=t_best,
        tri_verts=np.asarray(scene.shade_attrs[:, 0:9]),
        chunk_lo=np.asarray(scene.chunk_aabb_min),
        chunk_hi=np.asarray(scene.chunk_aabb_max),
        n_valid=int(scene.valid.sum()),
        chunk_tris=chunk_tris,
        detail=detail,
    )
    np.savez_compressed(CACHE, **data)
    return data


def main() -> int:
    r = int(os.environ.get("PROBE_R", str(64 * 1024)))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    eps = 1e-4
    wf = get_wavefront(r, detail)
    o1, d1 = wf["o1"], wf["d1"]
    alive, t_best = wf["alive"], wf["t_best"]
    spawn_chunk = wf["spawn_chunk"]
    chunk_tris = int(wf["chunk_tris"])
    lo_c, hi_c = wf["chunk_lo"], wf["chunk_hi"]
    c = lo_c.shape[0]

    emit = lambda **kw: print(json.dumps(kw), flush=True)

    # Production order: the hint key (spawn chunk x octant).
    octant = (
        (d1[:, 0] > 0).astype(np.int64) * 4
        + (d1[:, 1] > 0) * 2
        + (d1[:, 2] > 0)
    )
    key = np.where(alive, octant * (c + 1) + spawn_chunk, 1 << 28)
    order = np.argsort(key, kind="stable")

    def slab_bits(lo, hi, blk=4096):
        """[R, B] t-bounded pierced bits for boxes (lo, hi) [B, 3]."""
        b = lo.shape[0]
        out = np.zeros((r, b), bool)
        inv = 1.0 / np.where(d1 == 0.0, 1e-30, d1)
        for s in range(0, r, blk):
            e = min(s + blk, r)
            t_lo = np.full((e - s, b), -np.inf, np.float32)
            t_hi = np.full((e - s, b), np.inf, np.float32)
            for a in range(3):
                t1 = (lo[None, :, a] - o1[s:e, a, None]) * inv[s:e, a, None]
                t2 = (hi[None, :, a] - o1[s:e, a, None]) * inv[s:e, a, None]
                np.maximum(t_lo, np.minimum(t1, t2), out=t_lo)
                np.minimum(t_hi, np.maximum(t1, t2), out=t_hi)
            out[s:e] = (
                (t_lo <= t_hi) & (t_hi >= eps) & (t_lo <= t_best[s:e, None])
            )
        return out

    def sub_boxes(k):
        """Sub-chunk AABBs for runs of k tris (NaN tris -> NaN boxes)."""
        v = wf["tri_verts"].reshape(-1, 3, 3)  # [N, 3 verts, 3]
        n = v.shape[0]
        pad = (-n) % chunk_tris
        if pad:
            v = np.concatenate([v, np.full((pad, 3, 3), np.nan, v.dtype)])
        v = v.reshape(-1, k, 3, 3)  # [C*(128/k), k, 3, 3]
        with np.errstate(invalid="ignore"):
            lo = np.nanmin(v.reshape(v.shape[0], -1, 3), axis=1)
            hi = np.nanmax(v.reshape(v.shape[0], -1, 3), axis=1)
        allnan = ~np.isfinite(lo).any(axis=1)
        lo[allnan] = np.nan
        hi[allnan] = np.nan
        return lo.astype(np.float32), hi.astype(np.float32)

    def union_pairs(bits, block, tris_per_unit):
        sb = bits[order]
        nb = r // block
        blocks = sb[: nb * block].reshape(nb, block, -1)
        un = blocks.any(axis=1)
        return int(un.sum()) * block * tris_per_unit

    cb = slab_bits(lo_c, hi_c)
    res = {
        "rays": r,
        "chunks": c,
        "per_ray_chunk": float(cb.sum() / max(alive.sum(), 1)),
        "floor_chunk_r64": union_pairs(cb, 64, 128),
    }
    emit(**res)
    del cb

    for k in (8, 16):
        lo_s, hi_s = sub_boxes(k)
        sbits = slab_bits(lo_s, hi_s)
        res[f"per_ray_sub{k}"] = float(sbits.sum() / max(alive.sum(), 1))
        for blk in (64, 128):
            res[f"floor_sub{k}_r{blk}"] = union_pairs(sbits, blk, k)
        emit(**{m: res[m] for m in res if f"sub{k}" in m})
        del sbits

    os.makedirs("out", exist_ok=True)
    with open("out/probe_subchunk_proxy.json", "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
